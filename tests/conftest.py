"""Test configuration: CPU backend with 8 virtual devices (the
fake-multi-chip harness the reference lacks — SURVEY §4), float64 on
(the reference is real(8) throughout with tolerances to 1e-15).

Note: the env may pin JAX_PLATFORMS to a TPU plugin; plain os.environ
overrides are not reliably honored, so the platform is forced via
jax.config before any device query.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache, shared with bench.py's .jaxcache (CPU
# and TPU entries key separately). Two reasons: the suite's wall time
# on a 1-core box is dominated by XLA compiles, and a full-suite run
# was twice observed to wedge INSIDE one specific large GSPMD compile
# (test_lsqr sharded parity) only after ~150 earlier compilations in
# the same process — a cache hit sidesteps the pathological recompile
# entirely and makes suite time roughly proportional to actual solves.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jaxcache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_client_state():
    """Drop live executables/tracing caches between test MODULES.

    Full-suite runs in ONE process were observed to wedge or segfault
    inside XLA (a compile that never returns at test_lsqr, later a
    SIGSEGV deserializing a cache entry at test_implicit) only after
    ~150 accumulated compilations — never in short runs of the same
    tests. Bounding the in-process client state per module avoids the
    pathological regime; the persistent disk cache above keeps the
    recompiles cheap."""
    yield
    jax.clear_caches()
