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
