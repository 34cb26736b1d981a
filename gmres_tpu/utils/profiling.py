"""Profiling and roofline helpers (SURVEY §5 tracing plan).

The reference's only instrumentation is omp_get_wtime around whole
solves (test_poisson_mf.f90:44-46). Here: jax.profiler trace capture
around any callable, per-phase named scopes (the solvers annotate their
SpMV / orthogonalization / small-matrix phases), and a stencil roofline
measurement against HBM speed-of-light — the BASELINE.json
"speed-of-light" requirement made checkable.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

# Peak HBM bandwidth (GB/s) per chip for known TPU generations; used
# only to report a fraction-of-peak estimate. Unknown platforms report
# the achieved number with fraction=None.
_HBM_PEAK_GBPS = {
    "v4": 1228.0,
    "v5 lite": 819.0,  # v5e reports device_kind "TPU v5 lite"
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _device_peak_gbps() -> Optional[float]:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for name, peak in _HBM_PEAK_GBPS.items():
        if name in kind:
            return peak
    return None


def measure_bandwidth(
    fn: Callable, x: jnp.ndarray, bytes_moved: int, reps: int = 50
) -> dict:
    """Achieved effective bandwidth of fn(x) (GB/s), compile excluded.

    The ``reps`` applications are CHAINED inside one jit call
    (x ← fn(x)) so host-dispatch latency — which dominates per-call
    timing for small grids, especially over a remote-TPU tunnel — is
    amortized away and the device-side time per application is what's
    measured. Requires fn: X → X (every stencil/SpMV qualifies)."""

    @jax.jit
    def chained(v):
        v = jax.lax.fori_loop(0, reps, lambda _, u: fn(u), v)
        # Reduce to a scalar INSIDE the jit: fetching it is the only
        # reliable sync — block_until_ready returns early through the
        # remote-TPU (axon) tunnel, and transferring the full array
        # would measure tunnel bandwidth instead of HBM.
        return jnp.sum(v)

    float(chained(x))
    t0 = time.perf_counter()
    float(chained(x))
    dt = (time.perf_counter() - t0) / reps
    gbps = bytes_moved / dt / 1e9
    peak = _device_peak_gbps()
    return {
        "seconds": dt,
        "gbps": gbps,
        "fraction_of_peak": (gbps / peak) if peak else None,
        "peak_gbps": peak,
    }


def stencil_roofline(nsize: int, dtype=jnp.float32, reps: int = 50) -> dict:
    """Roofline check of the 5-point stencil: it reads and writes one
    grid each (ideal traffic 2·N²·itemsize; halo re-reads are cached in
    VMEM/registers)."""
    from gmres_tpu.ops.stencil import stencil_5pt_apply

    x = jnp.ones((nsize, nsize), dtype=dtype)
    bytes_moved = 2 * x.size * x.dtype.itemsize
    out = measure_bandwidth(stencil_5pt_apply, x, bytes_moved, reps)
    out["kernel"] = "stencil_5pt_jnp"
    out["nsize"] = nsize
    out["dtype"] = str(dtype)
    return out
