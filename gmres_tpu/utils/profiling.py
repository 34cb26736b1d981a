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

    Applications are CHAINED inside one jit call (x ← fn(x)) and timed
    at two rep counts; the per-application time is the SLOPE, so both
    host-dispatch latency (~30 ms over a remote-TPU tunnel) and the
    scalar-fetch round trip cancel out. Requires fn: X → X where X is
    an array or a pytree of arrays (every stencil/SpMV qualifies; the
    double-double route carries an (hi, lo) pair)."""

    def total(k):
        @jax.jit
        def chained(v):
            v = jax.lax.fori_loop(0, k, lambda _, u: fn(u), v)
            # Reduce to a scalar INSIDE the jit: fetching it is the
            # only reliable sync — block_until_ready returns early
            # through the remote-TPU (axon) tunnel, and transferring
            # the full array would measure tunnel bandwidth.
            return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(v))

        float(chained(x))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(chained(x))
            best = min(best, time.perf_counter() - t0)
        return best

    if jax.default_backend() != "tpu":
        # Local backends have no dispatch-latency problem — a direct
        # two-point slope at the requested rep counts is accurate and
        # keeps CPU test runs fast (the TPU ramp below sizes chains in
        # SECONDS and made the suite crawl).
        r1 = max(1, reps)
        r2 = 2 * r1
        dt = max((total(r2) - total(r1)) / (r2 - r1), 1e-9)
        gbps = bytes_moved / dt / 1e9
        peak = _device_peak_gbps()
        return {
            "seconds": dt,
            "gbps": gbps,
            "fraction_of_peak": (gbps / peak) if peak else None,
            "peak_gbps": peak,
        }

    # Two-point slope with chain lengths sized in SECONDS of device
    # work: the per-dispatch constant over a remote-TPU tunnel is
    # ~30 ms with multi-ms jitter, so the two points must sit ≳1 s
    # apart for a clean slope. Ramp the chain length geometrically
    # until the call takes ≳0.7 s (so the estimate is jitter-free),
    # never predicting past ~6 s — multi-minute fused kernels trip the
    # device watchdog (observed: TPU worker crash).
    rtt = total(0)
    r1 = max(1, reps // 4)
    t1 = total(r1)
    while t1 - rtt < 0.7 and r1 < 1_000_000:
        # Predict the next size from the work seen so far, but never
        # grow more than 16x per step in case the estimate is noise.
        per = max((t1 - rtt) / r1, 1e-8)
        r_next = min(max(int(1.0 / per), 2 * r1), 16 * r1, 1_000_000)
        r1, t1 = r_next, total(r_next)
    per = max((t1 - rtt) / r1, 1e-9)
    r2 = max(r1 + 1, min(4 * r1, r1 + int(4.0 / per)))
    t2 = total(r2)
    dt = max((t2 - t1) / (r2 - r1), 1e-9)
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
