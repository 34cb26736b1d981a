"""Fused Pallas kernels for the memory-bound solver inner loops.

The Krylov iterations are HBM-bandwidth-bound: every vector op streams
the operands at O(n) flops. The reference fuses what OpenMP can —
cg_omp folds the x/r update and the residual reduction into one
parallel region (cg.f90:127-134), bicgstab pairs its dot products into
single reduction clauses (bicgstab.f90:123-127). The TPU equivalents
here keep each fusion to ONE VMEM round trip:

* ``cg_fused_update`` — x ← x+αp, r ← r−α·ap, ‖r‖² in a single pass
  over the four vectors (the cg.f90:127-134 fusion). MEASURED VERDICT
  (docs/DESIGN.md §6): parity with the jnp sequence on v5e — XLA
  already fuses the update AND keeps loop-invariant vectors
  VMEM-resident across while_loop iterations, so the solvers stay
  pure jnp; this kernel is kept for shard_map-per-shard callers.
* ``axpy_dot`` — y ← y+αx together with (y·z) for a caller-chosen z;
  the generic dot+axpy fusion of SURVEY §2 C2's reflector sweeps.
  MEASURED VERDICT: 1.5× SLOWER than the XLA-fused jnp pair (same
  residency effect) — not wired anywhere on the single-chip path.
* ``chebyshev_poisson_fused`` — the entire degree-2 Chebyshev
  application z = r/d + α(r − A(r)/d) (uses A(r/d) = A(r)/d by
  linearity) as one stencil+axpy VMEM pass, with explicit halo rows so
  it drops into the shard_map distributed path
  (chebyshev.f90:27-37 does the same work as three separate loops).

All kernels are single-program whole-block (the per-chip shard of a
Krylov vector is the natural VMEM unit); f32/bf16 — f64 has no Mosaic
vector path and stays on the fused-by-XLA jnp route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_specs(k):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(k)]


# ---------------------------------------------------------------------------
# CG fused update.
# ---------------------------------------------------------------------------


def _cg_update_kernel(alpha_ref, x_ref, r_ref, p_ref, ap_ref,
                      xo_ref, ro_ref, rsq_ref):
    a = alpha_ref[0]
    xo_ref[:] = x_ref[:] + a * p_ref[:]
    rn = r_ref[:] - a * ap_ref[:]
    ro_ref[:] = rn
    # Accumulate in f32: a bf16 running sum stagnates once it exceeds
    # ~256 (8-bit mantissa ulp swallows unit-scale terms).
    rf = rn.astype(jnp.float32)
    rsq_ref[0, 0] = jnp.sum(rf * rf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cg_fused_update(x, r, p, ap, alpha, interpret: bool = False):
    """(x+αp, r−α·ap, ‖r−α·ap‖²_local) in one VMEM pass.

    The returned square norm is the LOCAL partial sum — under shard_map
    the caller psums it (the reference's reduction(+:res) clause,
    cg.f90:127-134)."""
    alpha = jnp.asarray(alpha, dtype=x.dtype).reshape(1)
    x2, r2, rsq = pl.pallas_call(
        _cg_update_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _vmem_specs(4),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(r.shape, r.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(alpha, x, r, p, ap)
    return x2, r2, rsq[0, 0]


# ---------------------------------------------------------------------------
# Generic axpy + dot fusion.
# ---------------------------------------------------------------------------


def _axpy_dot_kernel(alpha_ref, x_ref, y_ref, z_ref, yo_ref, dot_ref):
    a = alpha_ref[0]
    yn = y_ref[:] + a * x_ref[:]
    yo_ref[:] = yn
    dot_ref[0, 0] = jnp.sum(
        yn.astype(jnp.float32) * z_ref[:].astype(jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def axpy_dot(alpha, x, y, z, interpret: bool = False):
    """(y + αx, (y+αx)·z_local) fused — one pass instead of two."""
    alpha = jnp.asarray(alpha, dtype=x.dtype).reshape(1)
    yn, d = pl.pallas_call(
        _axpy_dot_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _vmem_specs(3),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(y.shape, y.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(alpha, x, y, z)
    return yn, d[0, 0]


# ---------------------------------------------------------------------------
# Fused Chebyshev(2) application on the 5-point stencil.
# ---------------------------------------------------------------------------


def _cheb_kernel(scal_ref, r_ref, top_ref, bot_ref, z_ref):
    d = scal_ref[0]
    alpha = scal_ref[1]
    c0, cw, ce, cs, cn = (scal_ref[2], scal_ref[3], scal_ref[4],
                          scal_ref[5], scal_ref[6])
    r = r_ref[:]
    ar = _local_stencil(r, top_ref[:], bot_ref[:], c0, cw, ce, cs, cn)
    inv_d = 1.0 / d
    z_ref[:] = r * inv_d + alpha * (r - ar * inv_d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chebyshev_poisson_fused(
    r, top, bottom, d, alpha,
    coefs=(4.0, -1.0, -1.0, -1.0, -1.0),
    interpret: bool = False,
):
    """Degree-2 Chebyshev preconditioner application fused into one
    stencil pass: z = r/d + α(r − A(r)/d), exploiting A(r/d) = A(r)/d.

    top/bottom are the one-row halos of r (zeros at physical
    boundaries) so this slots directly under shard_map next to the
    halo stencil operator."""
    if top.ndim == 1:
        top = top[None, :]
    if bottom.ndim == 1:
        bottom = bottom[None, :]
    scal = jnp.asarray([d, alpha, *coefs], dtype=r.dtype)
    return pl.pallas_call(
        _cheb_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _vmem_specs(3),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
        interpret=interpret,
    )(scal, r, top, bottom)


# ---------------------------------------------------------------------------
# Order-k Chebyshev semi-iteration, fully VMEM-resident.
#
# The deep-polynomial preconditioner (the tuned headline config) applies
# k stencil sweeps per preconditioning. Done in jnp, every sweep is an
# HBM read+write; done here, the grid is loaded into VMEM ONCE and all
# k sweeps run on-chip: HBM traffic drops from 2k·n² to 2·n² words.
# The ρ recurrence is data-independent, so the per-step coefficients
# are precomputed host-side and passed through SMEM.
# ---------------------------------------------------------------------------


def _local_stencil(x, top, bottom, c0, cw, ce, cs, cn):
    up = jnp.concatenate([top, x[:-1, :]], axis=0)
    down = jnp.concatenate([x[1:, :], bottom], axis=0)
    left = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    return c0 * x + cw * left + ce * right + cs * up + cn * down


def _chebk_kernel(order: int):
    def kernel(scal_ref, rho_ref, r_ref, z_ref, d_scr):
        theta = scal_ref[0]
        c0, cw, ce, cs, cn = (scal_ref[1], scal_ref[2], scal_ref[3],
                              scal_ref[4], scal_ref[5])
        r = r_ref[:]
        zero = jnp.zeros((1, r.shape[1]), dtype=r.dtype)
        d_scr[:] = r / theta
        z_ref[:] = d_scr[:]
        for step in range(order - 1):
            az = _local_stencil(z_ref[:], zero, zero, c0, cw, ce, cs, cn)
            # rho_ref[2*step] = ρ_{new}·ρ_{old}; [2*step+1] = 2ρ_{new}/δ
            d_scr[:] = (rho_ref[2 * step] * d_scr[:]
                        + rho_ref[2 * step + 1] * (r - az))
            z_ref[:] = z_ref[:] + d_scr[:]

    return kernel


def jacobi_k_scalars(omega: float, center: float, order: int):
    """Host-side coefficients expressing an order-k DAMPED-JACOBI sweep
    (e ← e + (ω/c₀)·(r − A·e), e₀ = (ω/c₀)·r) in the SAME (θ, per-step
    [a, b]) form as the Chebyshev semi-iteration: the kernel recurrence

        d ← a·d + b·(r − A·z) ;  z ← z + d ;  z₀ = d₀ = r/θ

    reduces to damped Jacobi with θ = c₀/ω and (a, b) = (0, ω/c₀) at
    every step. This lets the nonsymmetric multigrid smoothers (which
    must avoid real-axis Chebyshev — it diverges on the convection
    operator's complex spectrum, precond/multigrid.py) reuse the
    VMEM-resident trapezoidal kernels unchanged."""
    step = float(omega) / float(center)
    steps = []
    for _ in range(order - 1):
        steps.extend([0.0, step])
    return 1.0 / step, steps


@functools.partial(
    jax.jit, static_argnames=("theta", "steps", "coefs", "interpret")
)
def poly_stencil_smoother_pallas(
    r: jnp.ndarray,
    theta: float,
    steps: tuple,
    coefs=(4.0, -1.0, -1.0, -1.0, -1.0),
    interpret: bool = False,
) -> jnp.ndarray:
    """Generic order-k polynomial smoother z ≈ A⁻¹r on a 5-point
    stencil, all sweeps VMEM-resident (whole grid in VMEM). ``steps``
    is the flattened per-step [a₀, b₀, a₁, b₁, …] of the d-recurrence
    above; ``jacobi_k_scalars``/``chebyshev_k_scalars`` produce it."""
    order = len(steps) // 2 + 1
    scal = jnp.asarray([theta, *coefs], dtype=r.dtype)
    rho = jnp.asarray(list(steps) if steps else [0.0], dtype=r.dtype)
    return pl.pallas_call(
        _chebk_kernel(order),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
        scratch_shapes=[pltpu.VMEM(r.shape, r.dtype)],
        interpret=interpret,
    )(scal, rho, r)


@functools.partial(
    jax.jit,
    static_argnames=("theta", "steps", "coefs", "interpret",
                     "block_rows"),
)
def poly_stencil_smoother_pallas_blocked(
    r: jnp.ndarray,
    theta: float,
    steps: tuple,
    coefs=(4.0, -1.0, -1.0, -1.0, -1.0),
    interpret: bool = False,
    block_rows: int | None = None,
) -> jnp.ndarray:
    """Blocked-trapezoidal form of ``poly_stencil_smoother_pallas`` for
    grids beyond VMEM — same tiling/halo-creep analysis as
    ``chebyshev_k_poisson_pallas_blocked`` (the recurrence structure is
    identical; only the coefficients differ)."""
    if not interpret:
        with jax.enable_x64(False):
            return _poly_blocked_impl(r, theta, steps, coefs,
                                      interpret, block_rows)
    return _poly_blocked_impl(r, theta, steps, coefs, interpret,
                              block_rows)


def _poly_blocked_impl(r, theta, steps, coefs, interpret, block_rows):
    order = len(steps) // 2 + 1
    n = r.shape[0]
    halo = 8 * (-(-(order - 1) // 8)) if order > 1 else 8
    if block_rows is None:
        block_rows = _chebk_auto_rows(n, halo) or halo
    rows = min(block_rows, n)
    if n % rows != 0:
        raise ValueError(f"grid rows {n} not divisible by {rows}")
    if halo > rows or rows % halo != 0:
        raise ValueError(
            f"order {order} needs halo {halo} ≤ and dividing "
            f"block_rows {rows}"
        )
    nblocks = n // rows
    scal = jnp.asarray([theta, *coefs], dtype=r.dtype)
    rho = jnp.asarray(list(steps) if steps else [0.0], dtype=r.dtype)
    ratio = rows // halo
    last_h = n // halo - 1
    return pl.pallas_call(
        _chebk_blocked_kernel(order, rows, halo, nblocks),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, r.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (halo, r.shape[1]),
                lambda i: (jnp.maximum(i * ratio - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (halo, r.shape[1]),
                lambda i: (jnp.minimum((i + 1) * ratio, last_h), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((rows, r.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
        interpret=interpret,
    )(scal, rho, r, r, r)


def chebyshev_k_scalars(lam_min: float, lam_max: float, order: int):
    """Host-side precompute of the semi-iteration coefficients:
    returns (theta, delta, [ρ'ρ, 2ρ'/δ] per step)."""
    lo, hi = sorted((float(lam_min), float(lam_max)))
    theta = (hi + lo) / 2.0
    delta = (hi - lo) / 2.0
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    steps = []
    for _ in range(order - 1):
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        steps.extend([rho_new * rho, 2.0 * rho_new / delta])
        rho = rho_new
    return theta, delta, steps


@functools.partial(
    jax.jit, static_argnames=("order", "lam_min", "lam_max", "coefs",
                              "interpret")
)
def chebyshev_k_poisson_pallas(
    r: jnp.ndarray,
    order: int,
    lam_min: float,
    lam_max: float,
    coefs=(4.0, -1.0, -1.0, -1.0, -1.0),
    interpret: bool = False,
) -> jnp.ndarray:
    """z ≈ A⁻¹r by the order-k Chebyshev semi-iteration, all k stencil
    sweeps VMEM-resident (single chip / single shard, Dirichlet zero
    halos). Grid + two scratch buffers must fit VMEM: f32 N ≲ 800."""
    theta, _, steps = chebyshev_k_scalars(lam_min, lam_max, order)
    scal = jnp.asarray([theta, *coefs], dtype=r.dtype)
    rho = jnp.asarray(steps if steps else [0.0], dtype=r.dtype)
    return pl.pallas_call(
        _chebk_kernel(order),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
        scratch_shapes=[pltpu.VMEM(r.shape, r.dtype)],
        interpret=interpret,
    )(scal, rho, r)


# ---------------------------------------------------------------------------
# BLOCKED order-k Chebyshev: trapezoidal tiling for grids beyond VMEM.
#
# chebyshev_k_poisson_pallas needs the whole grid resident (f32
# N ≲ 800). For large grids, process row blocks of R with a halo of H
# rows on each side: all k−1 sweeps run in VMEM on the (R+2H)-row
# window, and the zero-padding error at the window edge creeps inward
# one row per sweep — H ≥ k−1 keeps the creep out of the written
# center. One HBM read of r (plus 2H/R halo overhead) and one write of
# z replace the jnp route's ~3 passes PER SWEEP: the multigrid
# smoothers' level-0 cost at 4096² drops accordingly.
# ---------------------------------------------------------------------------


def _chebk_blocked_kernel(order: int, rows: int, halo: int,
                          nblocks: int):
    R, H = rows, halo

    def kernel(scal_ref, rho_ref, rc_ref, rt_ref, rb_ref, z_ref):
        i = pl.program_id(0)
        theta = scal_ref[0]
        c0, cw, ce, cs, cn = (scal_ref[1], scal_ref[2], scal_ref[3],
                              scal_ref[4], scal_ref[5])
        top = jnp.where(i > 0, rt_ref[:], jnp.zeros_like(rt_ref[:]))
        bot = jnp.where(i < nblocks - 1, rb_ref[:],
                        jnp.zeros_like(rb_ref[:]))
        r = jnp.concatenate([top, rc_ref[:], bot], axis=0)  # (R+2H, N)
        zero = jnp.zeros((1, r.shape[1]), dtype=r.dtype)
        # Out-of-grid window rows (edge blocks' halos) must stay ZERO
        # through every sweep — the Dirichlet boundary is truncation,
        # not a value: without re-masking, the sweep writes into the
        # dead rows and grid row 0 reads the corruption back on the
        # next sweep (observed: only the first/last grid rows wrong).
        g = (i * R - H) + jax.lax.broadcasted_iota(
            jnp.int32, r.shape, 0
        )
        in_grid = (g >= 0) & (g < nblocks * R)
        d0 = r / theta
        z = d0
        for step in range(order - 1):
            az = _local_stencil(z, zero, zero, c0, cw, ce, cs, cn)
            d0 = (rho_ref[2 * step] * d0
                  + rho_ref[2 * step + 1] * (r - az))
            d0 = jnp.where(in_grid, d0, jnp.zeros_like(d0))
            z = z + d0
        z_ref[:] = z[H:H + R]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("order", "lam_min", "lam_max", "coefs",
                     "interpret", "block_rows"),
)
def chebyshev_k_poisson_pallas_blocked(
    r: jnp.ndarray,
    order: int,
    lam_min: float,
    lam_max: float,
    coefs=(4.0, -1.0, -1.0, -1.0, -1.0),
    interpret: bool = False,
    block_rows: int | None = None,
) -> jnp.ndarray:
    """z ≈ A⁻¹r, order-k Chebyshev on an (N, N) grid of ANY size (see
    section comment). Requires order − 1 ≤ halo (= 8·ceil((order−1)/8))
    ≤ block_rows and block_rows | N; halo rows divide block_rows so
    they address the same array in (halo, N) block units. block_rows
    defaults to the largest halo-multiple divisor of N that keeps the
    ~6 live window buffers inside VMEM.

    Compiled path traced with x64 off: clamped index maps otherwise
    return i64, which Mosaic rejects."""
    if not interpret:
        with jax.enable_x64(False):
            return _chebk_blocked_impl(r, order, lam_min, lam_max,
                                       coefs, interpret, block_rows)
    return _chebk_blocked_impl(r, order, lam_min, lam_max, coefs,
                               interpret, block_rows)


def _chebk_blocked_impl(
    r, order, lam_min, lam_max, coefs, interpret, block_rows
):
    theta, _, steps = chebyshev_k_scalars(lam_min, lam_max, order)
    return _poly_blocked_impl(r, theta, tuple(steps), coefs,
                              interpret, block_rows)


def _chebk_auto_rows(n: int, halo: int) -> int | None:
    """Largest halo-multiple divisor of n within the VMEM row budget
    (~2^18 elems/operand: the kernel keeps ~6 window-sized buffers
    live plus double buffering; 64-row blocks at N=4096 measured OK).
    None if no such divisor exists. Single source of truth for both
    the kernel's auto sizing and `chebyshev_blocked_feasible`."""
    limit = max(halo, (1 << 18) // max(n, 1))
    rows = None
    for d in range(halo, min(limit, n) + 1, halo):
        if n % d == 0:
            rows = d
    return rows


def chebyshev_blocked_feasible(n: int, order: int) -> bool:
    """True iff `chebyshev_k_poisson_pallas_blocked` can tile an
    (n, n) grid for this order — derived from the kernel's own sizing
    helper so router and impl cannot drift."""
    halo = 8 * (-(-(order - 1) // 8)) if order > 1 else 8
    return _chebk_auto_rows(n, halo) is not None


def chebyshev_ref_scalars(lam_min: float, lam_max: float):
    """(d, α) of the reference's cbpr2 closed form
    (chebyshev.f90:20-25)."""
    lo, hi = sorted((float(lam_min), float(lam_max)))
    c = (hi - lo) / 2.0
    d = (hi + lo) / 2.0
    alpha = 1.0 / d
    beta = (c * alpha / 2.0) ** 2
    return d, 1.0 / (d - beta)
