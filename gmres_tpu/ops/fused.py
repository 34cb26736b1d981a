"""Fused Pallas kernels for the memory-bound solver inner loops.

The Krylov iterations are HBM-bandwidth-bound: every vector op streams
the operands at O(n) flops. The reference fuses what OpenMP can —
cg_omp folds the x/r update and the residual reduction into one
parallel region (cg.f90:127-134), bicgstab pairs its dot products into
single reduction clauses (bicgstab.f90:123-127). The TPU equivalents
here keep each fusion to ONE VMEM round trip:

* ``cg_fused_update`` — x ← x+αp, r ← r−α·ap, ‖r‖² in a single pass
  over the four vectors (the cg.f90:127-134 fusion).
* ``axpy_dot`` — y ← y+αx together with (y·z) for a caller-chosen z;
  the generic dot+axpy fusion of SURVEY §2 C2's reflector sweeps.
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
    rsq_ref[0, 0] = jnp.sum(rn * rn)


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
            jax.ShapeDtypeStruct((1, 1), x.dtype),
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
    dot_ref[0, 0] = jnp.sum(yn * z_ref[:])


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
            jax.ShapeDtypeStruct((1, 1), y.dtype),
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
    up = jnp.concatenate([top_ref[:], r[:-1, :]], axis=0)
    down = jnp.concatenate([r[1:, :], bot_ref[:]], axis=0)
    left = jnp.pad(r[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(r[:, 1:], ((0, 0), (0, 1)))
    ar = c0 * r + cw * left + ce * right + cs * up + cn * down
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


def chebyshev_ref_scalars(lam_min: float, lam_max: float):
    """(d, α) of the reference's cbpr2 closed form
    (chebyshev.f90:20-25)."""
    lo, hi = sorted((float(lam_min), float(lam_max)))
    c = (hi - lo) / 2.0
    d = (hi + lo) / 2.0
    alpha = 1.0 / d
    beta = (c * alpha / 2.0) ** 2
    return d, 1.0 / (d - beta)
