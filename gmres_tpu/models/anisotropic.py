"""Anisotropic diffusion: ε·u_xx + u_yy — the canonical point-smoother
killer.

Beyond the reference (isotropic stencils only): boundary layers,
stretched meshes, and layered media produce strongly anisotropic
operators. At ε ≪ 1 the coupling along the LAST axis dominates;
pointwise smoothers cannot damp error modes that are smooth along the
strong axis but oscillatory along the weak one (smoothing factor
→ 1 as ε → 0), so standard multigrid degrades — the fix is LINE
relaxation: solve whole strong-axis lines exactly each sweep, which
the batched PCR tridiagonal op makes a log-depth elementwise kernel
(ops/tridiag.py). See
precond/multigrid.py:anisotropic_multigrid_preconditioner.

Convention: h²-scaled like every stencil here —
    (A u)ᵢⱼ = ε(2uᵢⱼ − uᵢ₋₁ⱼ − uᵢ₊₁ⱼ) + (2uᵢⱼ − uᵢⱼ₋₁ − uᵢⱼ₊₁),
strong axis = axis 1 (the last, lane, axis: line solves run along
contiguous lanes and stay device-local under the library's row
sharding). ε = 1 reduces to ``poisson_operator`` exactly.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def anisotropic_apply(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """One application; eps scales the axis-0 (weak) coupling."""
    xp = jnp.pad(x, 1)
    return (eps * (2.0 * x - xp[:-2, 1:-1] - xp[2:, 1:-1])
            + (2.0 * x - xp[1:-1, :-2] - xp[1:-1, 2:]))


def anisotropic_operator(nsize: int, eps: float) -> Callable:
    """Matrix-free operator closure (nsize unused beyond
    documentation — the shape lives with the vector, matching
    poisson_operator's contract, models/poisson.py:42)."""
    del nsize

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        return anisotropic_apply(x, eps)

    return apply


def anisotropic_matrix(nsize: int, eps: float,
                       dtype=jnp.float64) -> jnp.ndarray:
    """Dense assembly (C-order) for small-n oracles."""
    eye = jnp.eye(nsize, dtype=dtype)
    lap1 = (2.0 * eye
            - jnp.eye(nsize, k=1, dtype=dtype)
            - jnp.eye(nsize, k=-1, dtype=dtype))
    return eps * jnp.kron(lap1, eye) + jnp.kron(eye, lap1)
