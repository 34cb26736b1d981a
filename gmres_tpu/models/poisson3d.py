"""3-D Poisson model problem (7-point stencil).

No reference counterpart — the reference is 2-D only
(src/problems/poisson.f90). The library's solvers are shape-agnostic
(pytree vectors), so the third dimension costs exactly one new
operator (ops/stencil.py:stencil_7pt_apply) and one new multigrid
cycle (precond/multigrid.py:poisson3d_multigrid_preconditioner);
GMRES/CG/MINRES/LOBPCG run unchanged. h² folded out as in 2-D:
A = h²(−Δ), unit off-diagonals, center 6.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

from gmres_tpu.ops.stencil import stencil_7pt_apply


def poisson3d_operator(nsize: int) -> Callable:
    """y = A·x on an (N, N, N) grid."""
    del nsize  # shape travels with x; kept for API symmetry
    return stencil_7pt_apply


def poisson3d_apply(x: jnp.ndarray) -> jnp.ndarray:
    return stencil_7pt_apply(x)


def poisson3d_matrix(nsize: int, dtype=jnp.float64) -> jnp.ndarray:
    """Dense assembly for small-n validation (C-order flattening of
    (i, j, k) with k fastest)."""
    eye = jnp.eye(nsize, dtype=dtype)
    t = (
        2.0 * jnp.eye(nsize, dtype=dtype)
        - jnp.eye(nsize, k=-1, dtype=dtype)
        - jnp.eye(nsize, k=1, dtype=dtype)
    )
    return (
        jnp.kron(jnp.kron(t, eye), eye)
        + jnp.kron(jnp.kron(eye, t), eye)
        + jnp.kron(jnp.kron(eye, eye), t)
    )


def poisson3d_spectral_bounds(nsize: int) -> tuple[float, float]:
    """Exact extreme eigenvalues of the unit 7-point stencil on the
    Dirichlet (n, n, n) grid: 6 ∓ 6·cos(π/(n+1))."""
    c = math.cos(math.pi / (nsize + 1))
    return 6.0 * (1.0 - c), 6.0 * (1.0 + c)
