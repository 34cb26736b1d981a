"""2-D Bratu problem: −Δu = λ e^u on the unit square, u = 0 on ∂Ω.

Beyond the reference (linear model problems only: poisson.f90,
hilbert.f90): the Bratu / Liouville-Bratu-Gelfand equation is the
classic Jacobian-free Newton-Krylov test problem (Knoll & Keyes, JCP
2004 §4). Discretized with the same 5-point stencil as models/poisson.py
and scaled by h², the residual is

    F(u) = A u − λ h² e^u          (A = unit 5-point stencil)

with Jacobian J(u) = A − λ h² diag(e^u). For λ below the fold point
λ* ≈ 6.808 the lower solution branch is well-conditioned and J stays
close to A (the h² factor makes the diagonal shift small), so the
PLAIN Poisson multigrid cycle is a high-quality frozen-Jacobian
preconditioner for every Newton step — no re-setup per step.

The residual is one fused stencil + exp expression; `jax.linearize`
inside the Newton loop (solvers/newton_krylov.py) produces the exact
J·v action at the same fused-stencil cost.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from gmres_tpu.models.poisson import poisson_apply


def bratu_residual(
    nsize: int, lam: float = 5.0, dtype=jnp.float64
) -> Callable:
    """Return F(u) for the nsize×nsize interior grid.

    lam: Bratu parameter λ; solutions exist (two branches) for
      0 < λ < λ* ≈ 6.808; Newton from u₀ = 0 finds the lower branch.
    """
    h = 1.0 / (nsize + 1)
    lam_h2 = jnp.asarray(lam * h * h, dtype)

    def residual(u: jnp.ndarray) -> jnp.ndarray:
        return poisson_apply(u) - lam_h2 * jnp.exp(u)

    return residual


def bratu_dense_residual(nsize: int, lam: float = 5.0):
    """NumPy oracle residual over the flat (nsize²,) vector — used by
    tests to cross-check against scipy.optimize.newton_krylov."""
    import numpy as np

    h = 1.0 / (nsize + 1)
    lam_h2 = lam * h * h

    def residual(u_flat):
        u = np.asarray(u_flat, dtype=np.float64).reshape(nsize, nsize)
        au = 4.0 * u
        au[:-1, :] -= u[1:, :]
        au[1:, :] -= u[:-1, :]
        au[:, :-1] -= u[:, 1:]
        au[:, 1:] -= u[:, :-1]
        return (au - lam_h2 * np.exp(u)).reshape(-1)

    return residual
