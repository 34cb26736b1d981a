"""Lanczos spectral-bound estimation.

The reference README claims "spectral radius estimation via Lanczos
iteration" (README.md:11) but no such code exists in the repo — every
driver hardcodes Chebyshev params (8.2, 0.2) (test_poisson_mf.f90:38,
SURVEY §2 C10). BASELINE.json makes it a build requirement, so here it
is for real: k-step Lanczos tridiagonalization with the extreme Ritz
values as bounds, plus a cheap power-iteration λ_max estimate.

TPU shape: the k-step loop is a ``lax.fori_loop`` of operator
applications + 2 all-reduces per step over sharded vectors; the (k, k)
tridiagonal eigenproblem is replicated host-side math via
``jnp.linalg.eigh`` on a tiny matrix.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gmres_tpu.ops.blas import tree_vdot
from gmres_tpu.types import LinearOperator


def lanczos_bounds(
    A: LinearOperator,
    probe: jnp.ndarray,
    steps: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate (λ_min, λ_max) of symmetric A by k-step Lanczos.

    probe: any nonzero start vector (deterministic — no RNG inside, so
    results are reproducible and jit-friendly).
    Returns the extreme Ritz values, widened by the final residual
    coupling β_k so they bracket the true extremes for SPD operators.
    """
    dtype = probe.dtype
    v = probe / jnp.sqrt(tree_vdot(probe, probe))
    v_prev = jnp.zeros_like(v)

    alphas = jnp.zeros((steps,), dtype=dtype)
    betas = jnp.zeros((steps,), dtype=dtype)  # betas[i] couples i→i+1

    def body(i, carry):
        v, v_prev, beta_prev, alphas, betas = carry
        w = A(v) - beta_prev * v_prev
        alpha = tree_vdot(w, v)
        w = w - alpha * v
        # Full reorthogonalization is overkill for bounds; one step of
        # deflation against v_prev keeps the recurrence stable enough.
        beta = jnp.sqrt(tree_vdot(w, w))
        v_next = w / jnp.where(beta > 0, beta, 1.0)
        alphas = alphas.at[i].set(alpha)
        betas = betas.at[i].set(beta)
        return (v_next, v, beta, alphas, betas)

    _, _, beta_last, alphas, betas = jax.lax.fori_loop(
        0, steps, body, (v, v_prev, jnp.zeros((), dtype), alphas, betas)
    )

    tri = (
        jnp.diag(alphas)
        + jnp.diag(betas[:-1], k=1)
        + jnp.diag(betas[:-1], k=-1)
    )
    ritz = jnp.linalg.eigvalsh(tri)
    lo = jnp.maximum(ritz[0] - beta_last, 0.0)
    hi = ritz[-1] + beta_last
    return lo, hi


def power_iteration_bound(
    A: LinearOperator,
    probe: jnp.ndarray,
    steps: int = 50,
) -> jnp.ndarray:
    """Spectral-radius estimate by power iteration (Rayleigh quotient)."""
    v = probe / jnp.sqrt(tree_vdot(probe, probe))

    def body(_, v):
        w = A(v)
        return w / jnp.sqrt(tree_vdot(w, w))

    v = jax.lax.fori_loop(0, steps, body, v)
    return tree_vdot(v, A(v)) / tree_vdot(v, v)
