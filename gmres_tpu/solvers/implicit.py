"""Implicit differentiation through linear solves (the adjoint method).

Beyond the reference (no autodiff concept exists in Fortran+OpenMP):
``implicit_solve`` makes the SOLUTION of A(θ)·x = b a differentiable
function of the operator parameters θ and the right-hand side b, with
exact gradients by the implicit function theorem instead of
differentiating through the iteration:

    x(θ, b) = A(θ)⁻¹ b
    ∂L/∂b      = y            where  A(θ)ᵀ y = ∂L/∂x   (ONE adjoint solve)
    ∂L/∂θ      = −yᵀ (∂A/∂θ) x                          (a vjp of θ ↦ A(θ)x)

Differentiating through the unrolled Krylov iteration would be both
wrong-adjacent (the iterate path is not the solution map) and
catastrophically expensive (checkpointing every basis vector);
the adjoint method costs exactly one extra linear solve, with the
TRANSPOSE operator derived mechanically by ``jax.linear_transpose``
(exact for stencils, sparse formats, and sharded operators — the same
derivation LSQR uses, solvers/lsqr.py).

This is the enabling primitive for PDE-constrained optimization and
data assimilation: gradient-descend a convection field, a boundary
forcing, or a conductivity so the PDE solution matches observations —
tests/test_implicit.py demonstrates recovering a convection parameter
by ``jax.grad`` + a few optimizer steps, each iteration one forward and
one adjoint solve, all inside jit.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def implicit_solve(
    A_fn: Callable[[Any], Callable],
    theta: Any,
    b: jnp.ndarray,
    *,
    solver: Callable,
    adjoint_solver: Optional[Callable] = None,
    symmetric: bool = False,
) -> jnp.ndarray:
    """Differentiable x(θ, b) = A(θ)⁻¹ b.

    Args:
      A_fn: θ ↦ linear operator callable (the returned callable must be
        linear in its vector argument; arbitrary — and differentiable —
        in θ). θ may be any pytree (scalars, arrays, nested dicts).
      theta: operator parameters (differentiable input #1).
      b: right-hand side (differentiable input #2).
      solver: (op, b) ↦ result with an ``.x`` attribute — any library
        solver, typically wrapped in ``functools.partial`` with its
        tolerance options. Solve tolerances bound gradient accuracy:
        the adjoint gradient error is O(tol_forward + tol_adjoint).
      adjoint_solver: optional separate solver for the transpose
        system (e.g. plain CG when A is SPD but the forward solve is
        preconditioned unsymmetrically). Defaults to ``solver``.
      symmetric: set True when A(θ) = A(θ)ᵀ to skip the
        ``jax.linear_transpose`` derivation and solve with A itself.

    Returns x with a custom VJP: reverse-mode through any scalar loss
    of x triggers one adjoint solve (plus a cheap vjp for θ). Forward
    evaluation inside ``jit``/``vmap`` behaves like ``solver(...).x``.

    Real dtypes only (JAX's convention for complex cotangents would
    silently conjugate-flip the θ pullback; complex support needs the
    conjugate-transpose solve — use lsqr-style normal equations or
    open an explicit adjoint operator instead).
    """
    if jnp.issubdtype(jnp.asarray(b).dtype, jnp.complexfloating):
        raise ValueError("implicit_solve supports real dtypes only")
    adj = adjoint_solver if adjoint_solver is not None else solver

    @jax.custom_vjp
    def solve(theta, b):
        return solver(A_fn(theta), b).x

    def fwd(theta, b):
        x = solve(theta, b)
        return x, (theta, x)

    def bwd(saved, ct_x):
        theta, x = saved
        op = A_fn(theta)
        if symmetric:
            op_t = op
        else:
            transpose = jax.linear_transpose(op, ct_x)

            def op_t(v):
                (w,) = transpose(v)
                return w

        y = adj(op_t, ct_x).x
        # ∂L/∂θ = −yᵀ (∂A/∂θ) x : pull back −y through θ ↦ A(θ)·x
        # (x held constant — the implicit function theorem already
        # accounts for the solution's own θ-dependence via y).
        _, pullback = jax.vjp(lambda t: A_fn(t)(x), theta)
        (g_theta,) = pullback(-y)
        return g_theta, y

    solve.defvjp(fwd, bwd)
    return solve(theta, b)
