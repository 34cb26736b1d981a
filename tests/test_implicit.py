"""Implicit differentiation (solvers/implicit.py). Oracles: analytic
derivatives of x(θ) = (A + θI)⁻¹b; central finite differences through
the nonsymmetric convection parameter; a PDE-constrained optimization
loop that must actually descend."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.models.convection_diffusion import (
    convection_diffusion_apply,
)
from gmres_tpu.solvers.implicit import implicit_solve


def _cg_solver(op, b):
    return gt.cg(op, b, tol=1e-12, max_iterations=2000)


def _gmres_solver(op, b):
    return gt.gmres(op, b, restart=30, tol=1e-12, max_restarts=200,
                    compute_v_err=False)


def test_shifted_poisson_analytic_gradient():
    # x(θ) = (A + θI)⁻¹ b ⇒ d/dθ ½‖x‖² = −xᵀ(A + θI)⁻¹x  (analytic)
    n = 16
    base = gt.poisson_operator(n)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n)))

    def A_fn(theta):
        return lambda v: base(v) + theta * v

    def loss(theta):
        x = implicit_solve(A_fn, theta, b, solver=_cg_solver,
                           symmetric=True)
        return 0.5 * jnp.sum(x * x)

    theta0 = jnp.asarray(0.7)
    g = jax.grad(loss)(theta0)
    x = _cg_solver(A_fn(theta0), b).x
    w = _cg_solver(A_fn(theta0), x).x  # (A+θ)⁻¹ x
    analytic = -jnp.sum(x * w)
    np.testing.assert_allclose(float(g), float(analytic), rtol=1e-9)


def test_grad_wrt_rhs_is_adjoint_solution():
    # ∂/∂b [cᵀ x(b)] = A⁻ᵀ c — check against a direct transpose solve.
    n = 12
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, n)))
    c = jnp.asarray(rng.standard_normal((n, n)))

    def A_fn(theta):
        del theta
        return op

    g = jax.grad(
        lambda bb: jnp.sum(
            c * implicit_solve(A_fn, 0.0, bb, solver=_gmres_solver)
        )
    )(b)
    transpose = jax.linear_transpose(op, b)
    y = _gmres_solver(lambda v: transpose(v)[0], c).x
    np.testing.assert_allclose(np.asarray(g), np.asarray(y), atol=1e-9)


def test_convection_parameter_finite_difference():
    # Nonsymmetric θ-dependence: A(γ) the convdiff operator; compare
    # jax.grad against central differences.
    n = 12
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((n, n)))
    target = jnp.asarray(rng.standard_normal((n, n)))

    def A_fn(gamma):
        return lambda v: convection_diffusion_apply(v, gamma, 0.2)

    def loss(gamma):
        x = implicit_solve(A_fn, gamma, b, solver=_gmres_solver)
        return jnp.sum((x - target) ** 2)

    g0 = jnp.asarray(0.35)
    grad = float(jax.grad(loss)(g0))
    eps = 1e-6
    fd = (float(loss(g0 + eps)) - float(loss(g0 - eps))) / (2 * eps)
    np.testing.assert_allclose(grad, fd, rtol=1e-5)


def test_pde_constrained_optimization_descends():
    # Recover the convection strength that produced an observed
    # solution: gradient descent through the solver must reduce the
    # misfit monotonically and move γ toward the truth.
    n = 16
    op_true = gt.convection_diffusion_operator(n, 0.6, 0.2)
    b = op_true(jnp.ones((n, n)))  # observation setup
    x_obs = jnp.ones((n, n))

    def A_fn(gamma):
        return lambda v: convection_diffusion_apply(v, gamma, 0.2)

    @jax.jit
    def loss_and_grad(gamma):
        def loss(g):
            x = implicit_solve(A_fn, g, b, solver=_gmres_solver)
            return jnp.sum((x - x_obs) ** 2)

        return jax.value_and_grad(loss)(gamma)

    gamma = jnp.asarray(0.1)
    lr, prev, first = 0.05, None, None
    for _ in range(20):
        val, grad = loss_and_grad(gamma)
        if first is None:
            first = float(val)
        if prev is not None and float(val) > prev:
            lr *= 0.5  # backtrack on overshoot
        prev = float(val)
        gamma = gamma - lr * grad
    assert prev < 1e-10 * first
    assert abs(float(gamma) - 0.6) < 1e-4


def test_complex_rejected():
    with pytest.raises(ValueError, match="real"):
        implicit_solve(
            lambda t: (lambda v: v), 0.0,
            jnp.ones((4,), dtype=jnp.complex128), solver=_cg_solver,
        )


def test_vmap_and_jit_compose():
    # Batched parameter sweep THROUGH the gradient: one dispatch
    # computes dL/dγ at several γ.
    n = 12
    b = jnp.ones((n, n))

    def A_fn(gamma):
        return lambda v: convection_diffusion_apply(v, gamma, 0.1)

    def loss(gamma):
        x = implicit_solve(A_fn, gamma, b, solver=_gmres_solver)
        return jnp.sum(x * x)

    gammas = jnp.asarray([0.1, 0.3, 0.5])
    grads = jax.jit(jax.vmap(jax.grad(loss)))(gammas)
    singles = [float(jax.grad(loss)(g)) for g in gammas]
    np.testing.assert_allclose(np.asarray(grads), singles, rtol=1e-8)


def test_sharded_gradient_matches_replicated():
    """Mesh test (the custom-VJP transpose solve is exactly the path
    that could silently degrade under GSPMD): the gradient of a
    functional of x(θ) with a SHARDED rhs/operator must match the
    replicated result bit-for-tolerance, and the grad wrt the sharded
    b must come back with the right shape."""
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    n = 32
    base = gt.poisson_operator(n)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((n, n)))

    def A_fn(theta):
        return lambda v: base(v) + theta * v

    def loss(theta, bb):
        x = implicit_solve(A_fn, theta, bb, solver=_cg_solver,
                           symmetric=True)
        return 0.5 * jnp.sum(x * x)

    theta0 = jnp.asarray(0.7)
    g_rep, gb_rep = jax.grad(loss, argnums=(0, 1))(theta0, b)

    mesh = solver_mesh(8)
    b_sh = shard_grid_vector(b, mesh)
    g_sh, gb_sh = jax.jit(jax.grad(loss, argnums=(0, 1)))(theta0, b_sh)
    np.testing.assert_allclose(float(g_sh), float(g_rep), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(gb_sh), np.asarray(gb_rep), atol=1e-10
    )
    assert gb_sh.shape == b.shape
