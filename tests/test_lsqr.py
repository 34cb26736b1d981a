"""LSQR (solvers/lsqr.py) — least squares with the adjoint derived by
jax.linear_transpose. Oracles: np.linalg.lstsq and the closed-form
ridge solution."""

import jax
import jax.numpy as jnp
import numpy as np

import gmres_tpu as gt


def test_overdetermined_lstsq_oracle():
    rng = np.random.default_rng(0)
    m, n = 80, 30
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    aj = jnp.asarray(a)
    res = gt.lsqr(lambda v: aj @ v, jnp.asarray(b),
                  x_like=jnp.zeros(n), tol=1e-12, atol=1e-10,
                  max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.lstsq(a, b, rcond=None)[0],
        atol=1e-10,
    )
    # the certified residual is the least-squares residual norm
    r_np = b - a @ np.asarray(res.x)
    np.testing.assert_allclose(float(res.residual),
                               np.linalg.norm(r_np), rtol=1e-10)


def test_damped_ridge_closed_form():
    rng = np.random.default_rng(1)
    m, n, damp = 60, 25, 0.7
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    aj = jnp.asarray(a)
    res = gt.lsqr(lambda v: aj @ v, jnp.asarray(b),
                  x_like=jnp.zeros(n), tol=1e-14, atol=1e-10,
                  max_iterations=500, damp=damp)
    assert bool(res.converged)
    x_ridge = np.linalg.solve(a.T @ a + damp ** 2 * np.eye(n), a.T @ b)
    np.testing.assert_allclose(np.asarray(res.x), x_ridge, atol=1e-10)


def test_complex_rectangular():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((60, 20)) + 1j * rng.standard_normal((60, 20))
    b = rng.standard_normal(60) + 1j * rng.standard_normal(60)
    aj = jnp.asarray(a)
    res = gt.lsqr(lambda v: aj @ v, jnp.asarray(b),
                  x_like=jnp.zeros(20, dtype=jnp.complex128),
                  tol=1e-12, atol=1e-10, max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.lstsq(a, b, rcond=None)[0],
        atol=1e-10,
    )


def test_derived_adjoint_matches_explicit():
    """The jax.linear_transpose-derived adjoint of the NONSYMMETRIC
    convection-diffusion stencil is exact: LSQR converges to the
    square-system solution, and the derived Aᴴ agrees with the dense
    transpose."""
    from gmres_tpu.models.convection_diffusion import (
        convection_diffusion_matrix,
    )

    n = 16
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    transpose = jax.linear_transpose(op, jnp.zeros((n, n)))
    u = jnp.asarray(np.random.default_rng(3).standard_normal((n, n)))
    (atu,) = transpose(u)
    a_dense = np.asarray(convection_diffusion_matrix(n, 0.4, 0.2))
    np.testing.assert_allclose(
        np.asarray(atu).reshape(-1),
        a_dense.T @ np.asarray(u).reshape(-1), atol=1e-12,
    )
    b = op(jnp.ones((n, n)))
    res = gt.lsqr(op, b, tol=1e-9, max_iterations=20000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-6)


def test_inconsistent_system_certifies_lsq_not_rnorm():
    """b ∉ range(A): ‖r‖ never reaches tol but ‖Aᴴr‖ does — status is
    CONVERGED through the least-squares criterion with the honest
    nonzero residual reported."""
    rng = np.random.default_rng(4)
    m, n = 40, 10
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    aj = jnp.asarray(a)
    res = gt.lsqr(lambda v: aj @ v, jnp.asarray(b),
                  x_like=jnp.zeros(n), tol=1e-30, atol=1e-10,
                  max_iterations=500)
    assert bool(res.converged)
    assert float(res.residual) > 1.0  # genuinely inconsistent


def test_sharded_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 48
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    base = gt.lsqr(op, b, tol=1e-8, max_iterations=20000)
    sh = jax.jit(
        lambda v: gt.lsqr(op, v, tol=1e-8, max_iterations=20000)
    )(shard_grid_vector(b, mesh))
    assert bool(sh.converged)
    assert abs(int(base.iterations) - int(sh.iterations)) <= 2


def test_heavy_damping_regression():
    """Regression: the damping rotation's eliminated component ψ must
    accumulate into the residual estimate — without it, |phibar| decays
    by c₁ ≪ 1 per step for damp ≫ σ(A) and the loop stopped
    prematurely (returned BREAKDOWN after certification)."""
    rng = np.random.default_rng(5)
    m, n, damp = 60, 25, 50.0
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    aj = jnp.asarray(a)
    res = gt.lsqr(lambda v: aj @ v, jnp.asarray(b),
                  x_like=jnp.zeros(n), tol=1e-14, atol=1e-10,
                  max_iterations=500, damp=damp)
    assert bool(res.converged)
    x_ridge = np.linalg.solve(a.T @ a + damp ** 2 * np.eye(n), a.T @ b)
    np.testing.assert_allclose(np.asarray(res.x), x_ridge, atol=1e-12)
