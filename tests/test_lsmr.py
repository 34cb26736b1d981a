"""LSMR (solvers/lsmr.py) — MINRES-on-normal-equations least squares.
Oracles: np.linalg.lstsq, closed-form ridge, scipy.sparse.linalg.lsmr,
and a direct monotonicity check on ‖Aᴴr_k‖ (the property LSQR lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt


def test_overdetermined_lstsq_oracle():
    rng = np.random.default_rng(0)
    m, n = 80, 30
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    aj = jnp.asarray(a)
    res = gt.lsmr(lambda v: aj @ v, jnp.asarray(b),
                  x_like=jnp.zeros(n), tol=1e-12, atol=1e-10,
                  max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.lstsq(a, b, rcond=None)[0],
        atol=1e-10,
    )
    r_np = b - a @ np.asarray(res.x)
    np.testing.assert_allclose(float(res.residual),
                               np.linalg.norm(r_np), rtol=1e-10)


def test_damped_ridge_closed_form():
    rng = np.random.default_rng(1)
    m, n, damp = 60, 25, 0.7
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    aj = jnp.asarray(a)
    res = gt.lsmr(lambda v: aj @ v, jnp.asarray(b),
                  x_like=jnp.zeros(n), tol=1e-14, atol=1e-10,
                  max_iterations=500, damp=damp)
    assert bool(res.converged)
    x_ridge = np.linalg.solve(a.T @ a + damp ** 2 * np.eye(n), a.T @ b)
    np.testing.assert_allclose(np.asarray(res.x), x_ridge, atol=1e-10)


def test_scipy_lsmr_oracle():
    scipy_sla = pytest.importorskip("scipy.sparse.linalg")
    rng = np.random.default_rng(2)
    m, n = 70, 40
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    x_sp = scipy_sla.lsmr(a, b, atol=1e-12, btol=1e-12, maxiter=500)[0]
    aj = jnp.asarray(a)
    res = gt.lsmr(lambda v: aj @ v, jnp.asarray(b),
                  x_like=jnp.zeros(n), tol=1e-12, atol=1e-11,
                  max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_sp, atol=1e-8)


def test_complex_rectangular():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((60, 20)) + 1j * rng.standard_normal((60, 20))
    b = rng.standard_normal(60) + 1j * rng.standard_normal(60)
    aj = jnp.asarray(a)
    res = gt.lsmr(lambda v: aj @ v, jnp.asarray(b),
                  x_like=jnp.zeros(20, dtype=jnp.complex128),
                  tol=1e-12, atol=1e-10, max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.lstsq(a, b, rcond=None)[0],
        atol=1e-10,
    )


def test_arnorm_monotone_vs_lsqr():
    """The selling point: on an ill-conditioned inconsistent system
    LSMR's ‖Aᴴr_k‖ decreases monotonically while LSQR's oscillates.
    Measured directly by re-running to k = 1..K (each run is a fresh
    solve; iterates of a Krylov method are deterministic in k)."""
    rng = np.random.default_rng(4)
    m, n = 50, 20
    u_, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v_, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = u_ @ np.diag(np.logspace(0, -6, n)) @ v_.T  # cond 1e6
    b = rng.standard_normal(m)
    aj = jnp.asarray(a)

    def arnorms(solver, K):
        out = []
        for k in range(1, K + 1):
            r = solver(lambda v: aj @ v, jnp.asarray(b),
                       x_like=jnp.zeros(n), tol=0.0, atol=0.0,
                       max_iterations=k)
            r_np = b - a @ np.asarray(r.x)
            out.append(np.linalg.norm(a.T @ r_np))
        return np.array(out)

    K = 25
    lsmr_seq = arnorms(gt.lsmr, K)
    lsqr_seq = arnorms(gt.lsqr, K)
    # LSMR: monotone up to roundoff near the floor.
    growth = lsmr_seq[1:] / np.maximum(lsmr_seq[:-1], 1e-300)
    assert np.all(growth < 1.0 + 1e-6), growth
    # LSQR on the same problem visibly oscillates (>10% jumps).
    assert np.any(lsqr_seq[1:] > 1.1 * lsqr_seq[:-1])


def test_inconsistent_system_certifies_lsq_not_rnorm():
    rng = np.random.default_rng(5)
    m, n = 40, 10
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    aj = jnp.asarray(a)
    res = gt.lsmr(lambda v: aj @ v, jnp.asarray(b),
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
    base = gt.lsmr(op, b, tol=1e-8, max_iterations=20000)
    sh = jax.jit(
        lambda v: gt.lsmr(op, v, tol=1e-8, max_iterations=20000)
    )(shard_grid_vector(b, mesh))
    assert bool(sh.converged)
    assert abs(int(base.iterations) - int(sh.iterations)) <= 2
