"""JFNK (solvers/newton_krylov.py) on the Bratu problem
(models/bratu.py). Oracles: scipy.optimize.newton_krylov on the NumPy
residual; self-certification (`residual` is the freshly evaluated
‖F(x)‖); honest BREAKDOWN on a rootless residual."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.models.bratu import bratu_dense_residual


def test_bratu_scipy_oracle():
    n, lam = 16, 5.0
    F = gt.bratu_residual(n, lam)
    res = gt.newton_krylov(F, jnp.zeros((n, n)), tol=1e-11, restart=20)
    assert bool(res.converged)
    assert float(res.residual) < 1e-11
    import scipy.optimize

    x_ref = scipy.optimize.newton_krylov(
        bratu_dense_residual(n, lam), np.zeros(n * n), f_tol=1e-12
    ).reshape(n, n)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-9)
    # Lower-branch solution: positive, maximum at the center.
    assert float(jnp.min(res.x)) > 0


def test_bratu_mg_preconditioned_superlinear():
    n, lam = 64, 6.0
    F = gt.bratu_residual(n, lam)
    M = gt.poisson_multigrid_preconditioner(n)
    res = gt.newton_krylov(F, jnp.zeros((n, n)), tol=1e-10, M=M)
    assert bool(res.converged)
    it = int(res.iterations)
    assert it <= 8
    # Frozen-Jacobian MG keeps the inner GMRES cheap: a handful of
    # inner iterations per Newton step on average.
    assert int(res.inner_iterations) <= 10 * it
    # Eisenstat-Walker forcing preserves superlinear convergence: some
    # later contraction is far stronger than the first. (Not
    # necessarily the LAST step — once ‖F‖ nears tol the oversolve
    # guard floors η at 0.5·tol/‖F‖ by design, so the final step's
    # contraction is deliberately mild.)
    hist = np.asarray(res.residual_history)[:it]
    ratios = hist[1:] / hist[:-1]
    assert ratios[1:].min() < 0.1 * ratios[0]


def test_mixed_precision_inner():
    n, lam = 32, 5.0
    F = gt.bratu_residual(n, lam)
    res = gt.newton_krylov(
        F, jnp.zeros((n, n)), tol=1e-10, inner_dtype=jnp.float32
    )
    assert bool(res.converged)
    assert float(res.residual) < 1e-10
    base = gt.newton_krylov(F, jnp.zeros((n, n)), tol=1e-10)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(base.x), atol=1e-8
    )


def test_fixed_forcing_and_no_linesearch():
    n, lam = 16, 3.0
    F = gt.bratu_residual(n, lam)
    x0 = jnp.zeros((n, n))
    for kwargs in (
        {"forcing": "fixed", "eta_fixed": 1e-6},
        {"line_search": False},
    ):
        res = gt.newton_krylov(F, x0, tol=1e-11, restart=20, **kwargs)
        assert bool(res.converged), kwargs
        assert float(res.residual) < 1e-11
    with pytest.raises(ValueError, match="unknown forcing"):
        gt.newton_krylov(F, x0, forcing="nope")


def test_gcrodr_inner_recycles_across_newton_steps():
    # Unpreconditioned Bratu: the recycled deflation subspace carries
    # across Newton steps (measured 208 vs 1052 total inner matvecs).
    n, lam = 64, 6.0
    F = gt.bratu_residual(n, lam)
    rec = gt.newton_krylov(F, jnp.zeros((n, n)), tol=1e-10,
                           inner="gcrodr", recycle_k=10, restart=30,
                           max_restarts=100)
    assert bool(rec.converged)
    plain = gt.newton_krylov(F, jnp.zeros((n, n)), tol=1e-10,
                             restart=30, max_restarts=100)
    assert bool(plain.converged)
    np.testing.assert_allclose(
        np.asarray(rec.x), np.asarray(plain.x), atol=1e-8
    )
    assert int(rec.inner_iterations) * 3 < int(plain.inner_iterations)
    with pytest.raises(ValueError, match="unknown inner"):
        gt.newton_krylov(F, jnp.zeros((n, n)), inner="nope")
    with pytest.raises(ValueError, match="gmres inner"):
        gt.newton_krylov(F, jnp.zeros((n, n)), inner="gcrodr",
                         inner_dtype=jnp.float32)


def test_rootless_residual_breaks_down_honestly():
    # F(x) = x∘x + 1 has no real root; the line search must stall and
    # the solver must say BREAKDOWN, not CONVERGED.
    def F(x):
        return x * x + 1.0

    res = gt.newton_krylov(
        F, 0.5 * jnp.ones((8, 8)), tol=1e-9, restart=8, max_newton=30
    )
    assert int(res.status) == int(gt.SolverStatus.BREAKDOWN)
    assert not bool(res.converged)
    assert np.isfinite(float(res.residual))


def test_shape_mismatch_rejected():
    with pytest.raises(ValueError, match="same shape"):
        gt.newton_krylov(lambda x: jnp.sum(x), jnp.ones((4, 4)))


def test_sharded_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n, lam = 64, 5.0
    F = gt.bratu_residual(n, lam)
    base = gt.newton_krylov(F, jnp.zeros((n, n)), tol=1e-10)
    sh = jax.jit(
        lambda u0: gt.newton_krylov(F, u0, tol=1e-10)
    )(shard_grid_vector(jnp.zeros((n, n)), mesh))
    assert bool(sh.converged)
    assert int(base.iterations) == int(sh.iterations)
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(base.x), atol=1e-9
    )
