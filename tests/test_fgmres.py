"""Flexible GMRES: right preconditioning with nonlinear / varying M
(beyond the reference, whose only hook is a fixed linear left
application — interfaces.f90:19-28)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.solvers.fgmres import fgmres
from gmres_tpu.types import SolverStatus


def _problem(n=48):
    op = gt.poisson_operator(n)
    return op, op(jnp.ones((n, n)))


def _true_rel(op, b, x):
    r = b - op(x)
    return float(jnp.sqrt(jnp.sum(r * r)) / jnp.sqrt(jnp.sum(b * b)))


def test_unpreconditioned_matches_plain_gmres():
    """With M=None, FGMRES is mathematically plain GMRES — iteration
    counts must match the mgsr/cgs2 variant exactly."""
    op, b = _problem()
    f = fgmres(op, b, restart=20, tol=1e-10, max_restarts=200)
    g = gt.gmres(op, b, restart=20, tol=1e-10, max_restarts=200,
                 variant="mgsr", compute_v_err=False)
    assert int(f.status) == SolverStatus.CONVERGED
    assert int(f.iterations) == int(g.iterations)
    assert int(f.restarts) == int(g.restarts)
    np.testing.assert_allclose(f.x, 1.0, atol=1e-8)


def test_linear_preconditioner():
    op, b = _problem()
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    res = fgmres(op, b, restart=20, tol=1e-10, M=m_inv,
                 max_restarts=200)
    assert int(res.status) == SolverStatus.CONVERGED
    assert _true_rel(op, b, res.x) < 1e-9
    np.testing.assert_allclose(res.x, 1.0, atol=1e-8)


def test_nonlinear_inner_cg_preconditioner():
    """The canonical FGMRES use: M = a few inner CG steps (nonlinear
    in its input — left-preconditioned GMRES theory does not cover
    this). Must converge, and far faster than unpreconditioned."""
    op, b = _problem()

    def inner_cg(r):
        return gt.cg(op, r, tol=0.0, max_iterations=8).x

    res = fgmres(op, b, restart=15, tol=1e-9, M=inner_cg,
                 max_restarts=100)
    plain = fgmres(op, b, restart=15, tol=1e-9, max_restarts=1000)
    assert int(res.status) == SolverStatus.CONVERGED
    assert _true_rel(op, b, res.x) < 1e-8
    total = (int(res.restarts) - 1) * 15 + int(res.iterations)
    total_plain = (int(plain.restarts) - 1) * 15 + int(plain.iterations)
    assert total < total_plain // 3
    np.testing.assert_allclose(res.x, 1.0, atol=1e-7)


def test_multigrid_preconditioned():
    from gmres_tpu.precond.multigrid import (
        poisson_multigrid_preconditioner,
    )

    n = 64
    op, b = (gt.poisson_operator(n),
             gt.poisson_operator(n)(jnp.ones((n, n))))
    m_inv = poisson_multigrid_preconditioner(n)
    res = fgmres(op, b, restart=10, tol=1e-10, M=m_inv, max_restarts=50)
    assert int(res.status) == SolverStatus.CONVERGED
    total = (int(res.restarts) - 1) * 10 + int(res.iterations)
    assert total <= 30  # grid-independent like the left-pc variant
    np.testing.assert_allclose(res.x, 1.0, atol=1e-8)


def test_mixed_precision_certified():
    op, b = _problem()
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    res = fgmres(op, b, restart=20, tol=1e-8, M=m_inv,
                 inner_dtype=jnp.float32, max_restarts=200)
    assert int(res.status) == SolverStatus.CONVERGED
    assert _true_rel(op, b, res.x) < 1e-8


def test_sharded_iteration_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    op, b = _problem(40)
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    f = jax.jit(lambda v: fgmres(op, v, restart=15, tol=1e-9, M=m_inv,
                                 max_restarts=100))
    plain = f(b)
    sh = f(shard_grid_vector(b, mesh))
    assert int(plain.iterations) == int(sh.iterations)
    assert int(plain.restarts) == int(sh.restarts)
    assert int(sh.status) == SolverStatus.CONVERGED


def test_b_zero():
    op, _ = _problem(8)
    res = fgmres(op, jnp.zeros((8, 8)))
    assert int(res.status) == SolverStatus.CONVERGED
    assert int(res.restarts) == 0


def test_max_restarts_status():
    op, b = _problem(24)
    res = fgmres(op, b, restart=3, tol=1e-14, max_restarts=2)
    # with so few iterations it cannot actually have converged to 1e-14
    assert int(res.status) == SolverStatus.MAX_ITERATIONS


def test_orthogonality_audit():
    op, b = _problem(12)
    res = fgmres(op, b, restart=10, tol=1e-12, compute_v_err=True,
                 max_restarts=50)
    assert float(jnp.max(res.v_err)) < 1e-12


def test_scale_invariance_mixed():
    op, base = _problem(24)
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    for s in (1e39, 1e-40):
        res = fgmres(op, base * s, restart=10, tol=1e-8, M=m_inv,
                     inner_dtype=jnp.float32, max_restarts=100)
        assert int(res.status) == SolverStatus.CONVERGED, s
        np.testing.assert_allclose(np.asarray(res.x) / s, 1.0,
                                   atol=1e-6, err_msg=str(s))


def test_1x1_degenerate():
    res = fgmres(lambda x: 2.0 * x, 2.0 * jnp.ones(1), tol=1e-10)
    assert int(res.status) == SolverStatus.CONVERGED
    np.testing.assert_allclose(res.x, 1.0, rtol=1e-14)
    res = fgmres(lambda x: 0.0 * x, jnp.ones(1), tol=1e-10)
    assert int(res.status) == SolverStatus.BREAKDOWN
