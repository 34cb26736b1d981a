"""3-D Poisson family (models/poisson3d.py + the 3-D multigrid cycle).
The reference is 2-D only; the solvers are shape-agnostic, so these
tests exercise exactly the two new pieces: the 7-point stencil and the
3-D transfer scaling (restrict_sum3d's ½ factor)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.precond.multigrid import (
    poisson3d_multigrid_preconditioner,
    prolong_repeat3d,
    restrict_sum3d,
)


@pytest.mark.parametrize("nsize", [4, 5, 7])
def test_dense_vs_stencil(nsize):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nsize, nsize, nsize))
    dense = np.asarray(gt.poisson3d_matrix(nsize)) @ x.reshape(-1)
    sten = np.asarray(gt.poisson3d_apply(jnp.asarray(x))).reshape(-1)
    np.testing.assert_allclose(sten, dense, atol=1e-13)


def test_spectral_bounds_exact():
    n = 6
    a = np.asarray(gt.poisson3d_matrix(n))
    eigs = np.linalg.eigvalsh(a)
    lo, hi = gt.poisson3d_spectral_bounds(n)
    np.testing.assert_allclose([eigs[0], eigs[-1]], [lo, hi], rtol=1e-12)


def test_transfers_are_adjoint_up_to_factor():
    """⟨R x, y⟩ = ½⟨x, P y⟩ — the pairing that keeps the V-cycle
    symmetric (a positive scalar on the coarse correction preserves
    SPD-ness)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 8, 8)))
    y = jnp.asarray(rng.standard_normal((4, 4, 4)))
    lhs = float(jnp.vdot(restrict_sum3d(x), y))
    rhs = float(jnp.vdot(x, prolong_repeat3d(y)))
    np.testing.assert_allclose(lhs, 0.5 * rhs, rtol=1e-13)


def test_mg_cg_grid_independent():
    iters = {}
    for n in (16, 32):
        op = gt.poisson3d_operator(n)
        b = op(jnp.ones((n, n, n)))
        m = poisson3d_multigrid_preconditioner(n)
        res = gt.cg(op, b, tol=1e-9, max_iterations=300, M=m)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)
        iters[n] = int(res.iterations)
    assert iters[32] <= iters[16] + 4  # grid independence
    plain = gt.cg(gt.poisson3d_operator(32),
                  gt.poisson3d_apply(jnp.ones((32, 32, 32))),
                  tol=1e-9, max_iterations=2000)
    assert int(plain.iterations) > 4 * iters[32]


def test_gmres_3d():
    n = 16
    op = gt.poisson3d_operator(n)
    b = op(jnp.ones((n, n, n)))
    m = poisson3d_multigrid_preconditioner(n)
    res = gt.gmres(op, b, restart=20, tol=1e-9, M=m,
                   compute_v_err=False, max_restarts=50)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)


def test_lobpcg_3d_lambda_min():
    n = 16
    op = gt.poisson3d_operator(n)
    lo, _ = gt.poisson3d_spectral_bounds(n)
    X0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, n, n, n))
    )
    m = poisson3d_multigrid_preconditioner(n)
    e = gt.lobpcg(op, X0, tol=1e-7, max_iterations=100, M=m)
    assert bool(e.converged)
    np.testing.assert_allclose(float(e.eigenvalues[0]), lo, rtol=1e-10)


def test_sharded_parity_3d():
    """First grid axis sharded over the 8-device mesh: the stencil's
    axis-0 rolls become collective permutes; iterations match."""
    from jax.sharding import NamedSharding, PartitionSpec

    from gmres_tpu.parallel.mesh import solver_mesh

    mesh = solver_mesh(8)
    n = 32
    op = gt.poisson3d_operator(n)
    b = op(jnp.ones((n, n, n)))
    m = poisson3d_multigrid_preconditioner(n, mesh=mesh)
    base = gt.cg(op, b, tol=1e-9, max_iterations=300,
                 M=poisson3d_multigrid_preconditioner(n))
    b_sh = jax.device_put(
        b, NamedSharding(mesh, PartitionSpec("grid", None, None))
    )
    sh = jax.jit(
        lambda v: gt.cg(op, v, tol=1e-9, max_iterations=300, M=m)
    )(b_sh)
    assert bool(sh.converged)
    assert abs(int(base.iterations) - int(sh.iterations)) <= 1
