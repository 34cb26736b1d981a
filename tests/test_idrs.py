"""IDR(s) (solvers/idrs.py). Oracles: dense np.linalg.solve; the
finite-termination property (s=n converges in ~1-2 outer iterations);
matvec monotonicity in s on convection-diffusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt


def test_dense_oracle_across_s():
    rng = np.random.default_rng(0)
    d = 60
    a = rng.standard_normal((d, d)) + 8 * np.eye(d)
    b = rng.standard_normal(d)
    aj = jnp.asarray(a)
    x_star = np.linalg.solve(a, b)
    matvecs = {}
    for s in (1, 2, 4, 8):
        res = gt.idrs(lambda v: aj @ v, jnp.asarray(b), s=s, tol=1e-10,
                      max_iterations=500)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-9)
        matvecs[s] = int(res.iterations) * (s + 1)
    # growing s buys fewer total matvecs (the IDR dimension-reduction
    # property; measured 84/75/65/63)
    assert matvecs[8] < matvecs[1]


def test_convdiff_beats_bicgstab_matvecs():
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    res = gt.idrs(op, b, s=8, tol=1e-9, max_iterations=3000)
    assert bool(res.converged)
    assert float(res.residual) < 1e-9  # certified
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)
    rb = gt.bicgstab(op, b, tol=1e-9, max_iterations=3000)
    # total matvecs AND collective-bearing outer iterations both win
    assert int(res.iterations) * 9 < 2 * int(rb.iterations)
    assert int(res.iterations) < int(rb.iterations) // 3


def test_mg_preconditioned():
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    m = gt.convection_diffusion_multigrid_preconditioner(n, 0.4, 0.2)
    res = gt.idrs(op, b, s=4, tol=1e-9, max_iterations=100, M=m)
    assert bool(res.converged)
    assert int(res.iterations) <= 6
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)


def test_x0_zero_rhs_and_bad_s():
    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    res = gt.idrs(op, b, s=4, tol=1e-9, max_iterations=2000,
                  x0=0.5 * jnp.ones((n, n)))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)
    r0 = gt.idrs(op, jnp.zeros((n, n)), s=4, tol=1e-9, max_iterations=5)
    assert bool(r0.converged) and int(r0.iterations) == 0
    with pytest.raises(ValueError, match="s must"):
        gt.idrs(op, b, s=0)


def test_sharded_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    base = gt.idrs(op, b, s=4, tol=1e-9, max_iterations=3000)
    sh = jax.jit(
        lambda v: gt.idrs(op, v, s=4, tol=1e-9, max_iterations=3000)
    )(shard_grid_vector(b, mesh))
    assert bool(sh.converged)
    assert abs(int(base.iterations) - int(sh.iterations)) <= 2
