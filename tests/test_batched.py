"""Batched solves: every solver is a pure function of pytrees, so
``jax.vmap`` turns it into a batched solver for free — many right-hand
sides (or many grids of the same size) solved in one compiled program,
with all the vector work batched onto the MXU/VPU. The reference would
need an outer Fortran loop per system."""

import jax
import jax.numpy as jnp
import numpy as np

import gmres_tpu as gt


def _rhs_batch(n, k):
    op = gt.poisson_operator(n)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((k, n, n)))
    bs = jax.vmap(op)(xs)
    return op, xs, bs


def test_vmap_cg():
    n, k = 16, 4
    op, xs, bs = _rhs_batch(n, k)
    solve = jax.vmap(
        lambda b: gt.cg(op, b, tol=1e-10, max_iterations=2000)
    )
    res = solve(bs)
    assert res.x.shape == (k, n, n)
    assert bool(jnp.all(res.status == 0))
    np.testing.assert_allclose(res.x, xs, atol=1e-7)


def test_vmap_gmres():
    n, k = 12, 3
    op, xs, bs = _rhs_batch(n, k)
    solve = jax.vmap(
        lambda b: gt.gmres(op, b, restart=30, tol=1e-10,
                           max_restarts=100, compute_v_err=False)
    )
    res = solve(bs)
    assert res.x.shape == (k, n, n)
    assert bool(jnp.all(res.status == 0))
    np.testing.assert_allclose(res.x, xs, atol=1e-6)


def test_vmap_bicgstab():
    n, k = 12, 3
    op, xs, bs = _rhs_batch(n, k)
    res = jax.vmap(
        lambda b: gt.bicgstab(op, b, tol=1e-10, max_iterations=2000)
    )(bs)
    assert bool(jnp.all(res.status == 0))
    np.testing.assert_allclose(res.x, xs, atol=1e-6)
