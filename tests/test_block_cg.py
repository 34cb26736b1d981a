"""Block CG (solvers/block_cg.py). Oracles: per-RHS dense/cg solves,
block-vs-single iteration advantage, rank-deficient blocks, the MG
preconditioner, sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt


def _problem(n, s, seed=0):
    A = gt.poisson_operator(n)
    rng = np.random.default_rng(seed)
    B = jnp.asarray(rng.standard_normal((s, n, n)))
    return A, B


def test_matches_single_rhs_cg():
    n, s = 32, 4
    A, B = _problem(n, s)
    res = gt.block_cg(A, B, tol=1e-10)
    assert bool(res.converged)
    for i in range(s):
        single = gt.cg(A, B[i], tol=1e-12)
        np.testing.assert_allclose(
            np.asarray(res.x[i]), np.asarray(single.x), atol=1e-8
        )
    assert res.residuals.shape == (s,)
    assert float(res.residual) < 1e-10


def test_block_beats_worst_single_iterations():
    n, s = 64, 8
    A, B = _problem(n, s, seed=2)
    blk = gt.block_cg(A, B, tol=1e-9)
    assert bool(blk.converged)
    worst = max(
        int(gt.cg(A, B[i], tol=1e-9).iterations) for i in range(s)
    )
    # The union block-Krylov space pays for shared spectral content
    # once: strictly fewer block iterations than the worst single RHS.
    assert int(blk.iterations) < worst


def test_rank_deficient_block():
    # Duplicate and zero rows: textbook block CG breaks down; the
    # clamped SVQB whitening sails through and both copies solve.
    n = 24
    A = gt.poisson_operator(n)
    b = A(jnp.ones((n, n), jnp.float64))
    B = jnp.stack([b, b, jnp.zeros_like(b)])
    res = gt.block_cg(A, B, tol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x[0]), np.ones((n, n)), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.x[1]), np.asarray(res.x[0]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res.x[2]), np.zeros((n, n)), atol=1e-10
    )


def test_preconditioned_mg():
    n, s = 64, 4
    A, B = _problem(n, s, seed=3)
    M = gt.poisson_multigrid_preconditioner(n)
    plain = gt.block_cg(A, B, tol=1e-9)
    prec = gt.block_cg(A, B, tol=1e-9, M=M)
    assert bool(prec.converged)
    assert int(prec.iterations) * 4 < int(plain.iterations)
    for i in range(s):
        np.testing.assert_allclose(
            np.asarray(prec.x[i]), np.asarray(plain.x[i]), atol=1e-7
        )


def test_dense_matrix_accepted():
    n = 10
    a = np.asarray(gt.poisson_matrix(n))
    rng = np.random.default_rng(5)
    B = jnp.asarray(rng.standard_normal((3, n * n)))
    res = gt.block_cg(jnp.asarray(a), B, tol=1e-11)
    assert bool(res.converged)
    exact = np.linalg.solve(a, np.asarray(B).T).T
    np.testing.assert_allclose(np.asarray(res.x), exact, atol=1e-8)


def test_sharded_parity():
    from jax.sharding import AxisType, NamedSharding
    from jax.sharding import PartitionSpec as P

    n, s = 64, 4
    A, B = _problem(n, s, seed=7)
    base = gt.block_cg(A, B, tol=1e-9)
    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    B_sh = jax.device_put(
        B, NamedSharding(mesh, P(None, "grid", None))
    )
    sh = jax.jit(lambda v: gt.block_cg(A, v, tol=1e-9))(B_sh)
    assert bool(sh.converged)
    assert int(sh.iterations) == int(base.iterations)
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(base.x), atol=1e-9
    )
