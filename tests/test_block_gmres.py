"""Block GMRES tests: per-RHS parity with single solves, an explicit
block-Krylov minimization oracle, rank-deficiency, and sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import AxisType, NamedSharding, PartitionSpec as P

import gmres_tpu as gt
from gmres_tpu.solvers.block_gmres import block_gmres
from gmres_tpu.types import SolverStatus


def _problem(n=48, s=4, seed=0):
    op = gt.poisson_operator(n)
    rng = np.random.default_rng(seed)
    x_true = jnp.asarray(rng.standard_normal((s, n, n)))
    return op, x_true, jax.vmap(op)(x_true)


def test_matches_single_rhs_solutions():
    op, x_true, b = _problem()
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    res = block_gmres(op, b, restart=25, tol=1e-10, M=m_inv,
                      max_restarts=100)
    assert int(res.status) == int(SolverStatus.CONVERGED)
    assert float(jnp.max(jnp.abs(res.x - x_true))) < 1e-7
    # per-RHS residual vector honest: every entry under tol
    assert float(jnp.max(res.residuals)) < 1e-10


def test_block_krylov_minimization_oracle():
    """After ONE cycle, each RHS residual equals the minimum over the
    shared block Krylov space span{R, A R, ..., A^{m-1} R} — computed
    independently with a stabilized long-vector basis + dense lstsq."""
    n, s, m = 20, 3, 6
    op, x_true, b = _problem(n=n, s=s, seed=1)
    res = block_gmres(op, b, restart=m, tol=1e-13, max_restarts=1)
    a_mat = np.zeros((n * n, n * n))
    eye = np.eye(n * n)
    for j in range(n * n):
        a_mat[:, j] = np.asarray(
            op(jnp.asarray(eye[:, j].reshape(n, n)))
        ).ravel()
    b_np = np.asarray(b).reshape(s, -1)
    # stabilized block Krylov basis
    basis = []
    blk = [b_np[i] for i in range(s)]
    for _ in range(m):
        nxt = []
        for v in blk:
            for u in basis:
                v = v - u * (u @ v)
            for u in basis:
                v = v - u * (u @ v)
            nv = np.linalg.norm(v)
            if nv > 1e-12:
                v = v / nv
                basis.append(v)
                nxt.append(a_mat @ v)
        blk = nxt
    w = np.stack(basis, axis=1)
    aw = a_mat @ w
    for i in range(s):
        y, *_ = np.linalg.lstsq(aw, b_np[i], rcond=None)
        r_min = np.linalg.norm(b_np[i] - aw @ y) / np.linalg.norm(b_np[i])
        got = float(res.residuals[i])
        assert abs(got - r_min) <= 1e-8 + 1e-5 * r_min, (
            f"rhs {i}: {got} vs oracle {r_min}"
        )


def test_shared_space_beats_single_on_related_rhs():
    """Related right-hand sides: the block solve needs no more cycles
    than the worst single solve at the same m (union-of-spaces)."""
    n = 40
    op = gt.poisson_operator(n)
    base = jnp.asarray(np.random.default_rng(3).standard_normal((n, n)))
    b0 = op(base)
    b1 = op(base + 0.1 * jnp.sin(jnp.arange(n))[:, None])
    b = jnp.stack([b0, b1])
    res_blk = block_gmres(op, b, restart=20, tol=1e-9, max_restarts=100)
    singles = [
        gt.gmres(op, bi, restart=20, tol=1e-9, max_restarts=100,
                 variant="householder")
        for bi in (b0, b1)
    ]
    assert int(res_blk.status) == int(SolverStatus.CONVERGED)
    worst = max(int(r.restarts) for r in singles)
    assert int(res_blk.restarts) <= worst + 1


def test_rank_deficient_duplicate_rhs():
    op, x_true, b = _problem(s=2, seed=2)
    b_dup = jnp.concatenate([b, b], axis=0)
    x_dup = jnp.concatenate([x_true, x_true], axis=0)
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    res = block_gmres(op, b_dup, restart=25, tol=1e-10, M=m_inv,
                      max_restarts=100)
    assert int(res.status) == int(SolverStatus.CONVERGED)
    assert float(jnp.max(jnp.abs(res.x - x_dup))) < 1e-7


def test_zero_rhs_column():
    op, _, b = _problem(s=3, seed=4)
    b = b.at[1].set(0.0)
    res = block_gmres(op, b, restart=25, tol=1e-10, max_restarts=100)
    assert int(res.status) == int(SolverStatus.CONVERGED)
    assert float(jnp.max(jnp.abs(res.x[1]))) < 1e-12


def test_all_zero_rhs():
    op, _, _ = _problem()
    res = block_gmres(op, jnp.zeros((2, 48, 48)), restart=10, tol=1e-10)
    assert int(res.status) == int(SolverStatus.CONVERGED)
    assert int(res.restarts) == 0


def test_dense_matrix_input():
    rng = np.random.default_rng(5)
    a = np.diag(np.linspace(1.0, 3.0, 30)) + 0.01 * rng.standard_normal(
        (30, 30)
    )
    x_true = rng.standard_normal((3, 30))
    b = jnp.asarray(x_true @ a.T)
    res = block_gmres(jnp.asarray(a), b, restart=15, tol=1e-11,
                      max_restarts=50)
    assert int(res.status) == int(SolverStatus.CONVERGED)
    assert float(jnp.max(jnp.abs(res.x - x_true))) < 1e-8


def test_sharded_parity():
    op, x_true, b = _problem(n=48, s=3, seed=6)
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    fn = lambda bb: block_gmres(op, bb, restart=20, tol=1e-10, M=m_inv,
                                max_restarts=100)
    res_rep = jax.jit(fn)(b)
    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    b_sh = jax.device_put(b, NamedSharding(mesh, P(None, "grid", None)))
    res_sh = jax.jit(fn)(b_sh)
    assert int(res_sh.restarts) == int(res_rep.restarts)
    np.testing.assert_allclose(
        np.asarray(res_sh.x), np.asarray(res_rep.x), atol=1e-9
    )


def test_f32_path():
    op, x_true, b = _problem(n=32, s=2, seed=7)
    b32 = b.astype(jnp.float32)
    res = block_gmres(op, b32, restart=20, tol=1e-4, max_restarts=100)
    assert res.x.dtype == jnp.float32
    assert int(res.status) == int(SolverStatus.CONVERGED)
