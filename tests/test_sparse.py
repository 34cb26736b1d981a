"""Sparse formats + SpMV (SURVEY §2 C13: CSR/COO beyond-reference
requirement). Oracle: dense matvec on the same matrix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.ops import sparse as sp


def _random_sparse(rng, n, density=0.2):
    a = rng.standard_normal((n, n))
    a[rng.random((n, n)) > density] = 0.0
    np.fill_diagonal(a, np.abs(a).sum(axis=1) + 1.0)  # nonzero diag, DD
    return a


@pytest.fixture
def dense():
    return _random_sparse(np.random.default_rng(0), 37)


def test_csr_roundtrip_and_spmv(dense):
    a = sp.csr_from_dense(dense)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(37))
    np.testing.assert_allclose(
        sp.csr_spmv(a, x), dense @ np.asarray(x), rtol=1e-12
    )


def test_coo_spmv(dense):
    a = sp.coo_from_dense(dense)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(37))
    np.testing.assert_allclose(
        sp.coo_spmv(a, x), dense @ np.asarray(x), rtol=1e-12
    )


def test_ell_spmv(dense):
    a = sp.ell_from_dense(dense)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(37))
    np.testing.assert_allclose(
        sp.ell_spmv(a, x), dense @ np.asarray(x), rtol=1e-12
    )


def test_csr_to_ell(dense):
    a = sp.csr_to_ell(sp.csr_from_dense(dense))
    x = jnp.asarray(np.ones(37))
    np.testing.assert_allclose(
        sp.ell_spmv(a, x), dense @ np.ones(37), rtol=1e-12
    )


def test_poisson_csr_matches_stencil():
    n = 12
    a = sp.poisson_csr(n)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((n, n))
    )
    y_csr = sp.csr_spmv(a, x.reshape(-1))
    y_st = gt.poisson_apply(x).reshape(-1)
    np.testing.assert_allclose(y_csr, y_st, rtol=1e-13)


def test_poisson_csr_matches_dense_matrix():
    n = 7
    a = sp.poisson_csr(n)
    dense = np.asarray(gt.poisson_matrix(n))
    x = np.random.default_rng(5).standard_normal(n * n)
    np.testing.assert_allclose(
        sp.csr_spmv(a, jnp.asarray(x)), dense @ x, rtol=1e-13
    )


def test_bsr_jnp_spmv(dense):
    # pad to block multiple
    n = 40
    padded = np.zeros((n, n))
    padded[:37, :37] = dense
    np.fill_diagonal(padded, np.where(np.diag(padded) == 0, 1.0,
                                      np.diag(padded)))
    a = sp.bsr_from_dense(padded, block_size=8)
    x = np.random.default_rng(6).standard_normal(n)
    np.testing.assert_allclose(
        sp.bsr_spmv(a, jnp.asarray(x)), padded @ x, rtol=1e-12
    )


def test_bsr_pallas_interpret():
    """Pallas BSR kernel vs jnp path (interpret mode on CPU; the
    compiled path is exercised on real TPU by the benchmarks)."""
    n, bs = 64, 8
    rng = np.random.default_rng(7)
    dense = _random_sparse(rng, n, density=0.15).astype(np.float32)
    a = sp.bsr_from_dense(dense, block_size=bs)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y = sp.bsr_spmv_pallas(a, x, interpret=True)
    np.testing.assert_allclose(y, dense @ np.asarray(x), rtol=1e-4)


def test_sparse_operator_in_gmres():
    """CSR operator drives the full GMRES path end-to-end."""
    n = 10
    a = sp.poisson_csr(n)
    op = sp.sparse_operator(a)
    b = op(jnp.ones(n * n))
    res = gt.gmres(op, b, restart=30, tol=1e-10, max_restarts=50)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-7)


def test_sparse_operator_in_cg():
    n = 10
    a = sp.csr_to_ell(sp.poisson_csr(n))
    op = sp.sparse_operator(a)
    b = op(jnp.ones(n * n))
    res = gt.cg(op, b, tol=1e-10, max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-7)


def test_spmv_under_jit_and_sharding():
    """ELL SpMV row-sharded over the 8-device mesh."""
    from gmres_tpu.parallel.mesh import solver_mesh

    mesh = solver_mesh(8)
    n = 16
    a = sp.csr_to_ell(sp.poisson_csr(n))
    x = jnp.ones(n * n)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("grid")
    )
    a_sh = sp.ELLMatrix(
        data=jax.device_put(
            a.data,
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("grid", None)
            ),
        ),
        cols=jax.device_put(
            a.cols,
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("grid", None)
            ),
        ),
        shape=a.shape,
    )
    x_sh = jax.device_put(x, sharding)
    y = jax.jit(lambda m, v: sp.ell_spmv(m, v))(a_sh, x_sh)
    np.testing.assert_allclose(
        y, gt.poisson_apply(x.reshape(n, n)).reshape(-1), rtol=1e-13
    )


def test_dia_from_dense(dense):
    a = sp.dia_from_dense(dense)
    x = jnp.asarray(np.random.default_rng(8).standard_normal(37))
    np.testing.assert_allclose(
        sp.dia_spmv(a, x), dense @ np.asarray(x), rtol=1e-12
    )


def test_poisson_dia_matches_stencil():
    n = 12
    a = sp.poisson_dia(n)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((n, n)))
    np.testing.assert_allclose(
        sp.dia_spmv(a, x.reshape(-1)),
        gt.poisson_apply(x).reshape(-1),
        rtol=1e-13,
    )


def test_dia_operator_in_cg():
    n = 10
    op = sp.sparse_operator(sp.poisson_dia(n))
    b = op(jnp.ones(n * n))
    res = gt.cg(op, b, tol=1e-10, max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-7)
