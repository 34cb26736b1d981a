"""SPAI preconditioner (precond/spai.py). Oracles:

* block-diagonal exactness — with pattern(M) = pattern(A) and A⁻¹'s
  support inside A's, SPAI must reproduce A⁻¹ to the Tikhonov reg;
* per-column least-squares oracle (real AND complex) — each column of
  M must match the numpy lstsq minimizer of ‖A m_j − e_j‖ restricted
  to the support (the complex case pins the conjugate-transpose normal
  equations, Grote–Huckle 1997);
* solver integration — SPAI as preconditioner cuts GMRES iterations on
  a nonsymmetric sparse operator (the preconditioner contract,
  reference ``src/interfaces.f90:19-28``);
* sharded apply parity on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.ops.sparse import csr_from_dense
from gmres_tpu.precond.spai import spai_matrix, spai_preconditioner


def ell_to_dense(m):
    """ELL → dense: padding slots hold value 0 so the scatter-add of
    zeros into column 0 is a no-op."""
    out = np.zeros(m.shape, dtype=np.asarray(m.data).dtype)
    rows = np.repeat(np.arange(m.shape[0]), m.row_width)
    np.add.at(out, (rows, np.asarray(m.cols).ravel()),
              np.asarray(m.data).ravel())
    return out


def _block_diag(rng, nblocks, bs, dtype=np.float64):
    blocks = []
    for _ in range(nblocks):
        b = rng.standard_normal((bs, bs)).astype(dtype)
        if np.issubdtype(dtype, np.complexfloating):
            b = b + 1j * rng.standard_normal((bs, bs)).astype(dtype)
        b = b + bs * np.eye(bs, dtype=dtype)
        blocks.append(b)
    n = nblocks * bs
    a = np.zeros((n, n), dtype=dtype)
    for k, b in enumerate(blocks):
        a[k * bs:(k + 1) * bs, k * bs:(k + 1) * bs] = b
    return a


def _tridiag(rng, n, dtype=np.float64):
    a = np.zeros((n, n), dtype=dtype)
    a[np.arange(n), np.arange(n)] = 4.0 + 0.1 * rng.standard_normal(n)
    off = 1.0 + 0.2 * rng.standard_normal(n - 1)
    a[np.arange(n - 1), np.arange(1, n)] = off
    a[np.arange(1, n), np.arange(n - 1)] = -0.8 * off
    if np.issubdtype(dtype, np.complexfloating):
        a = a + 0.3j * (a != 0) * rng.standard_normal((n, n))
    return a


def test_block_diagonal_exactness():
    """A⁻¹ of block-diagonal A has the same block pattern as A, so the
    per-column least squares hit zero residual: M == A⁻¹ (to reg)."""
    rng = np.random.default_rng(0)
    a = _block_diag(rng, nblocks=12, bs=4)
    m = spai_matrix(a)
    m_dense = np.asarray(ell_to_dense(m))
    np.testing.assert_allclose(m_dense, np.linalg.inv(a), atol=1e-8)


def _lstsq_oracle(a):
    """Per-column support-restricted least-squares minimizer."""
    n = a.shape[0]
    m = np.zeros_like(a)
    for j in range(n):
        s = np.nonzero(a[:, j])[0]  # pattern(M) = pattern(A) col j
        sol, *_ = np.linalg.lstsq(a[:, s], np.eye(n)[:, j], rcond=None)
        m[s, j] = sol
    return m


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_matches_per_column_lstsq(dtype):
    """The built M equals the true per-column minimizer of
    ‖A m_j − e_j‖₂ over supp(A[:, j]) — complex case requires the
    CONJUGATE-transpose normal equations (AᴴA, Aᴴe)."""
    rng = np.random.default_rng(1)
    a = _tridiag(rng, 30, dtype=dtype)
    m = spai_matrix(a)
    m_dense = np.asarray(ell_to_dense(m))
    oracle = _lstsq_oracle(a)
    np.testing.assert_allclose(m_dense, oracle, atol=1e-8)
    # And it is at least as good as any wrong-functional answer:
    # ‖AM−I‖_F must match the oracle's.
    err = np.linalg.norm(a @ m_dense - np.eye(30))
    err_true = np.linalg.norm(a @ oracle - np.eye(30))
    assert err <= err_true * (1 + 1e-8)


def test_csr_input_matches_dense_input():
    rng = np.random.default_rng(2)
    a = _tridiag(rng, 40)
    m_from_dense = np.asarray(ell_to_dense(spai_matrix(a)))
    m_from_csr = np.asarray(ell_to_dense(spai_matrix(csr_from_dense(a))))
    np.testing.assert_allclose(m_from_csr, m_from_dense, atol=1e-12)


def test_chunked_matches_unchunked():
    rng = np.random.default_rng(3)
    a = _tridiag(rng, 50)
    full = np.asarray(ell_to_dense(spai_matrix(a)))
    chunked = np.asarray(ell_to_dense(spai_matrix(a, chunk=7)))
    np.testing.assert_allclose(chunked, full, atol=1e-12)


def test_gmres_iteration_cut():
    """Preconditioner contract (interfaces.f90:19-28): M(v) composes
    with the solvers and cuts iterations on a nonsymmetric operator."""
    rng = np.random.default_rng(4)
    n = 200
    a = _tridiag(rng, n)
    # Skew the scale so plain GMRES works for its residual.
    a[np.arange(n), np.arange(n)] *= 1.0 + 9.0 * rng.random(n)
    aj = jnp.asarray(a)
    A = lambda v: aj @ v  # noqa: E731
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A(x_true)
    M = spai_preconditioner(a)
    plain = gt.gmres(A, b, restart=30, tol=1e-10, max_restarts=60,
                     compute_v_err=False)
    prec = gt.gmres(A, b, restart=30, tol=1e-10, max_restarts=60,
                    M=M, compute_v_err=False)
    assert bool(prec.converged)
    np.testing.assert_allclose(np.asarray(prec.x), np.asarray(x_true),
                               atol=1e-6)
    total = lambda r: int(r.restarts) * 30 + int(r.iterations)  # noqa: E731
    assert total(prec) < total(plain)


def test_sharded_apply_parity():
    """M(v) over the 8-device mesh matches the replicated apply."""
    from gmres_tpu.parallel.mesh import solver_mesh, shard_grid_vector

    rng = np.random.default_rng(5)
    nside = 16
    n = nside * nside
    a = _tridiag(rng, n)
    M = spai_preconditioner(a)
    v = jnp.asarray(rng.standard_normal((nside, nside)))
    ref = np.asarray(M(v))
    mesh = solver_mesh(8)
    v_sh = shard_grid_vector(v, mesh)
    out = np.asarray(jax.jit(M)(v_sh))
    np.testing.assert_allclose(out, ref, atol=1e-12)
    assert out.shape == (nside, nside)
