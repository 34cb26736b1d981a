"""Batched PCR tridiagonal solves (ops/tridiag.py). Oracle: dense
numpy solves on random diagonally dominant batches, including
non-power-of-two lengths and tiny systems."""

import jax.numpy as jnp
import numpy as np
import pytest

from gmres_tpu.ops.tridiag import tridiag_solve_pcr


def _dense(dl, dd, du):
    n = dd.shape[-1]
    a = np.zeros((n, n))
    a[np.arange(n), np.arange(n)] = dd
    a[np.arange(1, n), np.arange(n - 1)] = dl[1:]
    a[np.arange(n - 1), np.arange(1, n)] = du[:-1]
    return a


@pytest.mark.parametrize("n", [2, 3, 8, 37, 64, 100])
def test_vs_dense_oracle(n):
    rng = np.random.default_rng(n)
    batch = 5
    dl = rng.standard_normal((batch, n))
    du = rng.standard_normal((batch, n))
    dd = 4.0 + np.abs(rng.standard_normal((batch, n)))  # diag dominant
    rhs = rng.standard_normal((batch, n))
    x = np.asarray(tridiag_solve_pcr(
        jnp.asarray(dl), jnp.asarray(dd), jnp.asarray(du),
        jnp.asarray(rhs),
    ))
    for b in range(batch):
        exact = np.linalg.solve(_dense(dl[b], dd[b], du[b]), rhs[b])
        np.testing.assert_allclose(x[b], exact, atol=1e-12)


def test_n1_trivial():
    x = tridiag_solve_pcr(
        jnp.zeros((2, 1)), jnp.full((2, 1), 3.0), jnp.zeros((2, 1)),
        jnp.asarray([[6.0], [9.0]]),
    )
    np.testing.assert_allclose(np.asarray(x), [[2.0], [3.0]])


def test_line_system_shape():
    # The exact use: constant-coefficient line systems over a 2-D grid.
    n = 32
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((n, n)))
    dl = jnp.full((n, n), -1.0)
    dd = jnp.full((n, n), 2.2)
    du = jnp.full((n, n), -1.0)
    x = np.asarray(tridiag_solve_pcr(dl, dd, du, r))
    a = _dense(np.full(n, -1.0), np.full(n, 2.2), np.full(n, -1.0))
    exact = np.linalg.solve(a, np.asarray(r).T).T
    np.testing.assert_allclose(x, exact, atol=1e-12)
