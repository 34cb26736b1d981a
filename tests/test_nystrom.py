"""Randomized Nyström preconditioner (precond/nystrom.py). Oracles:
dense eigendecomposition for the eigenvalue estimates, an
order-of-magnitude PCG cut on a decaying-spectrum operator (the
paper's win case), SPD solution parity, sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt


def _decaying_spectrum_operator(n=400, kappa=1e4, seed=0):
    """Dense SPD with eigenvalues kappa/i^2 + 1: heavy head, no
    isolated structure — plain CG pays ~sqrt(kappa), a rank-r sketch
    captures the head and caps the rest near 1."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = kappa / (1.0 + np.arange(n)) ** 2 + 1.0
    a = (q * lam) @ q.T
    a = 0.5 * (a + a.T)
    aj = jnp.asarray(a)
    return a, lam, (lambda v: aj @ v)


def test_eigenvalue_estimates_match_head():
    n, rank = 400, 20
    a, lam, A = _decaying_spectrum_operator(n)
    P, lam_hat = gt.nystrom_preconditioner(
        A, jnp.zeros((n,)), rank=rank
    )
    # The sketch captures the spectral head: top eigenvalues within a
    # few percent (randomized, so not to machine precision).
    np.testing.assert_allclose(
        np.asarray(lam_hat[:5]), np.sort(lam)[::-1][:5], rtol=0.05
    )


def test_pcg_cut_decaying_spectra():
    # 1/i^2 at kappa=1e4: CG superconverges on decay, so the honest
    # cut is ~2.6x (104 -> 40), not the condition-number arithmetic.
    n, rank = 400, 20
    a, lam, A = _decaying_spectrum_operator(n)
    rng = np.random.default_rng(1)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A(x_true)
    tol = 1e-10 * float(jnp.linalg.norm(b))
    plain = gt.cg(A, b, tol=tol, max_iterations=5000)
    P, _ = gt.nystrom_preconditioner(A, jnp.zeros((n,)), rank=rank)
    prec = gt.cg(A, b, tol=tol, M=P)
    assert bool(plain.converged) and bool(prec.converged)
    np.testing.assert_allclose(
        np.asarray(prec.x), np.asarray(x_true), atol=1e-6
    )
    assert int(prec.iterations) * 2 < int(plain.iterations)


def test_pcg_big_cut_heavy_head():
    # 1/i^3 at kappa=1e8 — the paper's win case: measured 591 -> 88.
    n, rank = 400, 30
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = 1e8 / (1.0 + np.arange(n)) ** 3 + 1.0
    a = (q * lam) @ q.T
    aj = jnp.asarray(0.5 * (a + a.T))
    A = lambda v: aj @ v  # noqa: E731
    x_true = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    b = A(x_true)
    tol = 1e-8 * float(jnp.linalg.norm(b))
    plain = gt.cg(A, b, tol=tol, max_iterations=20000)
    P, _ = gt.nystrom_preconditioner(A, jnp.zeros((n,)), rank=rank)
    prec = gt.cg(A, b, tol=tol, M=P)
    assert bool(plain.converged) and bool(prec.converged)
    assert int(prec.iterations) * 5 < int(plain.iterations)


def test_spd_and_custom_mu():
    n = 200
    a, lam, A = _decaying_spectrum_operator(n, kappa=1e3, seed=2)
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    P, lam_hat = gt.nystrom_preconditioner(
        A, jnp.zeros((n,)), rank=15, mu=1.0
    )
    res = gt.cg(A, b, tol=1e-9 * float(jnp.linalg.norm(b)), M=P)
    assert bool(res.converged)
    exact = np.linalg.solve(a, np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), exact, atol=1e-6)


def test_sharded_parity():
    from jax.sharding import AxisType, NamedSharding
    from jax.sharding import PartitionSpec as P_

    n = 64
    A = gt.poisson_operator(n)
    b = A(jnp.ones((n, n), jnp.float64))
    M, _ = gt.nystrom_preconditioner(A, jnp.zeros((n, n)), rank=12)
    base = gt.cg(A, b, tol=1e-9, M=M)
    assert bool(base.converged)
    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    b_sh = jax.device_put(b, NamedSharding(mesh, P_("grid", None)))
    sh = jax.jit(lambda v: gt.cg(A, v, tol=1e-9, M=M))(b_sh)
    assert int(sh.iterations) == int(base.iterations)
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(base.x), atol=1e-10
    )
