"""Krylov matrix functions (solvers/funm.py). Oracles: dense
eigendecomposition / scipy.linalg.expm of the assembled Poisson
matrix, the exact eigenmode semigroup, CG for f = 1/x, and the Saad
error estimate tracking the true error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import gmres_tpu as gt


def _dense_oracle(n):
    a = np.asarray(gt.poisson_matrix(n), dtype=np.float64)
    L = gt.poisson_operator(n)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((n, n)))
    return a, L, b


def test_expm_vs_scipy_dense():
    n, t = 10, 0.7
    a, L, b = _dense_oracle(n)
    res = gt.expm_multiply(L, b, t, steps=40)
    exact = scipy.linalg.expm(-t * a) @ np.asarray(b).ravel()
    err = np.max(np.abs(np.asarray(res.y).ravel() - exact))
    assert err < 1e-10
    assert float(res.asymmetry) < 1e-10


def test_expm_eigenmode_exact():
    n, t = 32, 0.5
    k = jnp.arange(1, n + 1, dtype=jnp.float64)
    phi = jnp.outer(jnp.sin(jnp.pi * k / (n + 1)),
                    jnp.sin(2 * jnp.pi * k / (n + 1)))
    lam = 4 * np.sin(np.pi / (2 * (n + 1))) ** 2 + \
        4 * np.sin(np.pi / (n + 1)) ** 2
    L = gt.poisson_operator(n)
    # b IS an eigenmode: one Lanczos step spans the space; tiny m works.
    res = gt.expm_multiply(L, phi, t, steps=5)
    np.testing.assert_allclose(
        np.asarray(res.y), np.exp(-lam * t) * np.asarray(phi),
        atol=1e-12,
    )


def test_expm_vector_of_times_single_basis():
    n = 10
    a, L, b = _dense_oracle(n)
    ts = jnp.asarray([0.1, 0.5, 2.0])
    res = gt.expm_multiply(L, b, ts, steps=40)
    assert res.y.shape == (3, n, n)
    for i, t in enumerate([0.1, 0.5, 2.0]):
        exact = scipy.linalg.expm(-t * a) @ np.asarray(b).ravel()
        assert np.max(np.abs(np.asarray(res.y[i]).ravel() - exact)) \
            < 1e-9


def test_funm_inverse_matches_cg():
    n = 24
    L = gt.poisson_operator(n)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal((n, n)))
    res = gt.funm_lanczos(L, b, lambda s: 1.0 / s, steps=80)
    ref = gt.cg(L, b, tol=1e-13)
    np.testing.assert_allclose(
        np.asarray(res.y), np.asarray(ref.x), atol=1e-6
    )


def test_funm_inverse_sqrt_squares_to_inverse():
    # (A^{-1/2})(A^{-1/2}) b = A^{-1} b — applies the SAME funm twice.
    n = 12
    a, L, b = _dense_oracle(n)
    half = gt.funm_lanczos(L, b, lambda s: 1.0 / jnp.sqrt(s), steps=60)
    again = gt.funm_lanczos(L, half.y, lambda s: 1.0 / jnp.sqrt(s),
                            steps=60)
    exact = np.linalg.solve(a, np.asarray(b).ravel())
    assert np.max(np.abs(np.asarray(again.y).ravel() - exact)) < 1e-7


def test_error_estimate_tracks_true_error():
    n, t = 10, 1.0
    a, L, b = _dense_oracle(n)
    exact = scipy.linalg.expm(-t * a) @ np.asarray(b).ravel()
    errs, ests = [], []
    for m in (5, 10, 20):
        res = gt.expm_multiply(L, b, t, steps=m)
        errs.append(np.max(np.abs(np.asarray(res.y).ravel() - exact)))
        ests.append(float(res.error_estimate))
    # Monotone decrease and the estimate stays within 100x of truth
    # (it is the first neglected term, not a bound).
    assert errs[2] < errs[1] < errs[0]
    assert ests[2] < ests[0]
    for e, s in zip(errs, ests):
        assert s == pytest.approx(e, rel=None, abs=max(100 * e, 1e-13))


def test_asymmetry_diagnostic_flags_nonsymmetric():
    n = 24
    Lc = gt.convection_diffusion_operator(n, 2.0, 1.0)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal((n, n)))
    res = gt.funm_lanczos(Lc, b, jnp.exp, steps=20)
    assert float(res.asymmetry) > 1e-3


def test_sharded_parity():
    from jax.sharding import AxisType, NamedSharding
    from jax.sharding import PartitionSpec as P

    n, t = 64, 0.4
    L = gt.poisson_operator(n)
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.standard_normal((n, n)))
    base = gt.expm_multiply(L, b, t, steps=30)
    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    b_sh = jax.device_put(b, NamedSharding(mesh, P("grid", None)))
    sh = jax.jit(
        lambda v: gt.expm_multiply(L, v, t, steps=30)
    )(b_sh)
    np.testing.assert_allclose(
        np.asarray(sh.y), np.asarray(base.y), atol=1e-11
    )


def test_trace_logdet_vs_dense():
    # log det A = tr log A: SLQ estimate within a few stderr of the
    # dense slogdet on a problem small enough to enumerate.
    n = 16
    a, L, _ = _dense_oracle(n)
    exact = np.linalg.slogdet(a)[1]
    res = gt.trace_funm(L, jnp.log, jnp.zeros((n, n)),
                        n_probes=64, steps=40)
    assert res.samples.shape == (64,)
    err = abs(float(res.value) - exact)
    assert err < 4 * float(res.stderr) + 1e-6
    # The stderr itself must be a small fraction of the value.
    assert float(res.stderr) < 0.05 * abs(exact)


def test_trace_inverse_and_identity():
    n = 12
    a, L, _ = _dense_oracle(n)
    # f = identity: tr A is exact per probe for Rademacher z up to the
    # quadrature (polynomial degree 1 -> exact at any steps >= 2), so
    # the estimator reduces to Hutchinson on tr A.
    res_id = gt.trace_funm(L, lambda s: s, jnp.zeros((n, n)),
                           n_probes=128, steps=8)
    exact_tr = np.trace(a)
    assert abs(float(res_id.value) - exact_tr) \
        < 4 * float(res_id.stderr) + 1e-9
    res_inv = gt.trace_funm(L, lambda s: 1.0 / s, jnp.zeros((n, n)),
                            n_probes=64, steps=40)
    exact_inv = np.trace(np.linalg.inv(a))
    assert abs(float(res_inv.value) - exact_inv) \
        < 4 * float(res_inv.stderr) + 1e-6


def test_trace_key_and_jit():
    n = 16
    L = gt.poisson_operator(n)
    r1 = gt.trace_funm(L, jnp.log, jnp.zeros((n, n)), n_probes=8,
                       steps=20, key=jax.random.PRNGKey(3))
    r2 = jax.jit(
        lambda: gt.trace_funm(L, jnp.log, jnp.zeros((n, n)),
                              n_probes=8, steps=20,
                              key=jax.random.PRNGKey(3))
    )()
    np.testing.assert_allclose(
        np.asarray(r1.samples), np.asarray(r2.samples), atol=1e-10
    )
