"""GMRES (Householder compact-WY and MGSR variants) vs golden NumPy
oracles; Hilbert orthogonality A/B test (the reference's key numerical
claim: Householder keeps near-machine orthogonality where MGS drifts,
README.md:10, tests/test_hilbert.f90)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gmres_tpu import gmres, chebyshev_preconditioner, hilbert_matrix
from gmres_tpu.models.poisson import poisson_apply, poisson_matrix
from gmres_tpu.types import SolverStatus
from tests.golden import golden_gmres_householder, golden_gmres_mgs2


@pytest.mark.parametrize("variant", ["householder", "mgsr"])
def test_gmres_dense_poisson(variant):
    nsize = 8
    a = poisson_matrix(nsize)
    b = a @ jnp.ones(nsize * nsize)
    res = gmres(a, b, restart=30, tol=1e-12, variant=variant,
                orthogonalization="mgs2")
    assert res.status == SolverStatus.CONVERGED
    assert np.max(np.abs(np.asarray(res.x) - 1.0)) < 1e-9


@pytest.mark.parametrize("variant", ["householder", "mgsr"])
def test_gmres_matrix_free_poisson(variant):
    nsize = 24
    b = poisson_apply(jnp.ones((nsize, nsize)))
    res = gmres(poisson_apply, b, restart=40, tol=1e-10, variant=variant)
    assert res.status == SolverStatus.CONVERGED
    assert np.max(np.abs(np.asarray(res.x) - 1.0)) < 1e-8


def test_gmres_householder_matches_golden():
    nsize = 10
    a = poisson_matrix(nsize)
    bf = a @ jnp.ones(nsize * nsize)
    m = 25
    res = gmres(a, bf, restart=m, tol=1e-10, variant="householder",
                breakdown_check=False)
    an = np.asarray(a)
    x, n_out, st, ferr, _ = golden_gmres_householder(
        lambda v: an @ v, np.asarray(bf), m, 1e-10, 1000
    )
    assert int(res.iterations) == n_out
    assert int(res.restarts) == st
    np.testing.assert_allclose(
        np.asarray(res.residual_history[:n_out]), ferr[:n_out], rtol=1e-6,
        atol=1e-10,  # below-tol tail values are rounding noise
    )


@pytest.mark.parametrize("orth", ["mgs2", "cgs2"])
def test_gmres_mgsr_matches_golden(orth):
    nsize = 10
    a = poisson_matrix(nsize)
    bf = a @ jnp.ones(nsize * nsize)
    m = 25
    res = gmres(a, bf, restart=m, tol=1e-10, variant="mgsr",
                orthogonalization=orth)
    an = np.asarray(a)
    x, n_out, st, ferr, _ = golden_gmres_mgs2(
        lambda v: an @ v, np.asarray(bf), m, 1e-10, 1000
    )
    assert int(res.iterations) == n_out
    assert int(res.restarts) == st
    rtol = 1e-6 if orth == "mgs2" else 1e-4  # CGS2 rounds differently
    np.testing.assert_allclose(
        np.asarray(res.residual_history[:n_out]), ferr[:n_out], rtol=rtol,
        atol=1e-10,
    )


def test_gmres_preconditioned_matches_golden():
    nsize = 16
    b = poisson_apply(jnp.ones((nsize, nsize)))
    m = 20
    m_inv = chebyshev_preconditioner(poisson_apply, 0.2, 8.2)
    res = gmres(poisson_apply, b, restart=m, tol=1e-12,
                variant="householder", M=m_inv, breakdown_check=False)

    a = np.asarray(poisson_matrix(nsize))

    def golden_minv(r):
        d = (8.2 + 0.2) / 2.0
        alpha = 1.0 / d
        beta = ((8.2 - 0.2) / 2.0 * alpha / 2.0) ** 2
        alpha = 1.0 / (d - beta)
        z = r / d
        return z + alpha * (r - a @ z)

    x, n_out, st, ferr, _ = golden_gmres_householder(
        lambda v: a @ v, np.asarray(b).reshape(-1), m, 1e-12, 1000,
        m_inv=golden_minv,
    )
    assert int(res.iterations) == n_out
    assert int(res.restarts) == st
    assert np.max(np.abs(np.asarray(res.x) - 1.0)) < 1e-9


def test_hilbert_orthogonality_ab():
    """The headline numerical claim (README.md:10, SURVEY §3.5):
    on the Hilbert matrix Householder keeps ‖I−VᵀV‖-style error at
    machine precision while MGS2 degrades."""
    n = 12
    h = hilbert_matrix(n)
    b = h @ jnp.ones(n)
    m = n - 1
    hh = gmres(h, b, restart=m, tol=1e-15, variant="householder",
               max_restarts=1, breakdown_check=False)
    mg = gmres(h, b, restart=m, tol=1e-15, variant="mgsr",
               orthogonalization="mgs2", max_restarts=1)
    hh_err = float(jnp.max(hh.v_err))
    mg_err = float(jnp.max(mg.v_err))
    # HH: squared-metric ≈ 1e-30 → here ≤ 1e-25 is "machine precision"
    assert hh_err < 1e-25
    # MGS2 on Hilbert drifts by orders of magnitude more
    assert mg_err > hh_err * 10


def test_gmres_restart_cycles():
    """Small restart forces multiple cycles; still converges."""
    nsize = 16
    b = poisson_apply(jnp.ones((nsize, nsize)))
    res = gmres(poisson_apply, b, restart=8, tol=1e-9,
                variant="householder")
    assert res.status == SolverStatus.CONVERGED
    assert int(res.restarts) > 1
    assert np.max(np.abs(np.asarray(res.x) - 1.0)) < 1e-7


def test_gmres_check_inner_false_runs_full_cycle():
    """check_inner=False reproduces the gmres_hh_omp quirk: the inner
    loop always runs all m iterations (gmres_hh.f90:340-344)."""
    nsize = 12
    b = poisson_apply(jnp.ones((nsize, nsize)))
    res = gmres(poisson_apply, b, restart=30, tol=1e-6,
                variant="householder", check_inner=False)
    assert res.status == SolverStatus.CONVERGED
    assert int(res.iterations) == 30  # full cycle despite early tol hit


def test_gmres_v_err_matches_golden_definition():
    """The MGSR v_err formula (cumulative sqrt chain,
    gmres_mgsr.f90:414-420) evaluated on a fixed basis matches a direct
    NumPy transcription. (Comparing v_err between two different solver
    runs is meaningless — the values are at machine-epsilon scale and
    depend on each run's own rounding.)"""
    from gmres_tpu.solvers.gmres import _v_err_mgsr

    n = 12
    h = hilbert_matrix(n)
    b = h @ jnp.ones(n)
    m = n - 1
    _, n_out, _, _, v_basis = golden_gmres_mgs2(
        lambda v: np.asarray(h) @ v, np.asarray(b), m, 1e-15, 1
    )
    # Both sides consume the same Gram entries: at the 1e-16 scale the
    # entries live at, even dgemm-vs-dot accumulation order shifts them.
    gram_np = v_basis @ v_basis.T
    # golden cumulative chain (gmres_mgsr.f90:414-420)
    v_err = np.zeros(m + 2)
    for j in range(1, n_out + 1):
        acc = 0.0
        for i in range(j):
            acc += 2.0 * gram_np[j, i] ** 2
        acc += (gram_np[j, j] - 1.0) ** 2
        v_err[j] = np.sqrt(v_err[j - 1] ** 2 + acc)
    ours = _v_err_mgsr(jnp.asarray(gram_np), jnp.int32(n_out), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(ours[1 : n_out + 1]),
        v_err[1 : n_out + 1],
        rtol=1e-5,  # values live at machine-epsilon scale
    )


def test_certify_true_guarantees_unpreconditioned_tol():
    """certify="true" stops on the unpreconditioned relative residual,
    which the preconditioned criterion can undershoot (observed 5.2e-8
    true at tol=1e-8 with a deep polynomial M)."""
    import gmres_tpu as gt

    n = 48
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    m_inv = gt.chebyshev_preconditioner(op, 0.005, 8.0, order=16)
    res = gmres(op, b, restart=20, tol=1e-8, M=m_inv,
                compute_v_err=False, certify="true")
    assert bool(res.converged)
    true_rel = float(
        jnp.linalg.norm((b - op(res.x)).ravel())
        / jnp.linalg.norm(b.ravel())
    )
    assert true_rel <= 1e-8
    assert abs(float(res.residual) - true_rel) / true_rel < 1e-8


def test_certify_rejects_unknown():
    import pytest

    import gmres_tpu as gt

    n = 8
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    with pytest.raises(ValueError, match="certify"):
        gmres(op, b, certify="nope")
