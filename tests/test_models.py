"""Model-problem correctness: dense assembly ↔ matrix-free stencil
equivalence (the reference validates this only by eyeballing solver
output; here it is exact)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gmres_tpu.models.convection_diffusion import (
    convection_diffusion_apply,
    convection_diffusion_matrix,
)
from gmres_tpu.models.hilbert import hilbert_matrix
from gmres_tpu.models.poisson import poisson_apply, poisson_matrix


@pytest.mark.parametrize("nsize", [4, 7, 16])
def test_poisson_dense_vs_stencil(nsize):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nsize, nsize))
    a = poisson_matrix(nsize)
    dense = (a @ x.reshape(-1)).reshape(nsize, nsize)
    mf = poisson_apply(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mf), dense, rtol=1e-12,
                               atol=1e-12)


def test_poisson_flat_input():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(36)
    y2d = poisson_apply(jnp.asarray(x).reshape(6, 6)).reshape(-1)
    y1d = poisson_apply(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y1d), np.asarray(y2d))


def test_poisson_matrix_structure():
    a = np.asarray(poisson_matrix(3))
    assert a.shape == (9, 9)
    assert np.all(np.diag(a) == 4.0)
    np.testing.assert_allclose(a, a.T)  # symmetric
    # eigenvalues in (0, 8)
    w = np.linalg.eigvalsh(a)
    assert w[0] > 0 and w[-1] < 8.0


def test_hilbert_values():
    h = np.asarray(hilbert_matrix(4))
    assert h[0, 0] == 1.0
    assert h[0, 1] == 0.5
    np.testing.assert_allclose(h[2, 3], 1.0 / 6.0)
    np.testing.assert_allclose(h, h.T)


def test_hilbert_reference_rounding():
    h64 = np.asarray(hilbert_matrix(12))
    h32 = np.asarray(hilbert_matrix(12, reference_rounding=True))
    assert h64.dtype == np.float64 and h32.dtype == np.float64
    # single-precision rounding visible but tiny
    assert 0 < np.max(np.abs(h64 - h32)) < 1e-7


@pytest.mark.parametrize("gx,gy", [(0.0, 0.0), (0.4, 0.2), (-0.3, 0.7)])
def test_convection_diffusion_dense_vs_stencil(gx, gy):
    nsize = 6
    rng = np.random.default_rng(2)
    x = rng.standard_normal((nsize, nsize))
    a = convection_diffusion_matrix(nsize, gx, gy)
    dense = (np.asarray(a) @ x.reshape(-1)).reshape(nsize, nsize)
    mf = convection_diffusion_apply(jnp.asarray(x), gx, gy)
    np.testing.assert_allclose(np.asarray(mf), dense, rtol=1e-13, atol=1e-13)


def test_convection_diffusion_nonsymmetric():
    a = np.asarray(convection_diffusion_matrix(5, 0.4, 0.2))
    assert not np.allclose(a, a.T)


def test_convection_diffusion_zero_gamma_is_poisson():
    a = np.asarray(convection_diffusion_matrix(5, 0.0, 0.0))
    p = np.asarray(poisson_matrix(5))
    np.testing.assert_allclose(a, p)


def test_poisson_spectral_bounds_exact():
    """Bounds match the dense matrix's eigenvalues exactly."""
    import numpy as np

    from gmres_tpu.models.poisson import (
        poisson_matrix,
        poisson_spectral_bounds,
    )

    n = 10
    lam = np.linalg.eigvalsh(np.asarray(poisson_matrix(n)))
    lo, hi = poisson_spectral_bounds(n)
    np.testing.assert_allclose(lo, lam[0], rtol=1e-12)
    np.testing.assert_allclose(hi, lam[-1], rtol=1e-12)


def test_tuned_poisson_preconditioner_converges():
    import jax.numpy as jnp
    import numpy as np

    import gmres_tpu as gt

    n = 48
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    m_inv, order, lo, hi = gt.tuned_poisson_preconditioner(n)
    assert order >= 2 and lo < hi
    res = gt.gmres(op, b, restart=20, tol=1e-8, M=m_inv,
                   compute_v_err=False, certify="true", max_restarts=100)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-5)


@pytest.mark.parametrize("kh2", [0.0, 0.5, 2.0])
def test_helmholtz_dense_vs_stencil(kh2):
    from gmres_tpu.models.helmholtz import (
        helmholtz_apply,
        helmholtz_matrix,
    )

    nsize = 9
    rng = np.random.default_rng(3)
    x = rng.standard_normal((nsize, nsize))
    dense = helmholtz_matrix(nsize, kh2) @ x.reshape(-1)
    sten = helmholtz_apply(jnp.asarray(x), kh2).reshape(-1)
    np.testing.assert_allclose(np.asarray(sten), np.asarray(dense),
                               atol=1e-12)


def test_helmholtz_symmetric_indefinite():
    """Symmetric at every k; indefinite exactly when (kh)² exceeds the
    closed-form smallest Laplacian eigenvalue (helmholtz_lambda_min)."""
    from gmres_tpu.models.helmholtz import (
        helmholtz_lambda_min,
        helmholtz_matrix,
    )

    nsize = 12
    thresh = helmholtz_lambda_min(nsize, 0.0)
    for kh2, indefinite in [(0.5 * thresh, False), (4.0 * thresh, True)]:
        a = np.asarray(helmholtz_matrix(nsize, kh2))
        np.testing.assert_allclose(a, a.T, atol=0)
        eigs = np.linalg.eigvalsh(a)
        assert (eigs.min() < 0) == indefinite
        np.testing.assert_allclose(
            eigs.min(), helmholtz_lambda_min(nsize, kh2), atol=1e-12
        )


def test_helmholtz_zero_k_is_poisson():
    from gmres_tpu.models.helmholtz import helmholtz_apply

    x = jnp.asarray(np.random.default_rng(4).standard_normal((8, 8)))
    np.testing.assert_allclose(
        np.asarray(helmholtz_apply(x, 0.0)),
        np.asarray(poisson_apply(x)), atol=0
    )
