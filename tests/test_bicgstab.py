"""BiCGSTAB vs golden oracle on symmetric (Poisson) and nonsymmetric
(convection-diffusion) problems."""

import jax.numpy as jnp
import numpy as np

from gmres_tpu import bicgstab, chebyshev_preconditioner
from gmres_tpu.models.convection_diffusion import (
    convection_diffusion_matrix,
    convection_diffusion_operator,
)
from gmres_tpu.models.poisson import poisson_apply, poisson_matrix
from gmres_tpu.types import SolverStatus
from tests.golden import golden_bicgstab


def test_bicgstab_poisson_manufactured():
    nsize = 32
    b = poisson_apply(jnp.ones((nsize, nsize)))
    res = bicgstab(poisson_apply, b, tol=1e-9, max_iterations=10_000)
    assert res.status == SolverStatus.CONVERGED
    assert np.max(np.abs(np.asarray(res.x) - 1.0)) < 1e-7


def test_bicgstab_matches_golden():
    nsize = 16
    b = poisson_apply(jnp.ones((nsize, nsize)))
    res = bicgstab(poisson_apply, b, tol=1e-9, max_iterations=10_000)
    a = np.asarray(poisson_matrix(nsize))
    _, it, _, hist = golden_bicgstab(
        lambda v: a @ v, np.asarray(b).reshape(-1), 1e-9, 10_000
    )
    assert int(res.iterations) == it
    np.testing.assert_allclose(
        np.asarray(res.residual_history[:it]), hist, rtol=1e-4, atol=1e-12
    )


def test_bicgstab_convection_diffusion():
    nsize = 32
    op = convection_diffusion_operator(nsize, 0.4, 0.2)
    b = op(jnp.ones((nsize, nsize)))
    res = bicgstab(op, b, tol=1e-9, max_iterations=10_000)
    assert res.status == SolverStatus.CONVERGED
    assert np.max(np.abs(np.asarray(res.x) - 1.0)) < 1e-7


def test_pbicgstab_chebyshev():
    nsize = 32
    op = convection_diffusion_operator(nsize, 0.3, 0.1)
    b = op(jnp.ones((nsize, nsize)))
    plain = bicgstab(op, b, tol=1e-9, max_iterations=10_000)
    m_inv = chebyshev_preconditioner(op, 0.2, 8.2)
    pre = bicgstab(op, b, tol=1e-9, max_iterations=10_000, M=m_inv)
    assert pre.status == SolverStatus.CONVERGED
    assert int(pre.iterations) < int(plain.iterations)
    assert np.max(np.abs(np.asarray(pre.x) - 1.0)) < 1e-7


def test_pbicgstab_matches_golden():
    nsize = 12
    gx, gy = 0.4, 0.2
    op = convection_diffusion_operator(nsize, gx, gy)
    b = op(jnp.ones((nsize, nsize)))
    m_inv = chebyshev_preconditioner(op, 0.2, 8.2)
    res = bicgstab(op, b, tol=1e-9, max_iterations=10_000, M=m_inv)

    a = np.asarray(convection_diffusion_matrix(nsize, gx, gy))

    def golden_minv(r):
        d = (8.2 + 0.2) / 2.0
        alpha = 1.0 / d
        beta = ((8.2 - 0.2) / 2.0 * alpha / 2.0) ** 2
        alpha = 1.0 / (d - beta)
        z = r / d
        return z + alpha * (r - a @ z)

    _, it, _, hist = golden_bicgstab(
        lambda v: a @ v, np.asarray(b).reshape(-1), 1e-9, 10_000,
        m_inv=golden_minv,
    )
    assert int(res.iterations) == it
    np.testing.assert_allclose(
        np.asarray(res.residual_history[:it]), hist, rtol=1e-4, atol=1e-12
    )


def test_final_residual_is_certified_true_norm():
    """The reported residual is the recomputed ||b - Ax|| (one extra
    matvec), not the recursive estimate — BiCGSTAB's recurrence can
    drift arbitrarily far from the truth (observed: 2.4e-14 recursive
    vs ~1e-4 true on the 1024^2 convection-diffusion system), and a
    CONVERGED claim that fails re-verification must downgrade to
    BREAKDOWN."""
    import gmres_tpu as gt

    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    res = gt.bicgstab(op, b, tol=1e-9)
    assert int(res.status) == SolverStatus.CONVERGED
    r = b - op(res.x)
    true_norm = float(jnp.sqrt(jnp.sum(r * r)))
    assert abs(float(res.residual) - true_norm) <= 1e-12 + 1e-6 * true_norm
