"""CG / PCG vs the golden NumPy oracle and the manufactured-solution
test pattern of the reference drivers (x_true = 1, b = A·1,
test_cg.f90:40-41)."""

import jax.numpy as jnp
import numpy as np

from gmres_tpu import cg, chebyshev_preconditioner
from gmres_tpu.models.poisson import poisson_apply, poisson_matrix
from gmres_tpu.types import SolverStatus
from tests.golden import golden_cg


def _setup(nsize):
    x_true = jnp.ones((nsize, nsize))
    b = poisson_apply(x_true)
    return x_true, b


def test_cg_poisson_manufactured():
    nsize = 32
    x_true, b = _setup(nsize)
    res = cg(poisson_apply, b, tol=1e-9, max_iterations=10_000)
    assert res.status == SolverStatus.CONVERGED
    assert res.residual < 1e-9
    err = np.max(np.abs(np.asarray(res.x) - 1.0))
    assert err < 1e-8


def test_cg_matches_golden_iteration_count():
    nsize = 24
    x_true, b = _setup(nsize)
    res = cg(poisson_apply, b, tol=1e-9, max_iterations=10_000)

    a = np.asarray(poisson_matrix(nsize))
    bf = np.asarray(b).reshape(-1)
    _, it, gres, hist = golden_cg(lambda v: a @ v, bf, 1e-9, 10_000)
    assert int(res.iterations) == it
    ours = np.asarray(res.residual_history[: it])
    np.testing.assert_allclose(ours, hist, rtol=1e-5)


def test_pcg_chebyshev_accelerates():
    nsize = 48
    _, b = _setup(nsize)
    plain = cg(poisson_apply, b, tol=1e-9, max_iterations=10_000)
    # Reference driver bounds: params=(8.2, 0.2) swapped-order quirk
    # (test_cg.f90:30); our API normalizes.
    m_inv = chebyshev_preconditioner(poisson_apply, 0.2, 8.2)
    pre = cg(poisson_apply, b, tol=1e-9, max_iterations=10_000, M=m_inv)
    assert pre.status == SolverStatus.CONVERGED
    assert int(pre.iterations) < int(plain.iterations)
    err = np.max(np.abs(np.asarray(pre.x) - 1.0))
    assert err < 1e-8


def test_pcg_matches_golden():
    nsize = 16
    _, b = _setup(nsize)
    m_inv = chebyshev_preconditioner(poisson_apply, 0.2, 8.2)
    res = cg(poisson_apply, b, tol=1e-9, max_iterations=10_000, M=m_inv)

    a = np.asarray(poisson_matrix(nsize))
    bf = np.asarray(b).reshape(-1)

    def golden_minv(r):
        d = (8.2 + 0.2) / 2.0
        alpha = 1.0 / d
        beta = ((8.2 - 0.2) / 2.0 * alpha / 2.0) ** 2
        alpha = 1.0 / (d - beta)
        z = r / d
        return z + alpha * (r - a @ z)

    _, it, _, hist = golden_cg(lambda v: a @ v, bf, 1e-9, 10_000,
                               m_inv=golden_minv)
    assert int(res.iterations) == it
    np.testing.assert_allclose(
        np.asarray(res.residual_history[:it]), hist, rtol=1e-5
    )


def test_cg_x0_nonzero():
    nsize = 16
    _, b = _setup(nsize)
    x0 = jnp.full((nsize, nsize), 0.5)
    res = cg(poisson_apply, b, tol=1e-10, max_iterations=10_000, x0=x0)
    assert res.status == SolverStatus.CONVERGED
    assert np.max(np.abs(np.asarray(res.x) - 1.0)) < 1e-9


def test_cg_max_iterations_status():
    nsize = 32
    _, b = _setup(nsize)
    res = cg(poisson_apply, b, tol=1e-12, max_iterations=3)
    assert res.status == SolverStatus.MAX_ITERATIONS
    assert int(res.iterations) == 3


def test_cg_pytree_vectors():
    """Solvers operate on pytrees (block-diagonal two-grid system)."""
    b1 = poisson_apply(jnp.ones((8, 8)))
    b2 = poisson_apply(jnp.ones((12, 12)))

    def block_op(v):
        return {"a": poisson_apply(v["a"]), "b": poisson_apply(v["b"])}

    res = cg(block_op, {"a": b1, "b": b2}, tol=1e-10,
             max_iterations=10_000)
    assert res.status == SolverStatus.CONVERGED
    assert np.max(np.abs(np.asarray(res.x["a"]) - 1.0)) < 1e-8
    assert np.max(np.abs(np.asarray(res.x["b"]) - 1.0)) < 1e-8
