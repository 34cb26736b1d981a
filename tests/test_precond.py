"""Chebyshev preconditioner + Lanczos bounds."""

import jax
import jax.numpy as jnp
import numpy as np

from gmres_tpu import (
    chebyshev_preconditioner,
    lanczos_bounds,
    power_iteration_bound,
)
from gmres_tpu.models.poisson import poisson_apply, poisson_matrix
from gmres_tpu.precond.chebyshev import chebyshev_from_lanczos
from gmres_tpu.solvers.cg import cg
from gmres_tpu.types import SolverStatus


def test_chebyshev_reference_formula():
    """z = r/d + α(r − A(r/d)·…) exactly as chebyshev.f90:20-37."""
    nsize = 8
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal((nsize, nsize)))
    m_inv = chebyshev_preconditioner(poisson_apply, 0.2, 8.2)
    z = m_inv(r)

    d = (8.2 + 0.2) / 2.0
    c = (8.2 - 0.2) / 2.0
    alpha = 1.0 / d
    beta = (c * alpha / 2.0) ** 2
    alpha = 1.0 / (d - beta)
    z0 = np.asarray(r) / d
    a = np.asarray(poisson_matrix(nsize))
    az0 = (a @ z0.reshape(-1)).reshape(nsize, nsize)
    expected = z0 + alpha * (np.asarray(r) - az0)
    np.testing.assert_allclose(np.asarray(z), expected, rtol=1e-13)


def test_chebyshev_param_order_insensitive():
    """Reference drivers pass (8.2, 0.2) swapped (SURVEY §7 quirk 3);
    both orders must give the same preconditioner."""
    r = jnp.ones((8, 8))
    z1 = chebyshev_preconditioner(poisson_apply, 0.2, 8.2)(r)
    z2 = chebyshev_preconditioner(poisson_apply, 8.2, 0.2)(r)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))


def test_chebyshev_higher_order_better():
    """Higher-order Chebyshev is a better A⁻¹ approximation."""
    nsize = 16
    rng = np.random.default_rng(4)
    r = jnp.asarray(rng.standard_normal((nsize, nsize)))
    lo, hi = 0.05, 8.0

    def approx_error(order):
        m = chebyshev_preconditioner(poisson_apply, lo, hi, order=order,
                                     reference_form=False)
        z = m(r)
        back = poisson_apply(z)
        return float(jnp.linalg.norm((back - r).reshape(-1)))

    e2, e4, e8 = approx_error(2), approx_error(4), approx_error(8)
    assert e4 < e2
    assert e8 < e4


def test_lanczos_bounds_poisson():
    """Poisson 2-D eigenvalues lie in (0, 8); Lanczos must bracket the
    extremes the hardcoded reference params (0.2, 8.2) approximate."""
    nsize = 32
    probe = jnp.sin(
        jnp.arange(1.0, nsize * nsize + 1).reshape(nsize, nsize)
    )
    lo, hi = lanczos_bounds(poisson_apply, probe, steps=30)
    a = np.asarray(poisson_matrix(nsize))
    w = np.linalg.eigvalsh(a)
    assert float(lo) <= w[0] + 1e-8
    assert float(hi) >= w[-1] - 1e-8
    assert float(hi) < 12.0  # not wildly loose


def test_power_iteration_bound():
    nsize = 24
    probe = jnp.cos(jnp.arange(1.0, nsize * nsize + 1)).reshape(nsize, nsize)
    lam = power_iteration_bound(poisson_apply, probe, steps=100)
    a = np.asarray(poisson_matrix(nsize))
    w = np.linalg.eigvalsh(a)
    assert abs(float(lam) - w[-1]) / w[-1] < 0.05


def test_chebyshev_from_lanczos_end_to_end():
    """Adaptive preconditioner (the reference's missing Lanczos path)
    accelerates CG like the hand-tuned one."""
    nsize = 32
    b = poisson_apply(jnp.ones((nsize, nsize)))
    probe = jnp.ones((nsize, nsize)) + jnp.arange(
        nsize * nsize
    ).reshape(nsize, nsize) * 1e-3
    m_inv = chebyshev_from_lanczos(poisson_apply, probe, lanczos_steps=20,
                                   floor=0.05)
    plain = cg(poisson_apply, b, tol=1e-9, max_iterations=10_000)
    pre = cg(poisson_apply, b, tol=1e-9, max_iterations=10_000, M=m_inv)
    assert pre.status == SolverStatus.CONVERGED
    assert int(pre.iterations) < int(plain.iterations)


def test_lanczos_breakdown_exact_operator():
    """Invariant subspace at step 1 (A = 2I): exact bounds, no spurious
    zero eigenvalues from padding."""
    lo, hi = lanczos_bounds(lambda x: 2.0 * x, jnp.ones((4, 4)), steps=10)
    np.testing.assert_allclose(float(lo), 2.0, rtol=1e-12)
    np.testing.assert_allclose(float(hi), 2.0, rtol=1e-12)


def test_power_iteration_negative_dominant():
    import gmres_tpu as gt

    probe = jnp.asarray(
        np.random.default_rng(1).standard_normal((16, 16))
    )
    r = power_iteration_bound(lambda x: -gt.poisson_apply(x), probe)
    assert float(r) > 0


def test_lanczos_estimate_mode_nonzero_lo():
    import gmres_tpu as gt

    probe = jnp.asarray(
        np.random.default_rng(2).standard_normal((48, 48))
    )
    lo, hi = lanczos_bounds(gt.poisson_apply, probe, steps=30,
                            rigorous=False)
    assert float(lo) > 0.0
    assert float(hi) >= 7.5


def test_lanczos_sharded_parity():
    """CPU-mesh sharded run matches the single-device bounds exactly
    (CLAUDE.md testing convention)."""
    import gmres_tpu as gt
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    probe = jnp.asarray(
        np.random.default_rng(3).standard_normal((32, 32))
    )
    lo1, hi1 = lanczos_bounds(gt.poisson_apply, probe, steps=20)
    lo2, hi2 = jax.jit(
        lambda p: lanczos_bounds(gt.poisson_apply, p, steps=20)
    )(shard_grid_vector(probe, mesh))
    np.testing.assert_allclose(float(lo1), float(lo2), rtol=1e-10)
    np.testing.assert_allclose(float(hi1), float(hi2), rtol=1e-10)
