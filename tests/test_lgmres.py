"""LGMRES — augmented restarts (Baker-Jessup-Manteuffel 2005).

Beyond the reference: its restarted GMRES discards the Krylov space at
every restart (gmres_hh.f90:563-571), creating the restart-size
sensitivity the reference tunes by hand (README.md:20, m ≈ 95); LGMRES
appends the last k outer corrections to each cycle to break restart
stagnation at small m.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.solvers.lgmres import lgmres
from gmres_tpu.types import SolverStatus

from tests.golden import golden_lgmres


def _true_rel(op, b, x):
    r = b - op(x)
    return float(jnp.sqrt(jnp.sum(r * r)) / jnp.sqrt(jnp.sum(b * b)))


def test_aug0_is_exactly_fgmres():
    """aug=0 removes every augmentation branch — the solver must be
    bit-identical to restarted FGMRES (same cycle machinery)."""
    op = gt.convection_diffusion_operator(48, 1.0, 0.5)
    b = op(jnp.ones((48, 48)))
    f = gt.fgmres(op, b, restart=10, tol=1e-10, max_restarts=200)
    l0 = lgmres(op, b, restart=10, aug=0, tol=1e-10, max_restarts=200)
    assert int(l0.status) == SolverStatus.CONVERGED
    assert int(l0.restarts) == int(f.restarts)
    assert int(l0.iterations) == int(f.iterations)
    np.testing.assert_array_equal(np.asarray(l0.x), np.asarray(f.x))


def test_cycle_superset_property():
    """Cycle 1 is identical (no aug yet); cycle 2 minimizes over a
    strict superset of FGMRES's space, so its residual can only be
    smaller or equal."""
    op = gt.convection_diffusion_operator(48, 1.0, 0.5)
    b = op(jnp.ones((48, 48)))
    f1 = gt.fgmres(op, b, restart=8, tol=1e-14, max_restarts=1)
    l1 = lgmres(op, b, restart=8, aug=3, tol=1e-14, max_restarts=1)
    np.testing.assert_allclose(
        np.asarray(l1.x), np.asarray(f1.x), rtol=1e-12, atol=1e-14
    )
    f2 = gt.fgmres(op, b, restart=8, tol=1e-14, max_restarts=2)
    l2 = lgmres(op, b, restart=8, aug=3, tol=1e-14, max_restarts=2)
    assert _true_rel(op, b, l2.x) <= _true_rel(op, b, f2.x) * (1 + 1e-10)


def test_breaks_restart_stagnation_on_poisson():
    """The headline claim: unpreconditioned Poisson at small restart is
    the stagnation regime; lgmres(10,3) must cut outer restarts by a
    large factor vs fgmres(10) (measured 15 vs 76 at n=48)."""
    op = gt.poisson_operator(48)
    b = op(jnp.ones((48, 48)))
    f = gt.fgmres(op, b, restart=10, tol=1e-8, max_restarts=500)
    l = lgmres(op, b, restart=10, aug=3, tol=1e-8, max_restarts=500)
    assert int(f.status) == SolverStatus.CONVERGED
    assert int(l.status) == SolverStatus.CONVERGED
    assert int(l.restarts) * 3 <= int(f.restarts)
    np.testing.assert_allclose(np.asarray(l.x), 1.0, atol=1e-6)


def test_golden_oracle_trajectory():
    """Per-cycle residual trajectory matches a NumPy oracle that uses a
    different numerical route (dense lstsq over the same space).
    Restarted trajectories are chaotically sensitive, so only the first
    few cycles are comparable tightly."""
    n = 24
    op = gt.convection_diffusion_operator(n, 0.8, 0.4)
    b = op(jnp.ones((n, n)))
    bn = np.asarray(b, dtype=np.float64).ravel()

    def matvec(v):
        return np.asarray(
            op(jnp.asarray(v.reshape(n, n)))
        ).ravel()

    _, hist = golden_lgmres(matvec, bn, m=6, k_aug=2, tol=1e-14,
                            max_restarts=5)
    for cycles in (2, 3, 4):
        res = lgmres(op, b, restart=6, aug=2, tol=1e-14,
                     max_restarts=cycles)
        np.testing.assert_allclose(
            _true_rel(op, b, res.x), hist[cycles], rtol=1e-7
        )


def test_sharded_parity():
    """Row-sharding over the 8-device CPU mesh must not change the
    iteration path (replicated small-matrix state, psum reductions)."""
    from jax.sharding import NamedSharding, PartitionSpec as P, AxisType

    op = gt.poisson_operator(48)
    b = op(jnp.ones((48, 48)))
    ref = lgmres(op, b, restart=10, aug=3, tol=1e-8, max_restarts=500)
    mesh = jax.make_mesh((8,), ("grid",),
                         axis_types=(AxisType.Auto,))
    b_sh = jax.device_put(b, NamedSharding(mesh, P("grid", None)))
    sh = jax.jit(
        lambda bb: lgmres(op, bb, restart=10, aug=3, tol=1e-8,
                          max_restarts=500)
    )(b_sh)
    assert int(sh.status) == SolverStatus.CONVERGED
    assert int(sh.restarts) == int(ref.restarts)
    assert int(sh.iterations) == int(ref.iterations)


def test_mixed_precision_certified():
    """f32 cycles, f64 certification at restart boundaries: the
    reported residual is the f64 true residual and must sit below
    tol even though the work dtype cannot resolve it."""
    op = gt.poisson_operator(64)
    b = op(jnp.ones((64, 64)))
    m_inv = gt.poisson_multigrid_preconditioner(64)
    res = lgmres(op, b, restart=10, aug=2, tol=1e-10, M=m_inv,
                 inner_dtype=jnp.float32)
    assert int(res.status) == SolverStatus.CONVERGED
    assert _true_rel(op, b, res.x) < 1e-10


def test_preconditioned_aug_advantage():
    """Augmentation composes with a right preconditioner (flexible
    contract): with a weak Chebyshev M and small restart, lgmres must
    not need more restarts than fgmres."""
    op = gt.poisson_operator(48)
    b = op(jnp.ones((48, 48)))
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2, order=2)
    f = gt.fgmres(op, b, restart=5, tol=1e-9, max_restarts=500,
                  M=m_inv)
    l = lgmres(op, b, restart=5, aug=2, tol=1e-9, max_restarts=500,
               M=m_inv)
    assert int(l.status) == SolverStatus.CONVERGED
    assert int(l.restarts) <= int(f.restarts)


def test_zero_rhs_and_scalar_guard():
    op = gt.poisson_operator(16)
    res = lgmres(op, jnp.zeros((16, 16)), restart=5, aug=2, tol=1e-10)
    assert int(res.status) == SolverStatus.CONVERGED
    assert int(res.restarts) == 0

    res1 = lgmres(lambda x: 3.0 * x, jnp.array([6.0]), restart=5,
                  aug=2, tol=1e-12)
    assert int(res1.status) == SolverStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(res1.x), [2.0])


def test_v_err_audit():
    """compute_v_err exercises the CGS2 orthogonality audit over the
    augmented basis (zero-padded slots are audit-neutral)."""
    op = gt.poisson_operator(32)
    b = op(jnp.ones((32, 32)))
    res = lgmres(op, b, restart=8, aug=2, tol=1e-8, max_restarts=100,
                 compute_v_err=True)
    assert int(res.status) == SolverStatus.CONVERGED
    assert float(jnp.max(res.v_err)) < 1e-10
