"""BiCGstab(ℓ) (solvers/bicgstabl.py) — beyond-reference solver; the
key validation is EXACT recurrence equivalence to plain BiCGSTAB at
ℓ = 1 (same Krylov recurrence, independently implemented)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.types import SolverStatus


def test_ell1_reproduces_plain_bicgstab_history():
    """ℓ = 1 IS plain BiCGSTAB (one BiCG step + degree-1 MR): the
    residual histories of the two independent implementations agree to
    rounding — each entry within ~1e-12 relative."""
    n = 32
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    r1 = gt.bicgstabl(op, b, ell=1, tol=1e-9, max_iterations=500,
                      reliable=False)
    rp = gt.bicgstab(op, b, tol=1e-9, max_iterations=500,
                     reliable=False)
    assert int(r1.iterations) == int(rp.iterations)
    # early history to rounding; the tail of an ill-conditioned solve
    # amplifies the implementations' different arithmetic orders
    np.testing.assert_allclose(
        np.asarray(r1.residual_history[:10]),
        np.asarray(rp.residual_history[:10]),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(r1.residual_history),
        np.asarray(rp.residual_history),
        rtol=0.05,
    )


def test_ell2_poisson_converges():
    n = 32
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    res = gt.bicgstabl(op, b, ell=2, tol=1e-9, max_iterations=500)
    assert bool(res.converged)
    # certified true residual
    assert float(res.residual) < 1e-9
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)
    # each cycle = 2 BiCGSTAB-iteration-equivalents of work
    plain = gt.bicgstab(op, b, tol=1e-9, max_iterations=500)
    assert int(res.iterations) <= int(plain.iterations) // 2 + 3


def test_ell2_convdiff_mg_preconditioned():
    from gmres_tpu.precond.multigrid import (
        convection_diffusion_multigrid_preconditioner,
    )

    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    m = convection_diffusion_multigrid_preconditioner(n, 0.4, 0.2)
    res = gt.bicgstabl(op, b, ell=2, tol=1e-9, max_iterations=100, M=m)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-6)


def test_reliable_updates_fix_high_peclet_drift():
    """γ = (0.9, 0.9) unpreconditioned: the recursive residual claims
    1e-9 while the truth sits at ~0.13 (measured) — certification
    downgrades the plain run to BREAKDOWN; reliable replacement makes
    the solve actually converge."""
    n = 64
    op = gt.convection_diffusion_operator(n, 0.9, 0.9)
    b = op(jnp.ones((n, n)))
    plain = gt.bicgstabl(op, b, ell=2, tol=1e-9, max_iterations=2000,
                         reliable=False)
    rel = gt.bicgstabl(op, b, ell=2, tol=1e-9, max_iterations=2000,
                       reliable=True)
    assert int(plain.status) == int(SolverStatus.BREAKDOWN)
    assert float(plain.residual) > 1e-3
    assert bool(rel.converged)
    assert float(rel.residual) < 1e-9


def test_x0_and_zero_rhs():
    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    x0 = 0.5 * jnp.ones((n, n))
    res = gt.bicgstabl(op, b, ell=2, tol=1e-9, max_iterations=500,
                       x0=x0)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)
    r0 = gt.bicgstabl(op, jnp.zeros((n, n)), ell=2, tol=1e-9,
                      max_iterations=10)
    assert bool(r0.converged)
    assert int(r0.iterations) == 0


def test_invalid_ell_raises():
    with pytest.raises(ValueError, match="ell"):
        gt.bicgstabl(gt.poisson_operator(8),
                     jnp.ones((8, 8)), ell=0)


def test_sharded_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    plain = gt.bicgstabl(op, b, ell=2, tol=1e-9, max_iterations=500)
    sharded = jax.jit(
        lambda v: gt.bicgstabl(op, v, ell=2, tol=1e-9,
                               max_iterations=500)
    )(shard_grid_vector(b, mesh))
    # sharded reduction order differs by ULPs; near the absolute tol
    # that can move the exit by one cycle
    assert abs(int(plain.iterations) - int(sharded.iterations)) <= 1
    assert bool(sharded.converged)
