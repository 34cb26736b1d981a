"""CGS (solvers/cgs.py) — conjugate gradient squared. Oracles: dense
np.linalg.solve (real and complex); behavior cross-checked against
scipy.sparse.linalg.cgs during development (same convergence envelope
on the diagonally dominant dense case)."""

import jax
import jax.numpy as jnp
import numpy as np

import gmres_tpu as gt
from gmres_tpu.types import SolverStatus


def test_dense_oracle():
    rng = np.random.default_rng(0)
    d = 50
    a = rng.standard_normal((d, d)) + 8 * np.eye(d)
    b = rng.standard_normal(d)
    aj = jnp.asarray(a)
    res = gt.cgs(lambda v: aj @ v, jnp.asarray(b), tol=1e-10,
                 max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(a, b), atol=1e-9
    )


def test_complex_dense_oracle():
    rng = np.random.default_rng(1)
    d = 40
    a = (rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
         + 8 * np.eye(d))
    b = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    aj = jnp.asarray(a)
    res = gt.cgs(lambda v: aj @ v, jnp.asarray(b), tol=1e-10,
                 max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(a, b), atol=1e-9
    )
    assert res.residual_history.dtype == jnp.float64


def test_mg_preconditioned_convdiff():
    """With the MG cycle CGS tracks BiCGSTAB's iteration count at the
    same matvec budget (2 A + 2 M per iteration) while issuing one
    FEWER all-reduce per iteration — the case it exists for."""
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    m = gt.convection_diffusion_multigrid_preconditioner(n, 0.4, 0.2)
    res = gt.cgs(op, b, tol=1e-9, max_iterations=200, M=m)
    assert bool(res.converged)
    assert float(res.residual) < 1e-9  # certified true residual
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)
    rb = gt.bicgstab(op, b, tol=1e-9, max_iterations=200, M=m)
    assert int(res.iterations) <= int(rb.iterations) + 5


def test_reduction_count_vs_bicgstab():
    """The design claim in the docstring, pinned at the HLO level: one
    CGS iteration carries exactly TWO all-reduce points (σ, then the
    fused ‖r‖²+ρ tail) where BiCGSTAB carries three — counted in the
    while-body computations of the sharded-compiled SPMD program
    (matvec is a stencil, so its halo traffic is collective-permute,
    not all-reduce; every all-reduce in the body is a dot product)."""
    from tests.test_sstep import _loop_body_allreduce_counts
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 32
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = shard_grid_vector(op(jnp.ones((n, n))), mesh)

    cgs_counts = _loop_body_allreduce_counts(
        jax.jit(lambda v: gt.cgs(op, v, tol=1e-9, max_iterations=50)), b
    )
    bicg_counts = _loop_body_allreduce_counts(
        jax.jit(lambda v: gt.bicgstab(op, v, tol=1e-9,
                                      max_iterations=50,
                                      reliable=False)), b
    )
    assert max(cgs_counts) == 2, cgs_counts
    assert max(bicg_counts) == 3, bicg_counts


def test_certification_catches_squaring_loss():
    """Unpreconditioned convdiff at a tolerance below CGS's attainable
    accuracy: the recursive residual's squared intermediates limit the
    true residual; exit certification must never report a lying
    CONVERGED. Accept either an honest BREAKDOWN or a certified true
    CONVERGED — what is forbidden is converged-with-true-res ≥ tol."""
    n = 32
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    res = gt.cgs(op, b, tol=1e-12, max_iterations=4000)
    if bool(res.converged):
        assert float(res.residual) < 1e-12
    else:
        assert int(res.status) in (
            int(SolverStatus.BREAKDOWN),
            int(SolverStatus.MAX_ITERATIONS),
        )
    loose = gt.cgs(op, b, tol=1e-5, max_iterations=4000)
    assert bool(loose.converged)


def test_x0_rtol_and_zero_rhs():
    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    res = gt.cgs(op, b, tol=1e-8, max_iterations=2000,
                 x0=0.5 * jnp.ones((n, n)))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-6)
    # rtol: scale b up; the absolute tol alone would over-solve.
    big = 1e6 * b
    rr = gt.cgs(op, big, tol=1e-30, rtol=1e-8, max_iterations=2000)
    assert bool(rr.converged)
    r0 = gt.cgs(op, jnp.zeros((n, n)), tol=1e-9, max_iterations=10)
    assert bool(r0.converged)
    assert int(r0.iterations) == 0


def test_sharded_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    m = gt.convection_diffusion_multigrid_preconditioner(n, 0.4, 0.2)
    base = gt.cgs(op, b, tol=1e-9, max_iterations=200, M=m)
    sh = jax.jit(
        lambda v: gt.cgs(op, v, tol=1e-9, max_iterations=200, M=m)
    )(shard_grid_vector(b, mesh))
    assert bool(sh.converged)
    assert abs(int(base.iterations) - int(sh.iterations)) <= 1
