"""TFQMR (solvers/tfqmr.py) — transpose-free QMR. Oracles: dense
np.linalg.solve (real and complex); behavior cross-checked against
scipy.sparse.linalg.tfqmr during development (same convergence /
failure envelope on the unpreconditioned convdiff case)."""

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
    res = gt.tfqmr(lambda v: aj @ v, jnp.asarray(b), tol=1e-10,
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
    res = gt.tfqmr(lambda v: aj @ v, jnp.asarray(b), tol=1e-10,
                   max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(a, b), atol=1e-9
    )
    assert res.residual_history.dtype == jnp.float64


def test_mg_preconditioned_convdiff():
    """With the MG cycle TFQMR matches BiCGSTAB's iteration count at
    the same per-iteration budget (2 matvecs + 2 M) — and its
    quasi-residual bound decreases monotonically, where BiCGSTAB's
    residual history spikes."""
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    m = gt.convection_diffusion_multigrid_preconditioner(n, 0.4, 0.2)
    res = gt.tfqmr(op, b, tol=1e-9, max_iterations=200, M=m)
    assert bool(res.converged)
    assert float(res.residual) < 1e-9  # certified true residual
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)
    rb = gt.bicgstab(op, b, tol=1e-9, max_iterations=200, M=m)
    assert int(res.iterations) <= int(rb.iterations) + 3
    hist = np.asarray(res.residual_history[: int(res.iterations)])
    assert np.all(np.diff(hist) < hist[:-1] * 0.5)  # steady decrease


def test_certification_catches_cgs_squaring_loss():
    """Unpreconditioned 32² convdiff: the squared CGS polynomial
    limits attainable accuracy to ~1e-7 while the quasi-residual bound
    claims 1e-9 — exit certification downgrades the claim to BREAKDOWN
    (scipy's tfqmr reports the same configuration as converged-ish or
    exhausted with err ≈ 1; ours is honest)."""
    n = 32
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    res = gt.tfqmr(op, b, tol=1e-9, max_iterations=4000)
    assert int(res.status) == int(SolverStatus.BREAKDOWN)
    assert 1e-9 < float(res.residual) < 1e-4  # close, not converged
    loose = gt.tfqmr(op, b, tol=1e-6, max_iterations=4000)
    assert bool(loose.converged)


def test_x0_and_zero_rhs():
    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    res = gt.tfqmr(op, b, tol=1e-8, max_iterations=2000,
                   x0=0.5 * jnp.ones((n, n)))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-6)
    r0 = gt.tfqmr(op, jnp.zeros((n, n)), tol=1e-9, max_iterations=10)
    assert bool(r0.converged)
    assert int(r0.iterations) == 0


def test_sharded_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    m = gt.convection_diffusion_multigrid_preconditioner(n, 0.4, 0.2)
    base = gt.tfqmr(op, b, tol=1e-9, max_iterations=200, M=m)
    sh = jax.jit(
        lambda v: gt.tfqmr(op, v, tol=1e-9, max_iterations=200, M=m)
    )(shard_grid_vector(b, mesh))
    assert bool(sh.converged)
    assert abs(int(base.iterations) - int(sh.iterations)) <= 1
