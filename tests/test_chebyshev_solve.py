"""Chebyshev iteration solver (solvers/chebyshev.py) — the
reduction-free stationary solver; its one-collective-per-cycle
contract is asserted on the compiled SPMD program like s-step's
(tests/test_sstep.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import gmres_tpu as gt
from gmres_tpu.types import SolverStatus


def test_poisson_converges():
    n = 64
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    lo, hi = gt.poisson_spectral_bounds(n)
    res = gt.chebyshev_solve(op, b, lo, hi, order=32, tol=1e-9,
                             max_cycles=200)
    assert bool(res.converged)
    assert float(res.residual) < 1e-9  # true by construction
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)
    # contraction bound sanity: order-32 over this kappa converges in
    # tens of cycles, each a single reduction — CG needs ~190
    # iterations x2 reductions on the same system
    assert int(res.iterations) < 40


def test_stencil_route_parity():
    """coefs= routes the polynomial through the fused stencil kernels;
    cycle counts match the generic-operator route exactly (same
    polynomial — the chebyshev.py route contract)."""
    n = 64
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    lo, hi = gt.poisson_spectral_bounds(n)
    r1 = gt.chebyshev_solve(op, b, lo, hi, order=32, tol=1e-9,
                            max_cycles=200)
    r2 = gt.chebyshev_solve(op, b, lo, hi, order=32, tol=1e-9,
                            max_cycles=200,
                            coefs=(4.0, -1.0, -1.0, -1.0, -1.0))
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-12)


def test_bad_bounds_breakdown():
    """Bounds that miss the lower spectrum make the polynomial diverge
    on the unbounded modes — detected as non-contraction, not silent
    max_cycles."""
    n = 32
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    _, hi = gt.poisson_spectral_bounds(n)
    res = gt.chebyshev_solve(op, b, hi / 4, hi / 2, order=8, tol=1e-9,
                             max_cycles=50)
    assert int(res.status) == int(SolverStatus.BREAKDOWN)


def test_3d():
    n = 32
    op = gt.poisson3d_operator(n)
    b = op(jnp.ones((n, n, n)))
    lo, hi = gt.poisson3d_spectral_bounds(n)
    res = gt.chebyshev_solve(op, b, lo, hi, order=32, tol=1e-9,
                             max_cycles=100)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)


def test_one_collective_per_cycle():
    """The latency contract on the compiled SPMD program: the cycle
    loop issues exactly ONE all-reduce (the true-residual check) per
    order-k polynomial application — CG pays 2-3 per single operator
    application."""
    from tests.test_sstep import _loop_body_allreduce_counts
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    lo, hi = gt.poisson_spectral_bounds(n)
    f = jax.jit(
        lambda v: gt.chebyshev_solve(op, v, lo, hi, order=16, tol=1e-8,
                                     max_cycles=200)
    )
    b_sh = shard_grid_vector(b, mesh)
    counts = _loop_body_allreduce_counts(f, b_sh)
    assert counts == [1], counts
    res = f(b_sh)
    assert bool(res.converged)
