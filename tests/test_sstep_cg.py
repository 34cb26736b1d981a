"""s-step (communication-avoiding) PCG (solvers/sstep_cg.py).
Oracles: bitwise-class equivalence to solvers/cg.py at cycle
boundaries in f64 (the exact-arithmetic claim), MG-preconditioned
convergence with matching iteration counts, an HLO collective-count
assertion (the point of the algorithm), sharded parity, honest
BREAKDOWN on an indefinite operator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.solvers.sstep_cg import sstep_cg


def _poisson_system(n=48, seed=0):
    op = gt.poisson_operator(n)
    rng = np.random.default_rng(seed)
    x_true = jnp.asarray(rng.standard_normal((n, n)))
    return op, x_true, op(x_true)


def test_matches_cg_iterates_at_cycle_boundaries():
    """Each s-step cycle reproduces s steps of the standard recurrence
    in exact arithmetic; in f64 on a mildly conditioned system the
    iterates stay within ~1e-9 after several cycles."""
    op, x_true, b = _poisson_system(24)
    s, cycles = 3, 4
    # run EXACTLY cycles*s CG iterations (tol=0 never triggers)
    ref = gt.cg(op, b, tol=0.0, max_iterations=s * cycles)
    ca = sstep_cg(op, b, s=s, tol=0.0, max_cycles=cycles)
    assert int(ca.iterations) == s * cycles
    np.testing.assert_allclose(
        np.asarray(ca.x), np.asarray(ref.x), atol=1e-9
    )


def test_converges_and_certifies():
    op, x_true, b = _poisson_system(48)
    res = sstep_cg(op, b, s=4, tol=1e-10)
    assert bool(res.converged)
    assert float(res.residual) < 1e-10
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(x_true), atol=1e-7
    )
    # true residual re-check outside the solver
    r = b - op(res.x)
    assert float(jnp.linalg.norm(r.ravel())) < 1e-10


def test_mg_preconditioned_iteration_parity():
    """With the MG cycle (clustered spectrum — the intended pairing)
    the s-step iterate count matches plain PCG up to one cycle of
    granularity."""
    n = 64
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    m = gt.poisson_multigrid_preconditioner(n)
    plain = gt.cg(op, b, tol=1e-10, M=m)
    s = 4
    ca = sstep_cg(op, b, s=s, tol=1e-10, M=m, max_cycles=100)
    assert bool(ca.converged)
    assert int(ca.iterations) <= int(plain.iterations) + s


def test_collectives_independent_of_s():
    """The compiled sharded program's static all-reduce count must NOT
    grow with s — one stacked Gram + one certification norm per cycle
    regardless (that is the algorithm's reason to exist)."""
    import re

    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    op = gt.poisson_operator(n)
    b = shard_grid_vector(op(jnp.ones((n, n))), mesh)

    def count(s):
        fn = jax.jit(lambda bb: sstep_cg(op, bb, s=s, tol=1e-9))
        hlo = fn.lower(b).compile().as_text()
        return len(re.findall(r"= \S+ all-reduce\(", hlo))

    c2, c8 = count(2), count(8)
    assert c2 == c8
    assert c2 <= 6  # setup + loop body, constant in s


def test_sharded_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    rep = sstep_cg(op, b, s=4, tol=1e-10)
    sh = jax.jit(lambda bb: sstep_cg(op, bb, s=4, tol=1e-10))(
        shard_grid_vector(b, mesh)
    )
    assert int(sh.iterations) == int(rep.iterations)
    assert bool(sh.converged)
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(rep.x), atol=1e-12
    )


def test_indefinite_breaks_down_honestly():
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.standard_normal((40, 40)))
    lam = np.linspace(-1.0, 2.0, 40)  # indefinite
    a = jnp.asarray((q * lam) @ q.T)
    b = jnp.asarray(rng.standard_normal(40))
    res = sstep_cg(lambda v: a @ v, b, s=4, tol=1e-12, max_cycles=60)
    # must not claim convergence it cannot certify
    if not bool(res.converged):
        assert int(res.status) in (
            int(gt.SolverStatus.BREAKDOWN),
            int(gt.SolverStatus.MAX_ITERATIONS),
        )
    else:
        assert float(res.residual) < 1e-12


def test_b_zero_converges_immediately():
    op, _, _ = _poisson_system(16)
    res = sstep_cg(op, jnp.zeros((16, 16)), s=4, tol=1e-12)
    assert bool(res.converged)
    assert int(res.iterations) == 0
