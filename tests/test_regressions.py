"""Regression tests for defects found in the round-1 self review."""

import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.types import SolverStatus


def test_bicgstab_exact_solution_at_half_step():
    """s = r − α·ap hits exactly 0 on the identity system; must
    converge cleanly instead of poisoning x with ω = 0/0 NaN."""
    b = jnp.asarray([3.0, -1.0, 2.0, 0.5])
    res = gt.bicgstab(lambda x: x, b, tol=1e-12, max_iterations=10)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, b, rtol=1e-14)
    assert np.isfinite(float(res.residual))


def test_gmres_one_element_system():
    """n = 1 clamps restart to 1, not 0 (which crashed at trace)."""
    a = jnp.asarray([[2.0]])
    b = jnp.asarray([4.0])
    res = gt.gmres(a, b, restart=30, tol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, [2.0], rtol=1e-12)


def test_gmres_accepts_numpy_matrix():
    a = np.diag([1.0, 2.0, 3.0, 4.0])
    b = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    res = gt.gmres(a, b, restart=4, tol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-10)


def test_gmres_rejects_non_operator():
    with pytest.raises(TypeError, match="callable"):
        gt.gmres(42, jnp.ones(4))


def test_checkpoint_resume_after_exhausted_restarts(tmp_path):
    """Resuming from a checkpoint whose run already exhausted
    max_restarts returns the stored state instead of asserting."""
    from gmres_tpu.utils.checkpoint import (
        gmres_checkpointed,
        save_checkpoint,
    )

    n = 12
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    p = str(tmp_path / "c.npz")
    partial = gt.gmres(op, b, restart=5, tol=1e-14, max_restarts=2,
                       compute_v_err=False)
    save_checkpoint(p, partial.x, 2)
    res = gmres_checkpointed(
        op, b, checkpoint_path=p, chunk_restarts=2, max_restarts=2,
        restart=5, tol=1e-14, compute_v_err=False,
    )
    assert int(res.restarts) == 2
    np.testing.assert_allclose(res.x, partial.x, rtol=1e-12)


def test_finite_checked_no_overflow_false_positive():
    """Large-but-finite outputs must pass (isfinite(y·y) overflowed)."""
    from gmres_tpu.utils.debug import finite_checked, run_checked

    big = finite_checked(lambda x: x * 1e200, "scale")
    y = run_checked(big, jnp.ones(4))
    assert bool(jnp.all(jnp.isfinite(y)))


def test_csr_spmv_precomputed_rows_match():
    from gmres_tpu.ops import sparse as sp

    a = sp.poisson_csr(9)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(81))
    rows = sp.csr_row_ids(a)
    np.testing.assert_allclose(
        sp.csr_spmv(a, x, rows=rows), sp.csr_spmv(a, x), rtol=1e-14
    )


class Test1x1Degenerate:
    """gmres's 1×1 fast path (ADVICE round 1): residual honors M under
    the default 'preconditioned' certify; BREAKDOWN is reserved for the
    singular a == 0 system; a solvable system that misses tol reports
    MAX_ITERATIONS."""

    def test_solvable_converges(self):
        res = gt.gmres(lambda x: 2.0 * x, 2.0 * jnp.ones(1), tol=1e-10)
        assert int(res.status) == gt.SolverStatus.CONVERGED
        np.testing.assert_allclose(res.x, 1.0, rtol=1e-14)

    def test_singular_is_breakdown(self):
        res = gt.gmres(lambda x: 0.0 * x, jnp.ones(1), tol=1e-10)
        assert int(res.status) == gt.SolverStatus.BREAKDOWN

    def test_preconditioned_residual_uses_m(self):
        # exact solve: r = 0 either way, but the M scaling must flow
        # through the reported norm. Use a non-converging M to see it:
        # M scales the residual by 1e6, pushing it over tol.
        res = gt.gmres(
            lambda x: 2.0 * x, 2.0 * jnp.ones(1), tol=1e-10,
            M=lambda r: 1e6 * r,
        )
        # exact division: residual 0 regardless of scaling
        assert int(res.status) == gt.SolverStatus.CONVERGED
        assert float(res.residual) == 0.0

    def test_certify_true_ignores_m(self):
        res = gt.gmres(
            lambda x: 2.0 * x, 2.0 * jnp.ones(1), tol=1e-10,
            M=lambda r: 1e6 * r, certify="true",
        )
        assert int(res.status) == gt.SolverStatus.CONVERGED


def test_restart_seed_precision_semantics():
    """Mixed mode applies M at WORK precision at restart boundaries
    (the seed only feeds the next f32 cycle; at 4096^2 the f64 V-cycle
    costs 13x the f32 one) — while pure-f64 mode must keep applying M
    in f64 (reference iteration parity)."""
    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    seen = []

    def recording_m(r):
        seen.append(r.dtype)
        return gt.chebyshev_preconditioner(op, 0.2, 8.2)(r)

    # pure f64: every application in f64
    seen.clear()
    res = gt.gmres(op, b, restart=10, tol=1e-10, M=recording_m,
                   compute_v_err=False, max_restarts=50)
    assert bool(res.converged)
    assert all(d == jnp.float64 for d in seen), set(seen)

    # mixed: restart-boundary seeds arrive in f32
    seen.clear()
    res = gt.gmres(op, b, restart=10, tol=1e-8, M=recording_m,
                   compute_v_err=False, max_restarts=50,
                   inner_dtype=jnp.float32, certify="true")
    assert bool(res.converged)
    assert any(d == jnp.float32 for d in seen), set(seen)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-7)


def test_mixed_mode_scale_invariance():
    """Mixed-precision restart seeding must stay scale invariant: the
    f64→f32 cast happens on the NORMALIZED residual (casting raw
    residuals would overflow f32 at ||b|| ~ 1e39 → spurious BREAKDOWN,
    and flush to zero at ||b|| ~ 1e-40 → false convergence at x=0)."""
    n = 24
    op = gt.poisson_operator(n)
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    base = op(jnp.ones((n, n)))
    for s in (1e39, 1e-40):
        b = base * s
        res = gt.gmres(op, b, restart=10, tol=1e-8, M=m_inv,
                       compute_v_err=False, max_restarts=100,
                       inner_dtype=jnp.float32, certify="true")
        assert int(res.status) == gt.SolverStatus.CONVERGED, s
        np.testing.assert_allclose(np.asarray(res.x) / s, 1.0,
                                   atol=1e-6, err_msg=str(s))


def test_rtol_option_cg_bicgstab():
    """rtol raises the absolute target to max(tol, rtol*||b||) — the
    scale-free stop callers otherwise hand-roll (tol remains the
    reference's absolute semantics as the floor)."""
    import numpy as np

    n = 48
    A = gt.poisson_operator(n)
    x_true = 1e6 * jnp.ones((n, n), jnp.float64)  # huge-scale system
    b = A(x_true)
    nb = float(jnp.linalg.norm(b))
    # Absolute 1e-9 on ||b||~1e8 would be ~1e-17 relative: below
    # attainable accuracy (certified BREAKDOWN). rtol=1e-9 converges.
    res = gt.cg(A, b, tol=1e-9, rtol=1e-9)
    assert bool(res.converged)
    assert float(res.residual) < 1e-9 * nb
    np.testing.assert_allclose(
        np.asarray(res.x) / 1e6, np.ones((n, n)), rtol=1e-7
    )
    Ac = gt.convection_diffusion_operator(n, 0.6, 0.3)
    bc = Ac(x_true)
    res2 = gt.bicgstab(Ac, bc, tol=1e-9, rtol=1e-9)
    assert bool(res2.converged)
    assert float(res2.residual) < 1e-9 * float(jnp.linalg.norm(bc))
    # The floor: with rtol tiny, tol dominates unchanged (reference
    # semantics preserved).
    small = gt.cg(A, A(jnp.ones((n, n))), tol=1e-9, rtol=1e-30)
    assert bool(small.converged)
    assert float(small.residual) < 1e-9
