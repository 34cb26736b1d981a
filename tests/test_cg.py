"""CG / PCG vs the golden NumPy oracle and the manufactured-solution
test pattern of the reference drivers (x_true = 1, b = A·1,
test_cg.f90:40-41)."""

import jax
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


class TestPipelinedCG:
    """Pipelined (Ghysels-Vanroose) variant: one fused reduction per
    iteration; must converge to the same solution with an iteration
    count within a couple of the classic loop."""

    def _problem(self, n=64):
        import gmres_tpu as gt

        op = gt.poisson_operator(n)
        b = op(jnp.ones((n, n)))
        return op, b

    def test_matches_classic(self):
        import gmres_tpu as gt

        op, b = self._problem()
        classic = gt.cg(op, b, tol=1e-9, max_iterations=5000)
        piped = gt.cg(op, b, tol=1e-9, max_iterations=5000,
                      variant="pipelined")
        assert bool(piped.converged)
        assert abs(int(piped.iterations) - int(classic.iterations)) <= 2
        np.testing.assert_allclose(piped.x, 1.0, atol=1e-7)
        # reported residual honors the absolute criterion
        assert float(piped.residual) < 1e-9

    def test_preconditioned(self):
        import gmres_tpu as gt

        op, b = self._problem()
        m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
        classic = gt.cg(op, b, tol=1e-9, max_iterations=5000, M=m_inv)
        piped = gt.cg(op, b, tol=1e-9, max_iterations=5000, M=m_inv,
                      variant="pipelined")
        assert bool(piped.converged)
        assert abs(int(piped.iterations) - int(classic.iterations)) <= 2
        np.testing.assert_allclose(piped.x, 1.0, atol=1e-7)

    def test_sharded_iteration_parity(self):
        import gmres_tpu as gt
        from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

        mesh = solver_mesh(8)
        op, b = self._problem(40)
        plain = gt.cg(op, b, tol=1e-9, max_iterations=5000,
                      variant="pipelined")
        sharded = jax.jit(
            lambda v: gt.cg(op, v, tol=1e-9, max_iterations=5000,
                            variant="pipelined")
        )(shard_grid_vector(b, mesh))
        assert int(plain.iterations) == int(sharded.iterations)

    def test_b_zero(self):
        import gmres_tpu as gt

        op, _ = self._problem(8)
        res = gt.cg(op, jnp.zeros((8, 8)), tol=1e-9,
                    variant="pipelined")
        assert bool(res.converged)
        assert int(res.iterations) == 0

    def test_bad_variant(self):
        import gmres_tpu as gt
        import pytest

        op, b = self._problem(8)
        with pytest.raises(ValueError, match="variant"):
            gt.cg(op, b, variant="nope")


def test_final_residual_is_certified_true_norm():
    """Both CG variants report the recomputed ||b - Ax|| (one extra
    matvec), matching bicgstab's certification — short recurrences
    drift from the truth at the attainable-accuracy limit."""
    import gmres_tpu as gt
    from gmres_tpu.types import SolverStatus

    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    for variant in ("classic", "pipelined"):
        res = gt.cg(op, b, tol=1e-9, variant=variant)
        assert int(res.status) == SolverStatus.CONVERGED, variant
        r = b - op(res.x)
        true_norm = float(jnp.sqrt(jnp.sum(r * r)))
        assert abs(float(res.residual) - true_norm) <= (
            1e-12 + 1e-6 * true_norm
        ), variant
