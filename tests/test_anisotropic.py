"""Anisotropic diffusion + line-smoothing multigrid
(models/anisotropic.py, precond/multigrid.py). Oracles: exact
reduction to Poisson at eps=1, dense assembly, the point-vs-line
smoother contrast as eps shrinks, grid independence, sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt


def test_reduces_to_poisson_at_eps_one():
    n = 24
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)))
    np.testing.assert_allclose(
        np.asarray(gt.anisotropic_apply(x, 1.0)),
        np.asarray(gt.poisson_apply(x)), atol=1e-13,
    )


def test_dense_assembly_matches_operator():
    n, eps = 8, 0.05
    a = np.asarray(gt.anisotropic_matrix(n, eps))
    np.testing.assert_allclose(a, a.T, atol=1e-14)
    assert np.linalg.eigvalsh(a)[0] > 0
    A = gt.anisotropic_operator(n, eps)
    x = np.random.default_rng(1).standard_normal((n, n))
    np.testing.assert_allclose(
        np.asarray(A(jnp.asarray(x))).ravel(), a @ x.ravel(),
        atol=1e-12,
    )


def test_line_mg_eps_robust_point_mg_degrades():
    # The reason line smoothing exists: as eps -> 0, the point-Jacobi
    # cycle degrades while the line cycle stays flat. Sizes kept small
    # on purpose: each V-cycle-preconditioned CG iteration is many
    # stencil sweeps and the CI box has one core.
    n = 48
    line_iters = []
    for eps in (1.0, 0.01):
        A = gt.anisotropic_operator(n, eps)
        b = A(jnp.ones((n, n), jnp.float64))
        M = gt.anisotropic_multigrid_preconditioner(n, eps)
        res = gt.cg(A, b, tol=1e-8, M=M, max_iterations=400)
        assert bool(res.converged)
        line_iters.append(int(res.iterations))
    # Line cycle: eps-robust (no blow-up across two decades; measured
    # 13 at eps=1 — the isotropic end is line smoothing's WORST case —
    # vs 6 at eps=0.01).
    assert max(line_iters) <= 3 * min(line_iters)
    # Point cycle at eps=0.01: degrades hard vs the line cycle —
    # either fails the iteration cap or needs >3x the iterations.
    eps = 0.01
    A = gt.anisotropic_operator(n, eps)
    b = A(jnp.ones((n, n), jnp.float64))
    Mp = gt.anisotropic_multigrid_preconditioner(n, eps,
                                                 smoother="point")
    cap = 3 * line_iters[1] + 1
    resp = gt.cg(A, b, tol=1e-8, M=Mp, max_iterations=cap)
    assert not bool(resp.converged) or int(resp.iterations) >= cap


def test_line_mg_grid_independent():
    eps = 0.02
    iters = []
    for n in (48, 96):
        A = gt.anisotropic_operator(n, eps)
        b = A(jnp.ones((n, n), jnp.float64))
        M = gt.anisotropic_multigrid_preconditioner(n, eps)
        res = gt.cg(A, b, tol=1e-8, M=M)
        assert bool(res.converged)
        np.testing.assert_allclose(
            np.asarray(res.x), np.ones((n, n)), atol=1e-6
        )
        iters.append(int(res.iterations))
    assert iters[1] <= iters[0] + 2


def test_solution_dense_oracle():
    n, eps = 12, 0.05
    a = np.asarray(gt.anisotropic_matrix(n, eps))
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((n, n)))
    res = gt.cg(gt.anisotropic_operator(n, eps), b, tol=1e-12)
    exact = np.linalg.solve(a, np.asarray(b).ravel()).reshape(n, n)
    np.testing.assert_allclose(np.asarray(res.x), exact, atol=1e-9)


def test_sharded_parity():
    # Rows sharded; the line solves run along the unsharded lane axis
    # so the whole smoother is device-local.
    from jax.sharding import AxisType, NamedSharding
    from jax.sharding import PartitionSpec as P

    n, eps = 48, 0.05
    A = gt.anisotropic_operator(n, eps)
    b = A(jnp.ones((n, n), jnp.float64))
    M = gt.anisotropic_multigrid_preconditioner(n, eps)
    base = gt.cg(A, b, tol=1e-8, M=M)
    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    b_sh = jax.device_put(b, NamedSharding(mesh, P("grid", None)))
    sh = jax.jit(lambda v: gt.cg(A, v, tol=1e-8, M=M))(b_sh)
    assert int(sh.iterations) == int(base.iterations)
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(base.x), atol=1e-10
    )


def test_validation():
    with pytest.raises(ValueError, match="unknown smoother"):
        gt.anisotropic_multigrid_preconditioner(32, 0.1,
                                                smoother="nope")
