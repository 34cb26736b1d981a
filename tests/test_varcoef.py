"""Variable-coefficient diffusion (models/varcoef.py). Oracles: exact
reduction to the unit Poisson stencil at c = 1, dense symmetric
assembly, manufactured solutions, MG grid-independence for smooth
coefficients, and sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt


def _smooth_c(n, amp=0.9):
    g = jnp.linspace(0, 1, n)
    xx, yy = jnp.meshgrid(g, g, indexing="ij")
    return 1.0 + amp * jnp.sin(2 * jnp.pi * xx) * jnp.cos(
        jnp.pi * yy
    ) ** 2


def test_reduces_to_poisson_at_unit_c():
    n = 32
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n))
    )
    uniform = gt.varcoef_apply(jnp.ones((n, n), jnp.float64), x)
    # Same stencil, different summation order -> roundoff, not bitwise.
    np.testing.assert_allclose(
        np.asarray(uniform), np.asarray(gt.poisson_apply(x)),
        atol=1e-13,
    )
    np.testing.assert_array_equal(
        np.asarray(gt.varcoef_diagonal(jnp.ones((n, n)))),
        4.0 * np.ones((n, n)),
    )


def test_dense_assembly_symmetric_and_matches_operator():
    n = 8
    c = _smooth_c(n)
    a = np.asarray(gt.varcoef_matrix(c))
    np.testing.assert_allclose(a, a.T, atol=1e-14)
    # SPD: strictly positive eigenvalues.
    assert np.linalg.eigvalsh(a)[0] > 0
    A = gt.varcoef_operator(c)
    x = np.random.default_rng(1).standard_normal((n, n))
    np.testing.assert_allclose(
        np.asarray(A(jnp.asarray(x))).ravel(), a @ x.ravel(),
        atol=1e-12,
    )


def test_cg_solve_dense_oracle():
    n = 12
    c = _smooth_c(n)
    a = np.asarray(gt.varcoef_matrix(c))
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((n, n)))
    res = gt.cg(gt.varcoef_operator(c), b, tol=1e-12)
    assert bool(res.converged)
    exact = np.linalg.solve(a, np.asarray(b).ravel()).reshape(n, n)
    np.testing.assert_allclose(np.asarray(res.x), exact, atol=1e-9)


def test_mg_grid_independent_smooth_coefficients():
    iters = []
    for n in (64, 128):
        c = _smooth_c(n)
        A = gt.varcoef_operator(c)
        b = A(jnp.ones((n, n), jnp.float64))
        M = gt.varcoef_multigrid_preconditioner(c)
        res = gt.cg(A, b, tol=1e-10, M=M)
        assert bool(res.converged)
        np.testing.assert_allclose(
            np.asarray(res.x), np.ones((n, n)), atol=1e-7
        )
        iters.append(int(res.iterations))
    # Grid-independence: doubling n must not grow iterations by >2.
    assert iters[1] <= iters[0] + 2
    # And the cycle must beat plain Jacobi-free CG decisively.
    n = 128
    c = _smooth_c(n)
    A = gt.varcoef_operator(c)
    b = A(jnp.ones((n, n), jnp.float64))
    plain = gt.cg(A, b, tol=1e-10)
    assert iters[1] * 5 < int(plain.iterations)


def test_mg_moderate_contrast():
    n = 64
    c = np.ones((n, n))
    c[16:32, 16:48] = 100.0
    A = gt.varcoef_operator(jnp.asarray(c))
    b = A(jnp.ones((n, n), jnp.float64))
    M = gt.varcoef_multigrid_preconditioner(jnp.asarray(c))
    res = gt.cg(A, b, tol=1e-9 * float(jnp.linalg.norm(b)), M=M)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.ones((n, n)), atol=1e-5
    )


def test_sharded_parity():
    from jax.sharding import AxisType, NamedSharding
    from jax.sharding import PartitionSpec as P

    n = 64
    c = _smooth_c(n)
    A = gt.varcoef_operator(c)
    b = A(jnp.ones((n, n), jnp.float64))
    M = gt.varcoef_multigrid_preconditioner(c)
    base = gt.cg(A, b, tol=1e-10, M=M)
    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    b_sh = jax.device_put(b, NamedSharding(mesh, P("grid", None)))
    sh = jax.jit(lambda v: gt.cg(A, v, tol=1e-10, M=M))(b_sh)
    assert int(sh.iterations) == int(base.iterations)
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(base.x), atol=1e-10
    )
