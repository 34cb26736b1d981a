"""Coarse-space (deflation) preconditioning (precond/deflation.py).
Oracles: dense solve, closed-form Dirichlet modes, iteration-count
cuts vs plain/Chebyshev-only CG, lobpcg-supplied inexact modes, SPD
composition with minres, sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt


def test_exact_modes_cut_cg_iterations():
    # Mesh Laplacian: the spectrum is DENSE near the bottom, so
    # deflating k modes gives a modest, monotone-in-k cut (the sqrt
    # condition-number bound is loose here) — measured 142 -> 129/
    # 119/109 at k=4/8/16. The big win is isolated outliers (next
    # test).
    n = 64
    A = gt.poisson_operator(n)
    b = A(jnp.ones((n, n), jnp.float64))
    plain = gt.cg(A, b, tol=1e-10)
    iters = [int(plain.iterations)]
    for k in (4, 16):
        P = gt.coarse_space_preconditioner(
            A, gt.dirichlet_poisson_modes(n, k)
        )
        defl = gt.cg(A, b, tol=1e-10, M=P)
        assert bool(defl.converged)
        np.testing.assert_allclose(
            np.asarray(defl.x), np.ones((n, n)), atol=1e-7
        )
        iters.append(int(defl.iterations))
    assert iters[0] > iters[1] > iters[2]


def test_high_contrast_inclusions_jacobi_plus_indicators():
    # The regime deflation exists for (Vuik-Segal-Meijerink bubbly
    # flow): high-contrast inclusions under Jacobi scaling leave one
    # tiny isolated eigenvalue per inclusion; deflating the inclusion
    # INDICATOR vectors (not even eigenvectors) nearly halves the
    # iteration count. Measured here: 257 -> 136.
    n = 48
    c = np.ones((n, n))
    c[8:20, 8:20] = 1e5
    c[28:42, 26:40] = 1e5
    c = jnp.asarray(c)
    A = gt.varcoef_operator(c)
    diag = gt.varcoef_diagonal(c)
    Mj = lambda r: r / diag  # noqa: E731
    x_true = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n))
    )
    b = A(x_true)
    tol = 1e-10 * float(jnp.linalg.norm(b))
    jac = gt.cg(A, b, tol=tol, max_iterations=20000, M=Mj)
    w1 = np.zeros((n, n))
    w1[8:20, 8:20] = 1.0
    w2 = np.zeros((n, n))
    w2[28:42, 26:40] = 1.0
    W = jnp.asarray(np.stack(
        [w1 / np.linalg.norm(w1), w2 / np.linalg.norm(w2)]
    ))
    P = gt.coarse_space_preconditioner(A, W, M=Mj)
    defl = gt.cg(A, b, tol=tol, M=P)
    assert bool(jac.converged) and bool(defl.converged)
    np.testing.assert_allclose(
        np.asarray(defl.x), np.asarray(x_true), atol=1e-4
    )
    assert int(defl.iterations) * 1.5 < int(jac.iterations)


def test_stacks_on_chebyshev():
    # Deflation handles the low end, Chebyshev the high end — the
    # composition beats Chebyshev alone.
    n, k = 64, 8
    A = gt.poisson_operator(n)
    b = A(jnp.ones((n, n), jnp.float64))
    lo, hi = gt.poisson_spectral_bounds(n)
    M = gt.chebyshev_preconditioner(A, lo, hi, order=6)
    cheb = gt.cg(A, b, tol=1e-10, M=M)
    W = gt.dirichlet_poisson_modes(n, k)
    P = gt.coarse_space_preconditioner(A, W, M=M)
    both = gt.cg(A, b, tol=1e-10, M=P)
    assert bool(cheb.converged) and bool(both.converged)
    assert int(both.iterations) < int(cheb.iterations)
    np.testing.assert_allclose(
        np.asarray(both.x), np.ones((n, n)), atol=1e-7
    )


def test_lobpcg_modes_work_inexact():
    # Approximate eigenvectors from the library's own eigensolver.
    n, k = 48, 4
    A = gt.poisson_operator(n)
    b = A(jnp.ones((n, n), jnp.float64))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((k, n, n)))
    eig = gt.lobpcg(A, x0, tol=1e-6, max_iterations=200,
                    M=gt.poisson_multigrid_preconditioner(n))
    P = gt.coarse_space_preconditioner(A, eig.x)
    defl = gt.cg(A, b, tol=1e-10, M=P)
    plain = gt.cg(A, b, tol=1e-10)
    assert bool(defl.converged)
    assert int(defl.iterations) < int(plain.iterations)
    np.testing.assert_allclose(
        np.asarray(defl.x), np.ones((n, n)), atol=1e-7
    )


def test_spd_composition_minres():
    # P is SPD, so MINRES accepts it as well.
    n, k = 32, 4
    A = gt.poisson_operator(n)
    b = A(jnp.ones((n, n), jnp.float64))
    P = gt.coarse_space_preconditioner(
        A, gt.dirichlet_poisson_modes(n, k)
    )
    res = gt.minres(A, b, tol=1e-9, M=P)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.ones((n, n)), atol=1e-6
    )


def test_dense_oracle_small():
    n, k = 10, 3
    A = gt.poisson_operator(n)
    a = np.asarray(gt.poisson_matrix(n))
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((n, n)))
    P = gt.coarse_space_preconditioner(
        A, gt.dirichlet_poisson_modes(n, k)
    )
    res = gt.cg(A, b, tol=1e-12, M=P)
    exact = np.linalg.solve(a, np.asarray(b).ravel()).reshape(n, n)
    np.testing.assert_allclose(np.asarray(res.x), exact, atol=1e-9)


def test_sharded_parity():
    from jax.sharding import AxisType, NamedSharding
    from jax.sharding import PartitionSpec as P_

    n, k = 64, 6
    A = gt.poisson_operator(n)
    b = A(jnp.ones((n, n), jnp.float64))
    P = gt.coarse_space_preconditioner(
        A, gt.dirichlet_poisson_modes(n, k)
    )
    base = gt.cg(A, b, tol=1e-10, M=P)
    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    b_sh = jax.device_put(b, NamedSharding(mesh, P_("grid", None)))
    sh = jax.jit(lambda v: gt.cg(A, v, tol=1e-10, M=P))(b_sh)
    assert int(sh.iterations) == int(base.iterations)
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(base.x), atol=1e-10
    )


def test_validation():
    A = gt.poisson_operator(8)
    with pytest.raises(ValueError, match="k, \\*shape"):
        gt.coarse_space_preconditioner(A, jnp.ones((8,)))
