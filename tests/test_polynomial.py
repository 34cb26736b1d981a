"""GMRES-polynomial preconditioner (precond/polynomial.py). Oracles:
the full-degree polynomial IS the inverse (Cayley-Hamilton limit);
measured collective-count collapse on convection-diffusion."""

import jax
import jax.numpy as jnp
import numpy as np

import gmres_tpu as gt
from gmres_tpu.precond.polynomial import (
    gmres_polynomial_preconditioner,
    harmonic_ritz_values,
)


def test_full_degree_is_exact_inverse():
    """degree = n: the GMRES residual polynomial has a root at every
    eigenvalue, so s(A) = A⁻¹ exactly — pins the harmonic Ritz roots,
    the Leja ordering, and the conjugate-pair fusion all at once."""
    rng = np.random.default_rng(0)
    d = 12
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lam = np.linspace(1.0, 12.0, d)
    a = (q * lam) @ q.T + 0.3 * rng.standard_normal((d, d))
    aj = jnp.asarray(a)
    r = jnp.asarray(rng.standard_normal(d))
    m = gmres_polynomial_preconditioner(lambda v: aj @ v, r, degree=d)
    np.testing.assert_allclose(
        np.asarray(m(r)), np.linalg.solve(a, np.asarray(r)), atol=1e-12
    )
    # complex roots actually occurred (the nonsymmetric part is real)
    assert np.abs(m.roots.imag).max() > 1e-3


def test_convdiff_collective_collapse():
    """deg=24 on 64² convection-diffusion: inner GMRES iterations (the
    collective-bearing steps) drop ~30× and TOTAL matvecs still beat
    plain GMRES — the nonsymmetric analogue of the deep-Chebyshev
    trade (measured: 448 plain inner iters vs 15, 375 vs 448
    matvecs)."""
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    m = gmres_polynomial_preconditioner(op, b, degree=24)
    res = gt.gmres(op, b, restart=30, tol=1e-9, M=m,
                   compute_v_err=False, max_restarts=50, certify="true")
    assert bool(res.converged)
    total = max(int(res.restarts) - 1, 0) * 30 + int(res.iterations)
    assert total <= 25
    assert total * 25 < 448  # matvec budget beats measured plain GMRES
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)


def test_too_low_degree_fails_honestly():
    """A degree whose Krylov space misses the lower spectrum leaves
    eigenvalues where |1 − z·s(z)| > 1 (smallest root ≈ 0.95 vs
    λ_min ≈ 0.019) — the preconditioned iteration must NOT claim
    convergence."""
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    m = gmres_polynomial_preconditioner(op, b, degree=8)
    res = gt.gmres(op, b, restart=30, tol=1e-9, M=m,
                   compute_v_err=False, max_restarts=30, certify="true")
    assert not bool(res.converged)


def test_application_is_reduction_free():
    """The compiled sharded application of s(A) contains NO
    all-reduce: d stencil applications, halo permutes only."""
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    op = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = op(jnp.ones((n, n)))
    m = gmres_polynomial_preconditioner(op, b, degree=12)
    b_sh = shard_grid_vector(b, mesh)
    txt = jax.jit(m).lower(b_sh).compile().as_text()
    assert " all-reduce" not in txt


def test_harmonic_ritz_full_degree_are_eigenvalues():
    rng = np.random.default_rng(3)
    d = 10
    a = rng.standard_normal((d, d)) + 6 * np.eye(d)
    aj = jnp.asarray(a)
    hr = harmonic_ritz_values(lambda v: aj @ v,
                              jnp.asarray(rng.standard_normal(d)), d)
    np.testing.assert_allclose(
        np.sort_complex(hr), np.sort_complex(np.linalg.eigvals(a)),
        rtol=1e-8,
    )
