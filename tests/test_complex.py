"""Complex-operator support (beyond-reference: the reference is
real-only Fortran throughout). The MGSR GMRES variant, the BLAS-1
layer, and the Givens QR are conjugate-correct; the flagship complex
application is CSL-preconditioned Helmholtz
(precond/multigrid.py:csl_multigrid_preconditioner)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.models.helmholtz import (
    helmholtz_apply,
    helmholtz_matrix,
    helmholtz_operator,
)
from gmres_tpu.precond.multigrid import csl_multigrid_preconditioner


def _random_complex_system(n, seed=0):
    rng = np.random.default_rng(seed)
    a = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         + 6.0 * np.eye(n))
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    return a, b


@pytest.mark.parametrize("ortho", ["cgs2", "mgs2"])
def test_complex_gmres_dense_oracle(ortho):
    n = 40
    a, b = _random_complex_system(n)
    x_star = np.linalg.solve(a, b)
    res = gt.gmres(
        jnp.asarray(a), jnp.asarray(b), restart=n, tol=1e-12,
        variant="mgsr", orthogonalization=ortho,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-10)
    # audit metric stays real and at the f64 orthogonality floor
    assert res.v_err.dtype == jnp.float64
    assert float(res.v_err.max()) < 1e-12
    assert res.residual_history.dtype == jnp.float64


def test_complex_tree_vdot_conjugates():
    from gmres_tpu.ops.blas import tree_norm, tree_vdot

    a = jnp.asarray([1.0 + 2.0j, -3.0j])
    b = jnp.asarray([2.0 - 1.0j, 4.0])
    want = np.vdot(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(complex(tree_vdot(a, b)), want)
    assert tree_norm(a).dtype == jnp.float64
    np.testing.assert_allclose(
        float(tree_norm(a)), np.linalg.norm(np.asarray(a))
    )


def test_helmholtz_damped_dense_vs_stencil():
    nsize, kh2, damping = 9, 0.4, 0.3
    rng = np.random.default_rng(5)
    x = rng.standard_normal((nsize, nsize)) \
        + 1j * rng.standard_normal((nsize, nsize))
    dense = np.asarray(
        helmholtz_matrix(nsize, kh2, damping=damping)
    ) @ x.reshape(-1)
    sten = helmholtz_apply(jnp.asarray(x), kh2, damping).reshape(-1)
    np.testing.assert_allclose(np.asarray(sten), dense, atol=1e-12)


def test_csl_preconditioned_helmholtz():
    """Indefinite 64² Helmholtz at kh² = 0.25 (≈ 84 negative modes):
    the complex-shifted-Laplacian cycle makes restarted GMRES converge
    in a couple of cycles where unpreconditioned GMRES(60) stagnates."""
    n, kh2 = 64, 0.25
    op = helmholtz_operator(n, kh2)
    b = op(jnp.ones((n, n), dtype=jnp.complex128))
    m = csl_multigrid_preconditioner(n, kh2)
    res = gt.gmres(op, b, restart=60, tol=1e-8, variant="mgsr", M=m,
                   max_restarts=30, compute_v_err=False, certify="true")
    assert bool(res.converged)
    assert int(res.restarts) <= 4
    assert float(jnp.max(jnp.abs(res.x - 1.0))) < 1e-6
    plain = gt.gmres(op, b, restart=60, tol=1e-8, variant="mgsr",
                     max_restarts=4, compute_v_err=False, certify="true")
    assert not bool(plain.converged)


def test_csl_damped_operator():
    """Absorbing medium (complex A itself): damping only helps the
    preconditioned iteration."""
    n, kh2, damping = 64, 0.25, 0.1
    op = helmholtz_operator(n, kh2, damping)
    b = op(jnp.ones((n, n), dtype=jnp.complex128))
    m = csl_multigrid_preconditioner(n, kh2)
    res = gt.gmres(op, b, restart=60, tol=1e-8, variant="mgsr", M=m,
                   max_restarts=30, compute_v_err=False, certify="true")
    assert bool(res.converged)
    assert float(jnp.max(jnp.abs(res.x - 1.0))) < 1e-6


def test_householder_complex_raises():
    b = jnp.ones((8,), dtype=jnp.complex128)
    with pytest.raises(ValueError, match="real-only"):
        gt.gmres(jnp.eye(8, dtype=jnp.complex128), b)


def test_complex_sharded_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n, kh2 = 64, 0.25
    op = helmholtz_operator(n, kh2)
    b = op(jnp.ones((n, n), dtype=jnp.complex128))
    m = csl_multigrid_preconditioner(n, kh2)
    base = gt.gmres(op, b, restart=60, tol=1e-8, variant="mgsr", M=m,
                    max_restarts=30, compute_v_err=False, certify="true")
    sh = jax.jit(
        lambda bb: gt.gmres(op, bb, restart=60, tol=1e-8, variant="mgsr",
                            M=m, max_restarts=30, compute_v_err=False,
                            certify="true")
    )(shard_grid_vector(b, mesh))
    assert bool(sh.converged)
    assert abs(int(base.restarts) - int(sh.restarts)) <= 1


def test_cg_complex_hermitian():
    """Complex HPD system: CG's scalars are exactly real ((r, Mr),
    (p, Ap) Hermitian forms); the conjugating tree_vdot makes the same
    loop complex-capable."""
    rng = np.random.default_rng(9)
    d = 40
    bmat = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    a = bmat.conj().T @ bmat + 2.0 * np.eye(d)  # HPD
    rhs = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    aj = jnp.asarray(a)
    for variant in ("classic", "pipelined"):
        res = gt.cg(lambda v: aj @ v, jnp.asarray(rhs), tol=1e-10,
                    max_iterations=500, variant=variant)
        assert bool(res.converged)
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(a, rhs), atol=1e-8
        )
        assert res.residual_history.dtype == jnp.float64


def test_minres_complex_hermitian_indefinite():
    """Complex Hermitian INDEFINITE system — the full MINRES regime in
    complex arithmetic (all Lanczos/Givens scalars stay real)."""
    rng = np.random.default_rng(11)
    d = 40
    h = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    h = 0.5 * (h + h.conj().T)  # Hermitian, indefinite (random spectrum)
    assert np.linalg.eigvalsh(h).min() < 0 < np.linalg.eigvalsh(h).max()
    rhs = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    hj = jnp.asarray(h)
    res = gt.minres(lambda v: hj @ v, jnp.asarray(rhs), tol=1e-9,
                    max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(h, rhs), atol=1e-7
    )
