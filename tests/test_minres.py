"""MINRES (solvers/minres.py) — symmetric-indefinite solver, beyond
the reference (which leaves this class to full-recurrence GMRES).
Oracles: dense np.linalg.solve on the Helmholtz model; CG on SPD
Poisson (same Krylov space ⇒ comparable iteration counts)."""

import jax
import jax.numpy as jnp
import numpy as np

import gmres_tpu as gt
from gmres_tpu.models.helmholtz import (
    helmholtz_lambda_min,
    helmholtz_matrix,
    helmholtz_operator,
)

def test_minres_spd_poisson():
    n = 32
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    res = gt.minres(op, b, tol=1e-9, max_iterations=2000)
    assert bool(res.converged)
    assert float(res.residual) < 1e-9  # certified true residual
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)
    # On SPD the MINRES and CG Krylov spaces coincide; iteration counts
    # should be within a few of each other.
    res_cg = gt.cg(op, b, tol=1e-9, max_iterations=2000)
    assert abs(int(res.iterations) - int(res_cg.iterations)) <= 10


def test_minres_indefinite_dense_oracle():
    """Strongly indefinite small Helmholtz: MINRES reaches the
    np.linalg.solve solution. CG's minimization property is void here
    — its residual spikes above its starting value mid-solve (the
    indefinite (p, Ap) pivots), even when it stumbles into eventual
    convergence; MINRES by construction never does
    (test_minres_monotone_residual)."""
    n = 12
    kh2 = 4.0 * helmholtz_lambda_min(n, 0.0)  # several negative eigs
    a = np.asarray(helmholtz_matrix(n, kh2))
    assert np.linalg.eigvalsh(a).min() < 0
    op = helmholtz_operator(n, kh2)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal((n, n)))
    x_star = np.linalg.solve(a, np.asarray(b).reshape(-1)).reshape(n, n)

    res = gt.minres(op, b, tol=1e-10, max_iterations=400)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-7)

    res_cg = gt.cg(op, b, tol=1e-10, max_iterations=400)
    hist = np.asarray(
        res_cg.residual_history[: max(int(res_cg.iterations), 1)]
    )
    assert hist.max() > float(jnp.sqrt(jnp.vdot(b, b)))


def test_minres_monotone_residual():
    """MINRES minimizes ‖r‖ over the Krylov space, so the residual
    history is non-increasing — the property CG lacks on indefinite
    systems."""
    n = 16
    kh2 = 3.0 * helmholtz_lambda_min(n, 0.0)
    op = helmholtz_operator(n, kh2)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)))
    res = gt.minres(op, b, tol=1e-10, max_iterations=300)
    hist = np.asarray(res.residual_history[: int(res.iterations)])
    assert np.all(np.diff(hist) <= hist[:-1] * 1e-10 + 1e-12)


def test_shifted_laplacian_cycle_is_spd():
    """Assemble M densely (apply to every basis vector): the V-cycle
    with equal pre/post polynomial smoothers and adjoint transfers must
    be a symmetric positive-definite operator — the admissibility
    condition for MINRES preconditioning (solvers/minres.py)."""
    n = 32
    kh2 = 0.08
    m = gt.helmholtz_shifted_laplacian_preconditioner(n, kh2)
    eye = jnp.eye(n * n).reshape(n * n, n, n)
    cols = jax.vmap(lambda e: m(e).reshape(-1))(eye)
    mat = np.asarray(cols).T
    np.testing.assert_allclose(mat, mat.T, atol=1e-12 * np.abs(mat).max())
    eigs = np.linalg.eigvalsh(0.5 * (mat + mat.T))
    assert eigs.min() > 0


def test_minres_shifted_laplacian_preconditioned():
    """Indefinite 64² Helmholtz: the SPD shifted-Laplacian cycle cuts
    MINRES iterations by ≥3× and the certified M-norm residual meets
    tol; the plain 2-norm residual is checked directly against the
    operator."""
    n = 64
    kh2 = 10.0 * helmholtz_lambda_min(n, 0.0)  # ≈ 0.047: ~25 negative modes
    op = helmholtz_operator(n, kh2)
    b = op(jnp.ones((n, n)))

    plain = gt.minres(op, b, tol=1e-9, max_iterations=4000)
    m = gt.helmholtz_shifted_laplacian_preconditioner(n, kh2)
    prec = gt.minres(op, b, tol=1e-9, max_iterations=4000, M=m)
    assert bool(plain.converged) and bool(prec.converged)
    assert int(prec.iterations) * 3 <= int(plain.iterations)
    np.testing.assert_allclose(np.asarray(prec.x), 1.0, atol=1e-6)
    # 2-norm of the true residual, independent of the M-norm test
    r = np.asarray(b - op(prec.x))
    assert np.linalg.norm(r) < 1e-6


def test_minres_x0_and_zero_rhs():
    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    res = gt.minres(op, b, tol=1e-9, max_iterations=2000,
                    x0=0.5 * jnp.ones((n, n)))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)
    r0 = gt.minres(op, jnp.zeros((n, n)), tol=1e-9, max_iterations=10)
    assert bool(r0.converged)
    assert int(r0.iterations) == 0


def test_minres_sharded_parity():
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    kh2 = 6.0 * helmholtz_lambda_min(n, 0.0)
    op = helmholtz_operator(n, kh2)
    b = op(jnp.ones((n, n)))
    plain = gt.minres(op, b, tol=1e-9, max_iterations=4000)
    sharded = jax.jit(
        lambda v: gt.minres(op, v, tol=1e-9, max_iterations=4000)
    )(shard_grid_vector(b, mesh))
    assert bool(sharded.converged)
    assert abs(int(plain.iterations) - int(sharded.iterations)) <= 2


def test_minres_distributed_mg_parity():
    """The mesh= variant of the shifted-Laplacian cycle (replicated
    coarse levels) applies the same preconditioner: iteration counts
    match the single-device cycle."""
    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    n = 64
    kh2 = 6.0 * helmholtz_lambda_min(n, 0.0)
    op = helmholtz_operator(n, kh2)
    b = op(jnp.ones((n, n)))
    m0 = gt.helmholtz_shifted_laplacian_preconditioner(n, kh2)
    base = gt.minres(op, b, tol=1e-9, max_iterations=1000, M=m0)
    md = gt.helmholtz_shifted_laplacian_preconditioner(n, kh2, mesh=mesh)
    dist = jax.jit(
        lambda v: gt.minres(op, v, tol=1e-9, max_iterations=1000, M=md)
    )(shard_grid_vector(b, mesh))
    assert bool(base.converged) and bool(dist.converged)
    assert abs(int(base.iterations) - int(dist.iterations)) <= 2
