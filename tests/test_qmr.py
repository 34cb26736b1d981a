"""QMR (solvers/qmr.py). Oracles: dense solves,
scipy.sparse.linalg.qmr, the derived transpose vs the dense
transpose, certified exits, sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.models.convection_diffusion import (
    convection_diffusion_matrix,
)


def test_dense_oracle_convdiff():
    n = 24
    A = gt.convection_diffusion_operator(n, 0.8, 0.4)
    a = np.asarray(convection_diffusion_matrix(n, 0.8, 0.4))
    x_true = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n))
    )
    b = A(x_true)
    res = gt.qmr(A, b, tol=1e-10, max_iterations=2000)
    assert bool(res.converged)
    assert float(res.residual) < 1e-10
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(x_true), atol=1e-7
    )
    exact = np.linalg.solve(a, np.asarray(b).ravel()).reshape(n, n)
    np.testing.assert_allclose(np.asarray(res.x), exact, atol=1e-7)


def test_scipy_qmr_same_class():
    # scipy's qmr (same algorithm family) converges on the same
    # operator in a comparable iteration count — a behavioral oracle.
    import scipy.sparse.linalg as spla

    n = 16
    a = np.asarray(convection_diffusion_matrix(n, 0.6, 0.3))
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n * n)
    counts = {"n": 0}

    def cb(_):
        counts["n"] += 1

    x_sp, info = spla.qmr(a, b, rtol=1e-10, atol=0.0, maxiter=2000,
                          callback=cb)
    assert info == 0
    res = gt.qmr(lambda v: jnp.asarray(a) @ v, jnp.asarray(b),
                 tol=1e-10 * np.linalg.norm(b), max_iterations=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_sp, atol=1e-6)
    # Same family: iteration counts within 2x of each other.
    assert int(res.iterations) < 2 * counts["n"] + 10


def test_preconditioned_jacobi_varcoef():
    # M must be linear_transpose-able (elementwise Jacobi is; the
    # multigrid cycles use fori_loop — no transpose rule — and need
    # AT= instead). High-contrast variable-coefficient diffusion is
    # where spatially varying Jacobi genuinely pays: measured
    # 1089 -> 230 iterations AND solution error 7e-4 -> 2e-7 (the
    # scaled metric resolves the stiff-inclusion modes plain QMR
    # exits without).
    n = 48
    c = np.ones((n, n))
    c[8:20, 8:20] = 1e3
    c[28:42, 26:40] = 1e3
    c = jnp.asarray(c)
    A = gt.varcoef_operator(c)
    diag = gt.varcoef_diagonal(c)
    x_true = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n))
    )
    b = A(x_true)
    plain = gt.qmr(A, b, tol=1e-8 * float(jnp.linalg.norm(b)),
                   max_iterations=5000)
    prec = gt.qmr(A, b,
                  tol=1e-8 * float(jnp.linalg.norm(b / diag)),
                  max_iterations=5000, M=lambda r: r / diag)
    assert bool(plain.converged) and bool(prec.converged)
    np.testing.assert_allclose(
        np.asarray(prec.x), np.asarray(x_true), atol=1e-5
    )
    assert int(prec.iterations) * 3 < int(plain.iterations)


def test_quasi_residual_certified():
    # The quasi-residual can undershoot; the returned residual is the
    # certified true norm and CONVERGED implies it is under tol.
    n = 20
    A = gt.convection_diffusion_operator(n, 1.5, 0.7)
    b = A(jnp.ones((n, n), jnp.float64))
    res = gt.qmr(A, b, tol=1e-9, max_iterations=2000)
    assert bool(res.converged)
    r_true = float(jnp.linalg.norm(b - A(res.x)))
    np.testing.assert_allclose(float(res.residual), r_true, rtol=1e-6)
    assert r_true < 1e-9


def test_complex_rejected():
    with pytest.raises(ValueError, match="real"):
        gt.qmr(lambda v: v, jnp.ones((4,), jnp.complex128))


def test_sharded_parity():
    from jax.sharding import AxisType, NamedSharding
    from jax.sharding import PartitionSpec as P

    n = 64
    A = gt.convection_diffusion_operator(n, 0.4, 0.2)
    b = A(jnp.ones((n, n), jnp.float64))
    base = gt.qmr(A, b, tol=1e-7, max_iterations=2000)
    assert bool(base.converged)
    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    b_sh = jax.device_put(b, NamedSharding(mesh, P("grid", None)))
    sh = jax.jit(
        lambda v: gt.qmr(A, v, tol=1e-7, max_iterations=2000)
    )(b_sh)
    assert bool(sh.converged)
    # Two-sided Lanczos amplifies sharded-reduction roundoff (the
    # benign near-breakdowns make later scalars roundoff-sensitive),
    # so counts drift a few percent — the same contract as gcrodr's
    # sharded test (tests/test_gcrodr.py:123), solutions still match.
    assert abs(int(sh.iterations) - int(base.iterations)) \
        <= 0.1 * int(base.iterations)
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(base.x), atol=1e-6
    )


def test_qmr_multigrid_via_mt():
    """The MG un-fencing: qmr(A, b, M=cycle, MT=transposed cycle)
    works — iteration collapse on convdiff where the library's best
    preconditioner family was previously unreachable from QMR."""
    n = 64
    A = gt.convection_diffusion_operator(n, 0.4, 0.2)
    x_true = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, n))
    )
    b = A(x_true)
    m = gt.convection_diffusion_multigrid_preconditioner(n, 0.4, 0.2)
    mt = gt.convection_diffusion_multigrid_preconditioner(
        n, 0.4, 0.2, transpose=True
    )
    tol = 1e-9
    plain = gt.qmr(A, b, tol=tol, max_iterations=2000)
    prec = gt.qmr(A, b, tol=tol, M=m, MT=mt, max_iterations=200)
    assert bool(prec.converged)
    np.testing.assert_allclose(
        np.asarray(prec.x), np.asarray(x_true), atol=1e-6
    )
    assert int(prec.iterations) * 5 < int(plain.iterations)
