"""LOBPCG (solvers/lobpcg.py) — preconditioned block eigensolver.
Oracles: the closed-form Dirichlet eigenvalues of the Poisson stencil
(including a degenerate pair) and dense numpy eigh."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import gmres_tpu as gt


def _poisson_eigs(n, k):
    return sorted(
        4.0 - 2 * math.cos(i * math.pi / (n + 1))
        - 2 * math.cos(j * math.pi / (n + 1))
        for i in range(1, n + 1) for j in range(1, n + 1)
    )[:k]


def test_poisson_closed_form_eigenvalues():
    n, k = 24, 4
    op = gt.poisson_operator(n)
    X0 = jnp.asarray(np.random.default_rng(0).standard_normal((k, n, n)))
    res = gt.lobpcg(op, X0, tol=1e-8, max_iterations=400)
    assert bool(res.converged)
    # includes the degenerate (1,2)/(2,1) pair
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), _poisson_eigs(n, k), rtol=1e-10
    )
    assert float(jnp.max(res.residuals)) < 1e-8
    # Ritz block is orthonormal
    g = np.asarray(jnp.tensordot(
        res.x.reshape(k, -1), res.x.reshape(k, -1), axes=(1, 1)
    ))
    np.testing.assert_allclose(g, np.eye(k), atol=1e-8)


def test_dense_spd_oracle():
    d, k = 60, 3
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lam = np.linspace(0.5, 40.0, d)
    a = (q * lam) @ q.T
    aj = jnp.asarray(a)
    op = lambda v: aj @ v  # noqa: E731
    X0 = jnp.asarray(rng.standard_normal((k, d)))
    res = gt.lobpcg(op, X0, tol=1e-9, max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), lam[:k], rtol=1e-9
    )
    # eigenvector check against numpy (up to sign), eigenvalues distinct
    w, v = np.linalg.eigh(a)
    for i in range(k):
        xi = np.asarray(res.x[i])
        assert abs(abs(xi @ v[:, i]) - 1.0) < 1e-6


def test_multigrid_preconditioning_is_the_lever():
    """The V-cycle turns the h²-gap-limited plain iteration into a
    grid-independent one — same preconditioner object the linear
    solves use."""
    k = 4
    iters = {}
    for n in (64, 128):
        op = gt.poisson_operator(n)
        m = gt.poisson_multigrid_preconditioner(n)
        X0 = jnp.asarray(
            np.random.default_rng(1).standard_normal((k, n, n))
        )
        res = gt.lobpcg(op, X0, tol=1e-8, max_iterations=100, M=m)
        assert bool(res.converged)
        np.testing.assert_allclose(
            np.asarray(res.eigenvalues), _poisson_eigs(n, k), rtol=1e-8
        )
        iters[n] = int(res.iterations)
    assert iters[64] <= 40 and iters[128] <= 40
    # plain LOBPCG at 64² does not converge in the same budget
    plain = gt.lobpcg(
        gt.poisson_operator(64),
        jnp.asarray(np.random.default_rng(1).standard_normal((k, 64, 64))),
        tol=1e-8, max_iterations=100,
    )
    assert not bool(plain.converged)


def test_degenerate_start_block():
    """Duplicate and zero rows in X0 are replaced by deterministic
    fallback directions — the fixed-shape substitute for dynamic basis
    shrinking."""
    n, k = 24, 3
    op = gt.poisson_operator(n)
    row = jnp.asarray(np.random.default_rng(3).standard_normal((n, n)))
    X0 = jnp.stack([row, row, jnp.zeros((n, n))])
    res = gt.lobpcg(op, X0, tol=1e-7, max_iterations=400)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), _poisson_eigs(n, k), rtol=1e-8
    )


def test_sharded_parity():
    from jax.sharding import NamedSharding, PartitionSpec

    from gmres_tpu.parallel.mesh import solver_mesh

    mesh = solver_mesh(8)
    n, k = 64, 4
    op = gt.poisson_operator(n)
    m = gt.poisson_multigrid_preconditioner(n)
    X0 = jnp.asarray(np.random.default_rng(1).standard_normal((k, n, n)))
    base = gt.lobpcg(op, X0, tol=1e-8, max_iterations=100, M=m)
    X0_sh = jax.device_put(
        X0, NamedSharding(mesh, PartitionSpec(None, "grid", None))
    )
    sh = jax.jit(
        lambda x: gt.lobpcg(op, x, tol=1e-8, max_iterations=100, M=m)
    )(X0_sh)
    assert bool(sh.converged)
    assert abs(int(base.iterations) - int(sh.iterations)) <= 2
    np.testing.assert_allclose(
        np.asarray(sh.eigenvalues), np.asarray(base.eigenvalues),
        rtol=1e-9,
    )


def test_complex_hermitian_eigenpairs():
    """Complex HPD operator: the conjugate-correct Gram/SVQB path
    computes the same smallest eigenpairs numpy's eigh does
    (preconditioned with A⁻¹ so the test budget stays small; tol 1e-6
    because the LAST pair's residual floor sits near 1e-7 without
    guard vectors — the eigenvalues themselves land at 1e-14)."""
    rng = np.random.default_rng(7)
    d, k = 50, 3
    bmat = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    a = bmat.conj().T @ bmat + np.eye(d)
    aj = jnp.asarray(a)
    a_inv = jnp.asarray(np.linalg.inv(a))
    X0 = jnp.asarray(rng.standard_normal((k, d))
                     + 1j * rng.standard_normal((k, d)))
    res = gt.lobpcg(lambda v: aj @ v, X0, tol=1e-6, max_iterations=60,
                    M=lambda v: a_inv @ v)
    assert bool(res.converged)
    w, v = np.linalg.eigh(a)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), w[:k],
                               rtol=1e-9)
    for i in range(k):
        xi = np.asarray(res.x[i])
        assert abs(abs(np.vdot(v[:, i], xi)) - 1.0) < 1e-6


def test_deep_tolerance_below_sqrt_eps():
    """Regression: the degenerate-row floor must be RELATIVE to the
    block (an absolute √eps floor noise-replaced every residual
    direction once the block got small, stalling any tol below
    ~1.5e-8)."""
    d, k = 60, 3
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lam = np.linspace(0.5, 40.0, d)
    a = jnp.asarray((q * lam) @ q.T)
    X0 = jnp.asarray(rng.standard_normal((k, d)))
    res = gt.lobpcg(lambda v: a @ v, X0, tol=5e-12, max_iterations=800)
    assert bool(res.converged)
    assert float(jnp.max(res.residuals)) < 5e-12


def test_guard_vectors_accelerate_last_pair():
    """guard=2: the slow-converging LAST pair gets trailing basis
    vectors to resolve its spectral coupling — measured 23 → 11
    iterations on this operator — while the returned shapes stay
    (k,)."""
    rng = np.random.default_rng(7)
    d, k = 50, 3
    bmat = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    a = bmat.conj().T @ bmat + np.eye(d)
    aj = jnp.asarray(a)
    a_inv = jnp.asarray(np.linalg.inv(a))
    X0 = jnp.asarray(rng.standard_normal((k, d))
                     + 1j * rng.standard_normal((k, d)))
    res = gt.lobpcg(lambda v: aj @ v, X0, tol=1e-9, max_iterations=100,
                    M=lambda v: a_inv @ v, guard=2)
    assert bool(res.converged)
    assert res.eigenvalues.shape == (k,) and res.x.shape[0] == k
    np.testing.assert_allclose(np.asarray(res.eigenvalues),
                               np.linalg.eigvalsh(np.asarray(a))[:k],
                               rtol=1e-10)
    bare = gt.lobpcg(lambda v: aj @ v, X0, tol=1e-9, max_iterations=100,
                     M=lambda v: a_inv @ v)
    assert int(res.iterations) < int(bare.iterations)


def test_generalized_pencil_scipy_oracle():
    """A x = lam B x with a varying SPD diagonal mass operator:
    eigenvalues/vectors match scipy.linalg.eigh(a, b), and the
    returned block is B-orthonormal."""
    import scipy.linalg

    n, k = 16, 4
    a = np.asarray(gt.poisson_matrix(n))
    rng = np.random.default_rng(9)
    m_diag = 1.0 + 0.5 * rng.random(n * n)
    mj = jnp.asarray(m_diag.reshape(n, n))
    aj = jnp.asarray(a)

    def A(v):
        return gt.poisson_apply(v)

    def B(v):
        return mj * v

    X0 = jnp.asarray(rng.standard_normal((k, n, n)))
    res = gt.lobpcg(A, X0, tol=1e-8, max_iterations=500, B=B,
                    M=gt.poisson_multigrid_preconditioner(n), guard=2)
    assert bool(res.converged)
    w_ref, v_ref = scipy.linalg.eigh(a, np.diag(m_diag))
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), w_ref[:k], rtol=1e-7
    )
    # B-orthonormality of the returned block.
    xf = np.asarray(res.x).reshape(k, -1)
    gram = xf @ np.diag(m_diag) @ xf.T
    np.testing.assert_allclose(gram, np.eye(k), atol=1e-7)
    # Residuals are generalized: ||A x - lam B x|| small.
    for i in range(k):
        r = a @ xf[i] - w_ref[i] * m_diag * xf[i]
        assert np.linalg.norm(r) < 1e-6


def test_generalized_reduces_to_standard_with_identity_B():
    n, k = 24, 3
    A = gt.poisson_operator(n)
    rng = np.random.default_rng(4)
    X0 = jnp.asarray(rng.standard_normal((k, n, n)))
    std = gt.lobpcg(A, X0, tol=1e-7, max_iterations=300)
    gen = gt.lobpcg(A, X0, tol=1e-7, max_iterations=300,
                    B=lambda v: v)
    assert bool(std.converged) and bool(gen.converged)
    np.testing.assert_allclose(
        np.asarray(gen.eigenvalues), np.asarray(std.eigenvalues),
        rtol=1e-9,
    )


def test_rtol_scales_with_eigenvalue():
    """rtol thresholds each pair by its own |λ| — the scale-appropriate
    stop when eigenvalues carry the grid's h² factor. At rtol=1e-3 the
    solve must stop well before the absolute-1e-8 iteration count while
    still resolving the eigenvalues to ~rtol accuracy."""
    import math

    n, k = 64, 3
    op = gt.poisson_operator(n)
    m = gt.poisson_multigrid_preconditioner(n)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (k, n, n),
                           dtype=jnp.float64)
    tight = gt.lobpcg(op, x0, tol=1e-10, M=m, max_iterations=200)
    loose = gt.lobpcg(op, x0, tol=0.0, rtol=1e-3, M=m,
                      max_iterations=200)
    assert bool(loose.converged)
    assert int(loose.iterations) < int(tight.iterations)
    exact = sorted(
        4.0 - 2 * math.cos(i * math.pi / (n + 1))
        - 2 * math.cos(j * math.pi / (n + 1))
        for i in range(1, k + 2) for j in range(1, k + 2)
    )[:k]
    got = np.sort(np.asarray(loose.eigenvalues))
    np.testing.assert_allclose(got, exact, rtol=1e-4)
    # per-pair residuals satisfy the documented threshold
    lam = np.asarray(loose.eigenvalues)
    res = np.asarray(loose.residuals)
    assert (res < 1e-3 * np.abs(lam) + 1e-15).all()
