"""C++/OpenMP baseline (native/) vs the JAX solvers — an independent
compiled oracle standing in for the Fortran reference (gfortran is not
in this image, BASELINE.md)."""

import shutil

import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no g++"
)


@pytest.fixture(scope="module")
def loader():
    from native import loader as ld

    ld.load(threads=2)
    return ld


def test_native_stencil_matches_jax(loader):
    n = 48
    x = np.random.default_rng(0).standard_normal((n, n))
    np.testing.assert_allclose(
        loader.stencil(x),
        np.asarray(gt.poisson_apply(jnp.asarray(x))),
        rtol=1e-13, atol=1e-14,
    )


def test_native_pcg_iteration_parity(loader):
    """Same algorithm, same convergence semantics ⇒ same iteration
    count (up to reduction-order noise at the convergence edge)."""
    n = 64
    b = loader.stencil(np.ones((n, n))).reshape(-1)
    x_nat, it_nat, _ = loader.pcg(n, b, tol=1e-9)

    op = gt.poisson_operator(n)
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    res = gt.cg(op, jnp.asarray(b.reshape(n, n)), tol=1e-9,
                max_iterations=10_000, M=m_inv)
    assert abs(int(res.iterations) - it_nat) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x).reshape(-1), x_nat, atol=1e-8
    )


def test_native_hh_gmres_solution_parity(loader):
    n = 48
    b = loader.stencil(np.ones((n, n))).reshape(-1)
    x_nat, it_nat, rst_nat, rel_nat = loader.hh_gmres(
        n, b, m=30, tol=1e-10
    )
    assert rel_nat < 1e-10
    np.testing.assert_allclose(x_nat, 1.0, atol=1e-7)

    op = gt.poisson_operator(n)
    m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)
    res = gt.gmres(op, jnp.asarray(b.reshape(n, n)), restart=30,
                   tol=1e-10, M=m_inv, compute_v_err=False)
    assert bool(res.converged)
    total_jax = int(res.restarts - 1) * 30 + int(res.iterations)
    # Same restarted-Householder structure: restart counts match and
    # total inner iterations agree to within one cycle boundary.
    assert int(res.restarts) == rst_nat
    assert abs(total_jax - it_nat) <= 30
