"""In-kernel RDMA halo-exchange stencil (ops/stencil_rdma.py) under
Pallas TPU interpret mode — simulated remote DMAs + semaphores on the
8-virtual-device CPU mesh. Single-chip hardware cannot exercise RDMA,
so this simulation (with race detection) IS the correctness harness;
the ppermute route (tests/test_halo.py) is the hardware-validated one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.models.convection_diffusion import (
    convection_diffusion_apply,
    convection_diffusion_coefs,
)
from gmres_tpu.parallel.halo import (
    halo_chebyshev_preconditioner,
    rdma_chebyshev_preconditioner,
    rdma_stencil_operator,
)
from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh


@pytest.fixture(scope="module")
def mesh():
    return solver_mesh(8)


def test_rdma_poisson_matches_jnp(mesh):
    n = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    op = rdma_stencil_operator(mesh, interpret=True)
    y = op(shard_grid_vector(x, mesh))
    np.testing.assert_allclose(
        y, gt.poisson_apply(x), rtol=1e-5, atol=1e-5
    )


def test_rdma_asymmetric_coefs(mesh):
    """south≠north coefficients catch swapped halo directions: the top
    halo must be weighted by the SOUTH coefficient and vice versa."""
    n = 32
    coefs = convection_diffusion_coefs(0.7, 0.3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    op = rdma_stencil_operator(mesh, coefs, interpret=True)
    y = op(shard_grid_vector(x, mesh))
    ref = convection_diffusion_apply(x, 0.7, 0.3)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_rdma_race_free(mesh):
    """Interpret-mode vector-clock race detection over the semaphore
    protocol (barrier + send/recv predication at the chain ends)."""
    n = 32
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, n)).astype(np.float32)
    )
    op = rdma_stencil_operator(mesh, interpret=True, detect_races=True)
    y = op(shard_grid_vector(x, mesh))
    np.testing.assert_allclose(
        y, gt.poisson_apply(x), rtol=1e-5, atol=1e-5
    )


def test_rdma_chebyshev_matches_ppermute_route(mesh):
    """The affine-fused RDMA preconditioner equals the ppermute-route
    fused Chebyshev (same math, kernel-level comms)."""
    n = 32
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    r_sh = shard_grid_vector(r, mesh)
    m_rdma = rdma_chebyshev_preconditioner(
        mesh, 0.2, 8.2, interpret=True, detect_races=True
    )
    m_ref = halo_chebyshev_preconditioner(mesh, 0.2, 8.2)
    np.testing.assert_allclose(
        m_rdma(r_sh), m_ref(r_sh.astype(jnp.float64)).astype(jnp.float32),
        rtol=1e-4, atol=1e-5,
    )


def test_rdma_preconditioned_gmres(mesh):
    """Full preconditioned GMRES where BOTH the operator and the
    preconditioner communicate via in-kernel RDMA."""
    n = 32
    a = rdma_stencil_operator(mesh, interpret=True)
    m = rdma_chebyshev_preconditioner(mesh, 0.2, 8.2, interpret=True)
    b = shard_grid_vector(
        gt.poisson_apply(jnp.ones((n, n))).astype(jnp.float32), mesh
    )
    res = gt.gmres(a, b, restart=30, tol=1e-5, M=m, max_restarts=10,
                   compute_v_err=False)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-3)


def test_rdma_operator_drives_cg(mesh):
    """LinearOperator contract: the RDMA operator composes with the
    solvers untouched (interfaces.f90:12-18 inversion of control)."""
    n = 32
    op = rdma_stencil_operator(mesh, interpret=True)
    b = shard_grid_vector(
        gt.poisson_apply(jnp.ones((n, n))).astype(jnp.float32), mesh
    )
    # tol within f32's attainable TRUE residual: cg now certifies
    # ‖b − Ax‖ at exit, and at f32 the recursion can claim 1e-5 while
    # the truth floors near ~2.5e-5 (the old tol asserted a lie).
    res = gt.cg(op, b, tol=1e-4, max_iterations=500)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-3)
