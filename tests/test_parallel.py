"""SPMD distribution tests on the 8-virtual-device CPU mesh: the same
solver code, sharded inputs, identical iteration counts — the
fake-multi-device harness the reference lacks (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmres_tpu import cg, gmres, bicgstab, chebyshev_preconditioner
from gmres_tpu.models.poisson import poisson_apply
from gmres_tpu.parallel.mesh import (
    grid_sharding,
    shard_grid_vector,
    solver_mesh,
)
from gmres_tpu.types import SolverStatus


@pytest.fixture(scope="module")
def mesh():
    return solver_mesh(8)


@pytest.fixture(scope="module")
def problem(mesh):
    nsize = 64
    b = poisson_apply(jnp.ones((nsize, nsize)))
    b_sh = shard_grid_vector(b, mesh)
    return b, b_sh


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_cg_sharded_matches_unsharded(mesh, problem):
    b, b_sh = problem
    m_inv = chebyshev_preconditioner(poisson_apply, 0.2, 8.2)
    f = jax.jit(lambda bb: cg(poisson_apply, bb, tol=1e-9, M=m_inv))
    r_plain = f(b)
    r_sh = f(b_sh)
    assert r_sh.status == SolverStatus.CONVERGED
    assert int(r_sh.iterations) == int(r_plain.iterations)
    assert np.max(np.abs(np.asarray(r_sh.x) - 1.0)) < 1e-8
    # solution stays sharded on the grid axis
    assert r_sh.x.sharding.is_equivalent_to(grid_sharding(mesh), 2)


@pytest.mark.parametrize("variant", ["householder", "mgsr"])
def test_gmres_sharded_matches_unsharded(mesh, problem, variant):
    b, b_sh = problem
    m_inv = chebyshev_preconditioner(poisson_apply, 0.2, 8.2)
    f = jax.jit(
        lambda bb: gmres(poisson_apply, bb, restart=30, tol=1e-10,
                         M=m_inv, variant=variant, compute_v_err=False)
    )
    r_plain = f(b)
    r_sh = f(b_sh)
    assert r_sh.status == SolverStatus.CONVERGED
    assert int(r_sh.iterations) == int(r_plain.iterations)
    assert int(r_sh.restarts) == int(r_plain.restarts)
    assert np.max(np.abs(np.asarray(r_sh.x) - 1.0)) < 1e-7


def test_bicgstab_sharded(mesh, problem):
    b, b_sh = problem
    f = jax.jit(lambda bb: bicgstab(poisson_apply, bb, tol=1e-9))
    r_sh = f(b_sh)
    assert r_sh.status == SolverStatus.CONVERGED
    assert np.max(np.abs(np.asarray(r_sh.x) - 1.0)) < 1e-7


def test_shard_grid_vector_indivisible_error():
    import pytest

    from gmres_tpu.parallel.mesh import shard_grid_vector, solver_mesh

    mesh = solver_mesh(8)
    with pytest.raises(ValueError, match="divide evenly"):
        shard_grid_vector(jnp.ones((10, 10)), mesh)
