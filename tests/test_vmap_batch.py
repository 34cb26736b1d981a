"""Batched solves via jax.vmap — the TPU-native answer to "many
independent systems": one dispatch, lane-masked while_loops, MXU-batched
stencils. Pins the README claim ("… or jax.vmap any solver") with
per-lane parity against sequential solves.

No reference counterpart: the reference's OpenMP drivers run one
system per program invocation (tests/*.f90); batching over systems,
operator PARAMETERS, or nonlinear continuation values is a functional-
transform capability."""

import jax
import jax.numpy as jnp
import numpy as np

import gmres_tpu as gt
from gmres_tpu.models.convection_diffusion import (
    convection_diffusion_apply,
)
from gmres_tpu.models.poisson import poisson_apply


def test_vmap_cg_multi_rhs_per_lane_parity():
    n = 32
    op = gt.poisson_operator(n)
    rng = np.random.default_rng(3)
    bs = jnp.asarray(rng.standard_normal((6, n, n)))

    batched = jax.jit(
        jax.vmap(lambda b: gt.cg(op, b, tol=1e-10, max_iterations=500))
    )(bs)
    for k in range(6):
        single = gt.cg(op, bs[k], tol=1e-10, max_iterations=500)
        # vmap's while_loop batching masks finished lanes, so each
        # lane reproduces its sequential trajectory exactly.
        assert int(batched.iterations[k]) == int(single.iterations)
        assert int(batched.status[k]) == int(single.status)
        np.testing.assert_allclose(
            np.asarray(batched.x[k]), np.asarray(single.x), atol=1e-12
        )


def test_vmap_over_operator_parameters():
    # One dispatch sweeps the operator FAMILY: per-lane convection
    # strengths, not just per-lane right-hand sides.
    n = 32
    gammas = jnp.asarray([0.0, 0.2, 0.4, 0.8])
    b = jnp.ones((n, n))

    def solve(gx):
        op = lambda v: convection_diffusion_apply(v, gx, 0.5 * gx)
        return gt.bicgstab(op, op(b), tol=1e-9, max_iterations=2000)

    res = jax.jit(jax.vmap(solve))(gammas)
    assert bool(jnp.all(res.status == gt.SolverStatus.CONVERGED))
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)
    single = solve(gammas[2])
    # batching changes XLA fusion and hence last-ulp rounding; the
    # trajectory is identical up to a ±1 tol-boundary crossing
    assert abs(int(res.iterations[2]) - int(single.iterations)) <= 1


def test_vmap_newton_continuation():
    # Nonlinear continuation: the whole Bratu λ-sweep is ONE batched
    # JFNK dispatch; ‖u‖ grows monotonically toward the fold λ*≈6.8.
    n = 24
    h2 = (1.0 / (n + 1)) ** 2
    lams = jnp.asarray([1.0, 3.0, 5.0, 6.5])

    def solve(lam):
        F = lambda u: poisson_apply(u) - (lam * h2) * jnp.exp(u)
        return gt.newton_krylov(F, jnp.zeros((n, n)), tol=1e-10,
                                restart=20)

    res = jax.jit(jax.vmap(solve))(lams)
    assert bool(jnp.all(res.status == gt.SolverStatus.CONVERGED))
    umax = np.asarray(jnp.max(res.x, axis=(1, 2)))
    assert np.all(np.diff(umax) > 0)
    single = solve(lams[3])
    np.testing.assert_allclose(
        np.asarray(res.x[3]), np.asarray(single.x), atol=1e-9
    )
