"""Order-k VMEM-resident Chebyshev kernel vs the jnp recurrence, and
the auto-dispatching stencil preconditioner wrapper."""

import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt
from gmres_tpu.ops.fused import (
    chebyshev_k_poisson_pallas,
    chebyshev_k_scalars,
)
from gmres_tpu.precond.chebyshev import chebyshev_stencil_preconditioner


@pytest.mark.parametrize("order", [2, 4, 16, 64])
def test_chebk_pallas_matches_jnp(order):
    n = 32
    r = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    )
    op = gt.poisson_operator(n)
    z_ref = gt.chebyshev_preconditioner(
        op, 0.005, 8.0, order=order, reference_form=False
    )(r.astype(jnp.float64))
    z = chebyshev_k_poisson_pallas(r, order, 0.005, 8.0, interpret=True)
    rel = float(jnp.max(jnp.abs(z - z_ref)) / jnp.max(jnp.abs(z_ref)))
    assert rel < 5e-4


def test_chebk_scalars_shape():
    theta, delta, steps = chebyshev_k_scalars(0.2, 8.2, 8)
    assert theta == pytest.approx(4.2)
    assert delta == pytest.approx(4.0)
    assert len(steps) == 2 * 7


def test_wrapper_f64_route_matches_general_recurrence():
    n = 24
    r = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)))
    m = chebyshev_stencil_preconditioner(0.005, 8.0, order=8)
    z_ref = gt.chebyshev_preconditioner(
        gt.poisson_operator(n), 0.005, 8.0, order=8, reference_form=False
    )(r)
    np.testing.assert_allclose(m(r), z_ref, rtol=1e-12)


def test_wrapper_routes_agree_at_order2():
    """Both wrapper routes (jnp and Pallas) apply the SAME polynomial
    at every order — an f32 TPU run must not silently get a different
    preconditioner than an f64 run (found in review: the jnp route
    used cbpr2's closed form at order=2 while Pallas ran the
    semi-iteration, an 82% discrepancy)."""
    n = 16
    r32 = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, n)).astype(np.float32)
    )
    m_never = chebyshev_stencil_preconditioner(0.2, 8.2, order=2,
                                               use_pallas="never")
    m_always = chebyshev_stencil_preconditioner(0.2, 8.2, order=2,
                                                use_pallas="always")
    z_jnp = m_never(r32.astype(jnp.float64))
    z_pal = m_always(r32)
    np.testing.assert_allclose(z_pal, z_jnp, rtol=1e-4, atol=1e-6)
    # exact cbpr2 reference parity remains available via
    # chebyshev_preconditioner (reference_form=True default at order 2)
    z_cb = gt.chebyshev_preconditioner(gt.poisson_operator(n), 0.2,
                                       8.2)(r32.astype(jnp.float64))
    assert not np.allclose(z_cb, z_jnp)  # different polynomials, by design


def test_wrapper_drives_gmres():
    n = 48
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    m = chebyshev_stencil_preconditioner(0.005, 8.0, order=16)
    res = gt.gmres(op, b, restart=20, tol=1e-9, M=m,
                   compute_v_err=False)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-6)


@pytest.mark.parametrize("order,block_rows", [(2, 64), (3, 32), (8, 32),
                                              (9, 64)])
def test_chebk_blocked_matches_jnp(order, block_rows):
    """Trapezoidal-tiled blocked Chebyshev: exact vs the jnp
    recurrence, including the per-sweep Dirichlet re-masking of
    out-of-grid window rows (regression: without it only the first and
    last grid rows corrupt — the creep feeds back through the halo)."""
    from gmres_tpu.ops.fused import chebyshev_k_poisson_pallas_blocked
    from gmres_tpu.precond.chebyshev import chebyshev_preconditioner
    from gmres_tpu.ops.stencil import stencil_5pt_apply

    rng = np.random.default_rng(30 + order)
    n = 128
    r = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    ref = chebyshev_preconditioner(
        stencil_5pt_apply, 0.5, 8.0, order=order, reference_form=False
    )(r)
    y = chebyshev_k_poisson_pallas_blocked(
        r, order, 0.5, 8.0, interpret=True, block_rows=block_rows
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=2e-6)


def test_chebk_blocked_order_too_deep_raises():
    from gmres_tpu.ops.fused import chebyshev_k_poisson_pallas_blocked

    with pytest.raises(ValueError, match="halo"):
        chebyshev_k_poisson_pallas_blocked(
            jnp.ones((64, 64), jnp.float32), 40, 0.5, 8.0,
            interpret=True, block_rows=16,
        )


# ---------------------------------------------------------------------------
# Generalized polynomial smoother entry points (damped Jacobi = the
# (a, b) = (0, ω/c₀) special case of the same d-recurrence — used by the
# convection-diffusion multigrid smoothers).
# ---------------------------------------------------------------------------


def _jacobi_oracle(r, coefs, omega, iters):
    from gmres_tpu.ops.stencil import stencil_5pt_general

    step = omega / coefs[0]
    e = step * r
    for _ in range(iters - 1):
        e = e + step * (r - stencil_5pt_general(e, *coefs))
    return e


@pytest.mark.parametrize("iters", [1, 3, 8])
def test_poly_smoother_jacobi_matches_oracle(iters):
    from gmres_tpu.models.convection_diffusion import (
        convection_diffusion_coefs,
        convection_diffusion_coefs_upwind,
    )
    from gmres_tpu.ops.fused import (
        jacobi_k_scalars,
        poly_stencil_smoother_pallas,
    )

    n = 32
    r = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, n)).astype(np.float32)
    )
    for coefs in (convection_diffusion_coefs(0.4, 0.2),
                  convection_diffusion_coefs_upwind(1.6, 0.8)):
        theta, steps = jacobi_k_scalars(0.7, coefs[0], iters)
        z = poly_stencil_smoother_pallas(
            r, theta, tuple(steps), coefs, interpret=True
        )
        z_ref = _jacobi_oracle(r.astype(jnp.float64),
                               coefs, 0.7, iters)
        rel = float(jnp.max(jnp.abs(z - z_ref))
                    / jnp.max(jnp.abs(z_ref)))
        assert rel < 5e-5, (coefs, rel)


@pytest.mark.parametrize("iters,block_rows", [(3, 16), (8, 8)])
def test_poly_smoother_blocked_matches_oracle(iters, block_rows):
    from gmres_tpu.models.convection_diffusion import (
        convection_diffusion_coefs,
    )
    from gmres_tpu.ops.fused import (
        jacobi_k_scalars,
        poly_stencil_smoother_pallas_blocked,
    )

    n = 64
    r = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, n)).astype(np.float32)
    )
    coefs = convection_diffusion_coefs(0.4, 0.2)
    theta, steps = jacobi_k_scalars(0.7, coefs[0], iters)
    z = poly_stencil_smoother_pallas_blocked(
        r, theta, tuple(steps), coefs, interpret=True,
        block_rows=block_rows,
    )
    z_ref = _jacobi_oracle(r.astype(jnp.float64), coefs, 0.7, iters)
    rel = float(jnp.max(jnp.abs(z - z_ref)) / jnp.max(jnp.abs(z_ref)))
    assert rel < 5e-5, rel


def test_poly_smoother_chebyshev_equivalence():
    """chebyshev_k_poisson_pallas is the poly smoother with the
    Chebyshev coefficient schedule — same kernel, same numbers."""
    from gmres_tpu.ops.fused import poly_stencil_smoother_pallas

    n = 32
    r = jnp.asarray(
        np.random.default_rng(3).standard_normal((n, n)).astype(np.float32)
    )
    theta, _, steps = chebyshev_k_scalars(0.005, 8.0, 8)
    z_poly = poly_stencil_smoother_pallas(
        r, theta, tuple(steps), interpret=True
    )
    z_cheb = chebyshev_k_poisson_pallas(r, 8, 0.005, 8.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(z_poly), np.asarray(z_cheb))


def test_routed_general_stencil_cpu_falls_back():
    from gmres_tpu.models.convection_diffusion import (
        convection_diffusion_coefs,
    )
    from gmres_tpu.ops.stencil import (
        stencil_5pt_general,
        stencil_5pt_routed_general,
    )

    n = 16
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((n, n))
    )
    coefs = convection_diffusion_coefs(0.4, 0.2)
    np.testing.assert_array_equal(
        np.asarray(stencil_5pt_routed_general(x, coefs)),
        np.asarray(stencil_5pt_general(x, *coefs)),
    )
