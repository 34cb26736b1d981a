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
