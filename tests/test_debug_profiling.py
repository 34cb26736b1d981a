"""Debug-mode numeric checking and profiling helpers (SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

import gmres_tpu as gt
from gmres_tpu.types import SolverStatus
from gmres_tpu.utils.debug import finite_checked, run_checked
from gmres_tpu.utils.profiling import measure_bandwidth, stencil_roofline


def _nan_operator(n):
    op = gt.poisson_operator(n)

    def bad(x):
        y = op(x)
        return y.at[0, 0].set(jnp.nan)

    return bad


def test_finite_checked_raises_on_nan():
    n = 8
    bad = finite_checked(_nan_operator(n), "poisson+nan")
    x = jnp.ones((n, n))
    with pytest.raises(checkify.JaxRuntimeError, match="non-finite"):
        run_checked(bad, x)


def test_finite_checked_passes_clean():
    n = 8
    ok = finite_checked(gt.poisson_operator(n))
    y = run_checked(ok, jnp.ones((n, n)))
    np.testing.assert_allclose(y, gt.poisson_apply(jnp.ones((n, n))))


def test_gmres_nan_operator_reports_breakdown():
    """NaN from the operator surfaces as BREAKDOWN, not a silent run
    to max_restarts."""
    n = 8
    bad = _nan_operator(n)
    b = gt.poisson_apply(jnp.ones((n, n)))
    res = gt.gmres(bad, b, restart=5, tol=1e-10, max_restarts=50,
                   compute_v_err=False)
    assert int(res.status) == SolverStatus.BREAKDOWN
    assert int(res.restarts) < 50


def test_cg_nan_operator_reports_breakdown():
    n = 8
    res = gt.cg(_nan_operator(n), gt.poisson_apply(jnp.ones((n, n))),
                tol=1e-10, max_iterations=100)
    assert int(res.status) == SolverStatus.BREAKDOWN


def test_measure_bandwidth_and_roofline():
    out = stencil_roofline(64, dtype=jnp.float32, reps=3)
    assert out["gbps"] > 0 and out["seconds"] > 0
    out2 = measure_bandwidth(lambda x: x * 2.0, jnp.ones((64, 64)),
                             bytes_moved=2 * 64 * 64 * 8, reps=3)
    assert out2["gbps"] > 0
