"""Double-double f32-pair stencil (ops/dd.py, ops/stencil.py dd
route). Oracles: exact error-free-transformation identities checked in
f64, the f64 stencil for single and chained applications (interpret
mode — the repo convention for Pallas kernels), multi-block halo
parity, and the documented ~2^-48 accuracy contract."""

import jax
import jax.numpy as jnp
import numpy as np

from gmres_tpu.ops.dd import (
    dd_add,
    dd_from_f64,
    dd_scale_pow2,
    dd_to_f64,
    two_sum,
)
from gmres_tpu.ops.stencil import (
    stencil_5pt_apply,
    stencil_5pt_dd_pallas_blocked,
    stencil_5pt_f64_dd_chain,
    stencil_5pt_f64_via_dd,
)


def test_two_sum_is_error_free():
    """s + e must equal a + b EXACTLY (checked in f64, where the f32
    inputs and both f32 outputs embed without rounding)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(1000), dtype=jnp.float32)
    b = jnp.asarray(
        rng.standard_normal(1000) * 1e-4, dtype=jnp.float32
    )
    s, e = two_sum(a, b)
    lhs = s.astype(jnp.float64) + e.astype(jnp.float64)
    rhs = a.astype(jnp.float64) + b.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


def test_split_roundtrip_accuracy():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(4096) * 10.0 ** rng.integers(
        -6, 6, size=4096))
    back = dd_to_f64(dd_from_f64(x))
    rel = np.max(np.abs(np.asarray(back - x)) / np.abs(np.asarray(x)))
    assert rel < 2.0 ** -48


def test_dd_add_beats_f32():
    """Accumulating 10k f32 terms: dd reproduces the exact sum of the
    (f32-rounded) inputs to the last f64 digit, where the plain f32
    accumulator drifts to ~3e-6."""
    rng = np.random.default_rng(2)
    terms = np.asarray(
        rng.standard_normal(10_000), dtype=np.float32
    )
    exact = np.sum(terms.astype(np.float64))
    acc = (jnp.float32(0), jnp.float32(0))
    f32 = jnp.float32(0)
    for t in jnp.asarray(terms):
        acc = dd_add(acc, (t, jnp.float32(0)))
        f32 = f32 + t
    dd_err = abs(float(dd_to_f64(acc)) - exact) / abs(exact)
    f32_err = abs(float(f32) - exact) / abs(exact)
    assert dd_err < 1e-14
    assert f32_err > 1e-7  # the comparison has teeth


def test_scale_pow2_exact():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(100))
    four = dd_to_f64(dd_scale_pow2(dd_from_f64(x), 4.0))
    np.testing.assert_array_equal(
        np.asarray(four), np.asarray(4.0 * dd_to_f64(dd_from_f64(x)))
    )


def _rel(a, b):
    return float(
        jnp.linalg.norm((a - b).ravel()) / jnp.linalg.norm(b.ravel())
    )


def test_single_application_vs_f64_oracle():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((32, 32)))
    y_dd = stencil_5pt_f64_via_dd(x, interpret=True)
    y64 = stencil_5pt_apply(x)
    assert y_dd.dtype == jnp.float64
    assert _rel(y_dd, y64) < 1e-13


def test_multiblock_halo_parity():
    """Force 8 row blocks at n=64: the inter-block halo windows and
    edge Dirichlet masking must reproduce the single-block result."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((64, 64)))
    hi, lo = dd_from_f64(x)
    one = stencil_5pt_dd_pallas_blocked(hi, lo, interpret=True)
    many = stencil_5pt_dd_pallas_blocked(
        hi, lo, interpret=True, block_rows=8
    )
    np.testing.assert_array_equal(np.asarray(one[0]), np.asarray(many[0]))
    np.testing.assert_array_equal(np.asarray(one[1]), np.asarray(many[1]))
    assert _rel(dd_to_f64(many), stencil_5pt_apply(x)) < 1e-13


def test_chained_applications_error_growth():
    """20 dd-space applications (split once) against the f64 chain:
    the error stays ~k·2^-48 of the result norm — the preconditioner-
    grade accuracy contract, measured, for the DESIGN.md note. (k is
    capped because the unnormalized Laplacian amplifies ~8x per apply
    and dd inherits f32's ~1e38 exponent RANGE — the documented
    contract: solver vectors are norm-controlled.)"""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((32, 32)))
    k = 20
    y_dd = stencil_5pt_f64_dd_chain(x, k, interpret=True)
    y64 = x
    for _ in range(k):
        y64 = stencil_5pt_apply(y64)
    assert _rel(y_dd, y64) < 1e-12


def test_two_prod_error_free():
    """p + e == a·b to ≤2⁻⁴⁸ relative (the exact-partial-products form
    rounds once in its tail accumulation — see the two_prod docstring
    for why the bit-exact Dekker form is NOT usable under XLA:CPU's
    FMA contraction), under BOTH eager and jit execution."""
    from gmres_tpu.ops.dd import two_prod

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal(1000), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000), dtype=jnp.float32)
    rhs = np.asarray(a).astype(np.float64) * np.asarray(b).astype(
        np.float64)
    for f in (two_prod, jax.jit(two_prod)):
        p, e = f(a, b)
        lhs = np.asarray(p).astype(np.float64) + np.asarray(e).astype(
            np.float64)
        # normalize by the PRODUCT SCALE, not per-element (near-zero
        # products make per-element relative error meaningless)
        err = np.max(np.abs(lhs - rhs)) / np.max(np.abs(rhs))
        assert err < 2.0 ** -47


def test_general_coefficients_vs_f64_oracle():
    """Convection-diffusion coefficients (non-power-of-two — the
    Dekker two_prod path) against the f64 general stencil."""
    from gmres_tpu.models.convection_diffusion import (
        convection_diffusion_coefs,
    )
    from gmres_tpu.ops.stencil import (
        stencil_5pt_general,
        stencil_5pt_general_f64_via_dd,
    )

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((64, 64)))
    coefs = convection_diffusion_coefs(0.4, 0.2)
    y_dd = stencil_5pt_general_f64_via_dd(x, coefs, interpret=True)
    y64 = stencil_5pt_general(x, *coefs)
    assert _rel(y_dd, y64) < 1e-13


def test_general_multiblock_parity():
    from gmres_tpu.ops.dd import dd_from_f64, dd_to_f64
    from gmres_tpu.ops.stencil import (
        stencil_5pt_dd_general_pallas_blocked,
    )

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((64, 64)))
    coefs = jnp.asarray([4.3, -1.2, -0.7, -1.9, -0.1])
    hi, lo = dd_from_f64(x)
    one = stencil_5pt_dd_general_pallas_blocked(
        hi, lo, coefs, interpret=True
    )
    many = stencil_5pt_dd_general_pallas_blocked(
        hi, lo, coefs, interpret=True, block_rows=8
    )
    np.testing.assert_array_equal(np.asarray(one[0]), np.asarray(many[0]))
    np.testing.assert_array_equal(np.asarray(one[1]), np.asarray(many[1]))
    # and it reduces exactly to the Poisson kernel at (4,-1,-1,-1,-1)
    from gmres_tpu.ops.stencil import stencil_5pt_dd_pallas_blocked

    pc = jnp.asarray([4.0, -1.0, -1.0, -1.0, -1.0])
    g = stencil_5pt_dd_general_pallas_blocked(hi, lo, pc,
                                              interpret=True)
    p = stencil_5pt_dd_pallas_blocked(hi, lo, interpret=True)
    # the general kernel's two_prod rounds its tail accumulation
    # (2^-48-level), the power-of-two specialization is exact — match
    # to absolute dd precision, not bitwise
    np.testing.assert_allclose(
        np.asarray(dd_to_f64(g)), np.asarray(dd_to_f64(p)), atol=1e-12
    )
