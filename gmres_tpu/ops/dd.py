"""Double-double (f32-pair) arithmetic — the TPU-native f64 substitute
for Pallas kernels.

Why this exists: the reference is ``real(8)`` end-to-end (SURVEY §7,
``src/poisson.f90``), but the TPU has no native f64 datapath — XLA
*emulates* f64 (measured: the jnp f64 stencil reaches only 0.09–0.23
of HBM peak, ``artifacts/roofline_tpu.jsonl``) and Mosaic/Pallas does
not admit f64 operands at all. The classical fix is error-free f32
transformations (Dekker 1971; Knuth TAOCP §4.2.2; Hida–Li–Bailey QD):
represent a value as an unevaluated sum ``hi + lo`` of two f32 with
|lo| ≤ ulp(hi)/2 (≈ 49-bit significand) and propagate exact rounding
errors through two_sum/quick_two_sum chains. Every helper here is
plain jnp on f32 pairs, so the SAME code runs inside a Mosaic kernel,
in interpret mode, and in plain XLA (the correctness oracle).

Numerical contract: one dd add has relative error O(2⁻⁹⁶); rounding a
dd back to a single number loses to the ~2⁻⁴⁹ representation bound.
That is BELOW f64's 2⁻⁵³ — a dd operator application is accurate to
~1e-14 relative, not 1e-16. Consequence (documented in
docs/DESIGN.md): the dd stencil is the right engine for f64-path
*preconditioner* applications and for residual computations down to
~1e-13·‖A‖‖x‖, but an f64 parity workload chasing an ABSOLUTE 1e-15
residual (the restart sweep) must keep the outer operator on the XLA
f64 route — attainable accuracy is set by the operator's ε.

Ordering hazard encoded here: every transformation below depends on
IEEE-754 round-to-nearest per operation WITHOUT reassociation. XLA and
Mosaic preserve per-op IEEE semantics (no fast-math), which is what
makes these kernels legal.

Range contract: dd inherits f32's EXPONENT range (~1e±38), not f64's
~1e±308 — a dd chain on values outside that overflows/underflows where
f64 would not (measured: 50 unnormalized Laplacian applications reach
1e45 and NaN the hi component). Solver vectors are norm-controlled, so
this binds only synthetic power-iteration-like chains.
"""

from __future__ import annotations

import jax.numpy as jnp


def two_sum(a, b):
    """Error-free sum: s + e == a + b exactly, s = fl(a+b) (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free sum assuming |a| ≥ |b| (Dekker fast two-sum)."""
    s = a + b
    e = b - (s - a)
    return s, e


def dd_add(a, b):
    """Accurate dd + dd (Hida–Li–Bailey ``ieee_add``): full error
    propagation, safe under cancellation (the stencil's 4x − ΣN has
    heavy cancellation on smooth fields — the *sloppy* variant's
    O(ε²|a|+|b|) bound is not relative there and loses digits)."""
    a_hi, a_lo = a
    b_hi, b_lo = b
    s1, s2 = two_sum(a_hi, b_hi)
    t1, t2 = two_sum(a_lo, b_lo)
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def dd_neg(a):
    return -a[0], -a[1]

def dd_sub(a, b):
    return dd_add(a, dd_neg(b))


def dd_scale_pow2(a, c: float):
    """Multiply by an exact power of two (and ±1, ±4, …): error-free,
    component-wise. The Poisson stencil's coefficients (4, −1) are all
    of this form, which is why its dd application needs NO two_prod /
    Dekker splitting at all — only the adds carry rounding."""
    return a[0] * c, a[1] * c


def dd_from_f64(x):
    """Split an f64 array into the (hi, lo) f32 pair. Representation
    error ≤ 2⁻⁴⁹ relative (lo is the f32 rounding of the exact f64
    remainder). Runs in XLA (f64 never enters a kernel)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def dd_to_f64(a):
    """Recombine to f64 in XLA (exact: both terms are f32)."""
    return a[0].astype(jnp.float64) + a[1].astype(jnp.float64)
