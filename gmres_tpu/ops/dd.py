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

Ordering hazard encoded here (learned by measurement, round 4): every
transformation below depends on IEEE-754 round-to-nearest per
operation — and XLA does NOT fully guarantee that: its LLVM CPU
codegen contracts mul+add pairs into FMAs inside fused loops, which
silently replaces fl(a·b) with the unrounded product and collapsed a
jitted dd_mul_scalar to plain f32 accuracy while the eager op-by-op
run was exact. The defenses: (1) two_prod uses bit-masked exact 12-bit
splits so every multiply is EXACT and contraction becomes
value-preserving by construction; (2) the sums' intermediates are
fenced with optimization_barrier against pattern rewrites (skipped
via ``no_fences()`` inside Mosaic kernels, which lack the primitive
and never run the XLA simplifier; compiled-kernel accuracy is pinned
on real TPU).

Range contract: dd inherits f32's EXPONENT range (~1e±38), not f64's
~1e±308 — a dd chain on values outside that overflows/underflows where
f64 would not (measured: 50 unnormalized Laplacian applications reach
1e45 and NaN the hi component). Solver vectors are norm-controlled, so
this binds only synthetic power-iteration-like chains.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


_FENCES_ON = [True]


@contextlib.contextmanager
def no_fences():
    """Disable the XLA value fences while tracing a Mosaic kernel
    body: Pallas TPU lowering has no optimization_barrier primitive,
    and Mosaic compiles from its own dialect — the XLA HLO simplifier
    whose false rewrites the fences exist to block never sees kernel
    internals. The kernels' numerics are additionally protected by
    construction: two_prod's multiplies are all EXACT (see below), so
    even an FMA-contracting backend cannot change any value
    (accuracy pinned on real TPU by the compiled-kernel probes)."""
    _FENCES_ON.append(False)
    try:
        yield
    finally:
        _FENCES_ON.pop()


def _fence(x):
    """Opaque value barrier. XLA's LLVM codegen CONTRACTS mul+add
    pairs into FMAs and its simplifier can rewrite real-number
    identities — both false in floating point for the rounding-error
    terms this module exists to capture (measured: a jitted
    dd_mul_scalar collapsed to the plain f32 product, 2.2e-7 instead
    of 1e-14, while the EAGER op-by-op run was exact). Fencing the
    rounded intermediates of each error-free transformation blocks
    value movement across the boundary; the exact-product two_prod
    below removes the contraction hazard by construction, and the
    fences keep the sums' identities safe from pattern rewrites."""
    if not _FENCES_ON[-1]:
        return x
    return jax.lax.optimization_barrier(x)


def two_sum(a, b):
    """Error-free sum: s + e == a + b exactly, s = fl(a+b) (Knuth)."""
    a, b = _fence((a, b))
    s = _fence(a + b)
    bb = _fence(s - a)
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free sum assuming |a| ≥ |b| (Dekker fast two-sum)."""
    a, b = _fence((a, b))
    s = _fence(a + b)
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


def _split12(a):
    """Exact 12+12-bit significand split by MANTISSA BIT MASKING
    (truncate the low 12 explicit mantissa bits), not Dekker's
    2¹²+1-multiply trick. Why: XLA:CPU's LLVM codegen CONTRACTS
    mul-then-add/sub pairs into FMAs (observed in the compiled HLO's
    kLoop fusions; --xla_allow_excess_precision=false does not stop
    it), and Dekker's split is exactly such a pair — fma(a, 4097, −t)
    computes a DIFFERENT (unrounded) value and the split collapses.
    The masked split uses only bitwise ops plus one subtraction of
    exactly-representable values, so no transformation can change it.
    a_hi keeps ≤12 significand bits; a_lo = a − a_hi is exact and also
    ≤12 bits, so every 12×12 partial product below is EXACT in f32."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    a_hi = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFFF000), jnp.float32
    )
    return a_hi, a - a_hi


def two_prod(a, b):
    """Error-free product: s + e == a·b to O(2⁻⁴⁸) relative, by exact
    12-bit partial products. FMA-CONTRACTION-IMMUNE by construction:
    every multiply here is EXACT (12×12-bit significands fit f32's
    24), so a contracted fma(x, y, z) = round(exact + z) equals the
    uncontracted round(round(exact) + z) bit for bit — the compiler
    cannot change any value. (The classical Dekker form is NOT immune:
    its p = fl(a·b) is a bare rounded multiply, and a consumer add
    contracting it to fma(a, b, c) bypasses the rounding the algorithm
    depends on — measured 2.2e-7 instead of 1e-14 on XLA:CPU.)"""
    a, b = _fence((a, b))
    a_hi, a_lo = _split12(a)
    b_hi, b_lo = _split12(b)
    p1 = a_hi * b_hi  # all four partials exact in f32
    p2 = a_hi * b_lo
    p3 = a_lo * b_hi
    p4 = a_lo * b_lo
    s, e = two_sum(p2, p3)
    e = e + p4
    s, e2 = two_sum(p1, s)
    return quick_two_sum(s, e + e2)


def dd_mul_scalar(a, c):
    """dd × dd-scalar ((c_hi, c_lo), e.g. a stencil coefficient split
    from f64): relative error O(2⁻⁹⁶)."""
    a_hi, a_lo = a
    c_hi, c_lo = c
    p, e = two_prod(a_hi, c_hi)
    e = e + (a_hi * c_lo + a_lo * c_hi)
    return quick_two_sum(p, e)


def coef_split12(c):
    """Host/XLA-side 12-bit pre-split of an f64 coefficient VECTOR into
    (ca, cb, c_lo) f32 triples with ca + cb == hi(c) exactly, each
    factor ≤12 significand bits. Exists because Mosaic's tpu.bitcast
    accepts only VECTOR operands — a kernel cannot _split12 its SMEM
    coefficient scalars, so the split happens before the pallas_call
    and the kernel multiplies with ``dd_mul_presplit``."""
    hi, lo = dd_from_f64(c)
    ca, cb = _split12(hi)
    return ca, cb, lo


def dd_mul_presplit(a, ca, cb, c_lo):
    """dd × pre-split scalar (see coef_split12): every multiply is
    exact (vector operand split in-kernel via the vector-legal
    bitcast; ca/cb already ≤12 bits), so the product is FMA-
    contraction-immune like two_prod."""
    a_hi, a_lo = a
    ah, al = _split12(a_hi)
    p1 = ah * ca  # exact: 12×12-bit significands
    p2 = ah * cb
    p3 = al * ca
    p4 = al * cb
    s, e = two_sum(p2, p3)
    e = e + p4
    s, e2 = two_sum(p1, s)
    e = e + e2
    # correction terms (not exactness-critical)
    e = e + (a_hi * c_lo + a_lo * (ca + cb))
    return quick_two_sum(s, e)


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
