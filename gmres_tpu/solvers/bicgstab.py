"""BiCGSTAB (van der Vorst) for nonsymmetric systems, with optional
right-applied preconditioning in the reference's style.

Reference: ``src/bicgstab.f90`` — `bicgstab` (12-47), `pbicgstab`
(49-89), `pbicgstab_omp` (91-182). Faithful structure per iteration:

    z1 = M⁻¹p ; ap = A z1
    α  = (r,r0) / (ap,r0)          [ONE fused all-reduce for both dots,
                                    bicgstab.f90:123-127]
    s  = r − α·ap
    z2 = M⁻¹s ; as = A z2
    ω  = (as,s) / (as,as)          [ONE fused all-reduce]
    x += α·z1 + ω·z2 ; r = s − ω·as
    res = ‖r‖ ;  β = ((r,r0)/rr0)(α/ω) ; p = r + β(p − ω·ap)

with ‖r‖² and (r,r0) fused into one all-reduce (one better than the
reference, which reduces them separately at bicgstab.f90:150-165).
Convergence: ABSOLUTE ‖r‖₂ < tol (bicgstab.f90:40).

Deliberate fixes of reference quirks (SURVEY §7 quirk 1): reduction
accumulators are values, not uninitialized storage, and ``iterations``
is always defined even when the loop hits max_iterations
(bicgstab.f90:102,106,181 leaves `iters` undefined).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from gmres_tpu.ops.blas import (
    batched_vdot,
    tree_axpy,
    tree_sub,
    tree_vdot,
    tree_zeros_like,
)
from gmres_tpu.types import (
    LinearOperator,
    Preconditioner,
    SolveResult,
    SolverStatus,
)


def bicgstab(
    A: LinearOperator,
    b: Any,
    *,
    tol: float = 1e-9,
    max_iterations: int = 10_000,
    M: Optional[Preconditioner] = None,
    x0: Optional[Any] = None,
    reliable: bool = True,
    replace_delta: Optional[float] = None,
    rtol: Optional[float] = None,
) -> SolveResult:
    """Solve A x = b (A nonsymmetric) by (preconditioned) BiCGSTAB.

    reliable: van der Vorst–Ye residual replacement (SIAM J. Sci.
      Comput. 22(3), 1999). The RECURSIVE residual drifts from the true
      b − Ax by ~ε·Σⱼ(‖A‖‖xⱼ‖ + ‖rⱼ‖) — with the large intermediate
      spikes BiCGSTAB is prone to, the attainable accuracy can land
      orders of magnitude above tol while the recurrence claims
      convergence (observed: round-2 1024² convection-diffusion, the
      recurrence said 2.4e-14 with the truth at 10.3; the reference
      trusts the recurrence unconditionally, bicgstab.f90:148-159).
      A running drift bound d is accumulated each iteration
      (d += ε·(‖A‖‖x‖ + ‖r‖)); when it first crosses δ·‖r‖ the
      recursive r is REPLACED by the freshly computed b − Ax (one
      extra matvec, only when triggered) and the bound resets — the
      recurrence then continues converging toward the TRUE residual
      instead of a phantom. Exit certification (below) remains the
      final safety net.
    replace_delta: replacement threshold δ (default √ε of the dtype).
    rtol: raises the absolute target to max(tol, rtol·‖b‖) — the
      scale-free stop (tol stays the reference's absolute semantics,
      bicgstab.f90:40, and acts as the attainable-accuracy floor).
    """
    if rtol is not None:
        nb = jnp.sqrt(jnp.real(tree_vdot(b, b)))
        tol = jnp.maximum(jnp.asarray(tol, nb.dtype), rtol * nb)
    if x0 is None:
        x = tree_zeros_like(b)
        r = b
    else:
        x = x0
        r = tree_sub(b, A(x0))
    r0 = r
    p = r

    dtype = jnp.result_type(*jax.tree.leaves(b))
    history = jnp.zeros((max_iterations,), dtype=dtype)
    eps = jnp.finfo(dtype).tiny
    mach_eps = float(jnp.finfo(dtype).eps)
    delta = (float(replace_delta) if replace_delta is not None
             else mach_eps ** 0.5)
    if reliable:
        # ‖A‖ scale for the drift bound: one Rayleigh-style probe on r0
        # (a lower estimate of ‖A‖₂ — the bound only needs the scale).
        ar0 = A(r0)
        norm_A = jnp.sqrt(tree_vdot(ar0, ar0)
                          / jnp.maximum(tree_vdot(r0, r0), eps))

    def cond(carry):
        (i, *_), status, _ = carry
        return (i < max_iterations) & (status == SolverStatus.MAX_ITERATIONS)

    def body(carry):
        (i, x, r, p, rr0, drift, below), status, hist = carry
        z1 = M(p) if M is not None else p
        ap = A(z1)
        # rr0 was folded into the previous iteration's tail reduction;
        # ap_r0 is fresh. First iteration computes rr0 below the loop.
        ap_r0 = tree_vdot(ap, r0)
        alpha = rr0 / ap_r0
        s = tree_axpy(-alpha, ap, r)
        z2 = M(s) if M is not None else s
        as_ = A(z2)
        as_s, as_as = batched_vdot([(as_, s), (as_, as_)])
        # Half-step degeneracy guard: when s = r − α·ap is (numerically)
        # zero, as = A·M·s is zero and ω = (as·s)/(as·as) is 0/0 —
        # the α step already hit the solution. Skipping the omega
        # update (ω = 0 leaves x = x + α·z1, r = s) converges cleanly;
        # the reference omits this and NaN-poisons x (SURVEY §7
        # quirk-1 territory). Guarded on as_as ≈ 0 — not ‖s‖ < tol —
        # so regular iterations keep bit-parity with the reference
        # recurrence.
        degenerate = as_as <= eps
        omega = jnp.where(
            degenerate, 0.0, as_s / jnp.where(as_as > 0, as_as, 1.0)
        )
        x = tree_axpy(alpha, z1, tree_axpy(omega, z2, x))
        r = tree_axpy(-omega, as_, s)
        if reliable:
            res_sq, r_r0_new, x_sq = batched_vdot(
                [(r, r), (r, r0), (x, x)]
            )
        else:
            res_sq, r_r0_new = batched_vdot([(r, r), (r, r0)])
        res = jnp.sqrt(res_sq)
        safe_omega = jnp.where(omega != 0, omega, 1.0)
        beta = (r_r0_new / rr0) * (alpha / safe_omega)
        p = tree_axpy(beta, tree_axpy(-omega, ap, p), r)
        status = jnp.where(
            res < tol, jnp.int32(SolverStatus.CONVERGED), status
        )
        breakdown = (
            ~jnp.isfinite(res)
            | (degenerate & (res >= tol))
            | (jnp.abs(r_r0_new) <= eps)
        )
        status = jnp.where(
            breakdown & (status != SolverStatus.CONVERGED),
            jnp.int32(SolverStatus.BREAKDOWN),
            status,
        )
        hist = hist.at[i].set(res)
        rr0_next = r_r0_new
        if reliable:
            # Drift-bound accumulation + replacement (docstring): the
            # p-update above already consumed the pre-replacement
            # r_r0_new, matching van der Vorst–Ye's placement of the
            # replacement AFTER the iteration's updates.
            drift = drift + mach_eps * (
                norm_A * jnp.sqrt(x_sq) + res
            )

            def replace(_):
                r_t = tree_sub(b, A(x))
                res_t_sq, rr0_t = batched_vdot(
                    [(r_t, r_t), (r_t, r0)]
                )
                d_t = mach_eps * (
                    norm_A * jnp.sqrt(x_sq) + jnp.sqrt(res_t_sq)
                )
                return r_t, rr0_t, d_t

            # Fire only at CROSSINGS of the δ·‖r‖ threshold (`below`
            # tracks being under it): once the bound's floor
            # ε·‖A‖·‖x‖ itself exceeds δ·‖r‖ — the attainable-accuracy
            # limit of EVALUATING b − Ax — further replacements can't
            # help and repeated firing destabilizes the recurrence
            # (measured: NaN via a near-orthogonal replaced (r, r0)).
            trigger = (
                below
                & (drift >= delta * res)
                & (res >= tol)
                & jnp.isfinite(res)
                & (status == SolverStatus.MAX_ITERATIONS)
            )
            r, rr0_next, drift = jax.lax.cond(
                trigger, replace,
                lambda _: (r, r_r0_new, drift), None,
            )
            below = drift < delta * res
        return ((i + 1, x, r, p, rr0_next, drift, below), status, hist)

    rr0_init = tree_vdot(r, r0)
    # Already converged at x0 (e.g. b = 0): skip the loop (the
    # reference's accumulators would produce 0/0 here, SURVEY §7).
    status0 = jnp.where(
        jnp.sqrt(rr0_init) < tol,
        jnp.int32(SolverStatus.CONVERGED),
        jnp.int32(SolverStatus.MAX_ITERATIONS),
    )
    carry = (
        (jnp.int32(0), x, r, p, rr0_init, jnp.zeros((), dtype),
         jnp.asarray(True)),
        status0,
        history,
    )
    (i, x, r, p, _, _, _), status, history = jax.lax.while_loop(
        cond, body, carry
    )
    res = jnp.where(i > 0, history[jnp.maximum(i - 1, 0)],
                    jnp.sqrt(rr0_init))
    # CERTIFY on the true residual (one extra matvec): BiCGSTAB's
    # RECURSIVE r can drift arbitrarily far from b − Ax — observed on
    # the 1024² convection-diffusion benchmark, where the recurrence
    # reported 2.4e-14 while the true residual sat at ~1e-4 (the
    # classic attainable-accuracy breakdown: rounding in the recursive
    # update accumulates with the size of intermediate quantities).
    # The reference trusts the lying recurrence (bicgstab.f90:40);
    # reporting CONVERGED there would be a silent wrong answer, so a
    # CONVERGED claim that fails re-verification is downgraded to
    # BREAKDOWN and the TRUE norm is reported.
    r_true = tree_sub(b, A(x))
    true_res = jnp.sqrt(tree_vdot(r_true, r_true))
    status = jnp.where(
        (status == SolverStatus.CONVERGED) & (true_res >= tol),
        jnp.int32(SolverStatus.BREAKDOWN),
        status,
    )
    res = jnp.where(i > 0, true_res, res)
    # Pad past convergence with the final residual (documented contract).
    history = jnp.where(jnp.arange(max_iterations) < i, history, res)
    return SolveResult(
        x=x,
        iterations=i,
        residual=res,
        status=status,
        residual_history=history,
    )
