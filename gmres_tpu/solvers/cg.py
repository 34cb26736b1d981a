"""Conjugate Gradient for SPD systems, with optional left preconditioner.

Reference: ``src/cg.f90`` — `cg` (11-42), `pcg` (44-81) and their OpenMP
twins (83-234). The update order, reduction fusions and convergence
semantics are kept faithfully:

* rr = (r,z) and pAp = (Ap,p) are produced by ONE fused reduction
  (reference ``reduction(+:rr,alpha)``, cg.f90:118-123 / 207-212) —
  here a single stacked all-reduce via ``batched_vdot``.
* convergence on the ABSOLUTE residual ‖r‖₂ < tol, tested after the
  x/r update (cg.f90:37,76,145,222) — note this differs from GMRES's
  relative criterion (SURVEY §4).
* ``iterations`` out = iterations performed; max_iterations in — the
  reference's inout ``iter`` (cg.f90:16).

Everything is a ``lax.while_loop`` over pytree vectors: element-wise
updates shard trivially, each iteration costs one stencil application
(+1 inside the preconditioner) and two all-reduce points, the canonical
latency-bound Krylov loop (SURVEY §3.3).
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


def cg(
    A: LinearOperator,
    b: Any,
    *,
    tol: float = 1e-9,
    max_iterations: int = 10_000,
    M: Optional[Preconditioner] = None,
    x0: Optional[Any] = None,
    variant: str = "classic",
    rtol: Optional[float] = None,
) -> SolveResult:
    """Solve A x = b (A SPD) by (preconditioned) conjugate gradients.

    A and M are callables over pytree vectors; M approximates A⁻¹
    (left preconditioning, cg.f90:154-234). x0 defaults to zeros (the
    reference always starts at zero, cg.f90:27).

    tol is ABSOLUTE ‖r‖₂ (the reference's semantics, cg.f90:37 —
    PARITY.md quirk policy keeps divergences as explicit options);
    rtol, when given, raises the target to max(tol, rtol·‖b‖) — the
    scale-free stop every caller otherwise hand-rolls, with tol
    acting as the attainable-accuracy floor.

    variant: "classic" (reference-faithful: 2-3 reduction points per
    iteration, cg.f90:188-231) or "pipelined" (Ghysels-Vanroose: ONE
    fused reduction per iteration, with the matvec/preconditioner
    independent of it so XLA's scheduler can overlap the all-reduce
    with compute — the latency lever for multi-chip meshes). The
    pipelined recurrences drift from the true residual in finite
    precision ~1-2 orders earlier than classic CG; fine at the
    reference's 1e-9 on well-conditioned systems, prefer classic for
    tol near machine epsilon.
    """
    if rtol is not None:
        nb = jnp.sqrt(jnp.real(tree_vdot(b, b)))
        tol = jnp.maximum(jnp.asarray(tol, nb.dtype), rtol * nb)
    if variant == "pipelined":
        return _pipelined_cg(A, b, tol=tol,
                             max_iterations=max_iterations, M=M, x0=x0)
    if variant != "classic":
        raise ValueError(f"unknown cg variant {variant}")
    if x0 is None:
        x = tree_zeros_like(b)
        r = b
    else:
        x = x0
        r = tree_sub(b, A(x0))

    z = M(r) if M is not None else r
    p = z

    dtype = jnp.result_type(*jax.tree.leaves(b))
    # Norms/coefficients are REAL even for complex Hermitian A/M
    # ((r, Mr) and (p, Ap) are exactly real; jnp.real keeps the real
    # DTYPE out of comparisons — conjugation itself lives in
    # tree_vdot). Real dtypes are untouched.
    rdtype = jnp.finfo(dtype).dtype
    history = jnp.zeros((max_iterations,), dtype=rdtype)

    def cond(state):
        i, _, _, _, _, res, status = state
        return (i < max_iterations) & (status == SolverStatus.MAX_ITERATIONS)

    def body(state):
        i, x, r, z, p, _, status = state
        ap = A(p)
        # One fused all-reduce for rr=(r,z) and pAp=(Ap,p)
        # (cg.f90:197-202 fused reduction).
        rr, pap = jnp.real(batched_vdot([(r, z), (ap, p)]))
        alpha = rr / pap
        x = tree_axpy(alpha, p, x)
        r = tree_axpy(-alpha, ap, r)
        z_new = M(r) if M is not None else r
        # res and (r,z) in ONE fused reduction — the reference keeps
        # them separate (cg.f90:205-221); independent sums, so
        # iteration counts are unchanged.
        res_sq, rz_new = jnp.real(batched_vdot([(r, r), (r, z_new)]))
        res = jnp.sqrt(res_sq)
        beta = rz_new / rr
        p = tree_axpy(beta, p, z_new)
        status = jnp.where(
            res < tol, jnp.int32(SolverStatus.CONVERGED), status
        )
        status = jnp.where(
            ~jnp.isfinite(res), jnp.int32(SolverStatus.BREAKDOWN), status
        )
        return (i + 1, x, r, z_new, p, res, status)

    res0 = jnp.asarray(jnp.sqrt(jnp.real(tree_vdot(r, r))), dtype=rdtype)
    # Already converged at x0 (e.g. b = 0): skip the loop entirely —
    # the reference would divide 0/0 here (cg.f90:200 alpha = rr/pAp).
    status0 = jnp.where(
        res0 < tol,
        jnp.int32(SolverStatus.CONVERGED),
        jnp.int32(SolverStatus.MAX_ITERATIONS),
    )
    state = (
        jnp.int32(0),
        x,
        r,
        z,
        p,
        res0,
        status0,
    )

    # Residual history is recorded by wrapping the body: the while_loop
    # carries it alongside (scatter one scalar per iteration).
    def body_hist(state_hist):
        state, hist = state_hist
        new_state = body(state)
        i = state[0]
        hist = hist.at[i].set(new_state[5])
        return (new_state, hist)

    def cond_hist(state_hist):
        return cond(state_hist[0])

    (i, x, r, z, p, res, status), history = jax.lax.while_loop(
        cond_hist, body_hist, (state, history)
    )
    # Certify on the true residual (one extra matvec) — the recursive
    # r drifts from b − Ax at the attainable-accuracy limit (observed
    # on BiCGSTAB at 1024²; same pattern applied to every
    # short-recurrence solver). A CONVERGED claim that fails
    # re-verification downgrades to BREAKDOWN; the true norm is
    # reported.
    r_true = tree_sub(b, A(x))
    true_res = jnp.sqrt(jnp.real(tree_vdot(r_true, r_true)))
    status = jnp.where(
        (status == SolverStatus.CONVERGED) & (true_res >= tol),
        jnp.int32(SolverStatus.BREAKDOWN),
        status,
    )
    res = jnp.where(i > 0, true_res, res)
    # Pad past convergence with the final residual (the documented
    # contract of SolveResult.residual_history).
    history = jnp.where(
        jnp.arange(max_iterations) < i, history, res
    )
    return SolveResult(
        x=x,
        iterations=i,
        residual=res,
        status=status,
        residual_history=history,
    )


def _pipelined_cg(
    A: LinearOperator,
    b: Any,
    *,
    tol: float,
    max_iterations: int,
    M: Optional[Preconditioner],
    x0: Optional[Any],
) -> SolveResult:
    """Pipelined preconditioned CG (Ghysels & Vanroose, 2014, alg. 4).

    Per iteration: ONE fused all-reduce of three scalars
    (γ = r·u, δ = w·u, ‖r‖²) and one A·M application (m = M w,
    n = A m) that does NOT depend on the reduction results — the
    communication/computation overlap the classic loop cannot offer
    (its α gates the x/r update which gates the next matvec). All
    other work is axpy recurrences on six vectors.

    Reporting matches the classic loop: ‖r‖ is reduced from the
    just-updated r at the end of each iteration (that reduction also
    produces the NEXT iteration's γ and δ — the fusion that makes it
    one collective per iteration); `iterations` counts x-updates.
    """
    if x0 is None:
        x = tree_zeros_like(b)
        r = b
    else:
        x = x0
        r = tree_sub(b, A(x0))
    u = M(r) if M is not None else r
    w = A(u)

    dtype = jnp.result_type(*jax.tree.leaves(b))
    rdtype = jnp.finfo(dtype).dtype  # see classic cg: real scalars
    history = jnp.zeros((max_iterations,), dtype=rdtype)
    zeros = tree_zeros_like(b)

    gamma0, delta0, rr0 = jnp.real(
        batched_vdot([(r, u), (w, u), (r, r)])
    )
    res0 = jnp.sqrt(rr0)
    status0 = jnp.where(
        res0 < tol,
        jnp.int32(SolverStatus.CONVERGED),
        jnp.int32(SolverStatus.MAX_ITERATIONS),
    )

    def cond(carry):
        i, *_, status, _ = carry
        return (i < max_iterations) & (status == SolverStatus.MAX_ITERATIONS)

    def body(carry):
        (i, x, r, u, w, z, q, p, s, gamma, delta, gamma_prev,
         alpha_prev, status, hist) = carry
        # The reduction for THIS iteration's scalars was folded into the
        # previous iteration's tail (or the prologue); m/n depend only
        # on w, so XLA may schedule them alongside the collective.
        m = M(w) if M is not None else w
        n = A(m)
        first = i == 0
        beta = jnp.where(first, 0.0, gamma / gamma_prev)
        alpha = gamma / jnp.where(
            first, delta, delta - beta * gamma / alpha_prev
        )
        z = tree_axpy(beta, z, n)
        q = tree_axpy(beta, q, m)
        s = tree_axpy(beta, s, w)
        p = tree_axpy(beta, p, u)
        x = tree_axpy(alpha, p, x)
        r = tree_axpy(-alpha, s, r)
        u = tree_axpy(-alpha, q, u)
        w = tree_axpy(-alpha, z, w)
        gamma_new, delta_new, rr = jnp.real(
            batched_vdot([(r, u), (w, u), (r, r)])
        )
        res = jnp.sqrt(rr)
        hist = hist.at[i].set(res)
        status = jnp.where(
            res < tol, jnp.int32(SolverStatus.CONVERGED), status
        )
        status = jnp.where(
            ~jnp.isfinite(res) & (status == SolverStatus.MAX_ITERATIONS),
            jnp.int32(SolverStatus.BREAKDOWN),
            status,
        )
        return (i + 1, x, r, u, w, z, q, p, s, gamma_new, delta_new,
                gamma, alpha, status, hist)

    carry = (
        jnp.int32(0), x, r, u, w, zeros, zeros, zeros, zeros,
        gamma0, delta0, jnp.ones((), rdtype), jnp.ones((), rdtype),
        status0, history,
    )
    (i, x, r, u, w, *_, status, history) = jax.lax.while_loop(
        cond, body, carry
    )
    res = jnp.where(i > 0, history[jnp.maximum(i - 1, 0)], res0)
    # Same true-residual certification as classic CG (pipelined
    # recurrences drift even sooner — that is the known cost of the
    # Ghysels-Vanroose reformulation).
    r_true = tree_sub(b, A(x))
    true_res = jnp.sqrt(jnp.real(tree_vdot(r_true, r_true)))
    status = jnp.where(
        (status == SolverStatus.CONVERGED) & (true_res >= tol),
        jnp.int32(SolverStatus.BREAKDOWN),
        status,
    )
    res = jnp.where(i > 0, true_res, res)
    history = jnp.where(jnp.arange(max_iterations) < i, history, res)
    return SolveResult(
        x=x,
        iterations=i,
        residual=res,
        status=status,
        residual_history=history,
    )
