"""Restarted GMRES(m) with Householder (Walker '84) and MGS-with-
reorthogonalization Arnoldi variants.

Reference: ``src/gmres_hh.f90`` (Householder: dense 10-112, omp 211-385,
preconditioned omp 388-566) and ``src/gmres_mgsr.f90`` (MGSR: dense
11-95, matrix-free 98-199, omp 277-421). This is a ground-up TPU design
of the same algorithms:

* Fixed-size basis buffers (m+1, *shape), zero-initialized so that the
  j-dependent sweeps need no masks — zero rows contribute nothing.
  Everything under jit is static-shape matmul/elementwise work.
* Householder reflector products are kept in compact-WY form
  (ops/householder.py): applying j reflectors is two MXU matmuls with
  ONE all-reduce instead of the reference's sequential 2j-dot sweep
  (gmres_hh.f90:453-485).
* Gram-Schmidt offers "mgs2" (faithful: sequential modified GS run
  exactly twice, gmres_mgsr.f90:341-360, as a lax.scan) and "cgs2"
  (classical GS twice: each pass is one V·w matmul + one rank-update —
  one all-reduce per pass instead of j; CGS2 ≈ MGS2 numerically, the
  deliberate trade documented in SURVEY §3.2).
* Givens least-squares updates on a replicated accumulated-rotation
  matrix (ops/givens.py); back-substitution via a masked static
  triangular solve (ops/tri.py).
* Convergence: relative residual |g(j+1)|/β₀ with β₀ = ‖b‖ (x₀ = 0),
  gmres_hh.f90:237,339; lucky-breakdown exit on h_val < tol
  (gmres_mgsr.f90:69). `check_inner=False` reproduces the reference
  quirk where gmres_hh_omp only tests at restart boundaries
  (gmres_hh.f90:340-344, SURVEY §7 quirk 2).
* Orthogonality audits reproduce each variant's own metric
  (calculate_verr gmres_hh.f90:568-593; the cumulative sqrt chain
  gmres_mgsr.f90:414-420).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from gmres_tpu.ops import householder as wy
from gmres_tpu.ops.blas import tree_vdot
from gmres_tpu.ops.flat import flat_get, flat_iota, mask_ge
from gmres_tpu.ops.givens import GivensState, givens_init, givens_step
from gmres_tpu.ops.tri import masked_back_substitution
from gmres_tpu.types import (
    GmresResult,
    LinearOperator,
    Preconditioner,
    SolverStatus,
)


def _as_operator(A) -> LinearOperator:
    """Accept a dense matrix (reference dense path, gmres_hh.f90:37) or
    a callable operator."""
    if isinstance(A, jnp.ndarray):
        mat = A
        return lambda v: mat @ v
    return A


def _fortran_sign(a, b):
    """Fortran sign(a, b) = |a| * sign(b), with sign(0) = +."""
    return jnp.where(b >= 0, jnp.abs(a), -jnp.abs(a))


# ---------------------------------------------------------------------------
# Orthogonalization passes (MGSR variant).
# ---------------------------------------------------------------------------


def _cgs_pass(v_basis: jnp.ndarray, w: jnp.ndarray):
    """Classical Gram-Schmidt pass: h = V·w (one all-reduce), then
    w ← w − Vᵀh. Zero basis rows self-mask."""
    axes = list(range(1, v_basis.ndim))
    h = jnp.tensordot(v_basis, w, axes=(axes, list(range(w.ndim))))
    w = w - jnp.tensordot(h, v_basis, axes=(0, 0))
    return h, w


def _mgs_pass(v_basis: jnp.ndarray, w: jnp.ndarray):
    """Modified Gram-Schmidt pass, faithful to gmres_mgsr.f90:341-360:
    sequential over basis rows (lax.scan), one all-reduce per row.
    Zero rows are no-ops, so scanning the full buffer needs no mask."""

    def step(w, v_row):
        h = tree_vdot(w, v_row)
        return w - h * v_row, h

    w, h = jax.lax.scan(step, w, v_basis)
    return h, w


# ---------------------------------------------------------------------------
# Shared small-matrix epilogue per restart: back-substitute + status.
# ---------------------------------------------------------------------------


def _gmres_common(b, m, dtype):
    beta0 = jnp.sqrt(tree_vdot(b, b)).astype(dtype)
    final_err = jnp.zeros((m,), dtype=dtype)
    return beta0, final_err


# ---------------------------------------------------------------------------
# MGSR variant.
# ---------------------------------------------------------------------------


def _gmres_mgsr(
    A: LinearOperator,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    m: int,
    tol: float,
    max_restarts: int,
    M: Optional[Preconditioner],
    orthogonalization: str,
    check_inner: bool,
    compute_v_err: bool,
) -> GmresResult:
    dtype = b.dtype
    shape = b.shape
    beta0, final_err0 = _gmres_common(b, m, dtype)
    ortho = _cgs_pass if orthogonalization == "cgs2" else _mgs_pass

    def inner_cond(st):
        (t, *_), converged = st[0], st[1]
        return (t < m) & (~converged)

    def inner_body(st):
        (t, v_basis, hmat, giv, w_prev, h_val_prev, n_out, ferr), _ = st
        v_t = jax.lax.dynamic_index_in_dim(v_basis, t, axis=0, keepdims=False)
        z = A(v_t)
        w = M(z) if M is not None else z
        # MGS/CGS run exactly twice with H accumulation
        # (gmres_mgsr.f90:343 `do k=1,2`).
        h1, w = ortho(v_basis, w)
        h2, w = ortho(v_basis, w)
        hcol = h1 + h2
        h_val = jnp.sqrt(tree_vdot(w, w))
        hcol = hcol.at[t + 1].set(h_val)
        giv, col, g_next = givens_step(giv, hcol, t)
        hmat = jax.lax.dynamic_update_slice(
            hmat, col[:, None], (jnp.zeros((), t.dtype), t)
        )
        rel = jnp.abs(g_next) / beta0
        ferr = ferr.at[t].set(rel)
        # V(:,j+1) is written unconditionally, matching gmres_mgsr_omp
        # (gmres_mgsr.f90:384 before the convergence check).
        v_new = w / jnp.where(h_val > 0, h_val, 1.0)
        v_basis = jax.lax.dynamic_update_slice(
            v_basis, v_new[None],
            (t + 1,) + (jnp.zeros((), t.dtype),) * len(shape)
        )
        if check_inner:
            converged = (rel < tol) | (h_val < tol)
        else:
            converged = jnp.array(False)
        return (
            (t + 1, v_basis, hmat, giv, w, h_val, t + 1, ferr),
            converged,
        )

    def restart_body(carry):
        x, k, _, _, _, _ = carry
        ax = A(x)
        z = b - ax
        w = M(z) if M is not None else z
        beta = jnp.sqrt(tree_vdot(w, w))
        v_basis = jnp.zeros((m + 1,) + shape, dtype=dtype)
        v_basis = v_basis.at[0].set(w / jnp.where(beta > 0, beta, 1.0))
        g0 = jnp.zeros((m + 1,), dtype=dtype).at[0].set(beta)
        giv = givens_init(m, g0)
        hmat = jnp.zeros((m + 1, m), dtype=dtype)
        ferr = jnp.zeros((m,), dtype=dtype)

        st0 = (
            (jnp.int32(0), v_basis, hmat, giv, w, beta, jnp.int32(0), ferr),
            jnp.array(False),
        )
        (t, v_basis, hmat, giv, w, h_val, n_out, ferr), _ = (
            jax.lax.while_loop(inner_cond, inner_body, st0)
        )

        y = masked_back_substitution(hmat, giv.g, n_out)
        # x += Σ y_r V_r : one matmul over the basis
        # (gmres_mgsr.f90:400-406).
        x = x + jnp.tensordot(y, v_basis[:m], axes=(0, 0))
        rel = ferr[jnp.maximum(n_out - 1, 0)]
        converged = rel < tol
        breakdown = h_val < tol
        return (x, k + 1, converged, breakdown, n_out, (ferr, v_basis))

    def restart_cond(carry):
        _, k, converged, breakdown, _, _ = carry
        return (k < max_restarts) & (~converged) & (~breakdown)

    v0 = jnp.zeros((m + 1,) + shape, dtype=dtype)
    carry = (
        x0,
        jnp.int32(0),
        beta0 == 0,  # b = 0 → x = x0 is already exact
        jnp.array(False),
        jnp.int32(0),
        (final_err0, v0),
    )
    x, k, converged, breakdown, n_out, (ferr, v_basis) = jax.lax.while_loop(
        restart_cond, restart_body, carry
    )

    if compute_v_err:
        vf = v_basis.reshape(m + 1, -1)
        v_err = _v_err_mgsr(vf @ vf.T, n_out, dtype)
    else:
        v_err = jnp.zeros((m + 1,), dtype=dtype)

    status = jnp.where(
        converged,
        jnp.int32(SolverStatus.CONVERGED),
        jnp.where(
            breakdown,
            jnp.int32(SolverStatus.BREAKDOWN),
            jnp.int32(SolverStatus.MAX_ITERATIONS),
        ),
    )
    return GmresResult(
        x=x,
        iterations=n_out,
        restarts=k,
        residual=ferr[jnp.maximum(n_out - 1, 0)],
        status=status,
        residual_history=ferr,
        v_err=v_err,
    )


def _v_err_mgsr(gram: jnp.ndarray, n_out, dtype) -> jnp.ndarray:
    """Cumulative orthogonality chain of gmres_mgsr.f90:414-420:
    v_err(j+1)² = v_err(j)² + Σ_{i≤j} 2(Vi·V_{j+1})² + ((V_{j+1}·V_{j+1})−1)²."""
    mp1 = gram.shape[0]
    rows = jnp.arange(mp1)[:, None]
    cols = jnp.arange(mp1)[None, :]
    off = jnp.where(cols < rows, gram**2, 0.0)
    a = 2.0 * jnp.sum(off, axis=1) + (jnp.diagonal(gram) - 1.0) ** 2
    active = (jnp.arange(mp1) >= 1) & (jnp.arange(mp1) <= n_out)
    a = jnp.where(active, a, 0.0)
    return jnp.sqrt(jnp.cumsum(a)).astype(dtype) * active.astype(dtype)


# ---------------------------------------------------------------------------
# Householder (compact-WY) variant.
# ---------------------------------------------------------------------------


def _gmres_householder(
    A: LinearOperator,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    m: int,
    tol: float,
    max_restarts: int,
    M: Optional[Preconditioner],
    check_inner: bool,
    compute_v_err: bool,
    breakdown_check: bool,
) -> GmresResult:
    dtype = b.dtype
    shape = b.shape
    n = b.size
    beta0, final_err0 = _gmres_common(b, m, dtype)
    fidx = flat_iota(b)

    def inner_cond(st):
        (t, *_), converged = st[0], st[1]
        return (t < m) & (~converged)

    def inner_body(st):
        (t, p_basis, t_mat, hmat, giv, h_val_prev, n_out, ferr), _ = st
        # v_t = Q e_t  (reference: reflector sweep gmres_hh.f90:453-467;
        # here: compact-WY, two matmuls + one all-reduce).
        e_t = (fidx == t).astype(dtype)
        v_t = wy.wy_apply(p_basis, t_mat, e_t)
        z = A(v_t)
        w = M(z) if M is not None else z
        # w ← Qᵀ w (gmres_hh.f90:471-485).
        w = wy.wy_apply_transpose(p_basis, t_mat, w)

        # Hessenberg column: H[0:t+1, t] = w_flat[0:t+1]; H[t+1, t] from
        # the tail norm with the Walker sign choice
        # (gmres_hh.f90:487-502).
        whead = jax.lax.slice(w.reshape(-1), (0,), (m + 1,))
        w_t1 = whead[t + 1]
        tail_sq = jnp.sum(jnp.where(fidx > t, w * w, 0.0))
        tmp = jnp.sqrt(tail_sq)
        h_sub = jnp.where(w_t1 > 0, -tmp, tmp)
        h_val = tmp
        idx = jnp.arange(m + 1)
        hcol = jnp.where(idx <= t, whead, 0.0)
        hcol = jnp.where(idx == t + 1, h_sub, hcol)

        # New reflector: zero prefix, subtract H(t+1,t) at position t+1,
        # normalize (gmres_hh.f90:495-501). On lucky breakdown
        # (unorm == 0) the appended reflector is the zero vector, which
        # in compact-WY algebra contributes exactly nothing — Q is
        # unchanged, no guard needed.
        u = mask_ge(w, t + 1)
        u = u - jnp.where(fidx == t + 1, h_sub, jnp.zeros_like(u))
        unorm = jnp.sqrt(tree_vdot(u, u))
        p_new = u / jnp.where(unorm > 0, unorm, 1.0)
        p_basis, t_mat_new = wy.wy_append(p_basis, t_mat, p_new, t + 1)

        giv, col, g_next = givens_step(giv, hcol, t)
        hmat = jax.lax.dynamic_update_slice(
            hmat, col[:, None], (jnp.zeros((), t.dtype), t)
        )
        rel = jnp.abs(g_next) / beta0
        ferr = ferr.at[t].set(rel)
        if check_inner:
            converged = rel < tol
            if breakdown_check:
                converged = converged | (h_val < tol)
        else:
            converged = jnp.array(False)
        return (
            (t + 1, p_basis, t_mat_new, hmat, giv, h_val, t + 1, ferr),
            converged,
        )

    def restart_body(carry):
        x, k, _, _, _, _ = carry
        ax = A(x)
        z = b - ax
        w = M(z) if M is not None else z
        # Initial reflector from w (gmres_hh.f90:433-436): g(1) =
        # −sign(β, w₁); w₁ += sign(β, w₁); P₁ = w/‖w‖.
        beta = jnp.sqrt(tree_vdot(w, w))
        w0 = flat_get(w, 0)
        s = _fortran_sign(beta, w0)
        g0 = jnp.zeros((m + 1,), dtype=dtype).at[0].set(-s)
        u = w + jnp.where(fidx == 0, s, jnp.zeros_like(w))
        unorm = jnp.sqrt(tree_vdot(u, u))
        p_basis = jnp.zeros((m + 1,) + shape, dtype=dtype)
        p_basis = p_basis.at[0].set(u / jnp.where(unorm > 0, unorm, 1.0))
        t_mat = jnp.zeros((m + 1, m + 1), dtype=dtype).at[0, 0].set(2.0)
        giv = givens_init(m, g0)
        hmat = jnp.zeros((m + 1, m), dtype=dtype)
        ferr = jnp.zeros((m,), dtype=dtype)

        st0 = (
            (jnp.int32(0), p_basis, t_mat, hmat, giv, beta, jnp.int32(0),
             ferr),
            jnp.array(False),
        )
        (t, p_basis, t_mat, hmat, giv, h_val, n_out, ferr), _ = (
            jax.lax.while_loop(inner_cond, inner_body, st0)
        )

        y = masked_back_substitution(hmat, giv.g, n_out)
        # Update direction: Q [y; 0] (gmres_hh.f90:537-558) — one
        # compact-WY application instead of n_out reflector sweeps.
        yvec = jnp.zeros((n,), dtype=dtype).at[: m].set(y).reshape(shape)
        dx = wy.wy_apply(p_basis, t_mat, yvec)
        x = x + dx
        rel = ferr[jnp.maximum(n_out - 1, 0)]
        converged = rel < tol
        breakdown = jnp.array(False)
        if breakdown_check:
            breakdown = h_val < tol
        return (x, k + 1, converged, breakdown, n_out,
                (ferr, p_basis, t_mat))

    def restart_cond(carry):
        _, k, converged, breakdown, _, _ = carry
        return (k < max_restarts) & (~converged) & (~breakdown)

    p0 = jnp.zeros((m + 1,) + shape, dtype=dtype)
    t0 = jnp.zeros((m + 1, m + 1), dtype=dtype)
    carry = (
        x0,
        jnp.int32(0),
        beta0 == 0,  # b = 0 → x = x0 is already exact
        jnp.array(False),
        jnp.int32(0),
        (final_err0, p0, t0),
    )
    x, k, converged, breakdown, n_out, (ferr, p_basis, t_mat) = (
        jax.lax.while_loop(restart_cond, restart_body, carry)
    )

    if compute_v_err:
        v = wy.wy_basis(p_basis, t_mat, m)  # (m, n)
        v_err = _v_err_householder(v @ v.T, n_out, dtype)
    else:
        v_err = jnp.zeros((m + 1,), dtype=dtype)

    status = jnp.where(
        converged,
        jnp.int32(SolverStatus.CONVERGED),
        jnp.where(
            breakdown,
            jnp.int32(SolverStatus.BREAKDOWN),
            jnp.int32(SolverStatus.MAX_ITERATIONS),
        ),
    )
    return GmresResult(
        x=x,
        iterations=n_out,
        restarts=k,
        residual=ferr[jnp.maximum(n_out - 1, 0)],
        status=status,
        residual_history=ferr,
        v_err=v_err,
    )


def _v_err_householder(gram: jnp.ndarray, n_out, dtype) -> jnp.ndarray:
    """v_err(i) = Σ_{j<i} 2(Vi·Vj)², i = 2..n_iter (calculate_verr,
    gmres_hh.f90:587-591). Returned (m+1,) with reference indexing
    (entry r ↔ Fortran v_err(r+1))."""
    mm = gram.shape[0]
    rows = jnp.arange(mm)[:, None]
    cols = jnp.arange(mm)[None, :]
    off = jnp.where(cols < rows, gram**2, 0.0)
    v = 2.0 * jnp.sum(off, axis=1)
    active = jnp.arange(mm) < n_out
    v = jnp.where(active, v, 0.0)
    return jnp.concatenate([v, jnp.zeros((1,), dtype=dtype)]).astype(dtype)


# ---------------------------------------------------------------------------
# Public entry point.
# ---------------------------------------------------------------------------


def gmres(
    A,
    b: jnp.ndarray,
    *,
    restart: int = 30,
    tol: float = 1e-8,
    max_restarts: int = 1000,
    M: Optional[Preconditioner] = None,
    variant: str = "householder",
    orthogonalization: str = "cgs2",
    check_inner: bool = True,
    compute_v_err: bool = True,
    breakdown_check: bool = True,
    x0: Optional[jnp.ndarray] = None,
) -> GmresResult:
    """Solve A x = b with restarted GMRES(restart).

    Args:
      A: callable operator y = A(x) over arrays of any shape, or a dense
        (n, n) matrix (reference dense path, gmres_hh.f90:10).
      b: right-hand side array (any shape; GMRES treats it as a vector).
      restart: Krylov dimension m per cycle (reference argv `m`).
      tol: relative-residual tolerance |g(j+1)|/‖b‖ (gmres_hh.f90:85).
      max_restarts: restart cap (reference `stages=1000`,
        gmres_hh.f90:8 / `max_restarts=1000`, gmres_mgsr.f90:6).
      M: optional left preconditioner callable z = M(r).
      variant: "householder" (compact-WY Walker '84) or "mgsr".
      orthogonalization: for mgsr — "cgs2" (fast, one all-reduce per
        pass) or "mgs2" (faithful sequential MGS, gmres_mgsr.f90:341).
      check_inner: test convergence every inner iteration (True matches
        gmres_hh_prec_omp / gmres_mgsr_omp; False reproduces the
        gmres_hh_omp quirk of restart-boundary-only checks,
        gmres_hh.f90:340-344).
      compute_v_err: run the per-variant orthogonality audit.
      breakdown_check: exit on lucky breakdown h_val < tol
        (gmres_mgsr.f90:69; gmres_hh_prec_omp omits it — set False for
        exact parity with that routine).
      x0: initial guess, defaults to zeros (all reference drivers use 0).
    """
    op = _as_operator(A)
    # Clamp the Krylov dimension to n−1: the reference allocates
    # P(n, m+1) with m > n for e.g. Hilbert n=12, m=90 and relies on
    # the `j < n` branch never producing a reflector (gmres_hh.f90:60);
    # we keep the buffers well-formed instead (SURVEY §7 quirk 7).
    restart = min(restart, b.size - 1)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if variant == "householder":
        return _gmres_householder(
            op, b, x0, restart, tol, max_restarts, M,
            check_inner, compute_v_err, breakdown_check,
        )
    elif variant == "mgsr":
        if orthogonalization not in ("cgs2", "mgs2"):
            raise ValueError(f"unknown orthogonalization {orthogonalization}")
        return _gmres_mgsr(
            op, b, x0, restart, tol, max_restarts, M,
            orthogonalization, check_inner, compute_v_err,
        )
    raise ValueError(f"unknown variant {variant}")
