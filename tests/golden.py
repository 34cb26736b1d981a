"""Independent NumPy oracle implementations of the solver algorithms.

Written directly from the textbook algorithms (Walker '84 Householder
GMRES, MGS(2) Arnoldi GMRES, CG, BiCGSTAB) with the reference's
convergence semantics (relative |g|/β₀ for GMRES, absolute ‖r‖ for
CG/BiCGSTAB). These produce golden iteration counts and residual
histories to validate the JAX implementations against — the role the
reference's manufactured-solution eyeball tables play (SURVEY §4),
made executable.
"""

from __future__ import annotations

import numpy as np


def golden_cg(matvec, b, tol, max_iter, m_inv=None):
    x = np.zeros_like(b)
    r = b.copy()
    z = m_inv(r) if m_inv else r
    p = z.copy()
    hist = []
    for i in range(1, max_iter + 1):
        ap = matvec(p)
        rr = r @ z
        alpha = rr / (ap @ p)
        x += alpha * p
        r -= alpha * ap
        res = np.linalg.norm(r)
        hist.append(res)
        z = m_inv(r) if m_inv else r
        beta = (r @ z) / rr
        p = z + beta * p
        if res < tol:
            return x, i, res, np.array(hist)
    return x, max_iter, res, np.array(hist)


def golden_bicgstab(matvec, b, tol, max_iter, m_inv=None):
    x = np.zeros_like(b)
    r = b.copy()
    r0 = r.copy()
    p = r.copy()
    hist = []
    for i in range(1, max_iter + 1):
        z1 = m_inv(p) if m_inv else p
        ap = matvec(z1)
        rr0 = r @ r0
        alpha = rr0 / (ap @ r0)
        s = r - alpha * ap
        z2 = m_inv(s) if m_inv else s
        as_ = matvec(z2)
        omega = (as_ @ s) / (as_ @ as_)
        x += alpha * z1 + omega * z2
        r = s - omega * as_
        res = np.linalg.norm(r)
        hist.append(res)
        if res < tol:
            return x, i, res, np.array(hist)
        beta = ((r @ r0) / rr0) * (alpha / omega)
        p = r + beta * (p - omega * ap)
    return x, max_iter, res, np.array(hist)


def _apply_givens(cs, sn, h, j):
    for i in range(j):
        tmp = h[i]
        h[i] = cs[i] * tmp + sn[i] * h[i + 1]
        h[i + 1] = -sn[i] * tmp + cs[i] * h[i + 1]
    return h


def golden_gmres_mgs2(matvec, b, m, tol, max_restarts, m_inv=None):
    """Restarted GMRES with MGS run twice (re-orthogonalization)."""
    n = b.size
    x = np.zeros_like(b)
    beta0 = np.linalg.norm(b)
    for st in range(1, max_restarts + 1):
        r = b - matvec(x)
        w = m_inv(r) if m_inv else r
        beta = np.linalg.norm(w)
        V = np.zeros((m + 1, n))
        H = np.zeros((m + 1, m))
        g = np.zeros(m + 1)
        cs = np.zeros(m)
        sn = np.zeros(m)
        V[0] = w / beta
        g[0] = beta
        ferr = np.zeros(m)
        n_out = 0
        converged = False
        for j in range(m):
            n_out = j + 1
            z = matvec(V[j])
            w = m_inv(z) if m_inv else z
            for _ in range(2):
                for i in range(j + 1):
                    h = w @ V[i]
                    H[i, j] += h
                    w -= h * V[i]
            h_val = np.linalg.norm(w)
            col = H[: m + 1, j].copy()
            col[j + 1] = h_val
            col = _apply_givens(cs, sn, col, j)
            ds = np.hypot(col[j + 1], col[j])
            cs[j] = col[j] / ds
            sn[j] = col[j + 1] / ds
            col[j] = cs[j] * col[j] + sn[j] * col[j + 1]
            col[j + 1] = 0.0
            H[:, j] = col
            tmp = g[j]
            g[j] = cs[j] * tmp + sn[j] * g[j + 1]
            g[j + 1] = -sn[j] * tmp + cs[j] * g[j + 1]
            ferr[j] = abs(g[j + 1]) / beta0
            V[j + 1] = w / h_val if h_val > 0 else 0.0
            if ferr[j] < tol or h_val < tol:
                converged = True
                break
        # back substitution on rotated H
        k = n_out
        y = np.zeros(m)
        y[k - 1] = g[k - 1] / H[k - 1, k - 1]
        for i in range(k - 2, -1, -1):
            y[i] = (g[i] - H[i, i + 1 : k] @ y[i + 1 : k]) / H[i, i]
        x = x + V[:m].T @ y
        if converged or ferr[n_out - 1] < tol:
            return x, n_out, st, ferr, V
    return x, n_out, max_restarts, ferr, V


def golden_gmres_householder(matvec, b, m, tol, max_restarts, m_inv=None):
    """Restarted Householder (Walker '84) GMRES, explicit reflector
    sweeps (the slow-but-simple formulation)."""
    n = b.size
    x = np.zeros_like(b)
    beta0 = np.linalg.norm(b)

    def fsign(a, bb):
        return abs(a) if bb >= 0 else -abs(a)

    for st in range(1, max_restarts + 1):
        r = b - matvec(x)
        w = m_inv(r) if m_inv else r
        P = np.zeros((m + 1, n))
        H = np.zeros((m + 1, m))
        g = np.zeros(m + 1)
        cs = np.zeros(m)
        sn = np.zeros(m)
        beta = np.linalg.norm(w)
        s = fsign(beta, w[0])
        g[0] = -s
        u = w.copy()
        u[0] += s
        P[0] = u / np.linalg.norm(u)
        ferr = np.zeros(m)
        n_out = 0
        converged = False
        for j in range(m):
            n_out = j + 1
            v = np.zeros(n)
            v[j] = 1.0
            for i in range(j, -1, -1):
                v -= 2.0 * P[i] * (v @ P[i])
            z = matvec(v)
            w = m_inv(z) if m_inv else z
            for i in range(j + 1):
                w -= 2.0 * P[i] * (w @ P[i])
            col = np.zeros(m + 1)
            col[: j + 1] = w[: j + 1]
            tmp = np.linalg.norm(w[j + 1 :])
            col[j + 1] = -tmp if w[j + 1] > 0 else tmp
            h_val = tmp
            u = w.copy()
            u[: j + 1] = 0.0
            u[j + 1] -= col[j + 1]
            un = np.linalg.norm(u)
            if un > 0:
                P[j + 1] = u / un
            col = _apply_givens(cs, sn, col, j)
            ds = np.hypot(col[j + 1], col[j])
            cs[j] = col[j] / ds
            sn[j] = col[j + 1] / ds
            col[j] = cs[j] * col[j] + sn[j] * col[j + 1]
            col[j + 1] = 0.0
            H[:, j] = col
            tmp = g[j]
            g[j] = cs[j] * tmp + sn[j] * g[j + 1]
            g[j + 1] = -sn[j] * tmp + cs[j] * g[j + 1]
            ferr[j] = abs(g[j + 1]) / beta0
            if ferr[j] < tol:
                converged = True
                break
        k = n_out
        y = np.zeros(m)
        y[k - 1] = g[k - 1] / H[k - 1, k - 1]
        for i in range(k - 2, -1, -1):
            y[i] = (g[i] - H[i, i + 1 : k] @ y[i + 1 : k]) / H[i, i]
        w = np.zeros(n)
        w[:k] = y[:k]
        for i in range(k - 1, -1, -1):
            w -= 2.0 * P[i] * (P[i] @ w)
        x = x + w
        if converged or ferr[n_out - 1] < tol:
            return x, n_out, st, ferr, P
    return x, n_out, max_restarts, ferr, P


def golden_lgmres(matvec, b, m, k_aug, tol, max_restarts):
    """NumPy LGMRES oracle (Baker-Jessup-Manteuffel 2005).

    Space per cycle = K_m(A, r) (orthonormalized Arnoldi) with the
    last k_aug outer corrections appended, minimized by a dense
    least-squares on A Z — deliberately a DIFFERENT numerical route
    from the library's Givens/flexible-Arnoldi machinery, so trajectory
    agreement validates the mathematics rather than echoing the code.
    Returns (x, per_cycle_rel_history).
    """
    x = np.zeros_like(b)
    beta0 = np.linalg.norm(b)
    aug = []  # (z, unused) pairs, newest first
    hist = []
    for _ in range(max_restarts):
        r = b - matvec(x)
        rel = np.linalg.norm(r) / beta0
        hist.append(rel)
        if rel < tol:
            break
        v_basis = [r / np.linalg.norm(r)]
        zcols = []
        for j in range(m):
            zcols.append(v_basis[j])
            w = matvec(v_basis[j])
            for _pass in range(2):
                for v in v_basis:
                    w = w - v * np.dot(v, w)
            nw = np.linalg.norm(w)
            if nw < 1e-300:
                break
            v_basis.append(w / nw)
        zcols.extend(z for z, _ in aug[:k_aug])
        zmat = np.stack(zcols, axis=1)
        azmat = np.stack([matvec(z) for z in zcols], axis=1)
        y, *_ = np.linalg.lstsq(azmat, r, rcond=None)
        dx = zmat @ y
        x = x + dx
        az = matvec(dx)
        nz = np.linalg.norm(az)
        if nz > 0:
            aug.insert(0, (dx / nz, None))
            aug = aug[:k_aug]
    return x, hist


def golden_gmres_dr(matvec, b, m, k, tol, max_restarts):
    """NumPy GMRES-DR oracle (Morgan, SIMAX 2002, Thm 2.2 subspace).

    Deliberately a long-vector route, disjoint from the solver's
    coordinate machinery: each cycle orthonormalizes the EXPLICIT
    subspace [Y, r, A r, ..., A^{m-k-1} r], minimizes by dense lstsq on
    A W, and extracts the next cycle's Y as harmonic Ritz vectors from
    the generalized eigenproblem (AW)^H(AW) g = theta (AW)^H W g solved
    with numpy on long vectors. Both implementations minimize over the
    same mathematical subspace, so per-cycle residual norms must agree
    to rounding.  Returns (x, per_cycle_rel_history).
    """
    n = b.size
    x = np.zeros_like(b)
    beta0 = np.linalg.norm(b)
    y_defl = np.zeros((n, 0))
    hist = []
    for _ in range(max_restarts):
        r = b - matvec(x)
        rel = np.linalg.norm(r) / beta0
        hist.append(rel)
        if rel < tol:
            break
        # Orthonormal W: QR(Y) columns, the orthogonalized residual,
        # then Arnoldi continuation (2-pass MGS on long vectors) — the
        # same span as [Y, r, A r, ...] but numerically stable (a raw
        # power basis loses orthogonality at cond(A)^j).
        if y_defl.shape[1]:
            wq, _ = np.linalg.qr(y_defl)
            basis = [wq[:, i] for i in range(wq.shape[1])]
        else:
            basis = []
        v = r.copy()
        while len(basis) < m:
            for _pass in range(2):
                for u in basis:
                    v = v - u * (u @ v)
            nv = np.linalg.norm(v)
            if nv < 1e-13 * beta0:
                break
            basis.append(v / nv)
            v = matvec(basis[-1])
        w = np.stack(basis, axis=1)
        aw = np.stack([matvec(w[:, i]) for i in range(w.shape[1])],
                      axis=1)
        yy, *_ = np.linalg.lstsq(aw, r, rcond=None)
        x = x + w @ yy
        # Harmonic Ritz from the same subspace (generalized eig).
        lhs = aw.conj().T @ aw
        rhs = aw.conj().T @ w
        theta, g = np.linalg.eig(np.linalg.solve(rhs, lhs))
        order = np.argsort(np.abs(theta))
        sel, i = [], 0
        while len(sel) < k and i < len(order):
            gi = g[:, order[i]]
            if np.abs(theta[order[i]].imag) > 1e-12 * (
                np.abs(theta[order[i]]) + 1.0
            ):
                sel.append((w @ gi).real)
                sel.append((w @ gi).imag)
                i += 2  # conjugate partner adds nothing new
            else:
                sel.append((w @ gi).real)
                i += 1
        y_defl = np.stack(sel, axis=1) if sel else np.zeros((n, 0))
    return x, hist
