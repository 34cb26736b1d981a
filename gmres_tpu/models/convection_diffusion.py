"""2-D convection-diffusion model problem (nonsymmetric).

The reference library has no nonsymmetric model problem, but its
BiCGSTAB solver exists for exactly this class; BASELINE.md config 3
specifies "BiCGSTAB on nonsymmetric 2-D convection-diffusion, 256×256
stencil". Discretization: −Δu + (bx, by)·∇u with central differences on
a uniform grid, scaled like the reference Poisson stencil (center 4):

    y(i,j) = 4·x(i,j) − (1+γy)·x(i−1,j) − (1−γy)·x(i+1,j)
                      − (1+γx)·x(i,j−1) − (1−γx)·x(i,j+1)

with cell-Péclet numbers γ = b·h/2. γ=0 recovers the Poisson stencil.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from gmres_tpu.ops.stencil import stencil_5pt_general


def convection_diffusion_coefs(gamma_x: float, gamma_y: float):
    """(center, west, east, south, north) stencil coefficients."""
    return (
        4.0,
        -(1.0 + gamma_x),
        -(1.0 - gamma_x),
        -(1.0 + gamma_y),
        -(1.0 - gamma_y),
    )


def convection_diffusion_coefs_upwind(gamma_x: float, gamma_y: float):
    """(center, west, east, south, north) for the FIRST-ORDER UPWIND
    discretization of the same operator: the convection term uses the
    one-sided difference against the flow (b·h·∂x u ≈ 2γx·(u_j − u_{j−1})
    for γx > 0), giving an M-matrix for ANY cell-Péclet number — the
    stable rediscretization for multigrid coarse levels where the
    doubled γ makes central differences oscillatory (|γ| ≥ 1). First-
    order accurate in the convection term, which is irrelevant for a
    coarse-grid CORRECTION but would be wrong for the fine-level
    operator itself (keep central there)."""
    gx, gy = float(gamma_x), float(gamma_y)
    return (
        4.0 + 2.0 * abs(gx) + 2.0 * abs(gy),
        -(1.0 + 2.0 * max(gx, 0.0)),
        -(1.0 + 2.0 * max(-gx, 0.0)),
        -(1.0 + 2.0 * max(gy, 0.0)),
        -(1.0 + 2.0 * max(-gy, 0.0)),
    )


def convection_diffusion_apply(
    x: jnp.ndarray, gamma_x: float = 0.4, gamma_y: float = 0.2
) -> jnp.ndarray:
    """y = A·x on an (N, N) grid (or flat (N²,))."""
    c = convection_diffusion_coefs(gamma_x, gamma_y)
    if x.ndim == 1:
        n = int(round(x.shape[0] ** 0.5))
        return stencil_5pt_general(x.reshape(n, n), *c).reshape(-1)
    return stencil_5pt_general(x, *c)


def convection_diffusion_operator(
    nsize: int, gamma_x: float = 0.4, gamma_y: float = 0.2
) -> Callable:
    c = convection_diffusion_coefs(gamma_x, gamma_y)

    def apply_grid(x: jnp.ndarray) -> jnp.ndarray:
        return stencil_5pt_general(x, *c)

    return apply_grid


def convection_diffusion_matrix(
    nsize: int, gamma_x: float = 0.4, gamma_y: float = 0.2, dtype=jnp.float64
) -> jnp.ndarray:
    """Dense assembly for small-n validation (C-order flattening)."""
    c0, cw, ce, cs, cn = convection_diffusion_coefs(gamma_x, gamma_y)
    eye = jnp.eye(nsize, dtype=dtype)
    kx = (
        c0 / 2.0 * jnp.eye(nsize, dtype=dtype)
        + cw * jnp.eye(nsize, k=-1, dtype=dtype)
        + ce * jnp.eye(nsize, k=1, dtype=dtype)
    )
    ky = (
        c0 / 2.0 * jnp.eye(nsize, dtype=dtype)
        + cs * jnp.eye(nsize, k=-1, dtype=dtype)
        + cn * jnp.eye(nsize, k=1, dtype=dtype)
    )
    return jnp.kron(eye, kx) + jnp.kron(ky, eye)


def convection_diffusion_eigenvalues(
    nsize: int, gamma_x: float = 0.4, gamma_y: float = 0.2
):
    """Closed-form spectrum (NumPy, host-side) of the central-difference
    operator: the tensor structure gives

        λ(i, j) = 4 − 2√(1−γx²)·cos(iπh) − 2√(1−γy²)·cos(jπh)

    with h = 1/(nsize+1); for |γ| > 1 the square root is imaginary and
    the spectrum is complex (convection-dominated regime). Used as the
    eigensolver oracle (benchmarks/cli.py `eig --method arnoldi`,
    tests/test_arnoldi_eigs.py) — an (n²,) complex array."""
    import numpy as np

    h = np.pi / (nsize + 1)
    sx = np.emath.sqrt(1.0 - gamma_x * gamma_x)
    sy = np.emath.sqrt(1.0 - gamma_y * gamma_y)
    i = np.arange(1, nsize + 1)
    lx = 2.0 - 2.0 * sx * np.cos(i * h)
    ly = 2.0 - 2.0 * sy * np.cos(i * h)
    return (lx[:, None] + ly[None, :]).ravel()
