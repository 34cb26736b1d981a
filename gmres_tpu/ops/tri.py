"""Masked triangular solve for the projected GMRES system.

The reference back-substitutes the leading k×k block of the rotated
Hessenberg by hand (gmres_hh.f90:93-98, gmres_mgsr.f90:75-80) with k
known at runtime. Under jit, k is a traced value, so instead the full
static (m, m) system is solved after masking: rows/cols ≥ k are replaced
by the identity with zero rhs, making the extra unknowns exactly zero
while the leading block is untouched. One ``solve_triangular`` on a
replicated small matrix — no communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_back_substitution(
    h: jnp.ndarray, g: jnp.ndarray, k
) -> jnp.ndarray:
    """Solve H[:k,:k] y = g[:k]; return (m,) y padded with zeros.

    h: (m+1, m) rotated (upper-triangular) Hessenberg storage.
    g: (m+1,) rotated rhs.
    k: number of valid columns (traced int).
    """
    m = h.shape[1]
    rows = jnp.arange(m)[:, None]
    cols = jnp.arange(m)[None, :]
    active = (rows < k) & (cols < k)
    hm = jnp.where(active, h[:m, :m], jnp.eye(m, dtype=h.dtype))
    gm = jnp.where(jnp.arange(m) < k, g[:m], 0.0)
    return jax.scipy.linalg.solve_triangular(hm, gm, lower=False)
