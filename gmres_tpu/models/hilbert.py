"""Hilbert matrix — the ill-conditioned dense orthogonality stress test.

Reference: ``src/problems/hilbert.f90:6-18``: H(i,j) = 1/(i+j−1)
(1-based). Quirk (SURVEY §2 C12 vicinity): the reference computes the
entry in *single* precision (`1 / real(i+j-1)` with default-real
`real()`) before storing into real(8); pass ``reference_rounding=True``
to reproduce that bit pattern for exact parity studies.
"""

from __future__ import annotations

import jax.numpy as jnp


def hilbert_matrix(
    n: int, dtype=jnp.float64, reference_rounding: bool = False
) -> jnp.ndarray:
    i = jnp.arange(1, n + 1, dtype=jnp.int32)
    denom = i[:, None] + i[None, :] - 1
    if reference_rounding:
        return (1.0 / denom.astype(jnp.float32)).astype(dtype)
    return 1.0 / denom.astype(dtype)
