"""Compute kernels: pytree BLAS-1, stencils, sparse matvecs, small dense
helpers (Givens, triangular solve, compact-WY reflectors)."""
