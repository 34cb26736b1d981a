"""Preconditioners: Chebyshev polynomial (reference parity + general
order), and Lanczos-fed adaptive construction."""
