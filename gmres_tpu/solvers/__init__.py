"""Krylov solver cores: CG, BiCGSTAB, restarted GMRES (Householder /
MGSR variants), Lanczos spectral-bound estimation."""
