#!/bin/bash
# Round-3 TPU artifact batch for the new capabilities. Run on a healthy
# axon tunnel; each subcommand writes its JSONL only at the END (a
# timeout loses the run — CLAUDE.md rule 11), and a fresh process's
# first row can take 6-10 minutes (cold dispatch + remote compiles).
set -x
cd "$(dirname "$0")/.."

# Symmetric-indefinite flagship: MINRES + SPD shifted-Laplacian at scale
timeout 3000 python -m benchmarks.cli helmholtz --nsize 1024 \
  --kh2-factor 10 --tol 1e-9 --jsonl artifacts/helmholtz_tpu.jsonl
timeout 1800 python -m benchmarks.cli helmholtz --nsize 1024 \
  --kh2-factor 10 --tol 1e-9 --precision mixed \
  --jsonl artifacts/helmholtz_tpu.jsonl
# Complex CSL route (wave-resolution kh2)
timeout 1800 python -m benchmarks.cli helmholtz --nsize 512 \
  --kh2 0.25 --tol 1e-8 --precond csl \
  --jsonl artifacts/helmholtz_tpu.jsonl

# Eigensolver: k smallest Poisson pairs, MG-preconditioned LOBPCG
timeout 1800 python -m benchmarks.cli eig --nsize 1024 --k 4 \
  --tol 1e-8 --jsonl artifacts/eig_tpu.jsonl
# Nonsymmetric eigenpairs: Krylov-Schur on convection-dominated convdiff
timeout 1800 python -m benchmarks.cli eig --method arnoldi --nsize 512 \
  --k 4 --steps 40 --tol 1e-8 --jsonl artifacts/eig_tpu.jsonl

# 3-D scale sweep (MG-CG on the 7-point stencil)
timeout 3000 python -m benchmarks.cli scale --dim 3 \
  --grids 64,128,256 --tol 1e-8 --jsonl artifacts/scale3d_tpu.jsonl

# Krylov recycling: Helmholtz frequency sweep, GMRES-stagnation class
timeout 2400 python -m benchmarks.cli sequence --nsize 256 --k 10 \
  --restart 40 --tol 1e-8 --kh2-factors 10.0,10.5,11.0 --with-gmres \
  --max-restarts 400 --jsonl artifacts/sequence_tpu.jsonl

# Nonlinear flagship: JFNK Bratu at scale (f64 + mixed inner)
timeout 1800 python -m benchmarks.cli bratu --nsize 1024 --lam 5.0 \
  --tol 1e-9 --jsonl artifacts/bratu_tpu.jsonl
timeout 1800 python -m benchmarks.cli bratu --nsize 1024 --lam 5.0 \
  --tol 1e-9 --precision mixed --jsonl artifacts/bratu_tpu.jsonl

# Time-dependent trajectories: θ-method convdiff, recycled vs fresh
timeout 1800 python -m benchmarks.cli evolve --nsize 512 --steps 50 \
  --dt 1.0 --solver gcrodr --tol 1e-9 --jsonl artifacts/evolve_tpu.jsonl
timeout 1800 python -m benchmarks.cli evolve --nsize 512 --steps 50 \
  --dt 1.0 --solver gmres --tol 1e-9 --jsonl artifacts/evolve_tpu.jsonl
timeout 1800 python -m benchmarks.cli evolve --nsize 512 --steps 50 \
  --dt 1.0 --solver bicgstab --tol 1e-9 --jsonl artifacts/evolve_tpu.jsonl

# JFNK with recycling inner (vs the committed gmres-inner rows)
timeout 1800 python -m benchmarks.cli bratu --nsize 1024 --lam 5.0 \
  --tol 1e-9 --precond none --inner gcrodr --max-newton 50 \
  --jsonl artifacts/bratu_tpu.jsonl

# Krylov exponential integrator: heat trajectory, spectrally exact
timeout 1800 python -m benchmarks.cli evolve --model heat \
  --solver expm --nsize 512 --steps 50 --dt 0.5 --expm-steps 30 \
  --jsonl artifacts/evolve_tpu.jsonl

# Heterogeneous media: high-contrast inclusions, 4 preconditioner rows
timeout 2400 python -m benchmarks.cli varcoef --nsize 512 \
  --contrast 1e5 --tol 1e-9 --jsonl artifacts/varcoef_tpu.jsonl

# Reduction-free polynomial preconditioner on convdiff (TPU row)
timeout 1800 python -m benchmarks.cli convdiff --nsize 256 \
  --tol 1e-9 --precond poly --solver gmres --poly-degree 24 \
  --jsonl artifacts/convdiff_tpu.jsonl
