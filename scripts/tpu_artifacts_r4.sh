#!/bin/bash
# Round-4 TPU artifact batch: the re-records and new captures the
# round-3 verdict asked for. Run on a healthy axon tunnel AFTER
# scripts/tpu_artifacts_r3.sh (one chip — never concurrently).
# CLAUDE.md rules 7/11 apply: JSONL is written only at the END of each
# invocation, first rows can take 6-10 min in a fresh process.
set -x
cd "$(dirname "$0")/.."

# (a) CSL Helmholtz via SPLIT-COMPLEX (the c64 attempt failed at RUN
# time: this v5e runtime has no complex datapath at all — every c64 op
# returns UNIMPLEMENTED, and c128 fails to compile). The split route
# is the real-equivalent (2, N, N) system in plain f64: full 1e-8
# tolerance, restart 2x60.
timeout 1800 python -m benchmarks.cli helmholtz --nsize 512 \
  --kh2 0.25 --tol 1e-8 --precond csl --precision split \
  --jsonl artifacts/helmholtz_tpu.jsonl

# (b0) LOBPCG 1024² rerun at a scale-appropriate tolerance: the tol is
# ABSOLUTE on ‖Ax − λx‖ while λ₁ = 2π²h² ≈ 1.9e-5 at 1024², so the r3
# row's 1e-8 demanded a 5e-4-relative residual and hit the iteration
# cap at 2e-7 (eigenvalues were still good to 6e-9 absolute). 1e-6
# absolute ≈ 5% of λ₁'s scale is the honest production setting.
timeout 1800 python -m benchmarks.cli eig --nsize 1024 --k 4 \
  --tol 0 --rtol 1e-4 --jsonl artifacts/eig_tpu.jsonl

# (b) Krylov-Schur on TPU: NOT RUNNABLE on this runtime — the solver's
# basis arithmetic is complex (c64/c128), and every complex op fails
# here (c64 at run time, c128 at compile time). CPU-mesh evidence
# stands (tests/test_arnoldi_eigs.py); a split-complex Arnoldi basis
# is the designed follow-up. Recorded as a standing limitation in
# BASELINE.md.

# (c) Roofline re-record: VMEM-resident rows now flagged, dd f64 rows
# added; 4096^2 is the honest HBM row for f32, 2048^2 for f64.
timeout 3000 python -m benchmarks.cli roofline --grids 1024,2048,4096 \
  --jsonl artifacts/roofline_tpu_r4.jsonl

# (d) Multi-RHS amortization: block-CG (MG-preconditioned) and
# block-GMRES, s = 1,2,4,8.
timeout 2400 python -m benchmarks.cli multirhs --nsize 512 \
  --s-list 1,2,4,8 --tol 1e-8 --jsonl artifacts/multirhs_tpu.jsonl
timeout 2400 python -m benchmarks.cli multirhs --nsize 256 \
  --s-list 1,2,4,8 --solver block-gmres --tol 1e-8 --restart 30 \
  --jsonl artifacts/multirhs_tpu.jsonl

# (e) SLQ probe sweep: one-dispatch tr log A, probes near-free until
# the batched stencil saturates the chip.
timeout 1800 python -m benchmarks.cli slq --nsize 512 \
  --probes-list 8,16,32 --steps 40 --jsonl artifacts/slq_tpu.jsonl

# (f) r3-batch reruns. evolve gmres/gcrodr and bratu-gcrodr failed on
# the TPU's missing f64 LuDecomposition (fixed: ops/tri.py solve_small
# now backs the GCRO-DR pencil / GMRES-DR transpose / IDR(s) shadow
# solves); the sequence run tripped the ~30 s device watchdog with the
# plain-GMRES 400-restart comparison arm (CLAUDE.md rule 4) — capped.
timeout 1800 python -m benchmarks.cli evolve --nsize 512 --steps 50 \
  --dt 1.0 --solver gmres --tol 1e-9 --jsonl artifacts/evolve_tpu.jsonl
timeout 1800 python -m benchmarks.cli evolve --nsize 512 --steps 50 \
  --dt 1.0 --solver gcrodr --tol 1e-9 --jsonl artifacts/evolve_tpu.jsonl
timeout 1800 python -m benchmarks.cli bratu --nsize 1024 --lam 5.0 \
  --tol 1e-9 --precond none --inner gcrodr --max-newton 50 \
  --jsonl artifacts/bratu_tpu.jsonl
# f64 bratu rerun: the r3 row died at ||F(x0)|| because the LEFT-
# preconditioned inner accepted a direction with true linear residual
# 15.8 (M-norm said 0.22); the inner is now right-preconditioned
# FGMRES and the same config converges (4 Newton steps to 4.9e-12,
# probed on this chip).
timeout 1800 python -m benchmarks.cli bratu --nsize 1024 --lam 5.0 \
  --tol 1e-9 --jsonl artifacts/bratu_tpu.jsonl
timeout 2400 python -m benchmarks.cli sequence --nsize 256 --k 10 \
  --restart 40 --tol 1e-8 --kh2-factors 10.0,10.5,11.0 --with-gmres \
  --max-restarts 100 --jsonl artifacts/sequence_tpu.jsonl
# expm row re-record: the previous row's wall_s was ~0 (sync bug in
# _sync for ExpEvolveResult, fixed).
timeout 1800 python -m benchmarks.cli evolve --model heat \
  --solver expm --nsize 512 --steps 50 --dt 0.5 --expm-steps 30 \
  --jsonl artifacts/evolve_tpu.jsonl

# (g0) Poly-preconditioned convdiff re-record at configs where the
# polynomial CAN enclose the spectrum: the r3 row (256², degree 24)
# diverged on TPU AND CPU alike — the required degree grows like
# 1/h (tests/test_polynomial.py::test_degree_too_low pins the failure
# mode), so 256²/24 was mis-sized, not a TPU bug. The documented win
# config is 64²/deg 24 (PARITY row); 128²/deg 48 probes the scaling.
timeout 1800 python -m benchmarks.cli convdiff --nsize 64 \
  --tol 1e-9 --precond poly --solver gmres --poly-degree 24 \
  --jsonl artifacts/convdiff_tpu.jsonl
timeout 1800 python -m benchmarks.cli convdiff --nsize 128 \
  --tol 1e-9 --precond poly --solver gmres --poly-degree 48 \
  --jsonl artifacts/convdiff_tpu.jsonl

# (g) Headline decomposition validation on the real chip (the driver's
# round-end bench.py run records BENCH_r04; this validates the new
# decomposition field against the same hardware first).
timeout 3000 python bench.py > artifacts/bench_decomposed_tpu.json
