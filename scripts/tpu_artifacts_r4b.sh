#!/bin/bash
# Round-4 supplemental TPU batch: rows the main r4 batch could not
# capture because their fixes landed while it was running. Run AFTER
# scripts/tpu_artifacts_r4.sh completes (one chip).
set -x
cd "$(dirname "$0")/.."

# CSL Helmholtz via split-complex (this runtime has no complex
# datapath: c128 fails to compile, every c64 op fails at run time) —
# real-equivalent (2, N, N) f64 system, full 1e-8 tolerance,
# restart 2x60 (restart truncation is what hurts the real form).
timeout 1800 python -m benchmarks.cli helmholtz --nsize 512 \
  --kh2 0.25 --tol 1e-8 --precond csl --precision split \
  --jsonl artifacts/helmholtz_tpu.jsonl

# Roofline re-record (the r4 attempt crashed on the dd kernels'
# optimization_barrier before the no_fences fix): VMEM-resident rows
# flagged, dd f64 rows included.
timeout 3000 python -m benchmarks.cli roofline --grids 1024,2048,4096 \
  --jsonl artifacts/roofline_tpu_r4.jsonl

# LOBPCG 1024² at an honestly-sized RELATIVE tolerance: rtol 1e-4 was
# mis-sized (1e-4·lambda_1 = 1.9e-9, TIGHTER than the failed absolute
# row); rtol 1e-2 thresholds each pair at 1% of its own eigenvalue.
timeout 1800 python -m benchmarks.cli eig --nsize 1024 --k 4 \
  --tol 0 --rtol 1e-2 --max-iterations 300 \
  --jsonl artifacts/eig_tpu.jsonl

# theta-evolve gmres/gcrodr with the production shifted-MG
# preconditioner (sigma = 1/(theta*dt)): unpreconditioned GMRES
# stagnates on the stiff implicit operator and the single-dispatch
# trajectory tripped the ~30 s watchdog twice (TPU worker crash).
timeout 1800 python -m benchmarks.cli evolve --nsize 512 --steps 50 \
  --dt 1.0 --solver gmres --tol 1e-9 --precond mg \
  --jsonl artifacts/evolve_tpu.jsonl
# gcrodr rows (evolve --solver gcrodr, bratu --inner gcrodr, the
# sequence sweep) are NOT RUNNABLE on this runtime: GCRO-DR's in-jit
# harmonic-Ritz eigensolver (ops/hessenberg_eig.py) is complex
# arithmetic, and this axon libtpu has no complex support at all —
# the remote compile helper SIGABRTs on the program (c64 ops also
# fail UNIMPLEMENTED at run time in plain probes). CPU-mesh evidence
# stands; recorded as a standing runtime limitation in BASELINE.md.

# Tail steps of the main r4 batch, repeated here because an edit to
# the running script file shifted bash's read offset and the tail's
# execution is unreliable (lesson: never edit a running script).
timeout 1800 python -m benchmarks.cli evolve --model heat \
  --solver expm --nsize 512 --steps 50 --dt 0.5 --expm-steps 30 \
  --jsonl artifacts/evolve_tpu.jsonl
timeout 1800 python -m benchmarks.cli convdiff --nsize 64 \
  --tol 1e-9 --precond poly --solver gmres --poly-degree 24 \
  --jsonl artifacts/convdiff_tpu.jsonl
timeout 1800 python -m benchmarks.cli convdiff --nsize 128 \
  --tol 1e-9 --precond poly --solver gmres --poly-degree 48 \
  --jsonl artifacts/convdiff_tpu.jsonl
timeout 3000 python bench.py > artifacts/bench_decomposed_tpu.json

# JFNK + gcrodr-inner recycling evidence at a size where the
# UNPRECONDITIONED inner is feasible (1024² unpreconditioned stalls
# the line search at kappa ~ 4e5; the documented win case is 64-256).
timeout 1800 python -m benchmarks.cli bratu --nsize 256 --lam 5.0 \
  --tol 1e-9 --precond none --max-newton 50 \
  --jsonl artifacts/bratu_tpu.jsonl
# (the --inner gcrodr arm is blocked by the same complex-eig
# compile SIGABRT as above)

# slq re-record at a feasible memory footprint (the r4 attempt at
# probes 8,16,32 / steps 40 / 512^2 f64 exhausted HBM in the batched
# Lanczos temporaries).
timeout 1800 python -m benchmarks.cli slq --nsize 512 \
  --probes-list 4,8,16 --steps 30 --jsonl artifacts/slq_tpu.jsonl

# f64 bratu rerun with the fgmres breakdown_check fix (the r4 row
# stalled at ||F0||: fgmres's hardcoded lucky-breakdown exit fired at
# the loose Eisenstat-Walker forcing; CPU now converges 5 Newton / 26
# inner).
timeout 1800 python -m benchmarks.cli bratu --nsize 1024 --lam 5.0 \
  --tol 1e-9 --jsonl artifacts/bratu_tpu.jsonl
