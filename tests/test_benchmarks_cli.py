"""Smoke tests for the driver CLI (SURVEY §4: one subcommand per
reference program). Tiny sizes — correctness of the underlying solvers
is covered elsewhere; here we check each driver runs, prints the table,
and emits JSONL."""

import json

import pytest

from benchmarks.cli import main


@pytest.mark.parametrize(
    "argv",
    [
        ["dense-poisson", "--nsize", "8", "--restart", "20",
         "--tol", "1e-12"],
        ["hilbert", "--n", "8", "--restart", "8", "--tol", "1e-14"],
        ["poisson-mf", "--nsize", "24", "--restart", "20",
         "--tol", "1e-10", "--no-v-err"],
        ["poisson-mf", "--nsize", "24", "--restart", "20",
         "--tol", "1e-9", "--no-v-err", "--mixed"],
        ["cg", "--grids", "16:24:8", "--tol", "1e-8"],
        ["bicgstab", "--grids", "16:16:8", "--tol", "1e-8"],
        ["convdiff", "--nsize", "16", "--tol", "1e-8"],
        ["convdiff", "--nsize", "16", "--tol", "1e-8", "--precond",
         "mg", "--precision", "mixed"],
        ["convdiff", "--nsize", "16", "--tol", "1e-8", "--precond",
         "mg", "--solver", "gmres", "--precision", "mixed"],
        ["convdiff", "--nsize", "32", "--tol", "1e-8", "--precond",
         "poly", "--solver", "gmres", "--poly-degree", "16"],
        ["eig", "--nsize", "32", "--k", "3", "--tol", "1e-6"],
        ["eig", "--nsize", "16", "--k", "4", "--tol", "1e-8",
         "--method", "arnoldi", "--steps", "20",
         "--max-iterations", "200"],
        ["eig", "--nsize", "32", "--k", "3", "--tol", "1e-6",
         "--precond", "none", "--max-iterations", "400"],
        ["bratu", "--nsize", "24", "--lam", "5.0", "--tol", "1e-10"],
        ["sequence", "--nsize", "24", "--k", "5", "--restart", "16",
         "--tol", "1e-8", "--kh2-factors", "10.0,10.5",
         "--max-restarts", "300", "--with-gmres"],
        ["bratu", "--nsize", "32", "--lam", "5.0", "--tol", "1e-9",
         "--precision", "mixed"],
        ["helmholtz", "--nsize", "32", "--tol", "1e-8"],
        ["helmholtz", "--nsize", "32", "--tol", "1e-8", "--precond",
         "none", "--solver", "gmres"],
        ["helmholtz", "--nsize", "32", "--tol", "1e-8", "--precision",
         "mixed"],
        ["helmholtz", "--nsize", "32", "--kh2", "0.2", "--tol", "1e-7",
         "--precond", "csl", "--damping", "0.1"],
        ["strong-scaling", "--nsize", "16", "--restart", "10",
         "--tol", "1e-8", "--max-devices", "4", "--max-restarts", "200"],
        ["strong-scaling", "--nsize", "16", "--restart", "10",
         "--tol", "1e-8", "--max-devices", "2", "--explicit-halo",
         "--max-restarts", "200"],
        ["weak-scaling", "--nsize-per-device", "8", "--restart", "10",
         "--tol", "1e-8", "--max-devices", "2", "--max-restarts", "200"],
        ["restart-sweep", "--nsize", "16", "--start", "5", "--step", "5",
         "--ntests", "2", "--tol", "1e-8"],
        ["restart-sweep", "--nsize", "16", "--start", "5", "--step", "5",
         "--ntests", "2", "--tol", "1e-8", "--cycle-reps", "2",
         "--repeats", "2"],
        ["restart-sweep", "--nsize", "16", "--start", "5", "--step", "5",
         "--ntests", "2", "--tol", "1e-8", "--solver", "lgmres",
         "--aug", "2", "--cycle-reps", "2", "--repeats", "2"],
        ["restart-sweep", "--nsize", "16", "--start", "8", "--step", "4",
         "--ntests", "2", "--tol", "1e-8", "--solver", "gmres-dr",
         "--deflate", "3"],
        ["weak-scaling", "--nsize-per-device", "8", "--restart", "10",
         "--tol", "1e-8", "--max-devices", "2", "--max-restarts", "200",
         "--precond", "chebyshev"],
        ["spmv", "--nsize", "32", "--reps", "2"],
        ["roofline", "--grids", "32", "--reps", "2"],
        ["scale", "--grids", "16,32", "--restart", "8", "--tol", "1e-8"],
        ["scale", "--grids", "16,32", "--tol", "1e-8", "--dim", "3"],
        ["multirhs", "--nsize", "32", "--s-list", "1,2", "--tol",
         "1e-7"],
        ["multirhs", "--nsize", "32", "--s-list", "2", "--solver",
         "block-gmres", "--tol", "1e-7", "--restart", "16"],
        ["slq", "--nsize", "32", "--probes-list", "4", "--steps", "20"],
        ["helmholtz", "--nsize", "32", "--kh2", "0.2", "--tol", "1e-5",
         "--precond", "csl", "--precision", "c64"],
        ["eig", "--nsize", "16", "--k", "4", "--tol", "1e-4",
         "--method", "arnoldi", "--steps", "20", "--precision", "f32",
         "--max-iterations", "200"],
        ["helmholtz", "--nsize", "32", "--kh2", "0.2", "--tol", "1e-7",
         "--precond", "csl", "--precision", "split"],
        ["eig", "--nsize", "24", "--k", "3", "--tol", "0", "--method",
         "subspace", "--max-iterations", "200"],
        ["eig", "--nsize", "16", "--k", "4", "--tol", "1e-8",
         "--method", "ks_real", "--steps", "20",
         "--max-iterations", "200"],
        ["helmholtz", "--nsize", "32", "--kh2", "0.2", "--tol", "1e-7",
         "--precond", "csl", "--precision", "split", "--chunks", "2",
         "--max-iterations", "240"],
        ["helmholtz", "--nsize", "32", "--kh2", "0.2", "--tol", "1e-7",
         "--precond", "csl", "--precision", "split", "--solver",
         "gcrodr", "--deflate", "5", "--restart", "20", "--chunks",
         "2", "--max-iterations", "200"],
    ],
)
def test_cli_smoke(argv, capsys):
    main(argv)
    out = capsys.readouterr().out
    if argv[0] == "spmv":
        assert "kernel" in out and "stencil-jnp-f64" in out
    elif argv[0] == "slq":
        # the SLQ table has no residual column; value/stderr live in
        # the JSONL extra fields
        assert "slq-logdet" in out
    else:
        assert "solver" in out  # header printed
        assert "e-" in out or "e+" in out  # scientific cells present


def test_cli_jsonl(tmp_path, capsys):
    path = tmp_path / "rows.jsonl"
    main(["hilbert", "--n", "8", "--restart", "8", "--jsonl", str(path)])
    capsys.readouterr()
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(rows) == 2
    assert {r["name"] for r in rows} == {
        "gmres-mgsr-hilbert", "gmres-householder-hilbert"
    }
