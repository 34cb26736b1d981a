"""Reporting (SURVEY C15) and checkpoint/resume (§5) utilities."""

import json

import jax.numpy as jnp
import numpy as np

import gmres_tpu as gt
from gmres_tpu.utils.checkpoint import (
    gmres_checkpointed,
    load_checkpoint,
    save_checkpoint,
)
from gmres_tpu.utils.reporting import (
    RunRecord,
    print_table,
    record_from_result,
    write_jsonl,
)


def _solve(n=20, **kw):
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    return op, b, gt.gmres(op, b, restart=30, tol=1e-10, **kw)


def test_record_from_result_fields():
    op, b, res = _solve()
    rec = record_from_result(
        "hh", res, x_true=jnp.ones((20, 20)), wall_s=0.5, tol=1e-10,
        nnz=5 * 400,
    )
    assert rec.nvars == 400
    assert rec.iterations == int(res.iterations)
    assert rec.restarts == int(res.restarts)
    assert rec.linf_error < 1e-7
    assert rec.v_err is not None
    assert rec.nnz_per_s == 5 * 400 * rec.iterations / 0.5
    assert rec.iters_per_s == rec.iterations / 0.5


def test_print_table_and_jsonl(capsys, tmp_path):
    op, b, res = _solve()
    rec = record_from_result("hh", res, x_true=jnp.ones((20, 20)),
                             wall_s=0.1)
    print_table([rec])
    out = capsys.readouterr().out
    assert "solver" in out and "hh" in out and "L2" in out

    path = tmp_path / "runs.jsonl"
    write_jsonl([rec, rec], str(path))
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2
    d = json.loads(lines[0])
    assert d["name"] == "hh" and d["nvars"] == 400


def test_missing_fields_render_as_dash(capsys):
    print_table([RunRecord(name="x", nvars=4, iterations=1)])
    out = capsys.readouterr().out
    assert "-" in out


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "state.npz")
    x = jnp.arange(12.0).reshape(3, 4)
    save_checkpoint(p, x, 7)
    ck = load_checkpoint(p)
    np.testing.assert_array_equal(ck["x"], np.asarray(x))
    assert int(ck["restarts_done"]) == 7


def test_gmres_checkpointed_matches_plain(tmp_path):
    """Chunked+checkpointed solve converges to the same answer as one
    uninterrupted solve (restart boundaries are exact state)."""
    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    p = str(tmp_path / "gm.npz")
    res = gmres_checkpointed(
        op, b, checkpoint_path=p, chunk_restarts=2, max_restarts=100,
        restart=10, tol=1e-10, compute_v_err=False,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-7)
    # checkpoint file exists with the restart count
    ck = load_checkpoint(p)
    assert int(ck["restarts_done"]) == int(res.restarts)


def test_gmres_checkpointed_resume(tmp_path):
    """Kill after the first chunk; resume finishes and total restart
    count matches a run that was never interrupted."""
    n = 24
    op = gt.poisson_operator(n)
    b = op(jnp.ones((n, n)))
    kw = dict(restart=10, tol=1e-10, compute_v_err=False)

    plain = gmres_checkpointed(
        op, b, checkpoint_path=str(tmp_path / "a.npz"),
        chunk_restarts=100, max_restarts=100, **kw,
    )

    p = str(tmp_path / "b.npz")
    first = gt.gmres(op, b, max_restarts=2, **kw)
    save_checkpoint(p, first.x, 2)
    resumed = gmres_checkpointed(
        op, b, checkpoint_path=p, chunk_restarts=100, max_restarts=100,
        **kw,
    )
    assert bool(resumed.converged)
    assert int(resumed.restarts) == int(plain.restarts)
    np.testing.assert_allclose(resumed.x, plain.x, atol=1e-9)
