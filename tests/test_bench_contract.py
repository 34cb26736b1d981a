"""Driver contract: bench.py must print exactly one JSON line with the
required keys (the round harness records it as BENCH_r{N}.json)."""

import json
import os
import subprocess
import sys


def test_bench_json_contract():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "bench.py", "--nsize", "32", "--skip-baseline",
         "--repeats", "1"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        l for l in out.stdout.strip().splitlines()
        if l.startswith("{")
    ]
    assert len(json_lines) == 1
    d = json.loads(json_lines[0])
    for key in ("metric", "value", "unit", "vs_baseline", "converged",
                "true_rel_residual"):
        assert key in d, key
    assert d["unit"] == "s"
    assert d["converged"] is True
    assert d["true_rel_residual"] <= 1e-8
