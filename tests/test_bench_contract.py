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


def test_bench_probe_timeout_returns_false():
    """A hung backend (observed tunnel outage) must degrade, not hang:
    the probe's TimeoutExpired path reports unreachable."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Importing bench.py executes its module body (and a real probe);
    # grab just the probe function source instead.
    src = open(os.path.join(root, "bench.py")).read()
    ns = {"__file__": os.path.join(root, "bench.py")}
    fn_src = src.split("def _device_reachable")[1].split("\nif (")[0]
    exec("import sys, os\ndef _device_reachable" + fn_src, ns)
    assert ns["_device_reachable"](timeout_s=0.01) is False
