"""Result reporting: aligned text tables + JSONL emission.

Reference: ``src/utils/utils.f90`` — ``print_results`` (9-21),
``print_table`` (23-35), ``print_header`` (37-43), ``print_line``
(45-51). Its column set (vars, iters, restarts, tol, L2, L∞, residual,
‖I−VᵀV‖, wall time, utils.f90:29-33,40-42) is kept; beyond the
reference (SURVEY §5 metrics plan) each record also carries nnz/s and
iterations/s, and every table can be mirrored to JSONL for the
benchmark harness. Printing is gated to process 0 — the reference is
single-process and needs no gate; a multi-host SPMD program prints
once.
"""

from __future__ import annotations

import dataclasses
import json
import math
import sys
from typing import Any, Iterable, Optional, Sequence

import jax
import numpy as np


def is_host0() -> bool:
    return jax.process_index() == 0


@dataclasses.dataclass
class RunRecord:
    """One solve's report row (the reference's print_results argument
    list, utils.f90:9-21, plus throughput metrics)."""

    name: str
    nvars: int
    iterations: int
    restarts: Optional[int] = None
    tol: Optional[float] = None
    l2_error: Optional[float] = None
    linf_error: Optional[float] = None
    residual: Optional[float] = None
    v_err: Optional[float] = None
    wall_s: Optional[float] = None
    nnz: Optional[int] = None
    extra: Optional[dict] = None

    @property
    def nnz_per_s(self) -> Optional[float]:
        """Stencil/SpMV throughput: nnz touched per second over the
        whole solve (one operator application per iteration assumed
        unless extra['matvecs'] overrides)."""
        if not self.nnz or not self.wall_s:
            return None
        matvecs = (self.extra or {}).get(
            "matvecs",
            (self.extra or {}).get("total_iters", self.iterations),
        )
        return self.nnz * matvecs / self.wall_s

    @property
    def iters_per_s(self) -> Optional[float]:
        if not self.wall_s:
            return None
        total = (self.extra or {}).get("total_iters", self.iterations)
        return total / self.wall_s

    def to_json(self) -> dict:
        d = {
            k: v
            for k, v in dataclasses.asdict(self).items()
            if v is not None and k != "extra"
        }
        if self.nnz_per_s is not None:
            d["nnz_per_s"] = self.nnz_per_s
        if self.iters_per_s is not None:
            d["iters_per_s"] = self.iters_per_s
        if self.extra:
            d.update(self.extra)
        return d


def record_from_result(
    name: str,
    result: Any,
    *,
    x_true=None,
    wall_s: Optional[float] = None,
    tol: Optional[float] = None,
    nnz: Optional[int] = None,
    extra: Optional[dict] = None,
) -> RunRecord:
    """Build a RunRecord from a SolveResult / GmresResult, computing the
    manufactured-solution errors L2 = ‖x−x*‖₂ and L∞ = max|x−x*| the
    way every reference driver does (test_poisson_mf.f90:50-51)."""
    x = np.asarray(result.x)
    l2 = linf = None
    if x_true is not None:
        diff = x - np.asarray(x_true)
        l2 = float(np.linalg.norm(diff.ravel()))
        linf = float(np.max(np.abs(diff)))
    v_err = None
    if hasattr(result, "v_err"):
        v = np.asarray(result.v_err)
        v_err = float(np.max(v)) if v.size else None
    return RunRecord(
        name=name,
        nvars=int(x.size),
        iterations=int(result.iterations),
        restarts=(
            int(result.restarts) if hasattr(result, "restarts") else None
        ),
        tol=tol,
        l2_error=l2,
        linf_error=linf,
        residual=float(result.residual),
        v_err=v_err,
        wall_s=wall_s,
        nnz=nnz,
        extra=extra,
    )


_COLUMNS = (
    ("name", "{:<26}", 26),
    ("nvars", "{:>9}", 9),
    ("iterations", "{:>6}", 6),
    ("restarts", "{:>5}", 5),
    ("residual", "{:>10.2e}", 10),
    ("l2_error", "{:>10.2e}", 10),
    ("linf_error", "{:>10.2e}", 10),
    ("v_err", "{:>10.2e}", 10),
    ("wall_s", "{:>9.3f}", 9),
)
_HEADS = ("solver", "vars", "iters", "rst", "residual", "L2", "Linf",
          "|I-VtV|", "time[s]")


def print_line(file=None) -> None:
    """utils.f90:45-51 analogue."""
    if not is_host0():
        return
    total = sum(w for _, _, w in _COLUMNS) + 2 * (len(_COLUMNS) - 1)
    print("-" * total, file=file or sys.stdout)


def print_header(file=None) -> None:
    """utils.f90:37-43 analogue."""
    if not is_host0():
        return
    out = file or sys.stdout
    print_line(out)
    print(
        "  ".join(
            h.ljust(w) if i == 0 else h.rjust(w)
            for i, (h, (_, _, w)) in enumerate(zip(_HEADS, _COLUMNS))
        ),
        file=out,
    )
    print_line(out)


def print_results(record: RunRecord, file=None) -> None:
    """One aligned row (utils.f90:9-21 analogue)."""
    if not is_host0():
        return
    cells = []
    for field, fmt, width in _COLUMNS:
        val = getattr(record, field)
        if val is None or (isinstance(val, float) and math.isnan(val)):
            cells.append("-".rjust(width) if field != "name"
                         else "-".ljust(width))
        else:
            cells.append(fmt.format(val))
    print("  ".join(cells), file=file or sys.stdout)


def print_table(records: Sequence[RunRecord], file=None) -> None:
    """Header + rows + closing line (utils.f90:23-35 analogue)."""
    print_header(file)
    for r in records:
        print_results(r, file)
    print_line(file)


def write_jsonl(
    records: Iterable[RunRecord], path: str, append: bool = False
) -> None:
    """Mirror records to JSONL (one object per line) for the benchmark
    harness; process-0 only."""
    if not is_host0():
        return
    mode = "a" if append else "w"
    with open(path, mode) as f:
        for r in records:
            f.write(json.dumps(r.to_json()) + "\n")
