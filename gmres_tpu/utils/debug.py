"""Debug-mode numeric checking (SURVEY §5: the race-detection slot).

SPMD-by-construction removes data races, so the failure class that
remains is numeric: NaN/Inf escaping an operator or preconditioner and
silently poisoning a whole solve. Tools:

* ``finite_checked(op)`` — wrap any LinearOperator/Preconditioner with
  a ``checkify`` assertion that its output is finite.
* ``run_checked(fn, *args)`` — execute a (possibly jitted) function
  under checkify and raise the first failed check as a Python error.

The solvers themselves already surface non-finite residuals as
``SolverStatus.BREAKDOWN`` without debug mode (a deliberate fix of the
reference, whose non-convergence is silent — SURVEY §7 quirk 1).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def finite_checked(op: Callable, name: str = "operator") -> Callable:
    """Wrap y = op(x) with a checkify assertion that y is finite."""

    def wrapped(x):
        y = op(x)
        # Per-element isfinite (NOT isfinite(y·y): squaring can
        # overflow to inf on large-but-finite outputs).
        leaves = jax.tree.leaves(
            jax.tree.map(lambda v: jnp.all(jnp.isfinite(v)), y)
        )
        ok = leaves[0]
        for l in leaves[1:]:
            ok = ok & l
        checkify.check(ok, name + " produced non-finite values")
        return y

    return wrapped


def run_checked(fn: Callable, *args: Any, **kwargs: Any):
    """Run fn under checkify (float + user checks); raises
    ``checkify.JaxRuntimeError`` on the first failed check."""
    checked = checkify.checkify(
        fn, errors=checkify.user_checks | checkify.float_checks
    )
    err, out = checked(*args, **kwargs)
    err.throw()
    return out
