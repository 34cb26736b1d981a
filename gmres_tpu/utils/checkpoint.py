"""Checkpoint / resume at restart boundaries.

The reference runs every solve to completion in memory (SURVEY §5:
checkpoint subsystem absent). Restart boundaries are the natural
checkpoints of a restarted Krylov method — the entire resumable state
is (x, restarts-done): the next cycle rebuilds everything else from
the true residual. ``gmres_checkpointed`` runs the solve in chunks of
restarts, persisting host-side numpy state between chunks, and resumes
transparently from an existing checkpoint file.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gmres_tpu.solvers.gmres import gmres
from gmres_tpu.types import GmresResult, SolverStatus


def save_checkpoint(
    path: str, x: Any, restarts_done: int, meta: Optional[dict] = None
) -> None:
    """Persist (x, restarts-done) as .npz; process-0 only, atomic."""
    if jax.process_index() != 0:
        return
    tmp = path + ".tmp"
    np.savez(
        tmp,
        x=np.asarray(x),
        restarts_done=np.int64(restarts_done),
        **(meta or {}),
    )
    # np.savez appends .npz when the name lacks it — normalize.
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(src, path)


def load_checkpoint(path: str) -> Optional[dict]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def gmres_checkpointed(
    A,
    b: jnp.ndarray,
    *,
    checkpoint_path: str,
    chunk_restarts: int = 10,
    max_restarts: int = 1000,
    resume: bool = True,
    **gmres_kwargs,
) -> GmresResult:
    """Restarted GMRES with host-side checkpointing every
    ``chunk_restarts`` restart cycles.

    Semantically identical to ``gmres(..., max_restarts=max_restarts)``
    (a restart recomputes the true residual from x, so chunking changes
    nothing), but interruptible: if ``checkpoint_path`` exists and
    ``resume`` is set, the solve continues from the stored x.
    """
    gmres_kwargs.pop("x0", None)
    x = None
    done = 0
    if resume:
        ck = load_checkpoint(checkpoint_path)
        if ck is not None:
            x = jnp.asarray(ck["x"], dtype=b.dtype)
            done = int(ck["restarts_done"])

    result = None
    while done < max_restarts:
        chunk = min(chunk_restarts, max_restarts - done)
        result = gmres(
            A, b, max_restarts=chunk, x0=x, **gmres_kwargs
        )
        x = result.x
        done += int(result.restarts)
        save_checkpoint(checkpoint_path, x, done)
        if int(result.status) != SolverStatus.MAX_ITERATIONS:
            break
        if int(result.restarts) == 0:  # converged at x0
            break

    if result is None:
        # Resumed from a checkpoint that had already exhausted
        # max_restarts: evaluate the stored x without iterating
        # (max_restarts=0 runs only the convergence prologue).
        result = gmres(A, b, max_restarts=0, x0=x, **gmres_kwargs)
    return GmresResult(
        x=result.x,
        iterations=result.iterations,
        restarts=jnp.int32(done),
        residual=result.residual,
        status=result.status,
        residual_history=result.residual_history,
        v_err=result.v_err,
    )
