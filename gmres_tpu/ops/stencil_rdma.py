"""5-point stencil with kernel-level RDMA halo exchange.

The ``parallel.halo`` route exchanges halos with ``lax.ppermute`` and
leaves the communication/compute overlap to XLA's latency-hiding
scheduler. This module moves the exchange INSIDE the Pallas kernel with
``pltpu.make_async_remote_copy``: each chip starts two one-row remote
DMAs over ICI (last row to the chip below's top-halo slot, first row to
the chip above's bottom-halo slot), computes every locally-satisfiable
term of the stencil while the rows are in flight, and only the two
boundary-row corrections wait on the receive semaphores. The overlap is
structural — guaranteed by the kernel's instruction order, not left to
a scheduler heuristic.

Chain (non-periodic) topology: chip 0 has no upper neighbor and the
last chip no lower neighbor, so sends/waits are predicated per
direction and the unused halo slots are zeroed in-kernel — which is
exactly the homogeneous-Dirichlet truncation of the reference stencil
(``src/problems/poisson.f90:47-67``): physical boundaries need no
special case. The interior/edge split of the reference's OpenMP loops
(``poisson.f90:38-76``) is the serial shadow of this decomposition.

Testing: single-chip hardware cannot exercise RDMA, so correctness is
validated under Pallas TPU interpret mode (simulated remote DMAs +
semaphores, optional race detection) on a multi-device CPU mesh; the
ppermute route remains the hardware-validated default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Slot layout of the per-chip halo scratch buffer (2, ncols):
_TOP, _BOT = 0, 1  # row received from above / from below


def _rdma_halo_kernel(
    coef_ref, x_ref, o_ref, halo_ref, send_sem, recv_sem, *, axis, num_devices
):
    my = jax.lax.axis_index(axis)
    rows, ncols = x_ref.shape
    dtype = o_ref.dtype

    # Neighbor barrier: a chip must not let this invocation's RDMA land
    # in a neighbor's halo buffer while the neighbor is still in (or
    # before) a previous kernel that owns that buffer. Signaling both
    # neighbors and waiting once per live neighbor is a pairwise
    # rendezvous — cheaper than a global barrier and sufficient because
    # the DMAs only cross neighbor edges.
    barrier = pltpu.get_barrier_semaphore()

    @pl.when(my > 0)
    def _():
        pltpu.semaphore_signal(barrier, 1, device_id=(my - 1,))

    @pl.when(my < num_devices - 1)
    def _():
        pltpu.semaphore_signal(barrier, 1, device_id=(my + 1,))

    @pl.when(my > 0)
    def _():
        pltpu.semaphore_wait(barrier, 1)

    @pl.when(my < num_devices - 1)
    def _():
        pltpu.semaphore_wait(barrier, 1)

    # Two one-row RDMAs. Descriptors are recipes; .start() is the
    # effect, so constructing the down-copy on the last chip (whose
    # target index would be out of range) is harmless — it never runs.
    down = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[pl.ds(rows - 1, 1), :],
        dst_ref=halo_ref.at[pl.ds(_TOP, 1), :],
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=(my + 1,),
    )
    up = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[pl.ds(0, 1), :],
        dst_ref=halo_ref.at[pl.ds(_BOT, 1), :],
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=(my - 1,),
    )

    @pl.when(my < num_devices - 1)
    def _():
        down.start()

    @pl.when(my > 0)
    def _():
        up.start()

    # Physical-boundary chips receive nothing on the outward side: zero
    # the slot (Dirichlet truncation, poisson.f90:47-67).
    zero_row = jnp.zeros((1, ncols), dtype=dtype)

    @pl.when(my == 0)
    def _():
        halo_ref[_TOP : _TOP + 1, :] = zero_row

    @pl.when(my == num_devices - 1)
    def _():
        halo_ref[_BOT : _BOT + 1, :] = zero_row

    # Interior compute — every term available locally — overlaps the
    # in-flight DMAs. The result is the affine form a·x + b·A(x):
    # (a, b) = (0, 1) is the plain stencil; the degree-2 Chebyshev
    # application z = r/d + α(r − A(r)/d) is (1/d + α, −α/d)
    # (chebyshev.f90:27-37 collapsed by linearity), fusing the whole
    # preconditioner into this one exchange + pass.
    c0, cw, ce, cs, cn, a, b = (coef_ref[i] for i in range(7))
    x = x_ref[:]
    left = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    up_loc = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
    down_loc = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
    o_ref[:] = a * x + b * (
        c0 * x + cw * left + ce * right + cs * up_loc + cn * down_loc
    )

    # Drain semaphores: sends so the buffers may be reused after the
    # kernel, receives before the halo-dependent corrections below.
    @pl.when(my < num_devices - 1)
    def _():
        down.wait_send()

    @pl.when(my > 0)
    def _():
        up.wait_send()

    @pl.when(my > 0)
    def _():
        down.wait_recv()  # my top halo, sent by chip my−1's down-copy

    @pl.when(my < num_devices - 1)
    def _():
        up.wait_recv()  # my bottom halo, from chip my+1's up-copy

    # The only ops data-dependent on the transfers: boundary rows.
    o_ref[0:1, :] = o_ref[0:1, :] + (b * cs) * halo_ref[_TOP : _TOP + 1, :]
    o_ref[rows - 1 : rows, :] = (
        o_ref[rows - 1 : rows, :] + (b * cn) * halo_ref[_BOT : _BOT + 1, :]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "axis", "num_devices", "collective_id", "interpret", "detect_races",
    ),
)
def stencil_5pt_rdma(
    blk: jnp.ndarray,
    coefs: jnp.ndarray,
    *,
    axis: str,
    num_devices: int,
    collective_id: int = 7,
    interpret: bool = False,
    detect_races: bool = False,
) -> jnp.ndarray:
    """Per-shard affine stencil a·x + b·A(x) with in-kernel RDMA halos.

    Must be called inside ``shard_map`` over a 1-D mesh axis ``axis``
    of size ``num_devices`` with the grid row-partitioned. ``coefs`` is
    the (7,) array (center, west, east, south, north, a, b) in the
    block dtype (f32/bf16 — Mosaic has no f64 vector path); (a, b) =
    (0, 1) gives the plain stencil, (1/d + α, −α/d) the fused degree-2
    Chebyshev application.
    """
    interp = (
        pltpu.InterpretParams(
            dma_execution_mode="on_wait", detect_races=detect_races
        )
        if interpret
        else False
    )
    kernel = functools.partial(
        _rdma_halo_kernel, axis=axis, num_devices=num_devices
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(blk.shape, blk.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, blk.shape[1]), blk.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=interp,
    )(coefs, blk)
