"""Pallas TPU blocked prefix-sum over narrow [N, lanes] arrays.

Why this exists: the NGP hash-table gradient (`ops/hashgrid.py`,
`_oct_split_row_sums`) reduces sorted (index, value) streams with a
cumsum + boundary-diff. The value streams are NARROW — [m, 8F=16] f32 —
and TPU tiled layouts pad the minor dimension to the 128-lane tile, so
XLA's log-depth cumsum moves ~8x the logical bytes, several times over:
the r4-measured [16.8M, 16] cumsum costs 77 ms against a ~3 ms bandwidth
floor. (Reference counterpart: tiny-cuda-nn solves the same reduction
with atomic adds in the grid-gradient kernel,
`ngp-depth/models/networks.py:36-77` via tcnn; TPUs have no atomics, so
the sorted-stream scan is the design — this kernel makes the scan run at
the memory-bandwidth floor.)

Design: lane-folding + single sequential pass.
  * [N, lanes] is viewed as [N/G, G*lanes=128] (G consecutive logical
    rows packed into one full-width physical row);
  * within a block of R physical rows: an inclusive prefix over the G
    lane-groups (log2(G) shifted adds along lanes), then a prefix over
    rows of the per-row totals (log2(R) shifted adds along sublanes),
    then the running carry from all previous blocks;
  * the grid is sequential on TPU, so the carry lives in a VMEM scratch
    that persists across grid steps — ONE pass over the data, every
    vector op at full 128-lane width.

`cumsum(x)` == `jnp.cumsum(x, axis=0)` up to f32 reassociation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _prefix_groups(x, g: int, lanes: int):
    """Inclusive prefix over the g lane-groups of every [R, 128] row."""
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = lanes
    while shift < g * lanes:
        rolled = pltpu.roll(x, shift=shift, axis=1)
        x = x + jnp.where(lane_idx >= shift, rolled, 0.0)
        shift *= 2
    return x


def _prefix_rows(t, r: int):
    """Inclusive prefix over rows (axis 0) of a [R, lanes] block."""
    row_idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    shift = 1
    while shift < r:
        rolled = pltpu.roll(t, shift=shift, axis=0)
        t = t + jnp.where(row_idx >= shift, rolled, 0.0)
        shift *= 2
    return t


def _scan_kernel(x_ref, out_ref, carry_ref, *, g: int, lanes: int, r: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = _prefix_groups(x_ref[:].astype(jnp.float32), g, lanes)
    # After the group prefix, the LAST lane-group of each row holds that
    # row's full total.
    tot = x[:, (g - 1) * lanes:]
    rp = _prefix_rows(tot, r) - tot  # exclusive row prefix
    add = rp + carry_ref[0:1, :lanes]
    out = x + jnp.concatenate([add] * g, axis=1)
    out_ref[:] = out.astype(out_ref.dtype)
    new_carry = out[r - 1:r, (g - 1) * lanes:]
    carry_ref[0:1, :lanes] = new_carry


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def cumsum(x, block_rows: int = 512, interpret: bool = False):
    """Inclusive prefix sum along axis 0 of a 2-D [N, lanes] array.

    lanes must divide 128 (the fold packs 128//lanes logical rows per
    physical row). Accumulates in f32; returns x.dtype.
    """
    n, lanes = x.shape
    if LANE % lanes:
        raise ValueError(f"lanes must divide {LANE}, got {lanes}")
    g = LANE // lanes
    chunk = g * block_rows  # logical rows per grid step
    n_pad = (-n) % chunk
    xp = jnp.pad(x, ((0, n_pad), (0, 0))) if n_pad else x
    phys = xp.reshape(-1, LANE)  # [N/G, 128]
    grid = phys.shape[0] // block_rows

    out = pl.pallas_call(
        functools.partial(_scan_kernel, g=g, lanes=lanes, r=block_rows),
        out_shape=jax.ShapeDtypeStruct(phys.shape, x.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, LANE), jnp.float32)],
        interpret=interpret,
    )(phys)
    out = out.reshape(-1, lanes)
    return out[:n] if n_pad else out


def _scan_kernel_batched(x_ref, out_ref, carry_ref, *, g: int, lanes: int,
                         r: int):
    j = pl.program_id(1)  # block index WITHIN the batch element

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = _prefix_groups(x_ref[0].astype(jnp.float32), g, lanes)
    tot = x[:, (g - 1) * lanes:]
    rp = _prefix_rows(tot, r) - tot
    add = rp + carry_ref[0:1, :lanes]
    out = x + jnp.concatenate([add] * g, axis=1)
    out_ref[0] = out.astype(out_ref.dtype)
    carry_ref[0:1, :lanes] = out[r - 1:r, (g - 1) * lanes:]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def cumsum_batched(x, block_rows: int = 512, interpret: bool = False):
    """Independent prefix sums along axis 1 of [B, N, lanes].

    One kernel for B independent scans (e.g. the 16 hash-grid levels):
    the carry resets at each batch element's first block, so nothing
    leaks across the batch dimension.
    """
    b, n, lanes = x.shape
    if LANE % lanes:
        raise ValueError(f"lanes must divide {LANE}, got {lanes}")
    g = LANE // lanes
    chunk = g * block_rows
    n_pad = (-n) % chunk
    xp = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0))) if n_pad else x
    phys = xp.reshape(b, -1, LANE)
    blocks = phys.shape[1] // block_rows

    out = pl.pallas_call(
        functools.partial(
            _scan_kernel_batched, g=g, lanes=lanes, r=block_rows
        ),
        out_shape=jax.ShapeDtypeStruct(phys.shape, x.dtype),
        grid=(b, blocks),
        in_specs=[
            pl.BlockSpec((1, block_rows, LANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, LANE), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, LANE), jnp.float32)],
        interpret=interpret,
    )(phys)
    out = out.reshape(b, -1, lanes)
    return out[:, :n] if n_pad else out


def on_tpu() -> bool:
    """True when the default backend lowers Pallas TPU kernels."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# A pallas_call inside a MULTI-DEVICE sharded jit cannot be auto-partitioned
# by the SPMD partitioner (and a prefix scan is not shard-local math anyway:
# the carry crosses shard boundaries). The train-step factories flip this off
# when the mesh has >1 device, keeping XLA's partition-aware cumsum there;
# single-chip programs (and the bench) take the Pallas path.
_ENABLED = True


def set_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = bool(flag)


def cumsum_auto(x, block_rows: int = 512, force: bool = False):
    """Pallas scan on TPU; jnp.cumsum elsewhere (CPU tests, GPU).

    `force=True` bypasses the single-device gate — valid ONLY inside a
    shard_map body, where the kernel sees a per-device local array.
    ONDT_NO_PALLAS_SCAN=1 forces the jnp path (debugging escape hatch).
    """
    import os

    if (
        (_ENABLED or force)
        and x.ndim == 2
        and LANE % x.shape[1] == 0
        and on_tpu()
        and os.environ.get("ONDT_NO_PALLAS_SCAN") != "1"
    ):
        return cumsum(x, block_rows=block_rows)
    return jnp.cumsum(x, axis=0)
