"""1-D data mesh + sharding helpers for ray workloads.

Rays are embarrassingly parallel, so the entire parallelism story is one
mesh axis: batch leaves sharded on `data`, parameters replicated, gradients
all-reduced by XLA (psum over ICI within a slice, DCN across hosts). Model
sharding knobs (hash-table sharding for NGP) build on the same mesh later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """All (or given) devices on a single `data` axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (ray) axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """K-step batch stacks: leading axis = scan steps (unsharded), axis 1 =
    rays split across the data axis (for `make_multi_train_step`)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on device, ray axis sharded over the mesh.

    Single process: one `device_put` with the NamedSharding. Multiple
    processes: each host holds 1/process_count of the global batch (the
    data layer already slices per `jax.process_index()`), and
    `make_array_from_process_local_data` assembles the global jax.Array
    from the per-host shards (single-controller semantics).
    """
    sharding = batch_sharding(mesh)
    n_proc = jax.process_count()

    def put(x):
        if x is None:
            return None
        if n_proc == 1:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def shard_batch_stack(batches, mesh: Mesh):
    """Stack K host batches on a new leading axis and place them on device
    with rays (axis 1) sharded — the input contract of
    `make_multi_train_step`. Multi-host assembly mirrors `shard_batch`."""
    sharding = stacked_batch_sharding(mesh)
    n_proc = jax.process_count()

    def put(*xs):
        if xs[0] is None:
            return None
        x = np.stack([np.asarray(v) for v in xs])
        if n_proc == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0], x.shape[1] * n_proc) + x.shape[2:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, *batches)


def put_replicated(tree, mesh: Mesh):
    """Commit every leaf of `tree` to the replicated sharding on `mesh`.

    Freshly-initialized train state (and occupancy grids) live on the default
    device with NO mesh context in their avals; the first jitted train step
    returns arrays whose avals carry the mesh. Without this commit the second
    step call therefore misses the jit cache and recompiles the whole program
    (tens of seconds at production sizes). Committing up front makes call #1
    and call #N share one cache key — exactly one compile.
    """
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: None if x is None else jax.device_put(x, sharding), tree
    )
