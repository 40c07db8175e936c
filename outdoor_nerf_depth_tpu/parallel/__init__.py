"""Device-mesh construction and sharding specs (the collectives module).

The reference implements data parallelism three different ways (torch DDP +
gloo, `jax.pmap` + `lax.pmean`, Lightning DDP + NCCL — SURVEY.md section 2.6).
Here there is exactly one: a 1-D `data` mesh over all chips, `NamedSharding`
annotations on the batch, replicated params, and XLA-inserted psum for the
gradient all-reduce (overlapped with backward by the compiler). Multi-host
batching keys off `jax.process_index()` in the data layer.
"""

from outdoor_nerf_depth_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    put_replicated,
    replicated,
    shard_batch,
    shard_batch_stack,
    stacked_batch_sharding,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "put_replicated",
    "replicated",
    "shard_batch",
    "shard_batch_stack",
    "stacked_batch_sharding",
]
