"""Probe: candidate mechanisms for beating the ~30 ns/row XLA gather floor.

VERDICT r3 #3: the NGP hash-encode fwd+bwd is pure gather cost (~28-34
ns/ROW on this v5e, row-width independent at 8-64 B, forced fetches), and
XLA's generic gather is the ceiling. This probe measures, on the real chip,
every mechanism that could go below it:

  A. XLA gather ns/row as a function of TABLE size (2^13..2^22 rows) — if
     small tables gather faster (VMEM-resident operand), chunked-sorted
     processing pays.
  B. lax.sort cost vs operand count at the KITTI shape (8.4M entries) —
     permutation-by-sort is the only TPU-native way to reorder N rows
     below per-row gather cost, IF multi-operand payload sorts stay cheap.
  C. Pallas in-VMEM dynamic row gather (jnp.take inside a kernel on a
     VMEM-resident block) — does Mosaic lower it, and at what rate?
  D. Pallas one-hot matmul row-extraction (build a [tile, chunk] one-hot
     in VMEM, dot with the chunk rows on the MXU) — bandwidth-bound row
     extraction for sorted queries, no dynamic addressing at all.

Run ON THE TPU from the repo root:
    timeout 550 python -u benchmarks/probes/gather_attack_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

N_QUERIES = int(os.environ.get("ONDT_PROBE_QUERIES", 8192 * 64 * 16))  # 8.4M
LANES = 16  # oct physical row: 8 corners x F=2


def _force(out):
    for leaf in jax.tree_util.tree_leaves(out):
        _ = float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))


def timeit(fn, *args, n=6):
    out = fn(*args)
    jax.block_until_ready(out)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        _force(fn(*args))
    return (time.perf_counter() - t0) / n


def probe_gather_vs_table_size(results):
    rng = jax.random.PRNGKey(0)
    for log2_rows in (13, 16, 19, 22):
        rows = 2**log2_rows
        table = jax.random.normal(rng, (rows, LANES), jnp.bfloat16)
        idx = jax.random.randint(jax.random.fold_in(rng, 1), (N_QUERIES,), 0, rows)

        @jax.jit
        def take(t, i):
            return jnp.take(t, i, axis=0)

        dt = timeit(take, table, idx)
        results[f"A_take_2^{log2_rows}rows_ns_per_row"] = round(dt / N_QUERIES * 1e9, 2)
        print(json.dumps({k: results[k] for k in list(results)[-1:]}), flush=True)


def probe_sort_costs(results):
    rng = jax.random.PRNGKey(2)
    keys = jax.random.randint(rng, (N_QUERIES,), 0, 2**22)
    pos = jnp.arange(N_QUERIES, dtype=jnp.int32)
    payload32 = [
        jax.random.normal(jax.random.fold_in(rng, i), (N_QUERIES,), jnp.float32)
        for i in range(8)
    ]

    for n_ops, ops in (
        (1, (keys,)),
        (2, (keys, pos)),
        (5, (keys, pos, *payload32[:3])),
        (10, (keys, pos, *payload32)),
    ):
        @jax.jit
        def do_sort(*xs):
            return jax.lax.sort(xs, num_keys=1)

        dt = timeit(do_sort, *ops)
        results[f"B_sort_{n_ops}ops_s"] = round(dt, 4)
        print(json.dumps({k: results[k] for k in list(results)[-1:]}), flush=True)


def probe_pallas_vmem_take(results):
    """C: dynamic row gather from a VMEM-resident chunk inside Pallas."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = 2048          # rows resident in VMEM per grid step
    TILE = 2048           # queries handled per grid step
    n_tiles = N_QUERIES // TILE

    def kernel(idx_ref, table_ref, out_ref):
        idx = idx_ref[:]                       # [TILE] int32, values < CHUNK
        out_ref[:] = jnp.take(table_ref[:], idx, axis=0)

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_QUERIES, LANES), jnp.float32),
        )(idx, table)

    rng = jax.random.PRNGKey(3)
    table = jax.random.normal(rng, (CHUNK, LANES), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(rng, 1), (N_QUERIES,), 0, CHUNK)
    try:
        dt = timeit(run, idx, table)
        results["C_pallas_vmem_take_ns_per_row"] = round(dt / N_QUERIES * 1e9, 2)
    except Exception as e:  # Mosaic may not lower the gather
        results["C_pallas_vmem_take_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps({k: results[k] for k in list(results)[-1:]}), flush=True)


def probe_pallas_onehot_matmul(results):
    """D: extract rows by one-hot x chunk matmul on the MXU (sorted regime).

    Emulates the sorted-chunk pipeline: tile t's queries all land in chunk
    t % n_chunks; the kernel builds a [TILE, CHUNK] one-hot in VMEM and
    dots it with the chunk rows. Rate = rows/s of dynamic-address-free
    extraction.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = 512
    TILE = 256
    n_tiles = N_QUERIES // TILE
    rows_total = 2**19 * 12  # ~ the trimmed oct table
    n_chunks = rows_total // CHUNK

    def kernel(idx_ref, chunk_ref, out_ref):
        idx = idx_ref[:]                                   # [TILE] in [0, CHUNK)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE, CHUNK), 1)
            == idx[:, None]
        ).astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(
            onehot, chunk_ref[:], preferred_element_type=jnp.float32
        )

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
                # Walk the table chunk-by-chunk as tiles advance (the sorted
                # pipeline maps tile -> chunk monotonically; modulo here just
                # keeps every DMA distinct like the real thing).
                pl.BlockSpec((CHUNK, LANES), lambda i: (i % n_chunks, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_QUERIES, LANES), jnp.float32),
        )(idx, table)

    rng = jax.random.PRNGKey(4)
    table = jax.random.normal(rng, (rows_total, LANES), jnp.bfloat16)
    idx = jax.random.randint(jax.random.fold_in(rng, 1), (N_QUERIES,), 0, CHUNK)
    try:
        dt = timeit(run, idx, table)
        results["D_pallas_onehot_ns_per_row"] = round(dt / N_QUERIES * 1e9, 2)
        results["D_pallas_onehot_total_s"] = round(dt, 4)
    except Exception as e:
        results["D_pallas_onehot_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps({k: results[k] for k in list(results)[-1:]}), flush=True)


def main():
    results = {"n_queries": N_QUERIES, "backend": jax.default_backend()}
    for probe in (
        probe_gather_vs_table_size,
        probe_sort_costs,
        probe_pallas_vmem_take,
        probe_pallas_onehot_matmul,
    ):
        try:
            probe(results)
        except Exception as e:
            results[probe.__name__ + "_error"] = f"{type(e).__name__}: {e}"[:300]
            print(json.dumps({k: results[k] for k in list(results)[-1:]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
