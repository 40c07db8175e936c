"""Per-stage timing of the OSPLIT hash-table backward + candidate variants.

The r4 layout change (per-level bf16 tables) moved the bottleneck from
gathers to the per-level sorted-segment reduction. This probe times, at
the bench KITTI shape (8192 rays x 64 samples, L=16, F=2, T=2^19):

  * the full osplit encode fwd and fwd+bwd (baseline for any change);
  * per-level stage costs: data sort, value gather, cumsum (XLA vs the
    lane-folded Pallas scan of ops/pallas_scan.py), sentinel sorts,
    boundary gather;
  * batched-across-levels variants: one [L, m] batched lax.sort vs 16
    separate sorts; one [L, m, 16] batched Pallas scan vs 16 separate.

Run from the repo root on the chip:
    timeout 2400 python benchmarks/probes/ngp_osplit_bwd_probe.py
"""

import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from outdoor_nerf_depth_tpu.ops import hashgrid, pallas_scan

N_SAMPLES = int(os.environ.get("ONDT_PROBE_SAMPLES", 8192 * 64))
L, F, LOG2T = 16, 2, int(os.environ.get("ONDT_PROBE_LOG2T", 19))
T = 2**LOG2T
LANES = 8 * F


def _force(out):
    for leaf in jax.tree_util.tree_leaves(out):
        _ = float(jnp.sum(leaf.ravel()[:1]))


def timeit(fn, *args, n=8):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        _force(out)
    except Exception as e:  # CPU smoke: Pallas TPU kernels won't lower
        return f"error: {type(e).__name__}"
    t0 = time.perf_counter()
    for _ in range(n):
        _force(fn(*args))
    return round((time.perf_counter() - t0) / n, 5)


def main():
    res = hashgrid.level_resolutions(L, 16, 2048)
    res_key = tuple(int(r) for r in res)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (N_SAMPLES, 3))
    g = jax.random.normal(jax.random.fold_in(rng, 1), (N_SAMPLES, L * F))
    table = jax.random.normal(jax.random.fold_in(rng, 2), (L, T, F)) * 1e-2
    level_rows = hashgrid._oct_level_rows(res_key, T)
    m = N_SAMPLES
    results = {"m": m, "levels": L, "level_rows": [int(r) for r in level_rows]}

    # ---- Baselines: full osplit encode fwd / fwd+bwd (current code).
    enc = hashgrid._oct_split_grad_encode(res_key, T)
    fwd = jax.jit(enc)
    results["osplit_fwd_s"] = timeit(fwd, x, table)

    def loss(x, t):
        return jnp.sum(enc(x, t) * g.reshape(N_SAMPLES, L * F))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    results["osplit_fwd_bwd_s"] = timeit(grad, x, table)

    # ---- Per-level stage costs at the largest (hashed) level.
    idx_levels, w_all = jax.jit(
        lambda x: hashgrid._oct_local_indices_weights(x, res, T)
    )(x)
    lvl = L - 1  # hashed level: rows == T
    idx_flat = idx_levels[lvl].reshape(-1).astype(jnp.int32)
    vals = jax.random.normal(jax.random.fold_in(rng, 3), (m, LANES))
    n_rows = int(level_rows[lvl])

    results["sort_data_1lvl_s"] = timeit(
        jax.jit(lambda i: jax.lax.sort(
            (i, jnp.arange(m, dtype=jnp.int32)), num_keys=1)),
        idx_flat,
    )
    _, sd = jax.jit(lambda i: jax.lax.sort(
        (i, jnp.arange(m, dtype=jnp.int32)), num_keys=1))(idx_flat)
    results["vgather_1lvl_s"] = timeit(
        jax.jit(lambda v, s: jnp.take(v, s, axis=0)), vals, sd
    )
    sv = jnp.take(vals, sd, axis=0)
    results["cumsum_xla_1lvl_s"] = timeit(
        jax.jit(lambda v: jnp.cumsum(v, axis=0)), sv
    )
    results["cumsum_pallas_1lvl_s"] = timeit(pallas_scan.cumsum, sv)

    def sentinels(i):
        total = m + n_rows
        keys = jnp.concatenate(
            [i * 2, jnp.arange(n_rows, dtype=jnp.int32) * 2 + 1]
        )
        (sk,) = jax.lax.sort((keys,), num_keys=1)
        _, order = jax.lax.sort(
            (sk & 1 ^ 1, jnp.arange(total, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        return order[:n_rows] - jnp.arange(n_rows, dtype=jnp.int32)

    results["sentinel_sorts_1lvl_s"] = timeit(jax.jit(sentinels), idx_flat)
    results["row_sums_1lvl_s"] = timeit(
        jax.jit(lambda i, v: hashgrid._oct_split_row_sums(i, v, n_rows)),
        idx_flat, vals,
    )

    # Candidate: MERGED single data+sentinel sort (2 sorts total instead
    # of 3): one 2-op sort over m+rows replaces data-sort + key-only
    # sentinel sort; csum at each sentinel then holds the full prefix, so
    # row sums are direct adjacent differences of the compacted csum.
    def merged_row_sums(i, v):
        total = m + n_rows
        keys = jnp.concatenate(
            [i * 2, jnp.arange(n_rows, dtype=jnp.int32) * 2 + 1]
        )
        sk, sp = jax.lax.sort(
            (keys, jnp.arange(total, dtype=jnp.int32)), num_keys=1
        )
        vv = jnp.where(
            (sp < m)[:, None], jnp.take(v, jnp.minimum(sp, m - 1), axis=0),
            0.0,
        )
        csum = pallas_scan.cumsum_auto(vv)
        _, order = jax.lax.sort(
            (sk & 1 ^ 1, jnp.arange(total, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        s_csum = jnp.take(csum, order[:n_rows], axis=0)
        return s_csum - jnp.concatenate(
            [jnp.zeros((1, LANES), s_csum.dtype), s_csum[:-1]], axis=0
        )

    results["row_sums_merged_1lvl_s"] = timeit(
        jax.jit(merged_row_sums), idx_flat, vals
    )
    # Correctness cross-check of the candidate against the current path.
    a = jax.jit(lambda i, v: hashgrid._oct_split_row_sums(i, v, n_rows))(
        idx_flat, vals)
    b_ = jax.jit(merged_row_sums)(idx_flat, vals)
    results["merged_matches"] = bool(
        jnp.max(jnp.abs(a - b_)) < 5e-2
    )

    # Full bwd with the Pallas scan disabled (XLA cumsum) for the A/B.
    os.environ["ONDT_NO_PALLAS_SCAN"] = "1"
    grad_xla = jax.jit(jax.grad(loss, argnums=(0, 1)))
    results["osplit_fwd_bwd_xla_cumsum_s"] = timeit(grad_xla, x, table)
    del os.environ["ONDT_NO_PALLAS_SCAN"]

    # ---- Batched-across-levels variants.
    idx_all = jnp.stack([il.reshape(-1).astype(jnp.int32)
                         for il in idx_levels])  # [L, m]
    vals_all = jax.random.normal(jax.random.fold_in(rng, 4), (L, m, LANES))

    def sort16(idx_all):
        outs = []
        for level in range(L):
            outs.append(jax.lax.sort(
                (idx_all[level], jnp.arange(m, dtype=jnp.int32)), num_keys=1
            )[1])
        return jnp.stack(outs)

    results["sort_16_separate_s"] = timeit(jax.jit(sort16), idx_all)

    def sort_batched(idx_all):
        iota = jnp.broadcast_to(
            jnp.arange(m, dtype=jnp.int32)[None], (L, m)
        )
        return jax.lax.sort((idx_all, iota), dimension=1, num_keys=1)[1]

    results["sort_batched_s"] = timeit(jax.jit(sort_batched), idx_all)

    def cumsum16(vals_all):
        return jnp.stack(
            [jnp.cumsum(vals_all[level], axis=0) for level in range(L)]
        )

    results["cumsum_xla_16_s"] = timeit(jax.jit(cumsum16), vals_all)
    results["cumsum_pallas_batched_s"] = timeit(
        pallas_scan.cumsum_batched, vals_all
    )

    def gather16(vals_all, sd_all):
        return jnp.stack(
            [jnp.take(vals_all[level], sd_all[level], axis=0)
             for level in range(L)]
        )

    sd_all = jax.jit(sort_batched)(idx_all)
    results["vgather_16_separate_s"] = timeit(
        jax.jit(gather16), vals_all, sd_all
    )
    results["vgather_batched_s"] = timeit(
        jax.jit(jax.vmap(lambda v, s: jnp.take(v, s, axis=0))),
        vals_all, sd_all,
    )

    print(json.dumps(results, indent=1), flush=True)
    out_path = os.environ.get("ONDT_PROBE_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
