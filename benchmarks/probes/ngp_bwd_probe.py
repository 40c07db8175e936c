"""Piecewise timing of the oct-layout hash-table gradient at the KITTI
training shape (8192 rays x 64 samples, L=16, T=2^19, F=2).

The r3 layout probe showed encode fwd+bwd = 1.07 s of the 1.19 s NGP step,
with fwd only 0.30 s — the backward reduction is the whole ballgame. This
probe times each stage of `_oct_grad_encode.bwd` in isolation, plus
candidate reformulations, to find where the ~0.77 s actually goes:

  * vals materialization (w [m,8] x g [m,2] outer -> [m,16]; 16-lane rows
    pad 8x to the 128-lane tile on TPU — suspect #1 for hidden traffic)
  * sort1: (key, iota) 2-operand sort at m + n_rows = 16.8M
  * value gather by sorted position ([16.8M, 16])
  * cumsum over [16.8M, 16]
  * sort2: binary partition (flag, iota)
  * csum gather at sentinel order ([8.4M, 16])
  * roll-fold of the packed gradient back to canonical rows
  * analytic trilinear dL/dx

Variants: bf16 value carry, fused w*g-inside-gather (gather w and g
separately, multiply after), cumsum in transposed [16, N] layout.

Run from the repo root: timeout 2400 python benchmarks/probes/ngp_bwd_probe.py
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

from outdoor_nerf_depth_tpu.ops import hashgrid

N_SAMPLES = int(os.environ.get("ONDT_PROBE_SAMPLES", 8192 * 64))
L, F, LOG2T = 16, 2, int(os.environ.get("ONDT_PROBE_LOG2T", 19))
T = 2**LOG2T


def _force(out):
    # The axon tunnel DEFERS unfetched outputs (CLAUDE.md): block_until_ready
    # alone measures ~dispatch only. Fetch one scalar from EVERY tree leaf —
    # a stage returning independent outputs (e.g. a VJP's (dx, dtable)) can
    # otherwise leave the unfetched branch deferred and undercount.
    for leaf in jax.tree_util.tree_leaves(out):
        _ = float(jnp.sum(leaf.ravel()[:1]))


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        _force(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    res = hashgrid.level_resolutions(L, 16, 2048)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (N_SAMPLES, 3))
    g = jax.random.normal(jax.random.fold_in(rng, 1), (N_SAMPLES, L, F))

    idx, w_all = jax.jit(
        lambda x: hashgrid._oct_indices_weights(x, res, T)
    )(x)
    idx_flat = idx.reshape(-1)  # [m]
    m = idx_flat.shape[0]
    n_rows = L * T
    total = m + n_rows
    results = {"m": m, "n_rows": n_rows}

    # Forward-side stages: phys table build, raw row gather, trilerp.
    table = jax.random.normal(jax.random.fold_in(rng, 2), (L, T, F)) * 1e-2
    build = jax.jit(lambda t: hashgrid.build_oct_table(t, res, T))
    results["build_oct_s"] = timeit(build, table)
    phys = build(table)
    phys2d = jnp.asarray(phys.reshape(-1, 8 * F))

    results["rowgather_s"] = timeit(
        jax.jit(lambda p, i: jnp.take(p, i.reshape(-1), axis=0)), phys2d, idx
    )
    rows = jax.jit(lambda p, i: jnp.take(p, i.reshape(-1), axis=0))(phys2d, idx)

    def trilerp(rows, w_all):
        feats = rows.reshape(N_SAMPLES, L, 8, F)
        out = jnp.sum(w_all[..., None] * feats, axis=-2)
        return out.reshape(N_SAMPLES, L * F)

    results["trilerp_s"] = timeit(jax.jit(trilerp), rows, w_all)

    def trilerp_lanes(rows, w_all):
        # Lane-friendly variant: stay in [N, 8F] per level via strided lane
        # slices; no [..., 8, F] 4-D intermediate.
        w16 = jnp.repeat(
            w_all.reshape(N_SAMPLES * L, 8), F, axis=1
        )  # [m, 8F] wcorner per feature lane
        prod = rows * w16
        even = prod[:, 0::2].sum(axis=-1)
        odd = prod[:, 1::2].sum(axis=-1)
        return jnp.stack([even, odd], axis=-1).reshape(N_SAMPLES, L * F)

    results["trilerp_lanes_s"] = timeit(jax.jit(trilerp_lanes), rows, w_all)

    results["idxw_s"] = timeit(
        jax.jit(lambda x: hashgrid._oct_indices_weights(x, res, T)), x
    )

    # Stage 1: vals = w (x) g -> [m, 8F]
    def make_vals(w_all, g):
        vals = w_all[..., None] * g[..., None, :]
        return vals.reshape(-1, 8 * F)

    results["vals_s"] = timeit(jax.jit(make_vals), w_all, g)
    vals = jax.jit(make_vals)(w_all, g)

    # Stage 2: sort1 (key, iota)
    def sort1(idx_flat):
        keys = jnp.concatenate(
            [idx_flat * 2, jnp.arange(n_rows, dtype=jnp.int32) * 2 + 1]
        )
        iota = jnp.arange(total, dtype=jnp.int32)
        return jax.lax.sort((keys, iota), num_keys=1)

    results["sort1_s"] = timeit(jax.jit(sort1), idx_flat)
    sk, si = jax.jit(sort1)(idx_flat)

    # Stage 3: value gather by sorted position
    def vgather(vals, si):
        v = jnp.take(vals, jnp.minimum(si, m - 1), axis=0)
        return jnp.where((si < m)[:, None], v, 0.0)

    results["vgather_s"] = timeit(jax.jit(vgather), vals, si)
    v = jax.jit(vgather)(vals, si)

    # Stage 4: cumsum [total, 16]
    results["cumsum_s"] = timeit(jax.jit(lambda v: jnp.cumsum(v, axis=0)), v)
    csum = jax.jit(lambda v: jnp.cumsum(v, axis=0))(v)

    # Stage 4b: cumsum transposed [16, total]
    vT = jnp.asarray(v.T)
    results["cumsum_T_s"] = timeit(
        jax.jit(lambda v: jnp.cumsum(v, axis=1)), vT
    )

    # Stage 5: sort2 partition
    def sort2(sk):
        iota = jnp.arange(total, dtype=jnp.int32)
        return jax.lax.sort((sk & 1 ^ 1, iota), num_keys=1, is_stable=True)

    results["sort2_s"] = timeit(jax.jit(sort2), sk)
    _, order = jax.jit(sort2)(sk)

    # Stage 6: csum gather at sentinel order + diff
    def final_gather(csum, order):
        s_csum = jnp.take(csum, order[:n_rows], axis=0)
        prev = jnp.concatenate(
            [jnp.zeros((1, 8 * F), s_csum.dtype), s_csum[:-1]], 0
        )
        return s_csum - prev

    results["fgather_s"] = timeit(jax.jit(final_gather), csum, order)
    pg_flat = jax.jit(final_gather)(csum, order)

    # Stage 7: roll-fold to canonical rows
    def fold(pg_flat):
        pg = pg_flat.reshape(L, T, 8, F)
        canon = []
        for level in range(L):
            offs = hashgrid._oct_offsets(int(res[level]), T)
            p = pg[level]
            acc = p[:, 0]
            for lane, o in enumerate(offs[1:], start=1):
                acc = acc + jnp.roll(p[:, lane], o, axis=0)
            canon.append(acc)
        return jnp.stack(canon)

    results["fold_s"] = timeit(jax.jit(fold), pg_flat)

    # Stage 7b: fold without the 4-D reshape (lane slices of [L*T, 16])
    def fold2d(pg_flat):
        canon = []
        for level in range(L):
            offs = hashgrid._oct_offsets(int(res[level]), T)
            p = jax.lax.dynamic_slice_in_dim(pg_flat, level * T, T, 0)
            acc = p[:, 0:F]
            for lane, o in enumerate(offs[1:], start=1):
                acc = acc + jnp.roll(p[:, lane * F:(lane + 1) * F], o, axis=0)
            canon.append(acc)
        return jnp.stack(canon)

    results["fold2d_s"] = timeit(jax.jit(fold2d), pg_flat)

    # Stage 8: analytic trilinear dx
    def dx_fn(x, s):
        return hashgrid._trilinear_dx(x, tuple(int(r) for r in res), s)

    s8 = jnp.sum(
        v[:m].reshape(N_SAMPLES, L, 8, F), axis=-1
    )  # stand-in [N, L, 8]
    results["dx_s"] = timeit(jax.jit(dx_fn), x, s8)

    # Variant S: plain scatter-add segment sums, unsorted vs sorted index
    # streams (r2 measured ~80 ns/row unsorted; sorted-ness untested — if
    # XLA's scatter vectorizes on sorted indices the sentinel pipeline
    # collapses to sort1 + vgather + sorted-scatter).
    def seg_unsorted(idx_flat, vals):
        return jax.ops.segment_sum(vals, idx_flat, num_segments=n_rows)

    results["scatter_unsorted_s"] = timeit(
        jax.jit(seg_unsorted), idx_flat, vals
    )

    sidx = jnp.sort(idx_flat)

    def seg_sorted(sidx, v):
        return jax.ops.segment_sum(
            v, sidx, num_segments=n_rows, indices_are_sorted=True
        )

    results["scatter_sorted_s"] = timeit(jax.jit(seg_sorted), sidx, v[:m])

    # Variant A: whole bwd with bf16 value carry (cumsum still f32).
    def bwd_bf16(idx_flat, w_all, g):
        vals = (w_all.astype(jnp.bfloat16)[..., None]
                * g.astype(jnp.bfloat16)[..., None, :]).reshape(-1, 8 * F)
        sk, si = sort1(idx_flat)
        vv = jnp.take(vals, jnp.minimum(si, m - 1), axis=0)
        vv = jnp.where((si < m)[:, None], vv, 0)
        csum = jnp.cumsum(vv.astype(jnp.float32), axis=0)
        _, order = sort2(sk)
        return final_gather(csum, order)

    results["bwd_bf16_s"] = timeit(jax.jit(bwd_bf16), idx_flat, w_all, g)

    # Variant B: gather w and g separately (8 + 2 lanes instead of 16),
    # multiply after the gather: less gathered traffic, same gather count.
    def bwd_factored(idx_flat, w_all, g):
        w2 = w_all.reshape(-1, 8)
        g2 = g.reshape(-1, F)
        sk, si = sort1(idx_flat)
        sj = jnp.minimum(si, m - 1)
        wv = jnp.take(w2, sj, axis=0)
        gv = jnp.take(g2, sj, axis=0)
        vv = (wv[..., None] * gv[..., None, :]).reshape(-1, 8 * F)
        vv = jnp.where((si < m)[:, None], vv, 0.0)
        csum = jnp.cumsum(vv, axis=0)
        _, order = sort2(sk)
        return final_gather(csum, order)

    results["bwd_factored_s"] = timeit(jax.jit(bwd_factored), idx_flat, w_all, g)

    # Reference: the full current bwd via the custom VJP.
    vjp_fn = hashgrid._oct_grad_encode(tuple(int(r) for r in res), T)
    table = jax.random.normal(jax.random.fold_in(rng, 2), (L, T, F)) * 1e-2

    def full(x, table):
        out, pull = jax.vjp(lambda t: vjp_fn(x, t), table)
        return pull(g.reshape(N_SAMPLES, L * F))[0]

    results["full_bwd_s"] = timeit(jax.jit(full), x, table)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
