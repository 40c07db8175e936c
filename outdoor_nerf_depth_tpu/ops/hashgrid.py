"""Multiresolution hash-grid encoding (the Instant-NGP field backbone).

Capability parity with tiny-cuda-nn's HashGrid encoder as used by the
reference (`/root/reference/nerf-methods/ngp-depth/models/networks.py:36-77`:
L=16 levels, F=2 features/level, T=2^19 table, N_min=16, growth b from
`exp((ln(2048*scale) - ln(16)) / (L-1))`), re-designed for XLA/TPU:

* the per-level trilinear gather is expressed as one `take` over the level's
  table slice — XLA lowers it to a dynamic-gather HLO; the backward pass is
  the transpose scatter-add, which is exactly tcnn's hand-written gradient
  kernel, derived here by AD;
* all 16 levels share one [L, T, F] parameter tensor so a single scatter-add
  covers the whole backward;
* levels whose dense grid fits the table use injective dense indexing
  (matching tcnn), so coarse levels behave like voxel grids with no hash
  collisions.

The table lives in an ordinary flax param — shardable over a mesh axis if
the table ever outgrows HBM.

TPU gather-granularity redesign (the "oct" family; "osplit" is the
default): random-access gather on the v5e is PER-ROW bound and the per-row
cost scales with the SOURCE array's size — ~7 ns/row from <=2 MB sources,
~16 ns at 16 MB, ~21 ns at 128+ MB, roughly row-width independent at
8-64 B rows (r4 measurement with forced fetches; an earlier "6.4 ns/row"
reading was a tunnel deferred-execution artifact).
So the per-step cost is set by gathered-ROW COUNT, not bytes, and the
design goal is fewest rows per (sample, level). The classic layout needs 8
corner gathers. The "oct" layout makes the hash *fully linear* —
``h(x,y,z) = (x*P1 + y*P2 + z) mod T`` — so ALL EIGHT cell corners sit at
static row offsets {cx*Sx + cy*Sy + cz}; packing them into one 8F-lane
physical row (built by rolls, one cheap bandwidth pass per step) serves
the whole corner cube in ONE gather per (sample, level). The intermediate
"quad" layout (linear in y/z only, 2 gathers) is kept because it shares
the same hash — trained tables are interchangeable. The backward reduces
(index, value) pairs in packed space (8x fewer entries than corner space)
and folds the packed gradient back onto the canonical table with rolls.
Hash-quality note: full linearity changes the collision *pattern* (a
lattice instead of XOR mixing) but not the collision *rate*; tcnn itself
uses stride-1 (linear) indexing in x, and the on-TPU quality gate shows
parity.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Large primes from the Instant-NGP paper's spatial hash (x uses stride 1).
_PRIMES = (1, 2_654_435_761, 805_459_861)


def growth_factor(n_levels: int, n_min: int, n_max: int) -> float:
    if n_levels <= 1:
        return 1.0
    return float(np.exp((np.log(n_max) - np.log(n_min)) / (n_levels - 1)))


def level_resolutions(n_levels: int, n_min: int, n_max: int) -> np.ndarray:
    b = growth_factor(n_levels, n_min, n_max)
    return np.floor(n_min * b ** np.arange(n_levels)).astype(np.int32)


def _hash_corner(coords, resolution: int, table_size: int):
    """Spatial-hash (or dense) index of integer grid coords [..., 3]."""
    if (resolution + 1) ** 3 <= table_size:
        # Injective dense indexing: no collisions at coarse levels.
        stride = resolution + 1
        idx = (
            coords[..., 0]
            + coords[..., 1] * stride
            + coords[..., 2] * stride * stride
        )
        return idx
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    h ^= c[..., 1] * jnp.uint32(_PRIMES[1])
    h ^= c[..., 2] * jnp.uint32(_PRIMES[2])
    # Table sizes are powers of two: mask instead of mod.
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


# The 8 corner offsets of a unit cell, as a [8, 3] constant.
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)


def _corner_indices_weights(x, resolutions, table_size: int):
    """Per-level corner hash indices + trilinear weights.

    Returns (idx [..., L, 8] into the flattened [L*T] table,
             w [..., L, 8] trilinear weights).
    """
    n_levels = len(resolutions)
    x = jnp.clip(x, 0.0, 1.0)
    idx_levels, w_levels = [], []
    for level in range(n_levels):
        res = int(resolutions[level])
        pos = x * res  # cell coordinates in [0, res]
        cell = jnp.floor(pos).astype(jnp.int32)
        cell = jnp.clip(cell, 0, res - 1)
        frac = pos - cell

        corners = cell[..., None, :] + _CORNERS  # [..., 8, 3]
        idx = _hash_corner(corners, res, table_size)  # [..., 8]
        idx_levels.append(idx + level * table_size)
        # Trilinear weights from the corner pattern (product form).
        w_levels.append(
            jnp.prod(
                jnp.where(
                    _CORNERS[:, :] == 1, frac[..., None, :], 1.0 - frac[..., None, :]
                ),
                axis=-1,
            )
        )  # [..., 8]
    return jnp.stack(idx_levels, axis=-2), jnp.stack(w_levels, axis=-2)


def encode(x, table, resolutions, table_size: int, pack_rows: int = 0):
    """Hash-encode unit-cube positions.

    Args:
      x: [..., 3] positions in [0, 1] (caller contracts/normalizes).
      table: [L, T, F] feature table.
      resolutions: static [L] per-level grid resolutions.
      table_size: T (power of two).
      pack_rows: 0 gathers [F]-wide rows directly. P > 0 views the table as
        [L*T/P, P*F] and gathers full lane-width rows, then selects the
        bucket's F lanes — TPU HBM gathers of tiny rows (F=2 -> 8 bytes) run
        two orders of magnitude below bandwidth, while 128-lane rows gather
        at full speed; the P*F-row layout trades P-fold read amplification
        for that granularity (P=64, F=2 -> 128 lanes).

    Returns [..., L * F] interpolated features.

    All levels' corner lookups are folded into ONE gather over the
    flattened table (index arithmetic per level is fused VPU work): one
    gather HLO + one transpose scatter-add in backward instead of L of
    each.
    """
    n_levels, _, n_feats = table.shape
    idx_all, w_all = _corner_indices_weights(x, resolutions, table_size)

    if pack_rows > 1:
        p = pack_rows
        packed = table.reshape(-1, p * n_feats)  # [L*T/P, P*F]
        rows = jnp.take(packed, idx_all // p, axis=0)  # [..., L, 8, P*F]
        lane = (idx_all % p)[..., None] * n_feats + jnp.arange(n_feats)
        feats = jnp.take_along_axis(rows, lane, axis=-1)  # [..., L, 8, F]
    else:
        flat_table = table.reshape(-1, n_feats)  # [L*T, F]
        feats = jnp.take(flat_table, idx_all, axis=0)  # [..., L, 8, F]
    out = jnp.sum(w_all[..., None] * feats, axis=-2)  # [..., L, F]
    return out.reshape(out.shape[:-2] + (n_levels * n_feats,))


def _sorted_row_sums(flat_idx, vals, n_rows: int):
    """Sum `vals` rows by index with NO scatter (TPU scatter-free segsum).

    Measured on the v5e: XLA scatter-add costs ~80 ns per scattered row
    regardless of uniqueness or collisions (67M-row table gradients = 5.5 s
    per NGP step), while 67M-key multi-operand `lax.sort` is 0.37 s and a
    67Mx2 cumsum 0.06 s. So the gradient reduction is reformulated with no
    scatter at all:

      1. append one zero-valued *sentinel* entry per table row,
      2. one stable sort by row id (data entries precede their sentinel),
      3. inclusive cumsum of the sorted values — each sentinel now carries
         the cumulative sum through ALL entries of rows <= its own,
      4. one stable binary-partition sort on the sentinel flag compacts the
         sentinels (already in row order) to the front,
      5. per-row sums = adjacent differences of the compacted cumsums.

    Cost: two sorts + one cumsum + elementwise — ~1 s at the NGP KITTI
    shape vs 5.5 s for scatter-add, and collision-pattern independent.

    Args:
      flat_idx: [M] int32 row ids in [0, n_rows).
      vals: [M, F] float32 contributions.
    Returns [n_rows, F] per-row sums.
    """
    m = flat_idx.shape[0]
    f = vals.shape[-1]
    # Pack the sentinel flag into the key's low bit (data = 2*row,
    # sentinel = 2*row + 1): one less 75M-element operand to carry through
    # the sort, and the ordering (data before its row's sentinel) comes
    # from the key itself instead of sort stability.
    keys = jnp.concatenate(
        [
            flat_idx.astype(jnp.int32) * 2,
            jnp.arange(n_rows, dtype=jnp.int32) * 2 + 1,
        ]
    )
    vpad = jnp.concatenate(
        [vals.astype(jnp.float32), jnp.zeros((n_rows, f), jnp.float32)]
    )
    ops = jax.lax.sort(
        (keys,) + tuple(vpad[:, i] for i in range(f)), num_keys=1
    )
    is_sentinel = (ops[0] & 1).astype(jnp.int32)
    csum = jnp.cumsum(jnp.stack(ops[1:], axis=-1), axis=0)
    # Binary partition: sentinels (already in row order) to the front.
    ops2 = jax.lax.sort(
        (1 - is_sentinel,) + tuple(csum[:, i] for i in range(f)),
        num_keys=1,
        is_stable=True,
    )
    s_csum = jnp.stack(ops2[1:], axis=-1)[:n_rows]
    prev = jnp.concatenate([jnp.zeros((1, f), s_csum.dtype), s_csum[:-1]], 0)
    return s_csum - prev


def _quad_stride(resolution: int, table_size: int) -> int:
    """Row offset of the y+1 corner in the quad layout (see module doc)."""
    if (resolution + 1) ** 3 <= table_size:
        return resolution + 1  # dense injective layout x*(s*s) + y*s + z
    return int(_PRIMES[2] % table_size)


def _quad_base_index(cell, resolution: int, table_size: int):
    """Row index of a cell's (y0, z0) corner under the quad-layout hash.

    Dense levels use the natural x-major layout; hashed levels use
    ``(x*P1 + y*P2 + z) mod T`` — linear in y and z so the corner quad is
    reachable at static offsets {0, 1, Sy, Sy+1}.

    Returns (base_idx [...], x_step: offset of the x+1 corner).
    """
    if (resolution + 1) ** 3 <= table_size:
        s = resolution + 1
        idx = cell[..., 0] * (s * s) + cell[..., 1] * s + cell[..., 2]
        return idx, s * s
    c = cell.astype(jnp.uint32)
    h = (
        c[..., 0] * jnp.uint32(_PRIMES[1])
        + c[..., 1] * jnp.uint32(_PRIMES[2])
        + c[..., 2]
    )
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32), int(
        _PRIMES[1] % table_size
    )


def _quad_indices_weights(x, resolutions, table_size: int):
    """Quad-layout gather plan.

    Returns (idx [..., L, 2] rows into the flattened [L*T] phys table — the
    two x corners; w [..., L, 8] per-corner trilinear weights, ordered
    (cx-major, quad-lane-minor) so `w[..., 4*cx + q]` weighs lane q of
    gathered row cx, with quad lanes {0,1,Sy,Sy+1} = {(y0,z0), (y0,z1),
    (y1,z0), (y1,z1)}). Shapes deliberately mirror the proven corner
    layout's [..., L, 8] weight tensor — 6-D broadcast intermediates with
    tiny trailing dims provoke catastrophic TPU tile padding.
    """
    n_levels = len(resolutions)
    x = jnp.clip(x, 0.0, 1.0)
    mask = table_size - 1
    idx_levels, w_levels = [], []
    for level in range(n_levels):
        res = int(resolutions[level])
        pos = x * res
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
        frac = pos - cell
        base, x_step = _quad_base_index(cell, res, table_size)
        if (res + 1) ** 3 <= table_size:
            idx1 = base + x_step  # stays within the dense block, no wrap
        else:
            idx1 = (base + x_step) & mask
        idx_levels.append(
            jnp.stack([base, idx1], axis=-1) + level * table_size
        )
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        wq = [
            (1.0 - fy) * (1.0 - fz),
            (1.0 - fy) * fz,
            fy * (1.0 - fz),
            fy * fz,
        ]
        w_levels.append(
            jnp.stack(
                [(1.0 - fx) * q for q in wq] + [fx * q for q in wq], axis=-1
            )
        )
    return jnp.stack(idx_levels, axis=-2), jnp.stack(w_levels, axis=-2)


def build_quad_table(table, resolutions, table_size: int):
    """Materialize the packed [L, T, 4*F] physical table from the canonical
    [L, T, F] parameter: phys[i] = canon[i] ++ canon[i+1] ++ canon[i+Sy]
    ++ canon[i+Sy+1] (mod T; dense levels never read the wrapped rows).
    One bandwidth pass per step — negligible next to the gathers it saves.
    """
    levels = []
    for level in range(table.shape[0]):
        sy = _quad_stride(int(resolutions[level]), table_size)
        t = table[level]
        levels.append(
            jnp.concatenate(
                [
                    t,
                    jnp.roll(t, -1, axis=0),
                    jnp.roll(t, -sy, axis=0),
                    jnp.roll(t, -(sy + 1), axis=0),
                ],
                axis=-1,
            )
        )
    return jnp.stack(levels)


def encode_quad(x, table, resolutions, table_size: int, phys=None):
    """Hash-encode via the quad-packed layout (2 gathers per sample-level).

    Differentiable as-is (jnp.take AD gives a scatter backward); the TPU
    training path wraps it in `_quad_grad_encode`'s custom VJP instead.
    Note the hash differs from `encode`'s XOR hash, so outputs are not
    numerically comparable across layouts (only capability-equivalent).
    `phys` as in `encode_oct`.
    """
    n_levels, _, n_feats = table.shape
    idx, w_all = _quad_indices_weights(x, resolutions, table_size)
    if phys is None:
        phys = build_quad_table(table, resolutions, table_size)
    rows = jnp.take(phys.reshape(-1, 4 * n_feats), idx, axis=0)
    # [..., L, 2, 4F] -> [..., L, 8, F]: minor split, (cx, q) matches w_all.
    feats = rows.reshape(rows.shape[:-2] + (8, n_feats))
    out = jnp.sum(w_all[..., None] * feats, axis=-2)  # [..., L, F]
    return out.reshape(out.shape[:-2] + (n_levels * n_feats,))


def _oct_offsets(resolution: int, table_size: int):
    """Row offsets of ALL EIGHT cell corners under the fully-linear hash.

    The quad layout's hash ``h(x,y,z) = (x*P1 + y*P2 + z) mod T`` is linear
    in every coordinate, so the whole corner cube sits at static offsets
    {cx*Sx + cy*Sy + cz} (corner-bit order, lane = 4*cx + 2*cy + cz). Dense
    levels use their natural strides (Sx = s^2, Sy = s). Packing all eight
    corners into one 8F-lane physical row makes the forward ONE gather per
    (sample, level) — gather cost on this chip is per-row bound and roughly
    row-width independent (measured r3, forced fetches: ~28-34 ns/row at
    8-64 B rows), so this halves the gather bill vs quad and is 8x below
    the corner layout.
    """
    if (resolution + 1) ** 3 <= table_size:
        s = resolution + 1
        sx, sy = s * s, s
    else:
        sx = int(_PRIMES[1] % table_size)
        sy = int(_PRIMES[2] % table_size)
    return [cx * sx + cy * sy + cz
            for cx in (0, 1) for cy in (0, 1) for cz in (0, 1)]


def _oct_level_rows(resolutions, table_size: int):
    """Per-level row counts of the TRIMMED oct physical table.

    Dense levels are injective: cell bases only ever index rows
    [0, (res+1)^3), so the packed table need not carry the full T rows.
    Trimming shrinks the phys table (less build bandwidth) and — the real
    win — the backward's sentinel domain: table-gradient rows drop from
    L*T to sum(rows_l), ~27%% fewer boundary-gather rows at the KITTI
    shape (T=2^19, 5 dense levels)."""
    rows = []
    for r in resolutions:
        s = int(r) + 1
        rows.append(s**3 if s**3 <= table_size else table_size)
    return rows


def build_oct_table(table, resolutions, table_size: int):
    """Materialize the trimmed [sum(rows_l), 8*F] physical table:
    row (level_offset + i), lane o = canon[level][(i + offset_o) mod T]
    (dense levels never *gather* wrapped rows — bases stop at s^3-1-o).
    Eight rolls = one bandwidth pass per step, negligible next to the
    gathers it saves."""
    levels = []
    level_rows = _oct_level_rows(resolutions, table_size)
    for level in range(table.shape[0]):
        offs = _oct_offsets(int(resolutions[level]), table_size)
        t = table[level]
        packed = jnp.concatenate(
            [t if o == 0 else jnp.roll(t, -o, axis=0) for o in offs],
            axis=-1,
        )
        levels.append(packed[: level_rows[level]])
    return jnp.concatenate(levels, axis=0)


def _oct_indices_weights(x, resolutions, table_size: int):
    """Oct-layout gather plan: (idx [..., L] rows into the trimmed
    [sum(rows_l)] phys table, w [..., L, 8] corner-bit-ordered trilinear
    weights)."""
    n_levels = len(resolutions)
    x = jnp.clip(x, 0.0, 1.0)
    level_rows = _oct_level_rows(resolutions, table_size)
    idx_levels, w_levels = [], []
    offset = 0
    for level in range(n_levels):
        res = int(resolutions[level])
        pos = x * res
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
        frac = pos - cell
        base, _ = _quad_base_index(cell, res, table_size)
        idx_levels.append(base + offset)
        offset += level_rows[level]
        w_levels.append(
            jnp.prod(
                jnp.where(
                    _CORNERS[:, :] == 1,
                    frac[..., None, :],
                    1.0 - frac[..., None, :],
                ),
                axis=-1,
            )
        )
    return jnp.stack(idx_levels, axis=-1), jnp.stack(w_levels, axis=-2)


def encode_oct(x, table, resolutions, table_size: int, phys=None):
    """Hash-encode via the oct-packed layout (1 gather per sample-level).

    Same hash as the quad layout (outputs match encode_quad exactly);
    differentiable as-is, but the training path wraps it in
    `_oct_grad_encode`'s custom VJP. Pass a precomputed `phys`
    (`build_oct_table`) when calling repeatedly — e.g. from the iterative
    eval renderer's while_loop, where rebuilding the packed table every
    round would cost ~0.5 GB of HBM traffic per round.
    """
    n_levels, _, n_feats = table.shape
    idx, w_all = _oct_indices_weights(x, resolutions, table_size)
    if phys is None:
        phys = build_oct_table(table, resolutions, table_size)
    rows = jnp.take(phys, idx, axis=0)
    feats = rows.reshape(rows.shape[:-1] + (8, n_feats))
    out = jnp.sum(w_all[..., None] * feats, axis=-2)  # [..., L, F]
    return out.reshape(out.shape[:-2] + (n_levels * n_feats,))


def build_oct_tables_split(table, resolutions, table_size: int,
                           dtype=jnp.bfloat16):
    """Per-level trimmed oct physical tables (tuple of [rows_l, 8F]).

    The r4 gather probe (`benchmarks/probes/gather_attack_probe.py`) showed
    TPU gather cost is a function of the SOURCE array's size, not only of
    gathered-row count: ~7 ns/row from <=2 MB sources (VMEM-resident),
    ~16 ns/row at 16 MB, ~21 ns/row at 128 MB. One concatenated
    [sum(rows_l), 8F] f32 table (~380 MB) pins every level at the slow end;
    splitting per level puts the dense coarse levels (kB..MB) on the fast
    path and halving bytes with bf16 keeps the hashed levels at the 16 MB
    point. bf16 storage matches tcnn's fp16 table precision (the reference
    backend trains in half); the canonical param table stays f32.
    """
    level_rows = _oct_level_rows(resolutions, table_size)
    out = []
    for level in range(table.shape[0]):
        offs = _oct_offsets(int(resolutions[level]), table_size)
        t = table[level]
        packed = jnp.concatenate(
            [t if o == 0 else jnp.roll(t, -o, axis=0) for o in offs],
            axis=-1,
        )
        out.append(packed[: level_rows[level]].astype(dtype))
    return tuple(out)


def _oct_local_indices_weights(x, resolutions, table_size: int):
    """Per-level-LOCAL gather plan for the split-table layout.

    Returns (idx_levels: list of [...] int32 rows into each level's own
    trimmed table, w_all [..., L, 8] corner-bit-ordered trilinear weights).
    Same hash as `_oct_indices_weights`, minus the level offsets.
    """
    n_levels = len(resolutions)
    x = jnp.clip(x, 0.0, 1.0)
    idx_levels, w_levels = [], []
    for level in range(n_levels):
        res = int(resolutions[level])
        pos = x * res
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
        frac = pos - cell
        base, _ = _quad_base_index(cell, res, table_size)
        idx_levels.append(base)
        w_levels.append(
            jnp.prod(
                jnp.where(
                    _CORNERS[:, :] == 1,
                    frac[..., None, :],
                    1.0 - frac[..., None, :],
                ),
                axis=-1,
            )
        )
    return idx_levels, jnp.stack(w_levels, axis=-2)


def encode_oct_split(x, table, resolutions, table_size: int, phys=None):
    """Hash-encode via per-level bf16 oct tables (see build_oct_tables_split).

    Output identical to `encode_oct` up to the bf16 rounding of the table
    copy (the trilinear blend still runs in f32). `phys` as in `encode_oct`
    but a tuple of per-level tables.
    """
    n_levels, _, n_feats = table.shape
    idx_levels, w_all = _oct_local_indices_weights(x, resolutions, table_size)
    if phys is None:
        phys = build_oct_tables_split(table, resolutions, table_size)
    outs = []
    for level in range(n_levels):
        rows = jnp.take(phys[level], idx_levels[level], axis=0).astype(
            jnp.float32
        )
        feats = rows.reshape(rows.shape[:-1] + (8, n_feats))
        outs.append(jnp.sum(w_all[..., level, :, None] * feats, axis=-2))
    return jnp.concatenate(outs, axis=-1)


# Mesh used to shard the TABLE-GRADIENT reduction. The train-step factories
# bind this (via set_grad_mesh) immediately before dispatch, so the value is
# correct when jit traces the backward. With a >1-device mesh, each level's
# segment sums run PER DEVICE over that device's samples inside shard_map,
# then psum — the sum over samples decomposes exactly, every sort touches
# only local data (no cross-device sort collectives), and the Pallas scan
# is legal per device. With no mesh (or one device), the plain global path
# runs and XLA partitions nothing.
_GRAD_MESH = None


def set_grad_mesh(mesh) -> None:
    global _GRAD_MESH
    _GRAD_MESH = (
        mesh if mesh is not None and len(mesh.devices.flat) > 1 else None
    )


def _row_sums_for_grad(idx_flat, vals, n_rows: int):
    """Dispatch the per-level segment sum: shard-local + psum on a
    multi-device mesh, plain global otherwise.

    Falls back to the global path when the sample count doesn't divide
    the mesh (shard_map would reject it): the bound mesh describes the
    TRAIN step's batch sharding, but the encoder is also called on
    arbitrary-sized point sets (occupancy refreshes, tests, viewer
    probes) that may not be sharded at all."""
    mesh = _GRAD_MESH
    if mesh is None or idx_flat.shape[0] % len(mesh.devices.flat):
        return _oct_split_row_sums(idx_flat, vals, n_rows)
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(i, v):
        seg = _oct_split_row_sums(i, v, n_rows, force_pallas=True)
        return jax.lax.psum(seg, axis)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P()
    )(idx_flat, vals)


def _oct_split_row_sums(idx_flat, vals, n_rows: int,
                        force_pallas: bool = False):
    """Segment row sums for ONE level.

    Two scatter-free pipelines, selected by ONDT_OSPLIT_ROWSUMS
    ("threesort", the default pending on-chip measurement, or "merged"):

    * "merged": ONE 2-operand sort over m + n_rows interleaves data keys
      (2*idx) with per-row sentinel keys (2*r + 1); the prefix sum of the
      sorted value stream (sentinels carry 0) evaluated AT each sentinel is
      that row's inclusive total, so row sums are adjacent differences of
      the csum compacted to sentinel positions (one stable partition sort).
      2 sorts total.
    * "threesort": the r4 pipeline — data-only sort for the value order,
      then a key-only sentinel sort + stable partition for boundary
      positions. 3 sorts, but the cumsum covers only m entries.

    Both use the lane-folded Pallas prefix scan on TPU: XLA's cumsum on
    narrow [*, 16] arrays pays the 128-lane tile padding several times
    over (r4: 77 ms at [16.8M, 16] vs a ~3 ms bandwidth floor).

    The permutation gather reads from a BF16 copy of `vals` by default
    (ONDT_OSPLIT_GRAD_GATHER=f32 restores f32): gather cost is per-row and
    scales with SOURCE size (r4 roofline: ~16 ns/row at 16 MB vs ~21-27 at
    32+ MB), and at the bench shape the 16 per-level value gathers are the
    single largest backward stage (r5 probe: 0.224 s of a 0.286 s
    fwd+bwd). Each product w*g is rounded to bf16 (~0.4% rel) before the
    f32 cumsum — the same precision class as the bf16 tables themselves
    and the fp16 gradient accumulation the reference's tiny-cuda-nn uses
    (ngp-depth README's tcnn backend).
    """
    import os

    from outdoor_nerf_depth_tpu.ops import pallas_scan

    m = idx_flat.shape[0]
    lanes = vals.shape[-1]
    if os.environ.get("ONDT_OSPLIT_GRAD_GATHER", "bf16") == "bf16":
        vals = vals.astype(jnp.bfloat16)
    total = m + n_rows
    keys = jnp.concatenate(
        [idx_flat * 2, jnp.arange(n_rows, dtype=jnp.int32) * 2 + 1]
    )
    if os.environ.get("ONDT_OSPLIT_ROWSUMS", "threesort") == "merged":
        sk, sp = jax.lax.sort(
            (keys, jnp.arange(total, dtype=jnp.int32)), num_keys=1
        )
        sv = jnp.where(
            (sp < m)[:, None],
            jnp.take(vals, jnp.minimum(sp, m - 1), axis=0),
            0.0,
        ).astype(jnp.float32)  # accumulate in f32 regardless of gather dtype
        csum = pallas_scan.cumsum_auto(sv, force=force_pallas)
        _, order = jax.lax.sort(
            (sk & 1 ^ 1, jnp.arange(total, dtype=jnp.int32)),
            num_keys=1,
            is_stable=True,
        )
        s_csum = jnp.take(csum, order[:n_rows], axis=0)
        return s_csum - jnp.concatenate(
            [jnp.zeros((1, lanes), s_csum.dtype), s_csum[:-1]], axis=0
        )

    _, sd = jax.lax.sort(
        (idx_flat, jnp.arange(m, dtype=jnp.int32)), num_keys=1
    )
    csum = pallas_scan.cumsum_auto(
        jnp.take(vals, sd, axis=0).astype(jnp.float32), force=force_pallas
    )

    (sk,) = jax.lax.sort((keys,), num_keys=1)
    _, order = jax.lax.sort(
        (sk & 1 ^ 1, jnp.arange(total, dtype=jnp.int32)),
        num_keys=1,
        is_stable=True,
    )
    b = order[:n_rows] - jnp.arange(n_rows, dtype=jnp.int32)

    ge = jnp.take(csum, jnp.maximum(b - 1, 0), axis=0)
    ge = jnp.where((b > 0)[:, None], ge, 0.0)
    return ge - jnp.concatenate(
        [jnp.zeros((1, lanes), ge.dtype), ge[:-1]], axis=0
    )


@functools.lru_cache(maxsize=None)
def _oct_split_grad_encode(resolutions_key: tuple, table_size: int):
    """encode_oct_split() under a custom VJP: the oct backward run
    PER LEVEL so every gather reads a small (often VMEM-resident) source
    — see `build_oct_tables_split` for the measured size/cost curve."""
    resolutions = np.asarray(resolutions_key, np.int32)
    n_levels = len(resolutions_key)

    @jax.custom_vjp
    def fn(x, table):
        return encode_oct_split(x, table, resolutions, table_size)

    def fwd(x, table):
        n_feats = table.shape[-1]
        idx_levels, w_all = _oct_local_indices_weights(
            x, resolutions, table_size
        )
        phys = build_oct_tables_split(table, resolutions, table_size)
        outs, rows_levels = [], []
        for level in range(n_levels):
            rows = jnp.take(phys[level], idx_levels[level], axis=0)
            rows_levels.append(rows)  # bf16 residual (halves the traffic)
            feats = rows.astype(jnp.float32).reshape(
                rows.shape[:-1] + (8, n_feats)
            )
            outs.append(jnp.sum(w_all[..., level, :, None] * feats, axis=-2))
        out = jnp.concatenate(outs, axis=-1)
        return out, (x, tuple(idx_levels), w_all, tuple(rows_levels),
                     table.shape)

    def bwd(res, g):
        x, idx_levels, w_all, rows_levels, table_shape = res
        n_feats = table_shape[-1]
        lanes = 8 * n_feats
        g_lf = g.reshape(g.shape[:-1] + (n_levels, n_feats))
        level_rows = _oct_level_rows(resolutions_key, table_size)

        canon_levels = []
        s_levels = []
        for level in range(n_levels):
            g_l = g_lf[..., level, :]
            w_l = w_all[..., level, :]
            vals = (w_l[..., None] * g_l[..., None, :]).reshape(-1, lanes)
            idx_flat = idx_levels[level].reshape(-1).astype(jnp.int32)
            rows_l = level_rows[level]
            seg = _row_sums_for_grad(idx_flat, vals, rows_l)

            offs = _oct_offsets(int(resolutions_key[level]), table_size)
            p = seg
            if rows_l < table_size:
                p = jnp.pad(p, ((0, table_size - rows_l), (0, 0)))
            acc = p[:, 0:n_feats]
            for lane, o in enumerate(offs[1:], start=1):
                acc = acc + jnp.roll(
                    p[:, lane * n_feats:(lane + 1) * n_feats], o, axis=0
                )
            canon_levels.append(acc)

            feats = rows_levels[level].astype(jnp.float32).reshape(
                rows_levels[level].shape[:-1] + (8, n_feats)
            )
            s_levels.append(jnp.sum(g_l[..., None, :] * feats, axis=-1))
        dtable = jnp.stack(canon_levels)
        s = jnp.stack(s_levels, axis=-2)  # [..., L, 8]
        return _trilinear_dx(x, resolutions_key, s), dtable

    fn.defvjp(fwd, bwd)
    return fn


def _trilinear_dx(x, resolutions, s):
    """dL/dx from per-corner sums `s` [..., L, 8] (corner-bit lane order):
    dw/dx_d = res * sign_d * prod_{d' != d} f_{d'} (shared by the corner and
    oct gradient paths)."""
    xc = jnp.clip(x, 0.0, 1.0)
    dx = jnp.zeros_like(x)
    for level in range(len(resolutions)):
        r = float(resolutions[level])
        pos = xc * r
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, int(r) - 1)
        frac = pos - cell  # [..., 3]
        fd = jnp.where(
            _CORNERS[:, :] == 1, frac[..., None, :], 1.0 - frac[..., None, :]
        )  # [..., 8, 3]
        sign = jnp.where(_CORNERS[:, :] == 1, 1.0, -1.0)
        f0, f1, f2 = fd[..., 0], fd[..., 1], fd[..., 2]
        others = jnp.stack([f1 * f2, f0 * f2, f0 * f1], axis=-1)
        dw_dx = r * sign * others  # [..., 8, 3]
        dx = dx + jnp.sum(s[..., level, :, None] * dw_dx, axis=-2)
    in_range = (x > 0.0) & (x < 1.0)
    return jnp.where(in_range, dx, 0.0)


@functools.lru_cache(maxsize=None)
def _oct_grad_encode(resolutions_key: tuple, table_size: int):
    """encode_oct() under a custom VJP: packed-space sorted-segment table
    gradient (8x fewer reduction entries than corner space) folded back to
    the canonical table by eight rolls; analytic trilinear x gradient.

    The backward is structured around the measured TPU gather roofline
    (~30 ns per gathered row, row-width independent — the r3 stage probe;
    sorts and cumsums are comparatively free). Gathered rows are the budget:

      1. sort the m data entries alone (2-operand int32 sort) and gather
         the [m, 8F] gradient values ONCE into segment order, then cumsum;
      2. find every table row's segment boundary with INT-ONLY sentinel
         sorts: in the merged (2*idx) ++ (2*row+1) order, sentinel r sits
         at position p_r, so b_r = p_r - r = #(idx <= r) — no value lanes
         ride these sorts;
      3. ONE boundary gather of the prefix sums at b_r - 1; a row-shifted
         difference yields every row's segment sum (b is monotone in r, so
         the previous row's boundary value is just the gather shifted by
         one row — no second gather).

    Total gathered rows: m + sum(rows_l), vs 2m + (m + L*T) for the
    sentinel-interleaved variant (`_sorted_row_sums_gather`) — measured
    1.7x faster end-to-end at the 8192x64 KITTI shape.
    """
    resolutions = np.asarray(resolutions_key, np.int32)
    n_levels = len(resolutions_key)

    @jax.custom_vjp
    def fn(x, table):
        return encode_oct(x, table, resolutions, table_size)

    def fwd(x, table):
        n_feats = table.shape[-1]
        idx, w_all = _oct_indices_weights(x, resolutions, table_size)
        phys = build_oct_table(table, resolutions, table_size)
        rows = jnp.take(phys, idx, axis=0)
        feats = rows.reshape(rows.shape[:-1] + (8, n_feats))
        out = jnp.sum(w_all[..., None] * feats, axis=-2)
        out = out.reshape(out.shape[:-2] + (n_levels * n_feats,))
        # Save the 2-D gather output, NOT the [..., 8, F] view: a 4-D
        # residual with (8, F)-minor dims tile-pads (8,128) — 64x — and has
        # OOM'd compiles at the training shape (34 GB for a 537 MB logical
        # array). `rows` is already materialized by the gather.
        return out, (x, idx, w_all, rows, table.shape)

    def bwd(res, g):
        x, idx, w_all, rows, table_shape = res
        n_feats = table_shape[-1]
        lanes = 8 * n_feats
        feats = rows.reshape(rows.shape[:-1] + (8, n_feats))
        g_lf = g.reshape(g.shape[:-1] + (n_levels, n_feats))
        level_rows = _oct_level_rows(resolutions_key, table_size)
        n_rows = int(np.sum(level_rows))

        # d(gathered phys rows) [m, 8F], reduced in packed space.
        vals = (w_all[..., None] * g_lf[..., None, :]).reshape(-1, lanes)
        idx_flat = idx.reshape(-1).astype(jnp.int32)
        m = idx_flat.shape[0]

        # (1) data-only segment order: one m-row value gather + cumsum
        # (lane-folded Pallas scan on TPU; see _oct_split_row_sums).
        from outdoor_nerf_depth_tpu.ops import pallas_scan

        _, sd = jax.lax.sort(
            (idx_flat, jnp.arange(m, dtype=jnp.int32)), num_keys=1
        )
        csum = pallas_scan.cumsum_auto(jnp.take(vals, sd, axis=0))

        # (2) int-only sentinel sorts give each row's boundary b_r.
        total = m + n_rows
        keys = jnp.concatenate(
            [idx_flat * 2, jnp.arange(n_rows, dtype=jnp.int32) * 2 + 1]
        )
        (sk,) = jax.lax.sort((keys,), num_keys=1)
        _, order = jax.lax.sort(
            (sk & 1 ^ 1, jnp.arange(total, dtype=jnp.int32)),
            num_keys=1,
            is_stable=True,
        )
        b = order[:n_rows] - jnp.arange(n_rows, dtype=jnp.int32)

        # (3) one boundary gather + shifted difference.
        ge = jnp.take(csum, jnp.maximum(b - 1, 0), axis=0)
        ge = jnp.where((b > 0)[:, None], ge, 0.0)
        seg = ge - jnp.concatenate(
            [jnp.zeros((1, lanes), ge.dtype), ge[:-1]], axis=0
        )

        # canon[j] appears in phys[j - offset_o][lane o]: fold with rolls.
        # Dense levels pad their trimmed rows back to T first; the wrapped
        # roll rows land on zero padding because base_max + T >= s^3 + T
        # > T + offset_o for every lane (dense condition T >= s^3).
        canon_levels = []
        off = 0
        for level in range(n_levels):
            rows_l = level_rows[level]
            offs = _oct_offsets(int(resolutions_key[level]), table_size)
            p = jax.lax.slice_in_dim(seg, off, off + rows_l, axis=0)
            off += rows_l
            if rows_l < table_size:
                p = jnp.pad(p, ((0, table_size - rows_l), (0, 0)))
            acc = p[:, 0:n_feats]
            for lane, o in enumerate(offs[1:], start=1):
                acc = acc + jnp.roll(
                    p[:, lane * n_feats:(lane + 1) * n_feats], o, axis=0
                )
            canon_levels.append(acc)
        dtable = jnp.stack(canon_levels)

        s = jnp.sum(g_lf[..., None, :] * feats, axis=-1)  # [..., L, 8]
        return _trilinear_dx(x, resolutions_key, s), dtable

    fn.defvjp(fwd, bwd)
    return fn


def _sorted_row_sums_gather(flat_idx, vals, n_rows: int):
    """`_sorted_row_sums` variant for WIDE value rows: the sorts carry only
    (key, position) — two int32 operands — and the values follow by one
    row gather per stage instead of riding every comparator exchange.
    Wins when F is wide (quad layout: 4*F lanes) and the row count is
    modest; `_sorted_row_sums` stays optimal for the narrow corner layout.
    """
    m = flat_idx.shape[0]
    f = vals.shape[-1]
    total = m + n_rows
    keys = jnp.concatenate(
        [
            flat_idx.astype(jnp.int32) * 2,
            jnp.arange(n_rows, dtype=jnp.int32) * 2 + 1,
        ]
    )
    iota = jnp.arange(total, dtype=jnp.int32)
    sk, si = jax.lax.sort((keys, iota), num_keys=1)
    v = jnp.take(vals.astype(jnp.float32), jnp.minimum(si, m - 1), axis=0)
    v = jnp.where((si < m)[:, None], v, 0.0)
    csum = jnp.cumsum(v, axis=0)
    # Compact the sentinel positions (already in row order) to the front.
    _, order = jax.lax.sort((sk & 1 ^ 1, iota), num_keys=1, is_stable=True)
    s_csum = jnp.take(csum, order[:n_rows], axis=0)
    prev = jnp.concatenate([jnp.zeros((1, f), s_csum.dtype), s_csum[:-1]], 0)
    return s_csum - prev


@functools.lru_cache(maxsize=None)
def _quad_grad_encode(resolutions_key: tuple, table_size: int):
    """encode_quad() under a custom VJP: packed-space sorted-segment table
    gradient (4x fewer reduction entries than corner space) folded back to
    the canonical table by four rolls; analytic trilinear x gradient."""
    resolutions = np.asarray(resolutions_key, np.int32)
    n_levels = len(resolutions_key)

    @jax.custom_vjp
    def fn(x, table):
        return encode_quad(x, table, resolutions, table_size)

    def fwd(x, table):
        n_feats = table.shape[-1]
        idx, w_all = _quad_indices_weights(x, resolutions, table_size)
        phys = build_quad_table(table, resolutions, table_size)
        rows = jnp.take(phys.reshape(-1, 4 * n_feats), idx, axis=0)
        # [..., L, 2, 4F] -> [..., L, 8, F]: mirrors the corner path's
        # proven shapes (no 6-D broadcast intermediates — those pick up
        # catastrophic TPU tile padding).
        feats = rows.reshape(rows.shape[:-2] + (8, n_feats))
        out = jnp.sum(w_all[..., None] * feats, axis=-2)
        out = out.reshape(out.shape[:-2] + (n_levels * n_feats,))
        # Residual = the 3-D gather output (see the oct path: a 4-D
        # [..., 8, F] residual tile-pads 64x and has OOM'd at 34 GB).
        return out, (x, idx, w_all, rows, table.shape)

    def bwd(res, g):
        x, idx, w_all, rows, table_shape = res
        n_feats = table_shape[-1]
        feats = rows.reshape(rows.shape[:-2] + (8, n_feats))
        g_lf = g.reshape(g.shape[:-1] + (n_levels, n_feats))

        # d(gathered phys rows): corner-indexed [..., L, 8, F], viewed as
        # the two gathered rows' lanes [..., L, 2, 4F] for the reduction.
        vals = w_all[..., None] * g_lf[..., None, :]
        pg = _sorted_row_sums_gather(
            idx.reshape(-1),
            vals.reshape(-1, 4 * n_feats),
            n_levels * table_size,
        ).reshape(n_levels, table_size, 4, n_feats)
        # Fold packed lanes onto the canonical rows they alias:
        # canon[j] appears in phys[j][0], phys[j-1][1], phys[j-Sy][2],
        # phys[j-Sy-1][3].
        canon_levels = []
        for level in range(n_levels):
            sy = _quad_stride(int(resolutions_key[level]), table_size)
            p = pg[level]
            canon_levels.append(
                p[:, 0]
                + jnp.roll(p[:, 1], 1, axis=0)
                + jnp.roll(p[:, 2], sy, axis=0)
                + jnp.roll(p[:, 3], sy + 1, axis=0)
            )
        dtable = jnp.stack(canon_levels)

        # dL/dx via analytic derivatives of the (cx-major, quad-minor)
        # weights: w[4*cx+q] = wx[cx] * wq[q], wx = (1-fx, fx),
        # wq = ((1-fy)(1-fz), (1-fy)fz, fy(1-fz), fy fz).
        s = jnp.sum(g_lf[..., None, :] * feats, axis=-1)  # [..., L, 8]
        xc = jnp.clip(x, 0.0, 1.0)
        dx = jnp.zeros_like(x)
        for level in range(n_levels):
            r = float(resolutions_key[level])
            pos = xc * r
            cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, int(r) - 1)
            frac = pos - cell
            fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
            sl = s[..., level, :]
            sl = sl.reshape(sl.shape[:-1] + (2, 4))  # [..., cx, q]
            wq = jnp.stack(
                [(1 - fy) * (1 - fz), (1 - fy) * fz, fy * (1 - fz), fy * fz],
                axis=-1,
            )
            wx = jnp.stack([1.0 - fx, fx], axis=-1)
            gx = r * jnp.sum(wq * (sl[..., 1, :] - sl[..., 0, :]), axis=-1)
            dwq_dfy = jnp.stack([-(1 - fz), -fz, (1 - fz), fz], axis=-1)
            dwq_dfz = jnp.stack([-(1 - fy), (1 - fy), -fy, fy], axis=-1)
            gy = r * jnp.sum(
                wx[..., :, None] * dwq_dfy[..., None, :] * sl, axis=(-2, -1)
            )
            gz = r * jnp.sum(
                wx[..., :, None] * dwq_dfz[..., None, :] * sl, axis=(-2, -1)
            )
            dx = dx + jnp.stack([gx, gy, gz], axis=-1)
        in_range = (x > 0.0) & (x < 1.0)
        dx = jnp.where(in_range, dx, 0.0)
        return dx, dtable

    fn.defvjp(fwd, bwd)
    return fn


@functools.lru_cache(maxsize=None)
def _sorted_grad_encode(resolutions_key: tuple, table_size: int):
    """encode() wrapped in a custom VJP: gather forward, scatter-free
    sorted-segment table gradient (see `_sorted_row_sums`), analytic
    trilinear derivative for the position gradient (serves optimize_ext)."""
    resolutions = np.asarray(resolutions_key, np.int32)
    n_levels = len(resolutions_key)

    @jax.custom_vjp
    def fn(x, table):
        return encode(x, table, resolutions, table_size)

    def fwd(x, table):
        n_feats = table.shape[-1]
        idx_all, w_all = _corner_indices_weights(x, resolutions, table_size)
        flat_table = table.reshape(-1, n_feats)
        feats = jnp.take(flat_table, idx_all, axis=0)  # [..., L, 8, F]
        out = jnp.sum(w_all[..., None] * feats, axis=-2)
        out = out.reshape(out.shape[:-2] + (n_levels * n_feats,))
        return out, (x, idx_all, w_all, feats, table.shape)

    def bwd(res, g):
        x, idx_all, w_all, feats, table_shape = res
        n_feats = table_shape[-1]
        g_lf = g.reshape(g.shape[:-1] + (n_levels, n_feats))

        vals = w_all[..., None] * g_lf[..., None, :]  # [..., L, 8, F]
        dtable = _sorted_row_sums(
            idx_all.reshape(-1), vals.reshape(-1, n_feats),
            n_levels * table_size,
        ).reshape(table_shape)

        # dL/dx via the analytic trilinear-weight derivative:
        # w = prod_d f_d with f_d = frac_d (corner bit 1) else 1 - frac_d;
        # dw/dx_d = res * sign_d * prod_{d' != d} f_{d'}.
        s = jnp.sum(g_lf[..., None, :] * feats, axis=-1)  # [..., L, 8]
        xc = jnp.clip(x, 0.0, 1.0)
        dx = jnp.zeros_like(x)
        for level in range(n_levels):
            r = float(resolutions_key[level])
            pos = xc * r
            cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, int(r) - 1)
            frac = pos - cell  # [..., 3]
            fd = jnp.where(
                _CORNERS[:, :] == 1, frac[..., None, :], 1.0 - frac[..., None, :]
            )  # [..., 8, 3]
            sign = jnp.where(_CORNERS[:, :] == 1, 1.0, -1.0)
            # prod over d' != d, exact (no divide-by-zero at cell faces).
            f0, f1, f2 = fd[..., 0], fd[..., 1], fd[..., 2]
            others = jnp.stack([f1 * f2, f0 * f2, f0 * f1], axis=-1)
            dw_dx = r * sign * others  # [..., 8, 3]
            dx = dx + jnp.sum(s[..., level, :, None] * dw_dx, axis=-2)
        # Clip boundary: positions at/past the clamp get zero gradient.
        in_range = (x > 0.0) & (x < 1.0)
        dx = jnp.where(in_range, dx, 0.0)
        return dx, dtable

    fn.defvjp(fwd, bwd)
    return fn


class HashGridEncoding(nn.Module):
    """Learnable multiresolution hash encoding as a flax module."""

    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 2048  # 2048 * scene scale in the reference
    init_scale: float = 1e-4
    # Gather granularity experiment (see `encode`): rows of
    # pack_rows*n_features lanes. Default OFF — XLA lowers the packed
    # lane-select (take_along_axis) by materializing a [N, L, 8, F, 4] s32
    # index tensor (64 GB at the KITTI shape; TPU compile rejects it), and
    # TPU gather cost is per-row rather than per-byte anyway, so packing
    # buys nothing. Kept (with an exactness test) as documentation of the
    # measured dead end.
    pack_rows: int = 0
    # Table-gradient path. "scatter" = plain AD (XLA scatter-add, ~80 ns
    # per scattered row on TPU -> 5.5 s/step at the KITTI NGP shape).
    # "sorted" = custom VJP with the scatter-free sorted-segment reduction
    # (`_sorted_row_sums`, ~1 s at the same shape). "auto" = sorted on
    # TPU, scatter elsewhere.
    grad_mode: str = "auto"
    # Table layout. "osplit" (default) = oct packing with PER-LEVEL bf16
    # physical tables and a per-level backward: gather cost on this chip
    # scales with source-array size (~7 ns/row <=2 MB vs ~21 ns/row at
    # hundreds of MB — the r4 gather probe), so small per-level sources
    # beat one concatenated table. "oct" = same hash/packing, one
    # concatenated f32 table. "quad" = same hash, 4-corner rows (2
    # gathers). "corner" = classic XOR-prime hash, 8 gathers. osplit, oct
    # and quad hash identically (tables interchangeable); corner does NOT
    # — checkpoints record the hash function and refuse cross-hash
    # restores.
    layout: str = "osplit"
    compute_dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def setup(self):
        if self.layout not in ("osplit", "oct", "quad", "corner"):
            raise ValueError(
                f"unknown hash-grid layout {self.layout!r}; "
                "expected 'osplit', 'oct', 'quad' or 'corner'"
            )
        if self.layout in ("osplit", "oct", "quad") and self.pack_rows > 1:
            # The pack_rows path interprets indices under the corner XOR
            # hash; letting a perf knob silently change the hash function
            # would corrupt trained tables (ADVICE r2, medium).
            raise ValueError(
                f"layout={self.layout!r} is incompatible with pack_rows>1 "
                "(the packed path uses the corner hash); set pack_rows=0 "
                "or layout='corner'"
            )
        table_size = 2**self.log2_table_size
        self.table = self.param(
            "table",
            lambda key: jax.random.uniform(
                key,
                (self.n_levels, table_size, self.n_features),
                minval=-self.init_scale,
                maxval=self.init_scale,
            ),
        )

    def _resolutions(self):
        return level_resolutions(
            self.n_levels, self.base_resolution, self.max_resolution
        )

    def prepare(self):
        """Precompute the packed physical table for repeated encodes.

        The oct/quad layouts gather from a row-packed copy of the
        canonical table (one cheap bandwidth pass to build). A caller
        that encodes many times against FROZEN params — the iterative
        eval renderer's while_loop rounds — must build it once outside
        the loop and pass it back via `__call__(x, prepared=...)`;
        rebuilt per round it costs ~0.5 GB of HBM traffic each time.
        Returns None for the corner layout (nothing to pack).
        """
        table_size = 2**self.log2_table_size
        if self.layout == "osplit":
            return build_oct_tables_split(
                self.table, self._resolutions(), table_size
            )
        if self.layout == "oct":
            return build_oct_table(self.table, self._resolutions(), table_size)
        if self.layout == "quad":
            return build_quad_table(self.table, self._resolutions(), table_size)
        return None

    def __call__(self, x, prepared=None):
        table_size = 2**self.log2_table_size
        resolutions = self._resolutions()
        table = self.table
        # The gather (and its transpose scatter-add) stay f32: XLA's TPU
        # fast-path scatter is f32-only — a bf16 table grad lowers to a
        # serial while-loop over the full corner buffer (measured: 6.7 TB
        # of HBM traffic per 8192-ray step). Only the output feature
        # vector is cast for the MXU.
        pack = max(self.pack_rows, 0)
        if pack > 1 and (self.n_levels * table_size) % pack:
            pack = 0
        use_sorted = self.grad_mode == "sorted" or (
            self.grad_mode == "auto" and jax.default_backend() == "tpu"
        )
        if self.layout == "osplit" and pack == 0:
            if prepared is not None:
                out = encode_oct_split(
                    x, table, resolutions, table_size, prepared
                )
            elif use_sorted:
                fn = _oct_split_grad_encode(
                    tuple(int(r) for r in resolutions), table_size
                )
                out = fn(x, table)
            else:
                out = encode_oct_split(x, table, resolutions, table_size)
        elif self.layout == "oct" and pack == 0:
            if prepared is not None:
                out = encode_oct(x, table, resolutions, table_size, prepared)
            elif use_sorted:
                fn = _oct_grad_encode(
                    tuple(int(r) for r in resolutions), table_size
                )
                out = fn(x, table)
            else:
                out = encode_oct(x, table, resolutions, table_size)
        elif self.layout == "quad" and pack == 0:
            if prepared is not None:
                out = encode_quad(x, table, resolutions, table_size, prepared)
            elif use_sorted:
                fn = _quad_grad_encode(
                    tuple(int(r) for r in resolutions), table_size
                )
                out = fn(x, table)
            else:
                out = encode_quad(x, table, resolutions, table_size)
        elif use_sorted and pack == 0:
            fn = _sorted_grad_encode(
                tuple(int(r) for r in resolutions), table_size
            )
            out = fn(x, table)
        else:
            out = encode(x, table, resolutions, table_size, pack_rows=pack)
        return out.astype(self.compute_dtype)


@functools.partial(jax.jit, static_argnames=("out_dim",))
def spherical_harmonics(d, out_dim: int = 16):
    """Real spherical harmonics basis through degree 3 (16 coefficients).

    The closed-form polynomial expansion tcnn evaluates for its
    "SphericalHarmonics degree 4" encoding; `d` must be unit [..., 3].
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    comps = [
        0.28209479177387814 * jnp.ones_like(x),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.stack(comps[:out_dim], axis=-1)


def truncated_exp(x, bound: float = 15.0):
    """exp with clamped forward *and* clamped gradient (tcnn's TruncExp:
    `ngp-depth/custom_functions.py:162-173`)."""
    return _trunc_exp(x, bound)


@jax.custom_vjp
def _trunc_exp(x, bound):
    return jnp.exp(jnp.clip(x, -bound, bound))


def _trunc_exp_fwd(x, bound):
    return _trunc_exp(x, bound), (x, bound)


def _trunc_exp_bwd(res, g):
    x, bound = res
    return (g * jnp.exp(jnp.clip(x, -bound, bound)), None)


_trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
