"""Multi-cascade occupancy grid: empty-space skipping without dynamic shapes.

Capability parity with the reference's CUDA occupancy machinery
(`/root/reference/nerf-methods/ngp-depth/models/csrc/raymarching.cu`:
morton encode/invert, packbits, occupancy-DDA train/test marching; grid
maintenance in `models/networks.py:197-269`), re-thought for XLA:

* the grid is a dense `[cascades, R^3]` float32 EMA-density tensor (a pure
  pytree value, updated functionally every N steps — no CUDA buffers);
* marching is **fixed-width masked sampling**: each ray draws a static
  number of exponentially-spaced candidates, looks every candidate up in the
  occupancy mask (vectorized gather), and compacts the first `max_samples`
  occupied candidates per ray with one stable argsort — a static-shape
  replacement for the atomicAdd/CSR allocation of `raymarching_train_kernel`
  that trades bounded compute waste for MXU-friendly dense batches;
* morton codes are jnp int32 bit-twiddling (used for cell shuffling and
  parity with the reference's grid indexing).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SQRT3 = float(np.sqrt(3.0))


# --------------------------------------------------------------------------
# Morton (Z-order) codes.
# --------------------------------------------------------------------------


def _expand_bits(v):
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton3d(coords):
    """[..., 3] int32 grid coords (10 bits each) -> int32 Z-order index."""
    c = coords.astype(jnp.uint32)
    code = (
        _expand_bits(c[..., 0])
        | (_expand_bits(c[..., 1]) << 1)
        | (_expand_bits(c[..., 2]) << 2)
    )
    return code.astype(jnp.int32)


def _compact_bits(v):
    u = jnp.uint32
    v &= u(0x49249249)
    v = (v ^ (v >> 2)) & u(0xC30C30C3)
    v = (v ^ (v >> 4)) & u(0x0F00F00F)
    v = (v ^ (v >> 8)) & u(0xFF0000FF)
    v = (v ^ (v >> 16)) & u(0x000003FF)
    return v


def morton3d_invert(codes):
    """Inverse of morton3d: int32 Z-order index -> [..., 3] int32 coords."""
    c = codes.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(c), _compact_bits(c >> 1), _compact_bits(c >> 2)], axis=-1
    ).astype(jnp.int32)


# --------------------------------------------------------------------------
# Grid geometry. Cascade c covers the cube [-e_c, e_c]^3 with
# e_c = min(scale, 2^(c-1)) (cascade 0: half-extent 0.5). A point belongs to
# the smallest cascade containing it.
# --------------------------------------------------------------------------


def num_cascades(scale: float) -> int:
    return max(1 + int(np.ceil(np.log2(max(2 * scale, 1e-8)))), 1)


def cascade_extents(scale: float) -> np.ndarray:
    c = num_cascades(scale)
    return np.minimum(scale, 2.0 ** (np.arange(c) - 1))


def point_cascade(x, scale: float):
    """Smallest cascade index whose cube contains each point."""
    c = num_cascades(scale)
    maxc = jnp.max(jnp.abs(x), axis=-1)
    # maxc <= 2^(casc-1) -> casc >= log2(maxc) + 1
    casc = jnp.ceil(jnp.log2(jnp.maximum(maxc, 1e-8)) + 1.0).astype(jnp.int32)
    return jnp.clip(casc, 0, c - 1)


def cell_index(x, cascade, scale: float, resolution: int):
    """Flat cell index of each point within its cascade's grid."""
    extent = jnp.minimum(scale, 2.0 ** (cascade.astype(jnp.float32) - 1.0))
    u = (x / (2.0 * extent[..., None]) + 0.5) * resolution
    cell = jnp.clip(u.astype(jnp.int32), 0, resolution - 1)
    flat = (
        cell[..., 0] * resolution * resolution
        + cell[..., 1] * resolution
        + cell[..., 2]
    )
    return flat, cell


def lookup(density_grid, x, scale: float, threshold: float):
    """Occupancy of world points: density EMA above threshold. [bool ...]."""
    resolution = int(round(density_grid.shape[-1] ** (1.0 / 3.0)))
    # density_grid is [C, R^3].
    casc = point_cascade(x, scale)
    flat, _ = cell_index(x, casc, scale, resolution)
    vals = density_grid[casc, flat]
    return vals > threshold


# --------------------------------------------------------------------------
# Grid maintenance.
# --------------------------------------------------------------------------


def init_grid(scale: float, resolution: int = 128) -> jax.Array:
    """Fresh density grid [cascades, R^3], zero everywhere (all occupied
    until the first update thresholds it — callers should treat a zero grid
    as 'march densely')."""
    return jnp.zeros((num_cascades(scale), resolution**3), jnp.float32)


def sample_update_cells(rng, density_grid, n_per_cascade: int, threshold: float):
    """Pick cells to refresh: half uniform, half from currently-occupied.

    Mirrors `sample_uniform_and_occupied_cells` (`networks.py:176-195`):
    uniform cells keep dead space checked; occupied-biased cells track the
    moving surface. Returns ([C, M] flat cell indices,) with M=n_per_cascade.
    """
    c, n_cells = density_grid.shape
    # A sampled refresh larger than the grid is just a full refresh: clamp
    # so small test grids work with production cells-per-update settings.
    n_per_cascade = min(n_per_cascade, n_cells)
    k_uniform = n_per_cascade // 2
    k_occ = n_per_cascade - k_uniform
    rng_u, rng_o = jax.random.split(rng)
    uniform = jax.random.randint(rng_u, (c, k_uniform), 0, n_cells)

    occ = density_grid > threshold
    # Sample occupied cells per cascade via Gumbel-top-k over the mask
    # (uniform over occupied; falls back to uniform cells when none).
    g = jax.random.gumbel(rng_o, (c, n_cells))
    scores = jnp.where(occ, g, -jnp.inf)
    _, occupied_idx = jax.lax.top_k(scores, k_occ)
    any_occ = occ.any(axis=-1, keepdims=True)
    fallback = jax.random.randint(rng_o, (c, k_occ), 0, n_cells)
    occupied_idx = jnp.where(any_occ, occupied_idx, fallback)
    return jnp.concatenate([uniform, occupied_idx], axis=-1)


def cell_centers(rng, cells, scale: float, resolution: int):
    """Jittered world-space positions of [C, M] flat cells per cascade."""
    c = cells.shape[0]
    coords = jnp.stack(
        [
            cells // (resolution * resolution),
            (cells // resolution) % resolution,
            cells % resolution,
        ],
        axis=-1,
    ).astype(jnp.float32)
    jitter = jax.random.uniform(rng, coords.shape)
    u = (coords + jitter) / resolution - 0.5  # [-0.5, 0.5)
    extents = jnp.asarray(cascade_extents(scale), jnp.float32)
    return u * 2.0 * extents[:, None, None]


def update_grid(
    rng,
    density_grid,
    density_fn,
    scale: float,
    decay: float = 0.95,
    n_per_cascade: int = 0,
    threshold: float = 0.01,
    chunk: int = 131_072,
):
    """One grid refresh: decay everywhere, scatter-max new density samples.

    `density_fn(points[M, 3]) -> sigma[M]`. With `n_per_cascade=0`, refresh
    every cell (the reference's warmup behavior). Returns the new grid.

    Full sweeps evaluate cascades*R^3 points; `chunk` bounds the hash-encode
    intermediates (idx/weights/features per level*corner) by scanning fixed
    slabs with `lax.map` — a full 128^3 sweep in one call otherwise needs
    tens of GB of HBM for its encode temporaries.
    """
    c, n_cells = density_grid.shape
    resolution = int(round(n_cells ** (1.0 / 3.0)))
    rng_cells, rng_jitter = jax.random.split(rng)
    if n_per_cascade <= 0:
        cells = jnp.broadcast_to(jnp.arange(n_cells), (c, n_cells))
    else:
        cells = sample_update_cells(rng_cells, density_grid, n_per_cascade, threshold)

    pts = cell_centers(rng_jitter, cells, scale, resolution)  # [C, M, 3]
    flat_pts = pts.reshape(-1, 3)
    n_pts = flat_pts.shape[0]
    if n_pts > chunk:
        pad = (-n_pts) % chunk
        padded = jnp.pad(flat_pts, ((0, pad), (0, 0)))
        slabs = padded.reshape(-1, chunk, 3)
        sigma = jax.lax.map(density_fn, slabs).reshape(-1)[:n_pts]
    else:
        sigma = density_fn(flat_pts)
    sigma = sigma.reshape(cells.shape)

    decayed = density_grid * decay
    cascade_idx = jnp.broadcast_to(jnp.arange(c)[:, None], cells.shape)
    updated = decayed.at[cascade_idx.reshape(-1), cells.reshape(-1)].max(
        jnp.maximum(sigma.reshape(-1), 0.0)
    )
    # Cells culled by `mark_invisible_cells` carry a negative sentinel and
    # must never be resurrected (reference `networks.py:262` only updates
    # cells with grid >= 0).
    return jnp.where(density_grid < 0, density_grid, updated)


def mark_invisible_cells(
    density_grid,
    camtoworlds,
    intrinsics,
    width: int,
    height: int,
    scale: float,
    near: float = 0.01,
    chunk: int = 262_144,
):
    """Permanently exclude cells seen by no training camera.

    Capability parity with `NGP.mark_invisible_cells`
    (`ngp-depth/models/networks.py:197-238`): project every cell center into
    every camera (OpenGL c2w convention); cells in front of no camera's
    image plane get density -1 (a sentinel no refresh overwrites, since
    `update_grid` scatter-maxes with values >= 0 only onto *sampled* cells
    but decay keeps negatives negative).

    Args:
      density_grid: [C, R^3].
      camtoworlds: [N, 3, 4] OpenGL camera-to-world.
      intrinsics: [3, 3] K (fx, fy, cx, cy layout).
      width, height: image size in pixels.
      scale: scene half-extent.
    """
    c, n_cells = density_grid.shape
    resolution = int(round(n_cells ** (1.0 / 3.0)))
    cells = jnp.arange(n_cells)
    coords = jnp.stack(
        [
            cells // (resolution * resolution),
            (cells // resolution) % resolution,
            cells % resolution,
        ],
        axis=-1,
    ).astype(jnp.float32)
    u = (coords + 0.5) / resolution - 0.5
    extents = jnp.asarray(cascade_extents(scale), jnp.float32)

    rot = camtoworlds[:, :3, :3]
    t = camtoworlds[:, :3, 3]
    k_fx, k_fy = intrinsics[0, 0], intrinsics[1, 1]
    k_cx, k_cy = intrinsics[0, 2], intrinsics[1, 2]

    new_grid = density_grid
    for ci in range(c):
        pts = u * 2.0 * extents[ci]  # [n_cells, 3] world
        visible = jnp.zeros((n_cells,), bool)
        for start in range(0, n_cells, chunk):
            p = pts[start : start + chunk]
            # world -> camera (OpenGL): x_cam = R^T (p - t); camera looks -z.
            rel = p[None, :, :] - t[:, None, :]
            cam = jnp.einsum("nij,nki->nkj", rot, rel)
            z = -cam[..., 2]
            in_front = z > near
            x = k_fx * (cam[..., 0] / jnp.maximum(z, near)) + k_cx
            y = -k_fy * (cam[..., 1] / jnp.maximum(z, near)) + k_cy
            in_img = (x >= 0) & (x < width) & (y >= 0) & (y < height)
            vis = jnp.any(in_front & in_img, axis=0)
            visible = visible.at[start : start + chunk].set(vis)
        new_grid = new_grid.at[ci].set(
            jnp.where(visible, new_grid[ci], -1.0)
        )
    return new_grid


def mean_density(density_grid) -> jax.Array:
    """Mean density of cascade 0 — the adaptive half of the reference's
    `min(mean, threshold)` activation rule (`networks.py:260-268`)."""
    return jnp.mean(jnp.maximum(density_grid[0], 0.0))


# --------------------------------------------------------------------------
# Batch-wide sample compaction.
# --------------------------------------------------------------------------


def batch_compaction_plan(valid, budget_total: int):
    """Static-shape plan to evaluate the field only on valid sample slots.

    Fixed-width marching leaves the [R, K] sample grid mostly dead once the
    occupancy grid matures (KITTI fixture at step 1500: ~26 of 128 slots
    valid), yet the field still pays encode+MLP for every slot — the TPU
    answer to the reference's variable-length packed rays
    (`ngp-depth/models/csrc/raymarching.cu` marks rays/samples contiguously)
    is ONE cheap int sort, not dynamic shapes.

    Sort key `(~valid)*256 + slot_j` puts valid slots first ordered by
    intra-ray slot index, so when #valid > budget the OVERFLOW DROPS THE
    FARTHEST samples of every ray uniformly (an effective per-ray sample
    cap, transient while occupancy warms up) instead of dropping whole
    trailing rays. When #valid <= budget the compaction is EXACT — every
    valid slot is evaluated.

    Returns (sel [budget], inv [m]): `sel` = flat slot ids to evaluate;
    `inv[i]` = rank of flat slot i (>= budget means dropped/unselected).
    """
    m = valid.size
    flat = valid.reshape(m)
    j = jnp.broadcast_to(
        jnp.arange(valid.shape[-1], dtype=jnp.int32), valid.shape
    ).reshape(m)
    key = jnp.where(flat, 0, 256) + j
    _, order = jax.lax.sort(
        (key, jnp.arange(m, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    # Inverse permutation by one more int sort (a scatter would cost
    # ~107 ns/row at this size — the r4 roofline — vs ~milliseconds here).
    _, inv = jax.lax.sort(
        (order, jnp.arange(m, dtype=jnp.int32)), num_keys=1
    )
    return order[:budget_total], inv


def expand_compacted(vals_c, inv, sel):
    """Expand compacted per-sample values [budget, C] back to the dense
    flat grid [m, C]; unselected slots read 0.

    The forward is a permutation gather (plus one zero sentinel row). The
    VJP is the OPPOSITE permutation gather — declared via custom_vjp
    because XLA's default transpose of a gather is a scatter-add
    (~107 ns/row), which would cost more than the compaction saves.
    """
    budget = vals_c.shape[0]

    @jax.custom_vjp
    def _expand(v):
        padded = jnp.concatenate(
            [v, jnp.zeros((1,) + v.shape[1:], v.dtype)], axis=0
        )
        return jnp.take(padded, jnp.minimum(inv, budget), axis=0)

    def _fwd(v):
        return _expand(v), None

    def _bwd(_, g):
        return (jnp.take(g, sel, axis=0),)

    _expand.defvjp(_fwd, _bwd)
    return _expand(vals_c)


# --------------------------------------------------------------------------
# Ray-box intersection + masked fixed-width marching.
# --------------------------------------------------------------------------


def intersect_aabb(ray_o, ray_d, half_extent: float, near_min: float = 0.01):
    """Slab test against the cube [-e, e]^3. Returns (t_near, t_far, hit)."""
    inv_d = 1.0 / jnp.where(jnp.abs(ray_d) < 1e-10, 1e-10, ray_d)
    t0 = (-half_extent - ray_o) * inv_d
    t1 = (half_extent - ray_o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, near_min)
    hit = t_far > t_near
    return t_near, t_far, hit


def calc_dt(t, exp_step_factor: float, max_samples: int, grid_size: int,
            scale: float):
    """Exponential marching step size with the reference's clamp behavior.

    Matches `calc_dt` (`reference ngp-depth/models/csrc/raymarching.cu:11-18`):
    step grows proportionally to distance (factor 1/256 for unbounded scenes,
    0 for bounded ones -> constant minimum step), clamped between
    SQRT3/max_samples (so a unit-cube diagonal takes <= max_samples steps)
    and SQRT3 * 2 * extent / grid_size (never skip more than ~a cell of the
    coarsest cascade). `scale` here is the outermost cascade half-extent.
    """
    return jnp.clip(
        t * exp_step_factor,
        SQRT3 / max_samples,
        SQRT3 * 2.0 * scale / grid_size,
    )


def march_candidates(
    rng,
    t_near,
    t_far,
    n_candidates: int,
    exponential: bool = True,
):
    """Candidate sample distances per ray: [..., n+1] edges, jittered.

    Exponential spacing matches the reference's `calc_dt` growth (step size
    proportional to distance, `raymarching.cu:11-18`); uniform covers the
    bounded-scene case.
    """
    frac = jnp.linspace(0.0, 1.0, n_candidates + 1)
    if exponential:
        ratio = jnp.maximum(t_far / jnp.maximum(t_near, 1e-6), 1.0 + 1e-6)
        edges = t_near[..., None] * ratio[..., None] ** frac
    else:
        edges = t_near[..., None] + (t_far - t_near)[..., None] * frac
    if rng is not None:
        # Jitter interior edges within half a local step.
        widths = jnp.diff(edges, axis=-1)
        u = jax.random.uniform(rng, widths[..., :-1].shape, minval=-0.5, maxval=0.5)
        interior = edges[..., 1:-1] + u * jnp.minimum(
            widths[..., :-1], widths[..., 1:]
        )
        edges = jnp.concatenate([edges[..., :1], interior, edges[..., -1:]], -1)
    return edges


def compact_occupied(edges, occupied, max_samples: int, subsample: bool = True):
    """Select up to `max_samples` occupied candidate intervals per ray.

    When a ray has more occupied candidates than the budget, taking the
    *first* K would truncate integration to the near end of the ray — with
    a dense (e.g. freshly warmed-up) grid that trains per-view billboards
    in front of each camera instead of scene geometry. With `subsample`,
    rays over budget instead keep every k-th occupied candidate
    (k = ceil(n_occupied / K)) so the selection spans the full segment, and
    the selected intervals' dt is scaled by k — a piecewise-constant
    quadrature over the skipped span (coarse early, exact once the grid
    sparsifies below the budget).

    Args:
      edges: [..., C+1] candidate interval edges (sorted).
      occupied: [..., C] bool per candidate interval.
      max_samples: static K.
      subsample: stride-subsample over-budget rays (see above) instead of
        truncating to the nearest K.

    Returns (t_mid [..., K], dt [..., K], valid [..., K]): the marching
    output in dense static shape. Unoccupied-starved rays get valid=False
    tails (zero-weight in compositing). One stable argsort per ray replaces
    the reference's atomic sample allocator.
    """
    dt_scale = 1.0
    if subsample:
        n_occ = jnp.sum(occupied, axis=-1, keepdims=True)
        k = jnp.maximum((n_occ + max_samples - 1) // max_samples, 1)
        rank = jnp.cumsum(occupied, axis=-1) - 1
        occupied = occupied & (rank % k == 0)
        dt_scale = k.astype(jnp.float32)

    order = jnp.argsort(jnp.where(occupied, 0, 1), axis=-1, stable=True)
    take = order[..., :max_samples]
    t0 = jnp.take_along_axis(edges[..., :-1], take, axis=-1)
    t1 = jnp.take_along_axis(edges[..., 1:], take, axis=-1)
    valid = jnp.take_along_axis(occupied, take, axis=-1)
    # Keep marching order: selected indices ascend because the sort is stable.
    t_mid = 0.5 * (t0 + t1)
    dt = (t1 - t0) * dt_scale
    return jnp.where(valid, t_mid, 0.0), jnp.where(valid, dt, 0.0), valid
