"""Ray/pixel/batch pytrees: the L1->L3 interface of the framework.

Struct-of-arrays dataclasses registered as pytrees, so a whole batch moves
through `jit`/`shard_map` and `NamedSharding` as one unit. Capability parity
with the reference's `utils.Pixels`/`utils.Rays`/`utils.Batch`
(`/root/reference/nerf-methods/mipnerf360/internal/utils.py:32-102`), unified
so NeRF++-style per-ray near bounds (`min_depth`) ride the same structure.

All fields keep a trailing feature axis (3 for vectors, 1 for scalars) so
every leaf is rank-consistent and shardable along the leading ray axis.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Pixels:
    """Integer pixel coordinates plus per-ray metadata, before ray casting."""

    pix_x: Any
    pix_y: Any
    cam_idx: Any
    lossmult: Any
    near: Any
    far: Any
    exposure_idx: Optional[Any] = None
    exposure_values: Optional[Any] = None


@flax.struct.dataclass
class Rays:
    """World-space rays with cone footprints and per-ray bounds."""

    origins: Any  # [..., 3]
    directions: Any  # [..., 3] un-normalized (metric deltas scale by |d|)
    viewdirs: Any  # [..., 3] unit
    radii: Any  # [..., 1] cone base radius at unit distance
    imageplane: Any  # [..., 2]
    lossmult: Any  # [..., 1]
    near: Any  # [..., 1]
    far: Any  # [..., 1]
    cam_idx: Any  # [..., 1] int32
    exposure_idx: Optional[Any] = None
    exposure_values: Optional[Any] = None


@flax.struct.dataclass
class Batch:
    """One training/eval unit: rays (or pixels) plus per-ray supervision."""

    rays: Any  # Rays | Pixels
    rgb: Optional[Any] = None  # [..., 3]
    depth_gt: Optional[Any] = None  # [..., ] LiDAR ground truth (metric*scale)
    depth_sup: Optional[Any] = None  # [..., ] supervision prior (<=0 invalid)
    normals: Optional[Any] = None
    alphas: Optional[Any] = None


def dummy_rays(batch_shape=(10,), xnp=jnp) -> Rays:
    """Minimal valid Rays for model init / compile checks."""
    vec = lambda n: xnp.zeros(batch_shape + (n,), dtype=xnp.float32)
    return Rays(
        origins=vec(3),
        directions=vec(3) + xnp.asarray([0.0, 0.0, 1.0]),
        viewdirs=vec(3) + xnp.asarray([0.0, 0.0, 1.0]),
        radii=vec(1) + 1e-3,
        imageplane=vec(2),
        lossmult=vec(1) + 1.0,
        near=vec(1) + 0.1,
        far=vec(1) + 100.0,
        cam_idx=xnp.zeros(batch_shape + (1,), dtype=xnp.int32),
    )


def pad_to_multiple(tree, multiple: int, axis: int = 0):
    """Edge-pad every leaf so dim `axis` divides `multiple`; returns (tree, pad).

    The eval-time sharding helper: full-image ray chunks rarely divide the
    device count, so we pad (replicating the edge ray) and drop `pad` rows
    after gathering (reference `models.py:662-678` semantics, reshaped for
    `NamedSharding` instead of pmap).
    """
    n = jax.tree_util.tree_leaves(tree)[0].shape[axis]
    pad = (-n) % multiple

    def _pad(x):
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return np.pad(x, widths, mode="edge") if isinstance(x, np.ndarray) else jnp.pad(
            x, widths, mode="edge"
        )

    if pad == 0:
        return tree, 0
    return jax.tree_util.tree_map(_pad, tree), pad
