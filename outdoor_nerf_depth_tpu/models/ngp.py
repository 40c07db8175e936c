"""Hash-grid field with occupancy-grid empty-space skipping (Instant-NGP).

Capability parity with the reference NGP backend
(`/root/reference/nerf-methods/ngp-depth/models/networks.py:12-269` and
`models/rendering.py:11-163`): hash-grid encoder + shallow fused MLPs,
truncated-exp density, SH degree-4 view encoding, multi-cascade occupancy
grid, single-pass train marching with early termination expressed as weight
collapse. The dynamic CSR sample allocation of the CUDA path becomes the
static-shape compaction in `ops.occupancy` (SURVEY.md section 2.7 item 1).

The occupancy grid is *functional state*: passed in as the `occupancy`
argument (a `[cascades, R^3]` density-EMA array) and refreshed outside the
model by `make_density_fn` + `ops.occupancy.update_grid`. `occupancy=None`
marches densely (correct, slower — used for warmup and tests).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from outdoor_nerf_depth_tpu.ops import hashgrid, occupancy as occ, volren


class HashGridField(nn.Module):
    """Hash encoding -> sigma/geo-features; SH + features -> rgb."""

    scale: float = 0.5
    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 0  # 0 -> 2048 * (2 * scale), the reference rule
    geo_features: int = 15
    hidden_width: int = 64
    rgb_hidden_layers: int = 2
    # "sigmoid" -> LDR rgb directly; "none" -> the rgb net emits
    # log-radiance and per-channel tonemapper nets (HDR-NeRF style,
    # reference `networks.py:79-92`, `:109-130`) map it + log-exposure to LDR.
    rgb_activation: str = "sigmoid"
    tonemap_width: int = 64
    compute_dtype: Any = jnp.float32

    def setup(self):
        max_res = self.max_resolution or max(
            int(2048 * 2 * self.scale), self.base_resolution + 1
        )
        self.encoder = hashgrid.HashGridEncoding(
            n_levels=self.n_levels,
            n_features=self.n_features,
            log2_table_size=self.log2_table_size,
            base_resolution=self.base_resolution,
            max_resolution=max_res,
            compute_dtype=self.compute_dtype,
        )
        dense = lambda f, name: nn.Dense(
            f,
            kernel_init=jax.nn.initializers.he_uniform(),
            dtype=self.compute_dtype,
            name=name,
        )
        self.sigma_hidden = dense(self.hidden_width, "sigma_hidden")
        self.sigma_out = dense(1 + self.geo_features, "sigma_out")
        self.rgb_layers = [
            dense(self.hidden_width, f"rgb_hidden{i}")
            for i in range(self.rgb_hidden_layers)
        ]
        self.rgb_out = dense(3, "rgb_out")
        if self.rgb_activation == "none":
            self.tonemap_hidden = [
                dense(self.tonemap_width, f"tonemap_hidden{i}") for i in range(3)
            ]
            self.tonemap_out = [dense(1, f"tonemap_out{i}") for i in range(3)]

    def _normalize(self, x):
        # World cube [-e_max, e_max]^3 -> unit cube for the hash encoder,
        # where e_max is the outermost cascade extent.
        e_max = float(occ.cascade_extents(self.scale)[-1])
        return x / (2.0 * e_max) + 0.5

    def density(self, x):
        """sigma [..., ], geo features [..., geo_features]."""
        enc = self.encoder(self._normalize(x))
        h = nn.relu(self.sigma_hidden(enc))
        h = self.sigma_out(h).astype(jnp.float32)
        sigma = hashgrid.truncated_exp(h[..., 0])
        return sigma, h[..., 1:]

    def tonemap(self, log_radiance, exposure=None):
        """Per-channel learned tonemapping of log-radiance (+log-exposure)."""
        log_expo = 0.0 if exposure is None else jnp.log(exposure)
        chans = []
        for i in range(3):
            inp = (log_radiance[..., i : i + 1] + log_expo).astype(
                self.compute_dtype
            )
            h = nn.relu(self.tonemap_hidden[i](inp))
            chans.append(nn.sigmoid(self.tonemap_out[i](h).astype(jnp.float32)))
        return jnp.concatenate(chans, axis=-1)

    def __call__(self, x, viewdirs, exposure=None, output_radiance=False):
        """x [..., 3] world points; viewdirs [..., 3] unit. -> (sigma, rgb)."""
        sigma, feats = self.density(x)
        sh = hashgrid.spherical_harmonics(viewdirs)
        sh = jnp.broadcast_to(sh, feats.shape[:-1] + (sh.shape[-1],))
        y = jnp.concatenate([sh, feats], axis=-1).astype(self.compute_dtype)
        for layer in self.rgb_layers:
            y = nn.relu(layer(y))
        out = self.rgb_out(y).astype(jnp.float32)
        if self.rgb_activation == "sigmoid":
            rgb = nn.sigmoid(out)
        elif output_radiance:  # HDR map: radiance itself.
            rgb = hashgrid.truncated_exp(out)
        else:  # LDR via the learned tonemappers.
            rgb = self.tonemap(out, exposure)
        return sigma, rgb


class HashGridModel(nn.Module):
    """The full NGP renderer: AABB clip -> masked marching -> composite."""

    scale: float = 0.5
    grid_resolution: int = 128
    max_samples: int = 128
    n_candidates: int = 512
    exponential_steps: bool = True
    near_distance: float = 0.01
    density_threshold: float = 0.01
    bg_intensity_range: Tuple[float, float] = (0.0, 0.0)
    # With an HDR field (rgb_activation="none"), render the radiance map
    # itself instead of the tonemapped LDR (reference `output_radiance`).
    output_radiance: bool = False
    field_params: Any = None
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.field = HashGridField(
            scale=self.scale,
            compute_dtype=self.compute_dtype,
            **(self.field_params or {}),
        )

    def density(self, x):
        """Expose raw density for occupancy-grid refreshes."""
        return self.field.density(x)[0]

    def __call__(
        self,
        rng,
        rays,
        train_frac=1.0,
        compute_extras=False,
        zero_glo=True,
        occupancy: Optional[jax.Array] = None,
    ):
        del train_frac, zero_glo
        e_max = float(occ.cascade_extents(self.scale)[-1])
        # March along unit directions so t is metric distance.
        t_near, t_far, hit = occ.intersect_aabb(
            rays.origins, rays.viewdirs, e_max, near_min=self.near_distance
        )
        t_near = jnp.maximum(t_near, rays.near[..., 0])
        t_far = jnp.maximum(
            jnp.minimum(t_far, rays.far[..., 0]), t_near + 1e-4
        )

        key, rng = (None, None) if rng is None else tuple(jax.random.split(rng))
        edges = occ.march_candidates(
            key, t_near, t_far, self.n_candidates, self.exponential_steps
        )
        mids_all = 0.5 * (edges[..., :-1] + edges[..., 1:])
        pts_all = (
            rays.origins[..., None, :]
            + mids_all[..., None] * rays.viewdirs[..., None, :]
        )
        if occupancy is not None:
            occupied = occ.lookup(
                occupancy, pts_all, self.scale, self.density_threshold
            )
        else:
            occupied = jnp.ones(mids_all.shape, bool)
        occupied &= hit[..., None]

        t_mid, dt, valid = occ.compact_occupied(edges, occupied, self.max_samples)
        pts = (
            rays.origins[..., None, :]
            + t_mid[..., None] * rays.viewdirs[..., None, :]
        )
        exposure = getattr(rays, "exposure_values", None)
        if exposure is not None:
            exposure = exposure[..., None, :]  # broadcast over samples
        sigma, rgb = self.field(
            pts,
            rays.viewdirs[..., None, :],
            exposure=exposure,
            output_radiance=self.output_radiance,
        )
        sigma = jnp.where(valid, sigma, 0.0)

        tau = sigma * dt
        # Fused compositing weights: Pallas MXU kernel on TPU (the analog of
        # the reference's `composite_train_fw/bw` CUDA kernels), cumsum
        # formulation elsewhere.
        weights = volren.weights_from_optical_depth(tau)

        acc = jnp.sum(weights, axis=-1)
        lo, hi = self.bg_intensity_range
        if lo == hi:
            bg = lo
        elif rng is None:
            bg = 0.5 * (lo + hi)
        else:
            key, rng = tuple(jax.random.split(rng))
            bg = jax.random.uniform(
                key, acc.shape + (3,), minval=lo, maxval=hi
            )
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
        rgb_map = rgb_map + (1.0 - acc[..., None]) * bg
        depth = jnp.sum(weights * t_mid, axis=-1)

        rendering = {
            "rgb": rgb_map,
            "depth": depth,
            "distance_mean": depth,
            "acc": acc,
            "samples_per_ray": jnp.sum(valid, axis=-1),
        }
        history = dict(
            weights=weights,
            steps=t_mid,
            lengths=dt,
            valid=valid,
        )
        return [rendering], [history]


def make_density_fn(model: HashGridModel, variables):
    """Density closure for `ops.occupancy.update_grid` refreshes."""

    def density_fn(pts):
        return model.apply(variables, pts, method=HashGridModel.density)

    return density_fn
