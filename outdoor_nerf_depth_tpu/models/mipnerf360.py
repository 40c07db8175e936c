"""Hierarchical proposal-sampling cone-tracing model (mip-NeRF 360 family).

Capability parity with the reference Model
(`/root/reference/nerf-methods/mipnerf360/internal/models.py:47-313`): per
level — weight dilation, Schlick annealing, interval resampling in normalized
s-space with stop-gradient, s->t warp, cone->Gaussian casting, MLP eval,
alpha compositing, volumetric render with expected depth. The resampling path
is the TPU comparison kernel (`ops.mathx.sorted_interp`) by default.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from outdoor_nerf_depth_tpu.models.mlps import ConeFieldMLP
from outdoor_nerf_depth_tpu.ops import spaces, stepfuns, volren


def _maybe_split(rng):
    if rng is None:
        return None, None
    key, rng = jax.random.split(rng)
    return key, rng


class ProposalModel(nn.Module):
    """N-level proposal hierarchy: (num_levels - 1) prop passes + 1 nerf pass."""

    num_prop_samples: int = 64
    num_nerf_samples: int = 32
    num_levels: int = 3
    anneal_slope: float = 10.0
    stop_level_grad: bool = True
    use_viewdirs: bool = True
    raydist_fn: Optional[str] = "reciprocal"
    ray_shape: str = "cone"
    disable_integration: bool = False
    single_jitter: bool = True
    dilation_multiplier: float = 0.5
    dilation_bias: float = 0.0025
    near_anneal_rate: Optional[float] = None
    near_anneal_init: float = 0.95
    single_mlp: bool = False
    resample_padding: float = 0.0
    use_gather_resampling: bool = False  # gather path (GPU-style); off on TPU
    opaque_background: bool = False
    bg_intensity_range: Tuple[float, float] = (1.0, 1.0)
    num_glo_features: int = 0
    num_glo_embeddings: int = 1000
    # Per-image learned RGB scaling (reference `mipnerf360/internal/
    # models.py:66-121, 229-262`, used for multi-exposure captures): the
    # rendering's rgb is multiplied by (1 + offset[cam_idx]), offsets
    # zero-initialized. Inactive under zero_glo (eval on unseen cameras).
    learned_exposure_scaling: bool = False
    vis_num_rays: int = 16
    nerf_mlp_params: Any = None  # dict of ConeFieldMLP overrides
    prop_mlp_params: Any = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rng, rays, train_frac=1.0, compute_extras=False, zero_glo=True):
        nerf_mlp = ConeFieldMLP(
            warp="contract",
            compute_dtype=self.compute_dtype,
            num_glo_features=self.num_glo_features,
            name="nerf_mlp",
            **(self.nerf_mlp_params or {}),
        )
        prop_mlp = (
            nerf_mlp
            if self.single_mlp
            else ConeFieldMLP(
                warp="contract",
                disable_rgb=True,
                compute_dtype=self.compute_dtype,
                name="prop_mlp",
                **(self.prop_mlp_params or {}),
            )
        )

        glo_vec = None
        if self.num_glo_features > 0:
            if zero_glo:
                glo_vec = jnp.zeros(
                    rays.origins.shape[:-1] + (self.num_glo_features,)
                )
            else:
                glo_vec = nn.Embed(
                    self.num_glo_embeddings, self.num_glo_features, name="glo"
                )(rays.cam_idx[..., 0])

        exposure_scale = None
        if self.learned_exposure_scaling and not zero_glo:
            offsets = nn.Embed(
                self.num_glo_embeddings,
                3,
                embedding_init=jax.nn.initializers.zeros,
                name="exposure_scaling",
            )(rays.cam_idx[..., 0])
            exposure_scale = 1.0 + offsets

        _, s_to_t = spaces.metric_to_normalized(self.raydist_fn, rays.near, rays.far)

        if self.near_anneal_rate is None:
            s_near = 0.0
        else:
            s_near = jnp.clip(
                1.0 - train_frac / self.near_anneal_rate, 0.0, self.near_anneal_init
            )
        s_far = 1.0

        sdist = jnp.concatenate(
            [jnp.full_like(rays.near, s_near), jnp.full_like(rays.far, s_far)],
            axis=-1,
        )
        weights = jnp.ones_like(rays.near)
        prod_num_samples = 1

        renderings, ray_history = [], []
        for level in range(self.num_levels):
            is_prop = level < self.num_levels - 1
            num_samples = self.num_prop_samples if is_prop else self.num_nerf_samples

            dilation = (
                self.dilation_bias
                + self.dilation_multiplier * (s_far - s_near) / prod_num_samples
            )
            prod_num_samples *= num_samples

            if level > 0 and (self.dilation_bias > 0 or self.dilation_multiplier > 0):
                sdist, weights = stepfuns.max_dilate_weights(
                    sdist, weights, dilation, domain=(s_near, s_far), renormalize=True
                )
                sdist = sdist[..., 1:-1]
                weights = weights[..., 1:-1]

            if self.anneal_slope > 0:
                # Schlick bias ramp on the resampling sharpness.
                anneal = (self.anneal_slope * train_frac) / (
                    (self.anneal_slope - 1.0) * train_frac + 1.0
                )
            else:
                anneal = 1.0

            logits = jnp.where(
                sdist[..., 1:] > sdist[..., :-1],
                anneal * jnp.log(weights + self.resample_padding),
                -jnp.inf,
            )

            key, rng = _maybe_split(rng)
            sdist = stepfuns.sample_intervals(
                key,
                sdist,
                logits,
                num_samples,
                single_jitter=self.single_jitter,
                domain=(s_near, s_far),
                use_gather_interp=self.use_gather_resampling,
            )
            if self.stop_level_grad:
                sdist = jax.lax.stop_gradient(sdist)

            tdist = s_to_t(sdist)
            means, covs = volren.cast_rays(
                tdist,
                rays.origins,
                rays.directions,
                rays.radii,
                ray_shape=self.ray_shape,
                diagonal=False,
            )
            if self.disable_integration:
                covs = jnp.zeros_like(covs)

            mlp = prop_mlp if is_prop else nerf_mlp
            key, rng = _maybe_split(rng)
            field = mlp(
                key,
                means,
                covs,
                viewdirs=rays.viewdirs if self.use_viewdirs else None,
                glo_vec=None if is_prop else glo_vec,
            )

            # Weights-only fast path: Pallas MXU kernel on TPU, fused
            # cumsum elsewhere (`ops.volren.composite_weights`).
            weights = volren.composite_weights(
                field["density"],
                tdist,
                rays.directions,
                opaque_background=self.opaque_background,
            )

            lo, hi = self.bg_intensity_range
            if lo == hi:
                bg_rgbs = lo
            elif rng is None:
                bg_rgbs = 0.5 * (lo + hi)
            else:
                key, rng = _maybe_split(rng)
                bg_rgbs = jax.random.uniform(
                    key, weights.shape[:-1] + (3,), minval=lo, maxval=hi
                )

            rendering = volren.composite(
                field["rgb"],
                weights,
                tdist,
                bg_rgbs,
                rays.far,
                compute_extras,
                extras={
                    k: v
                    for k, v in field.items()
                    if k.startswith("normals") or k == "roughness"
                },
            )

            exposure = getattr(rays, "exposure_values", None)
            if exposure is not None:
                rendering["rgb"] = rendering["rgb"] * exposure
            if exposure_scale is not None:
                rendering["rgb"] = rendering["rgb"] * exposure_scale

            if compute_extras:
                n = self.vis_num_rays
                rendering["ray_sdist"] = sdist.reshape([-1, sdist.shape[-1]])[:n]
                rendering["ray_weights"] = weights.reshape([-1, weights.shape[-1]])[:n]
                rgb_flat = field["rgb"].reshape((-1,) + field["rgb"].shape[-2:])
                rendering["ray_rgbs"] = rgb_flat[:n]

            renderings.append(rendering)
            ray_history.append(
                dict(
                    sdist=sdist,
                    tdist=tdist,
                    weights=weights,
                    density=field["density"],
                    normals=field.get("normals"),
                    normals_pred=field.get("normals_pred"),
                )
            )

        if compute_extras:
            # Proposal colors are meaningless; show the final pass's color.
            final_rgb = jnp.sum(
                renderings[-1]["ray_rgbs"] * renderings[-1]["ray_weights"][..., None],
                axis=-2,
            )
            for r in renderings[:-1]:
                r["ray_rgbs"] = jnp.broadcast_to(
                    final_rgb[:, None, :], r["ray_rgbs"].shape
                )

        return renderings, ray_history
