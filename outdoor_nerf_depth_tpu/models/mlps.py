"""Field MLPs: the cone-Gaussian IPE MLP and the classic PE point MLP.

Capability parity with the reference fields
(`/root/reference/nerf-methods/mipnerf360/internal/models.py:342-613` and
`nerfplusplus/nerf_network.py:11-142`), including the Ref-NeRF option set
(density-gradient or predicted normals, integrated directional encoding,
reflection-direction conditioning, roughness, n.v features). TPU-minded
choices:

* a `compute_dtype` knob runs the dense stack in bfloat16 on the MXU while
  keeping params and the density/rgb heads in f32;
* the density-path matmuls are batched over rays*samples as one [N, C] GEMM
  (flax Dense broadcasting), so XLA tiles them onto the 128x128 MXU;
* density-gradient normals come from one `nn.vjp` over the whole sample
  batch (density_i depends only on point_i, so a ones-cotangent VJP yields
  per-point gradients) — no per-point vmapped value_and_grad.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from outdoor_nerf_depth_tpu.ops import refdirs, spaces


class ConeFieldMLP(nn.Module):
    """IPE MLP over frustum Gaussians (prop/nerf field of mip-NeRF 360)."""

    net_depth: int = 8
    net_width: int = 256
    bottleneck_width: int = 256
    net_depth_viewdirs: int = 1
    net_width_viewdirs: int = 128
    skip_layer: int = 4
    skip_layer_dir: int = 4
    min_deg_point: int = 0
    max_deg_point: int = 12
    deg_view: int = 4
    density_bias: float = -1.0
    density_noise: float = 0.0
    rgb_premultiplier: float = 1.0
    rgb_bias: float = 0.0
    rgb_padding: float = 0.001
    bottleneck_noise: float = 0.0
    warp: Optional[str] = None  # 'contract' tracks Gaussians through contraction
    basis_shape: str = "icosahedron"
    basis_subdivisions: int = 2
    disable_rgb: bool = False
    num_glo_features: int = 0
    # Ref-NeRF extras (all off in the reference's KITTI headline configs).
    compute_density_normals: bool = False
    enable_pred_normals: bool = False
    use_directional_enc: bool = False  # IDE instead of PE for directions
    use_reflections: bool = False
    enable_pred_roughness: bool = False
    roughness_bias: float = -1.0
    use_n_dot_v: bool = False
    compute_dtype: Any = jnp.float32

    def setup(self):
        if self.use_reflections and not (
            self.compute_density_normals or self.enable_pred_normals
        ):
            raise ValueError("reflection conditioning requires normals")
        dense = lambda feats, name: nn.Dense(
            feats,
            kernel_init=jax.nn.initializers.he_uniform(),
            dtype=self.compute_dtype,
            name=name,
        )
        self.trunk = [
            dense(self.net_width, f"trunk{i}") for i in range(self.net_depth)
        ]
        self.density_head = dense(1, "density_head")
        if self.enable_pred_normals:
            self.normal_head = dense(3, "normal_head")
        if self.enable_pred_roughness:
            self.roughness_head = dense(1, "roughness_head")
        if not self.disable_rgb:
            if self.bottleneck_width > 0:
                self.bottleneck = dense(self.bottleneck_width, "bottleneck")
            self.view_layers = [
                dense(self.net_width_viewdirs, f"view{i}")
                for i in range(self.net_depth_viewdirs)
            ]
            self.rgb_head = dense(3, "rgb_head")
        if self.use_directional_enc:
            self.dir_enc_fn = refdirs.generate_ide_fn(self.deg_view)
        else:
            self.dir_enc_fn = lambda d, _: spaces.pos_enc(
                d, 0, self.deg_view, append_identity=True
            )

    def predict_density(self, means, covs):
        """Raw (pre-activation) density + trunk features for given Gaussians."""
        basis = spaces.sphere_basis(self.basis_shape, self.basis_subdivisions)
        if self.warp == "contract":
            means, covs = spaces.track_gaussian(spaces.contract, means, covs)
        elif self.warp is not None:
            raise ValueError(f"unknown warp {self.warp!r}")
        lifted_means, lifted_vars = spaces.project_and_diagonalize(
            means, covs, basis
        )
        x = spaces.integrated_pos_enc(
            lifted_means, lifted_vars, self.min_deg_point, self.max_deg_point
        ).astype(self.compute_dtype)
        skip_in = x
        for i, layer in enumerate(self.trunk):
            x = nn.relu(layer(x))
            if i % self.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, skip_in], axis=-1)
        raw_density = self.density_head(x)[..., 0].astype(jnp.float32)
        return raw_density, x

    def __call__(
        self,
        rng,
        means: jax.Array,  # [..., S, 3]
        covs: jax.Array,  # [..., S, 3, 3]
        viewdirs: Optional[jax.Array] = None,  # [..., 3]
        glo_vec: Optional[jax.Array] = None,
    ):
        if self.compute_density_normals:
            # One VJP over the batch: since density_i is a function of
            # means_i alone, the ones-cotangent pullback is the per-point
            # spatial gradient (replaces the reference's vmapped
            # value_and_grad, `models.py:474-493`).
            (raw_density, x), vjp_fn = nn.vjp(
                lambda mdl, m: mdl.predict_density(m, covs),
                self,
                means,
                vjp_variables=False,
            )
            _, d_means = vjp_fn((jnp.ones_like(raw_density), jnp.zeros_like(x)))
            normals = -refdirs.l2_normalize(d_means)
        else:
            raw_density, x = self.predict_density(means, covs)
            normals = None

        if rng is not None and self.density_noise > 0:
            rng, key = jax.random.split(rng)
            raw_density += self.density_noise * jax.random.normal(
                key, raw_density.shape
            )
        density = jax.nn.softplus(raw_density + self.density_bias)

        normals_pred = None
        if self.enable_pred_normals:
            grad_pred = self.normal_head(x).astype(jnp.float32)
            normals_pred = -refdirs.l2_normalize(grad_pred)
        normals_to_use = normals_pred if self.enable_pred_normals else normals

        roughness = None
        if self.enable_pred_roughness:
            roughness = jax.nn.softplus(
                self.roughness_head(x).astype(jnp.float32) + self.roughness_bias
            )

        out = {
            "density": density,
            "normals": normals,
            "normals_pred": normals_pred,
            "roughness": roughness,
        }
        if self.disable_rgb:
            out["rgb"] = jnp.zeros_like(means)
            return out

        parts = []
        if self.bottleneck_width > 0:
            b = self.bottleneck(x)
            if rng is not None and self.bottleneck_noise > 0:
                rng, key = jax.random.split(rng)
                b += self.bottleneck_noise * jax.random.normal(key, b.shape).astype(
                    b.dtype
                )
            parts.append(b)

        if viewdirs is not None:
            if self.use_reflections:
                refl = refdirs.reflect(-viewdirs[..., None, :], normals_to_use)
                dir_enc = self.dir_enc_fn(
                    refl,
                    roughness if roughness is not None else jnp.zeros_like(refl[..., :1]),
                )
            else:
                dir_enc = self.dir_enc_fn(
                    viewdirs,
                    jnp.zeros_like(viewdirs[..., :1])
                    if self.use_directional_enc
                    else None,
                )
                dir_enc = jnp.broadcast_to(
                    dir_enc[..., None, :],
                    means.shape[:-1] + (dir_enc.shape[-1],),
                )
            parts.append(dir_enc.astype(self.compute_dtype))

        if self.use_n_dot_v and normals_to_use is not None:
            n_dot_v = jnp.sum(
                normals_to_use * viewdirs[..., None, :], axis=-1, keepdims=True
            )
            parts.append(n_dot_v.astype(self.compute_dtype))

        if glo_vec is not None:
            parts.append(
                jnp.broadcast_to(
                    glo_vec[..., None, :], means.shape[:-1] + (glo_vec.shape[-1],)
                ).astype(self.compute_dtype)
            )

        y = jnp.concatenate(parts, axis=-1)
        skip_in = y
        for i, layer in enumerate(self.view_layers):
            y = nn.relu(layer(y))
            if i % self.skip_layer_dir == 0 and i > 0:
                y = jnp.concatenate([y, skip_in], axis=-1)

        rgb = nn.sigmoid(
            self.rgb_premultiplier * self.rgb_head(y).astype(jnp.float32)
            + self.rgb_bias
        )
        out["rgb"] = rgb * (1.0 + 2.0 * self.rgb_padding) - self.rgb_padding
        return out


class PointFieldMLP(nn.Module):
    """PE point MLP with |.| density (the NeRF++ fg/bg field).

    `input_dim` is 3 for the foreground and 4 for the inverted-sphere
    background parametrization (x', y', z', 1/r).
    """

    input_dim: int = 3
    net_depth: int = 8
    net_width: int = 256
    skips: Tuple[int, ...] = (4,)
    pos_degrees: int = 10  # freqs 2^0 .. 2^(pos_degrees-1)
    view_degrees: int = 4
    compute_dtype: Any = jnp.float32

    def _dense(self, feats):
        return nn.Dense(
            feats,
            kernel_init=jax.nn.initializers.xavier_uniform(),
            dtype=self.compute_dtype,
        )

    @nn.compact
    def __call__(self, pts: jax.Array, viewdirs: jax.Array):
        """pts [..., S, input_dim], viewdirs [..., 3] or [..., S, 3]
        -> (sigma [..., S], rgb [..., S, 3]).

        Viewdirs may be per-ray (one fewer axis than pts): the directional
        encoding is then computed once per ray and broadcast across samples
        — S-fold fewer sin/cos on the VPU and an S-fold smaller dir-enc
        activation held for backward.
        """
        x = spaces.pos_enc(pts, 0, self.pos_degrees).astype(self.compute_dtype)
        skip_in = x
        for i in range(self.net_depth):
            x = nn.relu(self._dense(self.net_width)(x))
            # Reference concatenates the raw encoding *after* layer i in
            # `skips` feeds into layer i+1 (nerf_network.py:128-131).
            if i in self.skips and i != self.net_depth - 1:
                x = jnp.concatenate([x, skip_in], axis=-1)

        sigma = jnp.abs(self._dense(1)(x).astype(jnp.float32)[..., 0])

        base = self._dense(self.net_width)(x)
        dir_enc = spaces.pos_enc(viewdirs, 0, self.view_degrees).astype(
            self.compute_dtype
        )
        if dir_enc.ndim == base.ndim - 1:  # per-ray dirs: broadcast over S
            dir_enc = jnp.broadcast_to(
                dir_enc[..., None, :], base.shape[:-1] + (dir_enc.shape[-1],)
            )
        y = jnp.concatenate([base, dir_enc], axis=-1)
        y = nn.relu(self._dense(self.net_width // 2)(y))
        rgb = nn.sigmoid(self._dense(3)(y).astype(jnp.float32))
        return sigma, rgb
