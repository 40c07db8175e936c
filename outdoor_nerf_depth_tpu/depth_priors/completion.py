"""Depth completion: RGB-D encoder-decoder and guided-fusion networks.

Capability parity with the reference completion stacks:

* `DepthCompletionNet` — the std2019 self-supervised-depth-completion model
  (`/root/reference/depth-methods/depth_completion/std2019-depth-completion/
  model.py:69-205`): ResNet encoder over concatenated RGB + sparse depth,
  transposed-conv decoder with skip connections, trained with masked MSE on
  LiDAR plus photometric/smoothness terms for self-supervision.
* `GuidedCompletionNet` — the MFF-Net GuideNet family
  (`mffnet/models.py:198-618`): a guidance (RGB) branch predicting
  spatially-varying kernels that filter the depth branch at each scale —
  the `GuideConv` CUDA op realized as `ops.guided_conv` patch-einsums.

Both output dense metric depth >= 0; the inference CLI writes uint16 PNGs.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from outdoor_nerf_depth_tpu.depth_priors.blocks import (
    ConvBlock,
    ResBlock,
    upsample2d,
)
from outdoor_nerf_depth_tpu.ops.guided_conv import guided_local_conv


class DepthCompletionNet(nn.Module):
    """RGB-D ResNet encoder-decoder (std2019 style)."""

    base_features: int = 32
    depth_scale_hint: float = 80.0  # normalizes sparse depth input
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, sparse_depth):
        """rgb [N,H,W,3] in [0,1]; sparse_depth [N,H,W] metres (0 = missing).

        Returns dense depth [N,H,W] (metres, >= 0).
        """
        f = self.base_features
        d_in = (sparse_depth / self.depth_scale_hint)[..., None]
        valid = (sparse_depth > 0).astype(jnp.float32)[..., None]
        x = jnp.concatenate([rgb, d_in, valid], axis=-1)

        e0 = ConvBlock(f, kernel=5, dtype=self.dtype)(x)  # full res
        e1 = ResBlock(f * 2, strides=2, dtype=self.dtype)(e0)  # 1/2
        e1 = ResBlock(f * 2, dtype=self.dtype)(e1)
        e2 = ResBlock(f * 4, strides=2, dtype=self.dtype)(e1)  # 1/4
        e2 = ResBlock(f * 4, dtype=self.dtype)(e2)
        e3 = ResBlock(f * 8, strides=2, dtype=self.dtype)(e2)  # 1/8
        e3 = ResBlock(f * 8, dtype=self.dtype)(e3)

        d2 = upsample2d(ConvBlock(f * 4, dtype=self.dtype)(e3))
        d2 = d2[:, : e2.shape[1], : e2.shape[2]]
        d2 = ConvBlock(f * 4, dtype=self.dtype)(jnp.concatenate([d2, e2], -1))
        d1 = upsample2d(d2)[:, : e1.shape[1], : e1.shape[2]]
        d1 = ConvBlock(f * 2, dtype=self.dtype)(jnp.concatenate([d1, e1], -1))
        d0 = upsample2d(d1)[:, : e0.shape[1], : e0.shape[2]]
        d0 = ConvBlock(f, dtype=self.dtype)(jnp.concatenate([d0, e0], -1))

        out = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(d0)
        return nn.relu(out[..., 0].astype(jnp.float32)) * self.depth_scale_hint


class _GuidedFusion(nn.Module):
    """Guidance features -> per-pixel kernels -> filter the depth branch."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, guide_feat, depth_feat):
        k_sq = self.kernel_size**2
        kernels = nn.Conv(
            k_sq * self.features, (3, 3), padding="SAME", dtype=self.dtype
        )(guide_feat)
        n, h, w, _ = kernels.shape
        kernels = kernels.reshape(n, h, w, k_sq, self.features)
        # Softmax over taps keeps the filter a convex combination (stable).
        kernels = jax.nn.softmax(kernels, axis=-2)
        return guided_local_conv(depth_feat, kernels)


class GuidedCompletionNet(nn.Module):
    """Two-branch guided completion (MFF-Net GuideNet style)."""

    base_features: int = 32
    depth_scale_hint: float = 80.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, sparse_depth):
        f = self.base_features
        d_in = (sparse_depth / self.depth_scale_hint)[..., None]
        valid = (sparse_depth > 0).astype(jnp.float32)[..., None]

        # Guidance branch (RGB).
        g0 = ConvBlock(f, dtype=self.dtype)(rgb)
        g1 = ResBlock(f * 2, strides=2, dtype=self.dtype)(g0)
        g2 = ResBlock(f * 4, strides=2, dtype=self.dtype)(g1)

        # Depth branch, fused with guidance kernels at each scale.
        d0 = ConvBlock(f, dtype=self.dtype)(jnp.concatenate([d_in, valid], -1))
        d0 = _GuidedFusion(f, dtype=self.dtype)(g0, d0)
        d1 = ResBlock(f * 2, strides=2, dtype=self.dtype)(d0)
        d1 = _GuidedFusion(f * 2, dtype=self.dtype)(g1, d1)
        d2 = ResBlock(f * 4, strides=2, dtype=self.dtype)(d1)
        d2 = _GuidedFusion(f * 4, dtype=self.dtype)(g2, d2)

        u1 = upsample2d(ConvBlock(f * 2, dtype=self.dtype)(d2))
        u1 = u1[:, : d1.shape[1], : d1.shape[2]]
        u1 = ConvBlock(f * 2, dtype=self.dtype)(jnp.concatenate([u1, d1], -1))
        u0 = upsample2d(u1)[:, : d0.shape[1], : d0.shape[2]]
        u0 = ConvBlock(f, dtype=self.dtype)(jnp.concatenate([u0, d0], -1))

        out = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(u0)
        return nn.relu(out[..., 0].astype(jnp.float32)) * self.depth_scale_hint


# --------------------------------------------------------------------------
# Losses (std2019 criteria.py:7-88 + smoothness).
# --------------------------------------------------------------------------


def masked_depth_mse(pred, target):
    """MSE over pixels with LiDAR returns (target > 0)."""
    mask = (target > 0).astype(pred.dtype)
    return jnp.sum(mask * (pred - target) ** 2) / jnp.maximum(1.0, mask.sum())


def masked_depth_l1(pred, target):
    mask = (target > 0).astype(pred.dtype)
    return jnp.sum(mask * jnp.abs(pred - target)) / jnp.maximum(1.0, mask.sum())


def edge_aware_smoothness(depth, rgb):
    """Image-gradient-weighted depth smoothness (self-supervision term)."""
    dzdx = jnp.abs(depth[:, :, 1:] - depth[:, :, :-1])
    dzdy = jnp.abs(depth[:, 1:, :] - depth[:, :-1, :])
    didx = jnp.mean(jnp.abs(rgb[:, :, 1:] - rgb[:, :, :-1]), axis=-1)
    didy = jnp.mean(jnp.abs(rgb[:, 1:, :] - rgb[:, :-1, :]), axis=-1)
    return jnp.mean(dzdx * jnp.exp(-didx)) + jnp.mean(dzdy * jnp.exp(-didy))


def photometric_loss(pred_img, target_img, mask=None):
    """L1 photometric consistency between a warped view and the target."""
    err = jnp.abs(pred_img - target_img).mean(-1)
    if mask is not None:
        m = mask.astype(err.dtype)
        return jnp.sum(m * err) / jnp.maximum(1.0, m.sum())
    return jnp.mean(err)
