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
    """RGB-D ResNet encoder-decoder at the std2019 reference depth.

    Matches the block structure of `std2019 .../model.py:69-205`: separate
    RGB and depth stem convolutions concatenated into a joint feature
    (conv1_img + conv1_d), a ResNet-34-style basic-block encoder
    (`encoder_blocks` per stage, stride-2 between stages), and an
    upsample decoder with encoder skips. `base_features=64` reproduces the
    reference widths (64/128/256/512); tests shrink it.
    """

    base_features: int = 64
    encoder_blocks: Tuple[int, ...] = (3, 4, 6, 3)  # ResNet-34 layout
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

        # Modality-specific stems (reference conv1_img 48ch / conv1_d 16ch,
        # a 3:1 split of the stem width).
        img_feat = ConvBlock(3 * f // 4, kernel=5, dtype=self.dtype)(rgb)
        d_feat = ConvBlock(f - 3 * f // 4, kernel=5, dtype=self.dtype)(
            jnp.concatenate([d_in, valid], axis=-1)
        )
        e0 = jnp.concatenate([img_feat, d_feat], axis=-1)  # full res, f ch

        # ResNet-34 basic-block stages at 1/2, 1/4, 1/8, 1/16.
        skips = [e0]
        x = e0
        for stage, n_blocks in enumerate(self.encoder_blocks):
            width = f * (2 ** min(stage, 3))
            x = ResBlock(width, strides=2, dtype=self.dtype)(x)
            for _ in range(n_blocks - 1):
                x = ResBlock(width, dtype=self.dtype)(x)
            skips.append(x)

        # Decoder mirrors the encoder with skip concatenation.
        x = skips[-1]
        for stage in range(len(self.encoder_blocks) - 1, -1, -1):
            width = f * (2 ** min(max(stage - 1, 0), 3))
            skip = skips[stage]
            x = upsample2d(ConvBlock(width, dtype=self.dtype)(x))
            x = x[:, : skip.shape[1], : skip.shape[2]]
            x = ConvBlock(width, dtype=self.dtype)(
                jnp.concatenate([x, skip], -1)
            )

        out = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(x)
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


class MMAF(nn.Module):
    """Dual-direction multi-modal attention fusion (MFF-Net MMAF blocks,
    `mffnet/models.py:198-376`): each branch gates the other with
    channel attention derived from globally pooled joint statistics, and
    receives the gated cross-modal features residually. Returns the updated
    (guide, depth) pair — both branches are refreshed, the "dual direction"
    the round-1 softmax-kernel-only fusion lacked."""

    features: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, guide_feat, depth_feat):
        joint = jnp.concatenate([guide_feat, depth_feat], axis=-1)
        pooled = jnp.mean(joint, axis=(1, 2))  # [N, 2C]
        hidden = nn.relu(
            nn.Dense(max(4, 2 * self.features // self.reduction),
                     dtype=self.dtype)(pooled)
        )
        # Two per-channel gate sets: guide->depth and depth->guide.
        gates = nn.Dense(2 * self.features, dtype=self.dtype)(hidden)
        g2d = nn.sigmoid(gates[:, : self.features])[:, None, None, :]
        d2g = nn.sigmoid(gates[:, self.features :])[:, None, None, :]
        # Zero-init the residual output convs: the block starts as identity
        # and learns the cross-modal injection (residual-branch discipline).
        zconv = lambda name: nn.Conv(
            self.features, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=jax.nn.initializers.zeros, name=name,
        )
        new_depth = depth_feat + zconv("inject_g2d")(guide_feat * g2d)
        new_guide = guide_feat + zconv("inject_d2g")(depth_feat * d2g)
        return new_guide, new_depth


class GuidedCompletionNet(nn.Module):
    """Two-branch guided completion (MFF-Net GuideNet,
    `mffnet/models.py:377-618`): at every scale the RGB guidance branch
    (1) exchanges features with the depth branch through a dual-direction
    MMAF block and (2) predicts spatially-varying kernels that filter the
    depth branch (the GuideConv op, `ops.guided_conv`)."""

    base_features: int = 32
    depth_scale_hint: float = 80.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, sparse_depth):
        f = self.base_features
        d_in = (sparse_depth / self.depth_scale_hint)[..., None]
        valid = (sparse_depth > 0).astype(jnp.float32)[..., None]

        g = ConvBlock(f, dtype=self.dtype)(rgb)
        d = ConvBlock(f, dtype=self.dtype)(jnp.concatenate([d_in, valid], -1))

        skips = []
        for stage, width in enumerate((f, f * 2, f * 4)):
            if stage > 0:
                g = ResBlock(width, strides=2, dtype=self.dtype)(g)
                d = ResBlock(width, strides=2, dtype=self.dtype)(d)
            g, d = MMAF(width, dtype=self.dtype)(g, d)
            d = _GuidedFusion(width, dtype=self.dtype)(g, d)
            skips.append(d)

        d0, d1, d2 = skips
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
