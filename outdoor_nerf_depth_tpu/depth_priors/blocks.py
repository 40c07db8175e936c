"""Shared conv building blocks for the depth-prior networks.

NHWC layout throughout (the TPU-native conv layout); GroupNorm instead of
BatchNorm (see package docstring). 3D volumes use NDHWC.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """Conv -> GroupNorm -> ReLU (the depth nets' conv_bn_relu)."""

    features: int
    kernel: int = 3
    strides: int = 1
    dilation: int = 1
    use_norm: bool = True
    use_act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            use_bias=not self.use_norm,
            dtype=self.dtype,
        )(x)
        if self.use_norm:
            x = nn.GroupNorm(num_groups=min(8, self.features))(x)
        if self.use_act:
            x = nn.relu(x)
        return x


class ResBlock(nn.Module):
    """Two 3x3 convs with identity (or projected) shortcut."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.features, strides=self.strides, dtype=self.dtype)(x)
        y = ConvBlock(self.features, use_act=False, dtype=self.dtype)(y)
        if x.shape[-1] != self.features or self.strides != 1:
            x = ConvBlock(
                self.features, kernel=1, strides=self.strides, use_act=False,
                dtype=self.dtype,
            )(x)
        return nn.relu(x + y)


class Conv3dBlock(nn.Module):
    """3D conv -> GroupNorm -> ReLU over [N, D, H, W, C] cost volumes."""

    features: int
    kernel: int = 3
    strides: int = 1
    use_norm: bool = True
    use_act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.strides
        x = nn.Conv(
            self.features,
            (k, k, k),
            strides=(s, s, s),
            padding="SAME",
            use_bias=not self.use_norm,
            dtype=self.dtype,
        )(x)
        if self.use_norm:
            x = nn.GroupNorm(num_groups=min(8, self.features))(x)
        if self.use_act:
            x = nn.relu(x)
        return x


def upsample2d(x, factor: int = 2, method: str = "bilinear"):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * factor, w * factor, c), method)


def upsample3d(x, factor: int = 2):
    n, d, h, w, c = x.shape
    return jax.image.resize(
        x, (n, d * factor, h * factor, w * factor, c), "trilinear"
    )


class Hourglass3d(nn.Module):
    """Encoder-decoder over a cost volume with skip connections.

    The aggregation block every cost-volume stereo net shares (CFNet's
    `hourglass`/PCWNet's `hourglass_1`).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        d1 = Conv3dBlock(f * 2, strides=2, dtype=self.dtype)(x)
        d1 = Conv3dBlock(f * 2, dtype=self.dtype)(d1)
        d2 = Conv3dBlock(f * 4, strides=2, dtype=self.dtype)(d1)
        d2 = Conv3dBlock(f * 4, dtype=self.dtype)(d2)
        u1 = upsample3d(d2)[:, : d1.shape[1], : d1.shape[2], : d1.shape[3]]
        u1 = Conv3dBlock(f * 2, use_act=False, dtype=self.dtype)(u1)
        u1 = nn.relu(u1 + d1)
        u0 = upsample3d(u1)[:, : x.shape[1], : x.shape[2], : x.shape[3]]
        u0 = Conv3dBlock(f, use_act=False, dtype=self.dtype)(u0)
        return nn.relu(u0 + x)


class UNetFeatures(nn.Module):
    """Pyramid feature extractor returning {1/4, 1/8, 1/16} scale maps."""

    base_features: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array, jax.Array]:
        f = self.base_features
        s1 = ConvBlock(f, strides=2, dtype=self.dtype)(x)  # 1/2
        s1 = ResBlock(f, dtype=self.dtype)(s1)
        s2 = ResBlock(f * 2, strides=2, dtype=self.dtype)(s1)  # 1/4
        s2 = ResBlock(f * 2, dtype=self.dtype)(s2)
        s3 = ResBlock(f * 4, strides=2, dtype=self.dtype)(s2)  # 1/8
        s3 = ResBlock(f * 4, dtype=self.dtype)(s3)
        s4 = ResBlock(f * 8, strides=2, dtype=self.dtype)(s3)  # 1/16
        s4 = ResBlock(f * 8, dtype=self.dtype)(s4)
        # Fuse coarse context back into the finer maps (UNet-style).
        s3 = jnp.concatenate(
            [s3, upsample2d(s4)[:, : s3.shape[1], : s3.shape[2]]], axis=-1
        )
        s3 = ConvBlock(f * 4, dtype=self.dtype)(s3)
        s2 = jnp.concatenate(
            [s2, upsample2d(s3)[:, : s2.shape[1], : s2.shape[2]]], axis=-1
        )
        s2 = ConvBlock(f * 2, dtype=self.dtype)(s2)
        return s2, s3, s4
