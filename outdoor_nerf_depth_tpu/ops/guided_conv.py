"""Content-guided (spatially-varying) local convolution.

Capability parity with the MFF-Net `GuideConv` CUDA extension
(`/root/reference/depth-methods/depth_completion/mffnet/exts/
guideconv_kernel.cu:12-104`): z[b, c, y, x] = sum_k x[b, c, y+dy_k, x+dx_k]
* w[b, c, k, y, x], i.e. every pixel carries its own KxK depthwise kernel
predicted by a guidance branch.

On TPU this is one patch-extraction plus an einsum — the MXU-friendly form
of the hand-written CUDA gather loop; forward and backward both come from
XLA (the CUDA backward kernels are the einsum transposes AD derives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_patches(x: jax.Array, kernel_size: int) -> jax.Array:
    """im2col for NHWC inputs: [B,H,W,C] -> [B,H,W,K*K,C], zero-padded."""
    k = kernel_size
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    shifts = [
        xp[:, dy : dy + h, dx : dx + w, :] for dy in range(k) for dx in range(k)
    ]
    return jnp.stack(shifts, axis=-2)


def guided_local_conv(x: jax.Array, weights: jax.Array) -> jax.Array:
    """Apply per-pixel depthwise kernels.

    Args:
      x: [B, H, W, C] features.
      weights: [B, H, W, K*K, C] per-pixel per-channel kernels (the guidance
        branch's output).

    Returns [B, H, W, C].
    """
    k_sq = weights.shape[-2]
    k = int(round(k_sq**0.5))
    if k * k != k_sq:
        raise ValueError(f"weights kernel dim {k_sq} is not a square")
    patches = extract_patches(x, k)  # [B,H,W,K*K,C]
    return jnp.einsum("bhwkc,bhwkc->bhwc", patches, weights)
