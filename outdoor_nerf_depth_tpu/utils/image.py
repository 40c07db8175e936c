"""Image-space utilities: sRGB transfer, resampling, color alignment, IO.

Capability parity with the reference image layer
(`/root/reference/nerf-methods/mipnerf360/internal/image.py:28-124` and the
save helpers in `internal/utils.py:140-190`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def srgb_to_linear(srgb):
    """IEC 61966-2-1 electro-optical transfer (the exact piecewise curve)."""
    eps = jnp.finfo(jnp.float32).eps
    linear0 = 25.0 * srgb / 323.0
    linear1 = jnp.maximum(eps, (200.0 * srgb + 11.0) / 211.0) ** (12.0 / 5.0)
    return jnp.where(srgb <= 0.04045, linear0, linear1)


def linear_to_srgb(linear):
    eps = jnp.finfo(jnp.float32).eps
    srgb0 = 323.0 / 25.0 * linear
    srgb1 = (211.0 * jnp.maximum(eps, linear) ** (5.0 / 12.0) - 11.0) / 200.0
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def downsample(img, factor: int):
    """Exact area downsampling by an integer factor (box filter)."""
    h, w = img.shape[:2]
    if h % factor or w % factor:
        raise ValueError(f"image {img.shape} not divisible by factor {factor}")
    shape = (h // factor, factor, w // factor, factor) + img.shape[2:]
    return img.reshape(shape).mean(axis=(1, 3))


def color_correct(img, ref, num_iters: int = 5, eps: float = 0.5 / 255):
    """Per-channel quadratic color alignment of `img` onto `ref`.

    Solves a clipped least-squares warp over [rgb, rgb^2 cross-terms, 1]
    features per channel, iterating to handle the clipping — the tool the
    reference uses to fairly compare renders under exposure drift
    (`internal/image.py:55-124`).
    """
    img_np = np.asarray(img, dtype=np.float64)
    ref_np = np.asarray(ref, dtype=np.float64)
    if img_np.shape[-1] != ref_np.shape[-1]:
        raise ValueError("channel mismatch")
    num_channels = img_np.shape[-1]
    img_mat = img_np.reshape(-1, num_channels)
    ref_mat = ref_np.reshape(-1, num_channels)

    def quad_feats(mat):
        quads = [mat[:, i : i + 1] * mat[:, j : j + 1]
                 for i in range(num_channels) for j in range(i, num_channels)]
        return np.concatenate([mat] + quads + [np.ones_like(mat[:, :1])], axis=-1)

    out = img_mat.copy()
    for _ in range(num_iters):
        feats = quad_feats(out)
        for c in range(num_channels):
            # Only fit where neither side is clipped.
            mask = (
                (img_mat[:, c] > eps) & (img_mat[:, c] < 1 - eps)
                & (ref_mat[:, c] > eps) & (ref_mat[:, c] < 1 - eps)
            )
            coeff, *_ = np.linalg.lstsq(
                feats[mask], ref_mat[mask, c], rcond=None
            )
            out[:, c] = np.clip(feats @ coeff, 0.0, 1.0)
    return out.reshape(img_np.shape).astype(np.float32)


def save_img_u8(img, path: str):
    """Save a [0,1] float image as 8-bit PNG."""
    from PIL import Image as PILImage

    arr = (np.clip(np.nan_to_num(np.asarray(img)), 0.0, 1.0) * 255.0).astype(
        np.uint8
    )
    PILImage.fromarray(arr).save(path)


def save_depth_u16(depth_m, path: str):
    """Save metric depth as KITTI-convention uint16 PNG (metres * 256)."""
    from PIL import Image as PILImage

    arr = np.clip(np.nan_to_num(np.asarray(depth_m)) * 256.0, 0, 65535).astype(
        np.uint16
    )
    PILImage.fromarray(arr).save(path)
