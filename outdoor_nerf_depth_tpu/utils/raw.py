"""RawNeRF support: Bayer mosaics, demosaicing, exposure handling.

Capability parity with the reference's raw pipeline
(`/root/reference/nerf-methods/mipnerf360/internal/raw_utils.py:35-412`),
minus the rawpy/DNG file decoding (rawpy is not in this image — metadata and
mosaic handling accept pre-decoded arrays): Bayer masks for the loss,
bilinear demosaic, exposure-percentile normalization, and the affine color
alignment used to compare raw renders against postprocessed ground truth.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def pixels_to_bayer_mask(pix_x, pix_y):
    """[..., 3] binary mask of which RGGB channel each pixel observes.

    R at (even, even); G at the two mixed-parity sites; B at (odd, odd) —
    the per-ray lossmult for training on mosaicked raw frames
    (`raw_utils.py` `pixels_to_bayer_mask` semantics).
    """
    x_even = (pix_x % 2 == 0).astype(np.float32)
    y_even = (pix_y % 2 == 0).astype(np.float32)
    r = x_even * y_even
    g = x_even + y_even - 2.0 * x_even * y_even
    b = (1.0 - x_even) * (1.0 - y_even)
    return np.stack([r, g, b], axis=-1)


def bilinear_demosaic(bayer: np.ndarray) -> np.ndarray:
    """Demosaic an RGGB Bayer plane [H, W] -> [H, W, 3] by bilinear interp."""
    h, w = bayer.shape

    def grid_interp(vals_yx):
        ys, xs, vals = vals_yx
        out = np.zeros((h, w), np.float32)
        known = np.zeros((h, w), np.float32)
        out[ys, xs] = vals
        known[ys, xs] = 1.0
        # Two passes of 3x3 normalized box filling recover bilinear weights
        # for the regular Bayer lattice.
        for _ in range(2):
            pad_v = np.pad(out, 1)
            pad_k = np.pad(known, 1)
            acc_v = np.zeros_like(out)
            acc_k = np.zeros_like(known)
            for dy in range(3):
                for dx in range(3):
                    wgt = 1.0 / (1 + abs(dy - 1) + abs(dx - 1))
                    acc_v += wgt * pad_v[dy : dy + h, dx : dx + w]
                    acc_k += wgt * pad_k[dy : dy + h, dx : dx + w]
            fill = acc_v / np.maximum(acc_k, 1e-8)
            out = np.where(known > 0, out, fill)
            known = np.where(acc_k > 0, 1.0, known)
        return out

    yy, xx = np.mgrid[0:h, 0:w]
    r_mask = (yy % 2 == 0) & (xx % 2 == 0)
    g_mask = (yy % 2) != (xx % 2)
    b_mask = (yy % 2 == 1) & (xx % 2 == 1)
    channels = []
    for mask in (r_mask, g_mask, b_mask):
        ys, xs = np.nonzero(mask)
        channels.append(grid_interp((ys, xs, bayer[ys, xs])))
    return np.stack(channels, axis=-1)


_TAG_NAMES = {
    0x829A: "ExposureTime",
    0x8827: "ISOSpeedRatings",
    0x9201: "ShutterSpeedValue",
    0xC61A: "BlackLevel",
    0xC61D: "WhiteLevel",
    0x0100: "ImageWidth",
    0x0101: "ImageLength",
    0x0112: "Orientation",
    0xC628: "AsShotNeutral",
}
_EXIF_IFD = 0x8769
_SUB_IFDS = 0x014A
# TIFF field types -> (struct code, size)
_FIELD_TYPES = {
    1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
    8: ("h", 2), 9: ("i", 4), 10: ("ii", 8), 11: ("f", 4), 12: ("d", 8),
}


def read_dng_metadata(path: str) -> dict:
    """Pure-python DNG/TIFF metadata reader (no rawpy in this image).

    Walks the TIFF IFD chain (plus the EXIF sub-IFD and DNG SubIFDs) and
    collects the exposure tags the reference's raw pipeline consumes
    (`raw_utils.py:35-412`: ExposureTime, ISOSpeedRatings,
    ShutterSpeedValue, BlackLevel, WhiteLevel, AsShotNeutral). Pixel data
    is NOT decoded — pair with a pre-decoded mosaic for the full pipeline.
    """
    import struct

    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError(f"{path!r} is not a TIFF/DNG file")
    if struct.unpack(e + "H", data[2:4])[0] != 42:
        raise ValueError(f"{path!r}: bad TIFF magic")

    out = {}

    def read_ifd(offset, depth=0):
        if depth > 4 or offset <= 0 or offset + 2 > len(data):
            return
        (n,) = struct.unpack(e + "H", data[offset : offset + 2])
        for i in range(n):
            base = offset + 2 + 12 * i
            if base + 12 > len(data):
                return
            tag, ftype, count = struct.unpack(
                e + "HHI", data[base : base + 8]
            )
            if ftype not in _FIELD_TYPES:
                continue
            code, size = _FIELD_TYPES[ftype]
            total = size * count
            if total <= 4:
                raw = data[base + 8 : base + 8 + total]
            else:
                (ptr,) = struct.unpack(e + "I", data[base + 8 : base + 12])
                raw = data[ptr : ptr + total]
            if len(raw) < total:
                continue
            if code in ("II", "ii"):  # rationals
                ints = struct.unpack(
                    e + code[0] * (2 * count), raw
                )
                vals = [
                    ints[2 * j] / ints[2 * j + 1] if ints[2 * j + 1] else 0.0
                    for j in range(count)
                ]
            else:
                vals = list(struct.unpack(e + code * count, raw))
            if tag == _EXIF_IFD:
                read_ifd(int(vals[0]), depth + 1)
            elif tag == _SUB_IFDS:
                for v in vals:
                    read_ifd(int(v), depth + 1)
            elif tag in _TAG_NAMES:
                name = _TAG_NAMES[tag]
                out.setdefault(
                    name, vals[0] if count == 1 else vals
                )
        (nxt,) = struct.unpack(
            e + "I", data[offset + 2 + 12 * n : offset + 6 + 12 * n]
        )
        if nxt:
            read_ifd(nxt, depth + 1)

    (ifd0,) = struct.unpack(e + "I", data[4:8])
    read_ifd(ifd0)
    return out


def exposure_values(metadata: Sequence[Mapping]) -> np.ndarray:
    """shutter * ISO / 1000 per frame (the reference's exposure unit)."""
    return np.array(
        [float(m["ExposureTime"]) * float(m["ISOSpeedRatings"]) / 1000.0
         for m in metadata]
    )


def normalize_exposure(
    images: np.ndarray, percentile: float = 97.0
) -> Tuple[np.ndarray, float]:
    """Scale linear images so `percentile` of intensities hits 1.0."""
    level = float(np.percentile(images, percentile))
    return images / max(level, 1e-8), level


def postprocess_raw(linear, exposure=None, gamma: float = 1.0 / 2.2):
    """Simple raw->display transform: exposure scale + gamma."""
    x = jnp.asarray(linear)
    if exposure is not None:
        x = x * exposure
    return jnp.clip(x, 0.0, 1.0) ** gamma


def match_affine_color(img: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Least-squares 3x4 color transform of `img` onto `ref` (the raw
    evaluation trick: compare up to an affine color shift)."""
    flat = img.reshape(-1, 3)
    feats = np.concatenate([flat, np.ones_like(flat[:, :1])], axis=-1)
    coeff, *_ = np.linalg.lstsq(feats, ref.reshape(-1, 3), rcond=None)
    return (feats @ coeff).reshape(img.shape)
