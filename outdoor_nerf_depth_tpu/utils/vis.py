"""Render-output visualization: colormapped depth, error maps, ray strips.

Capability parity with the reference vis suites
(`/root/reference/nerf-methods/mipnerf360/internal/vis.py:114-260`,
`nerfplusplus/utils.py:44-128`, the turbo depth maps of
`ngp-depth/train.py:48-53`). matplotlib is only imported lazily for its
colormap tables.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _colormap(name: str):
    import matplotlib

    return matplotlib.colormaps[name]


def colorize(
    value: np.ndarray,
    cmap: str = "turbo",
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    invalid_color=(0.0, 0.0, 0.0),
) -> np.ndarray:
    """Map a scalar image to RGB with nan/invalid handling. Returns [H,W,3]."""
    value = np.asarray(value, dtype=np.float64)
    valid = np.isfinite(value)
    vmin = np.min(value[valid]) if vmin is None else vmin
    vmax = np.max(value[valid]) if vmax is None else vmax
    normed = np.clip((value - vmin) / max(1e-12, vmax - vmin), 0.0, 1.0)
    rgb = _colormap(cmap)(normed)[..., :3]
    rgb[~valid] = invalid_color
    return rgb.astype(np.float32)


def visualize_depth(
    depth,
    acc: Optional[np.ndarray] = None,
    percentile_clip: float = 99.0,
    cmap: str = "turbo",
) -> np.ndarray:
    """Disparity-space depth visualization, opacity-dimmed where acc is low."""
    depth = np.asarray(depth)
    disp = 1.0 / np.maximum(1e-6, depth)
    vmax = np.percentile(disp[np.isfinite(disp)], percentile_clip)
    rgb = colorize(disp, cmap=cmap, vmin=0.0, vmax=vmax)
    if acc is not None:
        rgb = rgb * np.clip(np.asarray(acc), 0.0, 1.0)[..., None]
    return rgb


def depth_error_map(pred, gt, cap: float = 80.0, cmap: str = "coolwarm"):
    """Signed depth error (pred - gt, metres), gray where gt invalid."""
    pred, gt = np.asarray(pred), np.asarray(gt)
    valid = gt > 0
    err = np.where(valid, np.clip(pred, 0, cap) - np.clip(gt, 0, cap), np.nan)
    bound = np.nanpercentile(np.abs(err), 95) if valid.any() else 1.0
    return colorize(err, cmap=cmap, vmin=-bound, vmax=bound,
                    invalid_color=(0.5, 0.5, 0.5))


def ray_weight_strip(tdist, weights, width: int = 512) -> np.ndarray:
    """Rows = rays, columns = normalized distance; intensity = weight density.

    The reference's per-ray histogram strips (`internal/vis.py:114-168`),
    resampled to a uniform grid for display.
    """
    tdist = np.asarray(tdist)
    weights = np.asarray(weights)
    n_rays = tdist.shape[0]
    grid = np.linspace(0.0, 1.0, width)
    out = np.zeros((n_rays, width), dtype=np.float32)
    for i in range(n_rays):
        t = tdist[i]
        span = max(1e-12, t[-1] - t[0])
        t01 = (t - t[0]) / span
        density = weights[i] / np.maximum(1e-12, np.diff(t01))
        idx = np.clip(np.searchsorted(t01, grid, side="right") - 1, 0,
                      len(density) - 1)
        inside = (grid >= t01[0]) & (grid <= t01[-1])
        out[i] = np.where(inside, density[idx], 0.0)
    out /= max(1e-12, out.max())
    return colorize(out, cmap="viridis")


def plot_camera_frusta(frusta_json: str, out_path: str):
    """Render exported camera frusta (see data.preprocess) to a PNG.

    A matplotlib substitute for the reference's open3d camera visualizer.
    """
    import json

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(frusta_json) as f:
        data = json.load(f)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    for fr in data["frusta"]:
        c = np.asarray(fr["corners"])  # [5, 3]: apex + 4 image corners
        for i in range(1, 5):
            j = 1 + (i % 4)
            ax.plot(*np.stack([c[0], c[i]]).T, "b-", lw=0.5)
            ax.plot(*np.stack([c[i], c[j]]).T, "r-", lw=0.5)
    ax.set_box_aspect((1, 1, 1))
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def side_by_side(*images) -> np.ndarray:
    """Horizontally concatenate [H,W,3] images with 2px white separators."""
    images = [np.asarray(im, dtype=np.float32) for im in images]
    h = max(im.shape[0] for im in images)
    sep = np.ones((h, 2, 3), np.float32)
    padded = []
    for im in images:
        if im.ndim == 2:
            im = np.repeat(im[..., None], 3, axis=-1)
        pad = h - im.shape[0]
        if pad:
            im = np.pad(im, ((0, pad), (0, 0), (0, 0)))
        padded.extend([im, sep])
    return np.concatenate(padded[:-1], axis=1)
