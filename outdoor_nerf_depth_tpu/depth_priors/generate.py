"""Prior generation: run a depth net over a scene, write uint16 depth PNGs.

The offline pipeline of the reference (SURVEY.md section 3.6): stereo or
completion nets -> uint16 PNG (metres * 256) -> copied into the scene as
`depths_<prior>_crop/` folders consumed by the NeRF data layer. One driver
replaces the four reference `save_disp.py`/`evaluate.py` scripts.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from outdoor_nerf_depth_tpu.data.datasets import load_image
from outdoor_nerf_depth_tpu.depth_priors import completion, stereo
from outdoor_nerf_depth_tpu.utils.image import save_depth_u16


def _pad_to_multiple(img, multiple: int = 32):
    h, w = img.shape[:2]
    ph, pw = (-h) % multiple, (-w) % multiple
    widths = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, widths), (h, w)


def generate_stereo_priors(
    params,
    left_dir: str,
    right_dir: str,
    out_dir: str,
    focal: float,
    baseline: float,
    variant: str = "cfnet",
    max_disparity: int = 192,
    confidence_threshold: float = 0.0,
    model_kwargs: Optional[dict] = None,
    log_fn=print,
):
    """Run the stereo net over paired directories; write depth PNGs.

    With `confidence_threshold > 0`, low-confidence pixels are zeroed —
    the `ste_conf` prior (92.28% density in the paper's Table 4).
    """
    model = stereo.StereoNet(
        variant=variant, max_disparity=max_disparity, **(model_kwargs or {})
    )
    apply_fn = jax.jit(lambda p, l, r: model.apply(p, l, r))
    os.makedirs(out_dir, exist_ok=True)

    lefts = sorted(os.listdir(left_dir))
    rights = sorted(os.listdir(right_dir))
    for lname, rname in zip(lefts, rights):
        left = load_image(os.path.join(left_dir, lname)) / 255.0
        right = load_image(os.path.join(right_dir, rname)) / 255.0
        left_p, (h, w) = _pad_to_multiple(left.astype(np.float32))
        right_p, _ = _pad_to_multiple(right.astype(np.float32))
        out = apply_fn(params, left_p[None], right_p[None])
        disp = np.asarray(out["disparity"])[0, :h, :w]
        conf = np.asarray(out["confidence"])[0, :h, :w]
        depth = np.asarray(
            stereo.disparity_to_depth(disp, focal, baseline)
        )
        if confidence_threshold > 0:
            depth = np.where(conf >= confidence_threshold, depth, 0.0)
        save_depth_u16(depth, os.path.join(out_dir, os.path.splitext(lname)[0] + ".png"))
        log_fn(f"{lname}: disp [{disp.min():.1f}, {disp.max():.1f}] "
               f"density {(depth > 0).mean():.2%}")


def generate_completion_priors(
    params,
    image_dir: str,
    sparse_depth_dir: str,
    out_dir: str,
    arch: str = "guided",
    log_fn=print,
):
    """Complete sparse LiDAR depth maps; write dense depth PNGs."""
    if arch == "guided":
        model = completion.GuidedCompletionNet()
    elif arch == "resnet":
        model = completion.DepthCompletionNet()
    else:
        raise ValueError(f"unknown completion arch {arch!r}")
    apply_fn = jax.jit(lambda p, rgb, d: model.apply(p, rgb, d))
    os.makedirs(out_dir, exist_ok=True)

    for name in sorted(os.listdir(image_dir)):
        rgb = load_image(os.path.join(image_dir, name)) / 255.0
        sparse = load_image(
            os.path.join(sparse_depth_dir, os.path.splitext(name)[0] + ".png")
        ) / 256.0
        rgb_p, (h, w) = _pad_to_multiple(rgb.astype(np.float32))
        sparse_p, _ = _pad_to_multiple(sparse.astype(np.float32))
        dense = np.asarray(apply_fn(params, rgb_p[None], sparse_p[None]))[0, :h, :w]
        save_depth_u16(dense, os.path.join(out_dir, os.path.splitext(name)[0] + ".png"))
        log_fn(f"{name}: depth [{dense.min():.1f}, {dense.max():.1f}] m")
