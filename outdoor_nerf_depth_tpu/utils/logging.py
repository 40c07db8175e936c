"""Metric writer: JSONL always, TensorBoard events when available.

Capability parity with the reference's observability (SURVEY.md section
5.5: tensorboardX / flax SummaryWriter / Lightning logger), without hard
dependencies: torch's SummaryWriter is used if importable, and every scalar
always lands in `metrics.jsonl` for offline plotting.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping, Optional

import numpy as np


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Mapping[str, float], prefix: str = ""):
        flat = {
            (f"{prefix}/{k}" if prefix else k): float(v)
            for k, v in values.items()
            if np.isscalar(v) or getattr(v, "ndim", 1) == 0
        }
        self._jsonl.write(
            json.dumps({"step": step, "time": time.time(), **flat}) + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)

    def image(self, step: int, tag: str, img, out_dir: Optional[str] = None):
        """Log an [H, W, 3] float image (TB and/or a PNG beside the logs)."""
        img = np.clip(np.nan_to_num(np.asarray(img)), 0.0, 1.0)
        if self._tb is not None:
            self._tb.add_image(tag, img.transpose(2, 0, 1), step)
        if out_dir is not None:
            from outdoor_nerf_depth_tpu.utils.image import save_img_u8

            os.makedirs(out_dir, exist_ok=True)
            save_img_u8(img, os.path.join(out_dir, f"{tag}_{step:06d}.png"))

    def histogram(self, step: int, tag: str, values):
        if self._tb is not None:
            self._tb.add_histogram(tag, np.asarray(values), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
