"""Tests for the training-loop driver (train/loop.py) on the CPU mesh."""

import json
import os

import numpy as np

from outdoor_nerf_depth_tpu.train.config import Config
from outdoor_nerf_depth_tpu.train.loop import train

TINY = dict(
    num_prop_samples=8,
    num_nerf_samples=4,
    num_levels=2,
    nerf_mlp_params=dict(net_depth=2, net_width=16, bottleneck_width=8,
                         net_width_viewdirs=8, max_deg_point=4),
    prop_mlp_params=dict(net_depth=2, net_width=16, max_deg_point=4),
)


class TestTrainLoop:
    def test_in_loop_test_render_and_resume(self, tmp_path):
        config = Config(
            model="mipnerf360",
            model_params=TINY,
            dataset="synthetic",
            batch_size=64,
            max_steps=4,
            print_every=2,
            checkpoint_every=2,
            train_render_every=2,
            render_chunk_size=64,
            lambda_depth=0.1,
            lr_delay_steps=0,
            exp_dir=str(tmp_path / "exp"),
        )
        lines = []
        state, history, _ = train(config, log_fn=lambda s: lines.append(s))
        assert len(history) >= 2
        renders = [json.loads(l) for l in lines if "test_view" in l]
        assert len(renders) == 2  # steps 2 and 4
        assert all(np.isfinite(r["psnr"]) for r in renders)
        # Metric JSONL carries the train_render scalars.
        logged = open(
            os.path.join(config.exp_dir, "logs", "metrics.jsonl")
        ).read()
        assert "train_render/psnr" in logged
        # Resume from the saved checkpoint: loop is a no-op at max_steps.
        state2, history2, _ = train(config, log_fn=lambda s: None)
        assert history2 == []
