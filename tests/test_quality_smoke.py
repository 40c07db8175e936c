"""End-to-end quality smokes on the analytic scene (CPU-scale).

The full-budget quality gate (quality_gate.py, QUALITY_r02.json) runs on
the real chip; these miniatures pin the same failure classes in CI — most
importantly the NGP over-budget truncation bias, which produced train
PSNR 40 / test PSNR 13 billboards before the stride-subsampling fix.
Train/test PSNR must both clear a bar AND stay close to each other.
"""

import numpy as np
import pytest

from outdoor_nerf_depth_tpu.train.config import Config
from outdoor_nerf_depth_tpu.train.loop import evaluate, train


def _run(config):
    state, history, occupancy = train(config, log_fn=lambda s: None)
    mean, _ = evaluate(
        config, state, occupancy=occupancy, save_renders=False,
        log_fn=lambda s: None,
    )
    return history[-1]["psnr"], mean


class TestQualitySmoke:
    def test_ngp_generalizes_not_billboards(self, tmp_path):
        config = Config(
            model="ngp",
            model_params=dict(
                scale=0.5, max_samples=24, n_candidates=96,
                grid_resolution=32,
                field_params=dict(n_levels=8, log2_table_size=13,
                                  base_resolution=8, max_resolution=128,
                                  hidden_width=32, geo_features=15),
            ),
            dataset="spheres",
            batch_size=1024,
            max_steps=250,
            print_every=250,
            checkpoint_every=250,
            render_chunk_size=2048,
            lambda_depth=0.05,
            depth_loss_type="mse",
            interlevel_loss_mult=0.0,
            distortion_loss_mult=0.0,
            opacity_loss_mult=1e-3,
            occupancy_update_every=16,
            occupancy_warmup_steps=64,
            occupancy_cells_per_update=2048,
            near=0.05,
            far=4.0,
            lr_init=1e-2,
            lr_final=5e-3,
            lr_delay_steps=32,
            grad_max_norm=0.0,
            exp_dir=str(tmp_path / "ngp"),
        )
        train_psnr, mean = _run(config)
        assert np.isfinite(train_psnr)
        # Generalization: held-out PSNR clears a floor and does not
        # collapse relative to train (the billboard signature was a
        # 27 dB train/test gap).
        assert mean["psnr"] > 19.0, mean
        assert train_psnr - mean["psnr"] < 12.0, (train_psnr, mean["psnr"])
        assert mean["rmse"] < 0.5, mean

    def test_mip_generalizes(self, tmp_path):
        config = Config(
            model="mipnerf360",
            model_params=dict(
                num_prop_samples=16,
                num_nerf_samples=8,
                num_levels=2,
                bg_intensity_range=(0.0, 0.0),
                nerf_mlp_params=dict(net_depth=2, net_width=64,
                                     bottleneck_width=32,
                                     net_width_viewdirs=32,
                                     max_deg_point=6),
                prop_mlp_params=dict(net_depth=2, net_width=32,
                                     max_deg_point=6),
            ),
            dataset="spheres",
            batch_size=1024,
            max_steps=250,
            print_every=250,
            checkpoint_every=250,
            render_chunk_size=2048,
            lambda_depth=0.05,
            depth_loss_type="mse",
            near=0.05,
            far=4.0,
            lr_init=3e-3,
            lr_final=1e-3,
            lr_delay_steps=32,
            exp_dir=str(tmp_path / "mip"),
        )
        train_psnr, mean = _run(config)
        assert mean["psnr"] > 17.0, mean
        assert train_psnr - mean["psnr"] < 12.0, (train_psnr, mean["psnr"])
