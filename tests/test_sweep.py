"""Tests for the sweep runner (the reference's bash-loop replacement)."""

import json
import os
import subprocess
import sys

import pytest

import sweep


class TestParseArgs:
    def test_grids_and_overrides(self):
        path, grids, overrides, dry = sweep.parse_args(
            ["--config", "c.json", "--grid", "depth_loss_type=mse,kl",
             "--grid", "sample_every=1,4", "batch_size=64", "--dry-run"]
        )
        assert path == "c.json"
        assert grids == [("depth_loss_type", ["mse", "kl"]),
                         ("sample_every", ["1", "4"])]
        assert overrides == ["batch_size=64"]
        assert dry


class TestSweepEndToEnd:
    def test_tiny_sweep_trains_and_summarizes(self, tmp_path):
        """2-point sweep over depth_loss_type on the synthetic fixture;
        each point trains, evaluates, and lands in the summary json."""
        exp = str(tmp_path / "sweep")
        tiny = json.dumps(dict(
            num_prop_samples=8, num_nerf_samples=4, num_levels=2,
            nerf_mlp_params=dict(net_depth=2, net_width=16,
                                 bottleneck_width=8, net_width_viewdirs=8,
                                 max_deg_point=4),
            prop_mlp_params=dict(net_depth=2, net_width=16, max_deg_point=4),
        ))
        sweep.main([
            "--grid", "depth_loss_type=mse,l1",
            f"model_params={tiny}",
            "dataset=synthetic", "batch_size=32", "max_steps=4",
            "print_every=4", "checkpoint_every=4", "render_chunk_size=64",
            "lambda_depth=0.1", "lr_delay_steps=0", "compute_ssim=false",
            f"exp_dir={exp}",
        ])
        summary = json.load(open(os.path.join(exp, "sweep_summary.json")))
        assert set(summary) == {"depth_loss_type_mse", "depth_loss_type_l1"}
        for point, mean in summary.items():
            assert "psnr" in mean and "rmse" in mean, point
            assert os.path.isdir(os.path.join(exp, point, "checkpoints"))

    def test_dry_run_creates_nothing(self, tmp_path, capsys):
        exp = str(tmp_path / "dry")
        sweep.main([
            "--grid", "depth_loss_type=mse,l1,kl",
            "dataset=synthetic", f"exp_dir={exp}", "--dry-run",
        ])
        out = capsys.readouterr().out
        assert out.count("sweep point") == 3
        assert not os.path.exists(os.path.join(exp, "sweep_summary.json"))


def test_full_budget_runner_override_passthrough():
    """Unknown key=value args forward into every backend config."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "full_budget_run",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                      "tools", "full_budget_run.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    captured = {}

    def fake_run(name, fixture, exp_root, steps_scale, extra=()):
        captured[name] = extra
        return {"backend": name, "steps": 1}

    mod.run_backend = fake_run
    mod.ensure_fixture = lambda *a, **k: None
    out = "/tmp/_fbr_test.json"
    if _os.path.exists(out):
        _os.remove(out)
    mod.main([f"out={out}", "backends=mip", "checkpoint_every=2000",
              "steps_scale=0.5"])
    assert captured["mip"] == ("checkpoint_every=2000",)
