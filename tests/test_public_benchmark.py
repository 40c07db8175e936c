"""Smoke test for the public-dataset benchmark driver
(benchmarks/run_public_benchmark.py), the replacement for the reference's
seven `ngp-depth/benchmarking/*.sh` scripts."""

import importlib.util
import json
import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def driver():
    spec = importlib.util.spec_from_file_location(
        "run_public_benchmark",
        os.path.join(REPO_ROOT, "benchmarks", "run_public_benchmark.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_covers_reference_suites(driver):
    # The reference ships seven benchmark scripts; each must have a suite.
    assert set(driver.SUITES) == {
        "synthetic_nerf", "synthetic_nsvf", "blendedmvs", "tat",
        "nerfpp", "mipnerf360", "rtmv",
    }
    for name, suite in driver.SUITES.items():
        assert suite["scenes"], name
        assert suite["dataset"], name


def test_end_to_end_tiny(driver, tmp_path, monkeypatch, capsys):
    # Inject a tiny synthetic suite and run the full driver loop: train,
    # eval, summary JSON.
    monkeypatch.chdir(tmp_path)
    driver.SUITES["_tiny"] = dict(
        dataset="synthetic", scale=0.5, batch=32,
        scenes=["a", "b"],
    )
    out = str(tmp_path / "bench.json")
    driver.main([
        "_tiny", "root=/nonexistent", "steps=4", f"out={out}",
        "print_every=4", "checkpoint_every=4", "render_chunk_size=64",
        'model_params={"scale": 0.5, "max_samples": 8, "n_candidates": 32,'
        ' "grid_resolution": 8, "field_params": {"n_levels": 2,'
        ' "log2_table_size": 10, "base_resolution": 4, "max_resolution": 16,'
        ' "hidden_width": 16, "geo_features": 7}}',
    ])
    summary = json.load(open(out))
    assert set(summary["scenes"]) == {"a", "b"}
    assert "psnr" in summary["mean"]
