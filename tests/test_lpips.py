"""Tests for the native-JAX LPIPS (train/lpips.py) and its MetricSuite wiring.

Uses a random-weights npz fixture (the real checkpoint is not
redistributable) — exercises the full VGG16 feature path, the calibration
weighting, the loud-failure contract, and the provenance guard that keeps
random-weight "LPIPS" numbers out of metric summaries.
"""

import numpy as np
import pytest

from outdoor_nerf_depth_tpu.train import lpips as lpips_lib
from outdoor_nerf_depth_tpu.train import metrics as metrics_lib


@pytest.fixture(scope="module")
def weights_path(tmp_path_factory):
    """Random weights with NO export provenance (the risky fixture file)."""
    path = str(tmp_path_factory.mktemp("lpips") / "lpips_test.npz")
    lpips_lib.save_weights(
        path, lpips_lib.random_weights(np.random.default_rng(0))
    )
    return path


@pytest.fixture(scope="module")
def stamped_path(tmp_path_factory):
    """Random weights stamped as-if exported (plumbing tests only)."""
    path = str(tmp_path_factory.mktemp("lpips") / "lpips_stamped.npz")
    lpips_lib.save_weights(
        path,
        lpips_lib.random_weights(np.random.default_rng(0)),
        provenance=lpips_lib.EXPORT_PROVENANCE,
    )
    return path


def _fn(path):
    return lpips_lib.make_lpips_fn(path, require_export_provenance=False)


class TestLpips:
    def test_identity_zero_and_positive(self, weights_path):
        fn = _fn(weights_path)
        rng = np.random.default_rng(1)
        x = rng.uniform(size=(48, 48, 3)).astype(np.float32)
        y = rng.uniform(size=(48, 48, 3)).astype(np.float32)
        assert fn(x, x) == pytest.approx(0.0, abs=1e-6)
        d = fn(x, y)
        assert d > 0
        # Symmetric: the distance is a squared feature difference.
        assert fn(y, x) == pytest.approx(d, rel=1e-4)

    def test_monotone_in_perturbation(self, weights_path):
        fn = _fn(weights_path)
        rng = np.random.default_rng(2)
        x = rng.uniform(0.2, 0.8, size=(48, 48, 3)).astype(np.float32)
        noise = rng.normal(size=x.shape).astype(np.float32)
        d_small = fn(x, x + 0.01 * noise)
        d_big = fn(x, x + 0.1 * noise)
        assert 0 < d_small < d_big

    def test_batch_axis(self, weights_path):
        weights = lpips_lib.load_weights(
            weights_path, require_export_provenance=False
        )
        rng = np.random.default_rng(3)
        x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        y = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        d = float(lpips_lib.lpips_distance(weights, x, y))
        d0 = float(lpips_lib.lpips_distance(weights, x[0], y[0]))
        d1 = float(lpips_lib.lpips_distance(weights, x[1], y[1]))
        assert d == pytest.approx(0.5 * (d0 + d1), rel=1e-4)

    def test_missing_weights_is_loud(self, tmp_path):
        with pytest.raises(ValueError, match="export_lpips_weights"):
            lpips_lib.load_weights(str(tmp_path / "nope.npz"))

    def test_incomplete_weights_is_loud(self, tmp_path):
        path = str(tmp_path / "partial.npz")
        w = lpips_lib.random_weights(np.random.default_rng(0))
        del w["lin4/weight"]
        lpips_lib.save_weights(path, w)
        with pytest.raises(ValueError, match="missing keys"):
            lpips_lib.load_weights(path, require_export_provenance=False)

    def test_unstamped_weights_refused_by_default(self, weights_path):
        # The r2 gap: a random-weights fixture in the weights path must not
        # silently become a reported "LPIPS" — provenance is checked unless
        # a plumbing test explicitly opts out.
        with pytest.raises(ValueError, match="provenance"):
            lpips_lib.load_weights(weights_path)
        with pytest.raises(ValueError, match="provenance"):
            lpips_lib.make_lpips_fn(weights_path)

    def test_metric_suite_refuses_unstamped(self, weights_path):
        with pytest.raises(ValueError, match="provenance"):
            metrics_lib.MetricSuite(
                compute_ssim=False,
                compute_lpips=True,
                lpips_weights=weights_path,
            )

    def test_metric_suite_wiring(self, stamped_path, monkeypatch):
        suite = metrics_lib.MetricSuite(
            compute_ssim=False, compute_lpips=True, lpips_weights=stamped_path
        )
        rng = np.random.default_rng(4)
        pred = rng.uniform(size=(48, 48, 3)).astype(np.float32)
        out = suite(pred, pred)
        assert out["lpips"] == pytest.approx(0.0, abs=1e-6)
        # env-var path resolution
        monkeypatch.setenv("ONDT_LPIPS_WEIGHTS", stamped_path)
        assert lpips_lib.default_weights_path() == stamped_path

    def test_metric_suite_raises_without_weights(self, monkeypatch, tmp_path):
        monkeypatch.setenv("ONDT_LPIPS_WEIGHTS", str(tmp_path / "absent.npz"))
        with pytest.raises(ValueError, match="LPIPS weights"):
            metrics_lib.MetricSuite(compute_lpips=True)
