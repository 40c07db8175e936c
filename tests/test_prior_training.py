"""Tests for depth-prior datasets and the training driver."""

import os

import numpy as np
import pytest

from outdoor_nerf_depth_tpu.depth_priors import datasets as prior_data
from outdoor_nerf_depth_tpu.utils.image import save_depth_u16, save_img_u8


def _make_stereo_root(tmp_path, n=3, h=64, w=96):
    rng = np.random.default_rng(0)
    for sub in ("left", "right", "disp"):
        os.makedirs(tmp_path / sub)
    for i in range(n):
        name = f"{i:06d}.png"
        save_img_u8(rng.uniform(size=(h, w, 3)), str(tmp_path / "left" / name))
        save_img_u8(rng.uniform(size=(h, w, 3)), str(tmp_path / "right" / name))
        save_depth_u16(rng.uniform(1, 60, (h, w)), str(tmp_path / "disp" / name))
    return str(tmp_path)


def _make_completion_root(tmp_path, n=3, h=64, w=96):
    rng = np.random.default_rng(1)
    for sub in ("image", "sparse", "groundtruth"):
        os.makedirs(tmp_path / sub)
    for i in range(n):
        name = f"{i:06d}.png"
        save_img_u8(rng.uniform(size=(h, w, 3)), str(tmp_path / "image" / name))
        d = rng.uniform(2, 60, (h, w))
        sparse = np.where(rng.uniform(size=d.shape) < 0.1, d, 0.0)
        save_depth_u16(sparse, str(tmp_path / "sparse" / name))
        save_depth_u16(d, str(tmp_path / "groundtruth" / name))
    return str(tmp_path)


class TestStereoPairDataset:
    def test_crop_batch(self, tmp_path):
        root = _make_stereo_root(tmp_path)
        ds = prior_data.StereoPairDataset(root, crop=(32, 48))
        l, r, d = ds.sample_batch(2)
        assert l.shape == (2, 32, 48, 3) and d.shape == (2, 32, 48)
        assert d.max() > 0

    def test_kitti_folder_names(self, tmp_path):
        rng = np.random.default_rng(2)
        for sub in ("image_2", "image_3", "disp_occ_0"):
            os.makedirs(tmp_path / sub)
            save_img_u8(
                rng.uniform(size=(40, 60, 3)), str(tmp_path / sub / "0.png")
            )
        ds = prior_data.StereoPairDataset(str(tmp_path), crop=(32, 48))
        l, r, d = ds.sample_batch(1)
        assert l.shape == (1, 32, 48, 3)

    def test_missing_dirs_raise(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            prior_data.StereoPairDataset(str(tmp_path))


class TestCompletionDataset:
    def test_crop_batch(self, tmp_path):
        root = _make_completion_root(tmp_path)
        ds = prior_data.CompletionDataset(root, crop=(32, 48))
        rgb, sparse, gt = ds.sample_batch(2)
        assert rgb.shape == (2, 32, 48, 3)
        assert (sparse > 0).mean() < 0.5  # sparse is actually sparse
        assert (gt > 0).mean() > 0.9

    def test_batch_with_near_shapes_and_fallback(self, tmp_path):
        root = _make_completion_root(tmp_path)
        ds = prior_data.CompletionDataset(root, crop=(32, 48))
        rgb, sp, gt, near, R, t, succ, K = ds.sample_batch_with_near(2)
        assert rgb.shape == near.shape == (2, 32, 48, 3)
        assert R.shape == (2, 3, 3) and t.shape == (2, 3)
        assert K.shape == (3, 3) and succ.shape == (2,)
        # Random-noise crops rarely match; failed PnP must give identity.
        for b in range(2):
            if succ[b] == 0.0:
                np.testing.assert_allclose(R[b], np.eye(3))
                np.testing.assert_allclose(t[b], 0.0)

    def test_intrinsics_from_file(self, tmp_path):
        root = _make_completion_root(tmp_path)
        want = np.array([[50.0, 0, 20.0], [0, 52.0, 10.0], [0, 0, 1]])
        np.savetxt(os.path.join(root, "K.txt"), want)
        ds = prior_data.CompletionDataset(root, crop=(32, 48))
        np.testing.assert_allclose(ds.intrinsics(32, 48), want)


class TestTrainPriorCli:
    def test_stereo_smoke(self, tmp_path):
        import train_prior

        root = _make_stereo_root(tmp_path / "data")
        out = str(tmp_path / "params.msgpack")
        train_prior.main([
            "stereo", "--data", root, "--steps", "2", "--batch", "1",
            "--crop", "32", "48", "--max-disparity", "32", "--out", out,
            "--print-every", "1", "--cpu",
        ])
        assert os.path.getsize(out) > 1000

    def test_completion_smoke(self, tmp_path):
        import train_prior

        root = _make_completion_root(tmp_path / "data")
        train_prior.main([
            "complete", "--data", root, "--steps", "2", "--batch", "1",
            "--crop", "32", "48", "--print-every", "1", "--cpu",
        ])

    def test_completion_photo_smoke(self, tmp_path):
        import train_prior

        root = _make_completion_root(tmp_path / "data")
        train_prior.main([
            "complete", "--data", root, "--steps", "2", "--batch", "1",
            "--crop", "32", "48", "--print-every", "1", "--cpu", "--photo",
        ])
