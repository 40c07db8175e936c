"""The KITTI fixture generator must produce scenes both KITTI loaders
consume with geometrically consistent poses/intrinsics/depths — so
`configs/kitti_*.json` run unmodified the moment real data lands."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kitti_fixture"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "make_kitti_fixture.py"),
         out, "20"],
        capture_output=True, text=True, cwd=root,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return out


def _reproject_check(ds, i_a, i_b, max_color_err=0.25, min_checked=5):
    """Backproject valid-depth pixels from view A, reproject into view B
    via the loader's own cameras, and compare colors (surface shading is
    view-independent in the analytic scene)."""
    from outdoor_nerf_depth_tpu.data import cameras as cameras_lib
    from outdoor_nerf_depth_tpu.data import rays as rays_lib

    ba = ds.image_batch(i_a)
    o = np.asarray(ba.rays.origins)
    d = np.asarray(ba.rays.viewdirs)
    t = np.asarray(ba.depth_gt)
    h, w = t.shape

    bb = ds.image_batch(i_b)
    ob = np.asarray(bb.rays.origins)
    db = np.asarray(bb.rays.viewdirs)
    tb = np.asarray(bb.depth_gt)
    cam_b = ob[0, 0]  # pinhole: all origins equal

    checked = 0
    for py in range(5, h - 5, max(1, h // 8)):
        for px in range(5, w - 5, max(1, w // 16)):
            if t[py, px] <= 0:
                continue
            pt = o[py, px] + t[py, px] * d[py, px]
            # Find view B's pixel whose ray passes closest to pt by brute
            # force over a candidate row band (robust, convention-free).
            rel = pt - cam_b
            dist_b = np.linalg.norm(rel)
            dirs = db.reshape(-1, 3)
            cos = (dirs @ rel) / np.maximum(dist_b, 1e-9)
            j = int(np.argmax(cos))
            if cos[j] < 0.99999:  # pt not in view B's frustum sampling
                continue
            jy, jx = j // w, j % w
            tb_j = tb[jy, jx]
            if tb_j <= 0 or abs(tb_j - dist_b) > 0.05 * dist_b:
                continue  # occluded or different surface
            ca = np.asarray(ba.rgb)[py, px]
            cb = np.asarray(bb.rgb)[jy, jx]
            assert np.abs(ca - cb).max() < max_color_err, (py, px, ca, cb)
            checked += 1
    assert checked >= min_checked, f"only {checked} covisible points"


class TestDrivingFixture:
    def test_loader_and_geometry(self, fixture_dir):
        from outdoor_nerf_depth_tpu.data.datasets import DrivingSceneDataset

        ds = DrivingSceneDataset(
            os.path.join(fixture_dir, "dtu_format"), "train",
            global_batch_size=16, near=0.1, far=150.0,
        )
        assert ds.n_images == 18  # 20 - 2 test views
        assert ds.scene_scale > 0
        t = np.asarray(ds.image_batch(0).depth_gt)
        assert (t > 0).mean() > 0.15  # lower half: road+objects; sky is invalid
        _reproject_check(ds, 0, 1)

    def test_prior_folders_load(self, fixture_dir):
        from outdoor_nerf_depth_tpu.data.datasets import DrivingSceneDataset

        ds = DrivingSceneDataset(
            os.path.join(fixture_dir, "dtu_format"), "train",
            global_batch_size=16, depth_sup_type="stereo_crop",
        )
        sup = np.asarray(ds.image_batch(0).depth_sup)
        gt = np.asarray(ds.image_batch(0).depth_gt)
        both = (sup > 0) & (gt > 0)
        assert both.mean() > 0.1
        # The stereo prior is gt + 0.15m noise (in scene units after scale).
        err = np.abs(sup[both] - gt[both]) / ds.scene_scale
        assert err.mean() < 0.5

    def test_kitti_ngp_config_runs(self, fixture_dir):
        from outdoor_nerf_depth_tpu.train.config import load_config
        from outdoor_nerf_depth_tpu.train.loop import build_dataset

        config = load_config(
            "configs/kitti_ngp.json",
            [f"scene_dir={fixture_dir}/dtu_format", "batch_size=32"],
        )
        ds = build_dataset(config, "train")
        batch = ds.sample_batch()
        assert batch.rgb.shape == (32, 3)
        assert batch.depth_sup is not None


class TestNerfppFixture:
    def test_loader_and_geometry(self, fixture_dir):
        from outdoor_nerf_depth_tpu.data.datasets import NerfppSceneDataset

        ds = NerfppSceneDataset(
            os.path.join(fixture_dir, "nerfpp"), "train",
            global_batch_size=16,
        )
        assert ds.n_images == 18
        # Cameras normalized into the unit sphere (NeRF++ requirement).
        batch = ds.image_batch(0)
        assert np.linalg.norm(np.asarray(batch.rays.origins)[0, 0]) < 1.0
        _reproject_check(ds, 0, 1)

    def test_kitti_nerfpp_config_runs(self, fixture_dir):
        from outdoor_nerf_depth_tpu.train.config import load_config
        from outdoor_nerf_depth_tpu.train.loop import build_dataset

        config = load_config(
            "configs/kitti_nerfpp.json",
            [f"scene_dir={fixture_dir}/nerfpp", "batch_size=32"],
        )
        ds = build_dataset(config, "train")
        batch = ds.sample_batch()
        assert batch.rgb.shape == (32, 3)
