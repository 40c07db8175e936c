"""Tests for data.preprocess, the Blender loader, and the metric writer."""

import json
import os

import numpy as np
import pytest

from outdoor_nerf_depth_tpu.data import colmap, preprocess


def _write_toy_model(tmp_path, n_images=5):
    from tests.test_data import _toy_model

    cams, images, points = _toy_model()
    d = str(tmp_path / "sparse0")
    os.makedirs(d, exist_ok=True)
    colmap.write_cameras_bin(cams, os.path.join(d, "cameras.bin"))
    colmap.write_images_bin(images, os.path.join(d, "images.bin"))
    colmap.write_points3d_bin(points, os.path.join(d, "points3D.bin"))
    return d, images


class TestUnitSphereTransform:
    def test_all_centers_inside(self):
        rng = np.random.default_rng(0)
        centers = rng.normal(0, 50, (20, 3)) + 100
        c, s = preprocess.unit_sphere_transform(centers)
        normalized = (centers - c) / s
        assert np.linalg.norm(normalized, axis=-1).max() < 1.0


class TestNerfppExport:
    def test_layout_and_poses(self, tmp_path):
        sparse, images = _write_toy_model(tmp_path)
        img_dir = str(tmp_path / "images")
        os.makedirs(img_dir)
        out = str(tmp_path / "scene")
        center, scale = preprocess.export_nerfpp_layout(
            sparse, img_dir, out, log_fn=lambda *_: None
        )
        pose_dir = os.path.join(out, "train", "pose")
        intr_dir = os.path.join(out, "train", "intrinsics")
        assert len(os.listdir(pose_dir)) == len(images)
        assert os.path.exists(os.path.join(out, "scale"))

        # Normalized camera centers must lie inside the unit sphere.
        for f in os.listdir(pose_dir):
            c2w = np.loadtxt(os.path.join(pose_dir, f)).reshape(4, 4)
            assert np.linalg.norm(c2w[:3, 3]) < 1.0
            K = np.loadtxt(os.path.join(intr_dir, f)).reshape(4, 4)
            assert K[0, 0] > 0 and K[3, 3] == 1.0

        scale_val = float(open(os.path.join(out, "scale")).read())
        np.testing.assert_allclose(scale_val, 1.0 / scale, rtol=1e-6)

    def test_frusta_export_and_plot(self, tmp_path):
        sparse, images = _write_toy_model(tmp_path)
        out_json = str(tmp_path / "frusta.json")
        n = preprocess.export_camera_frusta_json(sparse, out_json)
        assert n == len(images)
        data = json.load(open(out_json))
        assert len(data["frusta"][0]["corners"]) == 5

        from outdoor_nerf_depth_tpu.utils import vis

        out_png = str(tmp_path / "frusta.png")
        vis.plot_camera_frusta(out_json, out_png)
        assert os.path.getsize(out_png) > 0


class TestRunColmapGuard:
    def test_missing_binary_raises(self, tmp_path):
        import shutil

        if shutil.which("colmap") is not None:
            pytest.skip("colmap installed")
        with pytest.raises(FileNotFoundError):
            preprocess.run_colmap(str(tmp_path), str(tmp_path / "w"))


class TestBlenderDataset:
    def test_load(self, tmp_path):
        from outdoor_nerf_depth_tpu.data import datasets
        from outdoor_nerf_depth_tpu.utils.image import save_img_u8

        rng = np.random.default_rng(1)
        scene = str(tmp_path)
        os.makedirs(os.path.join(scene, "train"))
        frames = []
        for i in range(3):
            name = f"train/r_{i}"
            rgba = np.concatenate(
                [rng.uniform(size=(8, 10, 3)), np.ones((8, 10, 1)) * 0.5], -1
            )
            save_img_u8(rgba, os.path.join(scene, name + ".png"))
            pose = np.eye(4)
            pose[:3, 3] = [0, 0, 4 - i * 0.1]
            frames.append({"file_path": name, "transform_matrix": pose.tolist()})
        with open(os.path.join(scene, "transforms_train.json"), "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)

        ds = datasets.BlenderDataset(scene, "train", global_batch_size=16)
        assert ds.images.shape == (3, 8, 10, 3)
        # Alpha 0.5 over white: channels pulled toward 1.
        assert ds.images.min() >= 0.2
        batch = ds.sample_batch()
        assert batch.rgb.shape == (16, 3)


class TestMetricWriter:
    def test_jsonl_and_images(self, tmp_path):
        from outdoor_nerf_depth_tpu.utils.logging import MetricWriter

        w = MetricWriter(str(tmp_path), use_tensorboard=False)
        w.scalars(1, {"loss": 0.5, "psnr": 21.0}, prefix="train")
        w.scalars(2, {"loss": 0.4})
        w.image(1, "render", np.random.default_rng(0).uniform(size=(4, 6, 3)),
                out_dir=str(tmp_path / "imgs"))
        w.close()
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["train/loss"] == 0.5 and lines[1]["loss"] == 0.4
        assert os.path.exists(tmp_path / "imgs" / "render_000001.png")
