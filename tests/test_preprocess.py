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


class TestTxtModelRoundTrip:
    def test_write_read_txt(self, tmp_path):
        from outdoor_nerf_depth_tpu.data import colmap
        from tests.test_data import _toy_model

        cams, images, points = _toy_model()
        d = str(tmp_path)
        colmap.write_model_txt(cams, images, points, d)
        cams2 = colmap.read_cameras_txt(os.path.join(d, "cameras.txt"))
        images2 = colmap.read_images_txt(os.path.join(d, "images.txt"))
        points2 = colmap.read_points3d_txt(os.path.join(d, "points3D.txt"))
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        for i in images:
            np.testing.assert_allclose(images2[i].qvec, images[i].qvec)
            np.testing.assert_allclose(images2[i].tvec, images[i].tvec)
            assert images2[i].name == images[i].name
        for p in points:
            np.testing.assert_allclose(points2[p].xyz, points[p].xyz)
            np.testing.assert_array_equal(points2[p].image_ids,
                                          points[p].image_ids)


class TestColmapDatabase:
    def test_camera_and_image_round_trip(self, tmp_path):
        from outdoor_nerf_depth_tpu.data import colmap_db

        path = str(tmp_path / "db.db")
        with colmap_db.ColmapDatabase(path) as db:
            params = np.array([50.0, 52.0, 32.0, 24.0])
            cid = db.add_camera("PINHOLE", 64, 48, params)
            iid = db.add_image("a.png", cid, qvec=[1.0, 0, 0, 0],
                               tvec=[0.5, 0, -1.0])
            db.add_image("b.png", cid)
        with colmap_db.ColmapDatabase(path) as db:
            np.testing.assert_allclose(db.read_camera_params(cid), params)
            ids = db.image_ids_by_name()
            assert ids["a.png"] == iid and "b.png" in ids

    def test_pair_id_round_trip(self):
        from outdoor_nerf_depth_tpu.data import colmap_db

        pid = colmap_db.pair_id(7, 3)
        assert colmap_db.pair_id_to_image_ids(pid) == (3, 7)
        assert colmap_db.pair_id(3, 7) == pid


class TestPosedDatabase:
    def test_pose_priors_stored_as_w2c(self, tmp_path):
        import sqlite3

        from outdoor_nerf_depth_tpu.data import colmap, preprocess
        from tests.test_data import _rand_rotation

        rng = np.random.default_rng(40)
        n = 3
        poses = np.stack([
            np.concatenate([_rand_rotation(rng), rng.normal(size=(3, 1))], 1)
            for _ in range(n)
        ])
        K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
        path = str(tmp_path / "db.db")
        ids = preprocess.build_posed_database(
            path, [f"{i}.png" for i in range(n)], K, 64, 48, poses
        )
        assert len(ids) == n
        conn = sqlite3.connect(path)
        for i in range(n):
            row = conn.execute(
                "SELECT prior_qw, prior_qx, prior_qy, prior_qz, prior_tx, "
                "prior_ty, prior_tz FROM images WHERE name=?", (f"{i}.png",)
            ).fetchone()
            w2c = np.linalg.inv(np.vstack([poses[i], [0, 0, 0, 1]]))
            np.testing.assert_allclose(
                colmap.quaternion_to_rotation(np.array(row[:4])),
                w2c[:3, :3], atol=1e-8,
            )
            np.testing.assert_allclose(row[4:], w2c[:3, 3], atol=1e-10)
        conn.close()


class TestExtractSfm:
    def test_json_dump(self, tmp_path):
        from outdoor_nerf_depth_tpu.data import colmap, preprocess
        from tests.test_data import _toy_model

        cams, images, points = _toy_model()
        d = str(tmp_path)
        colmap.write_model_txt(cams, images, points, d)
        out = str(tmp_path / "sfm.json")
        n = preprocess.extract_sfm_json(d, out)
        assert n == len(images)
        data = json.load(open(out))
        assert len(data["points"]) == len(points)
        first = next(iter(data["images"].values()))
        assert np.asarray(first["W2C"]).shape == (4, 4)


class TestEpipolarGeometry:
    def test_correspondences_lie_on_epipolar_lines(self):
        from outdoor_nerf_depth_tpu.data import cameras
        from tests.test_data import _rand_rotation

        rng = np.random.default_rng(41)
        K = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
        w2c1 = np.eye(4)
        w2c2 = np.eye(4)
        w2c2[:3, :3] = _rand_rotation(rng)
        w2c2[:3, 3] = rng.normal(size=3)
        F = cameras.fundamental_matrix(K, w2c1, K, w2c2)
        pts = rng.normal(size=(20, 3)) * 2 + np.array([0, 0, 6.0])
        for X in pts:
            x1 = K @ X
            x1 = x1[:2] / x1[2]
            Xc2 = (w2c2 @ np.append(X, 1.0))[:3]
            x2 = K @ Xc2
            x2 = x2[:2] / x2[2]
            line = cameras.epipolar_line(x1, F)
            dist = abs(line[0] * x2[0] + line[1] * x2[1] + line[2])
            assert dist < 1e-6
