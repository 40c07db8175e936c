"""Tests for the data layer: COLMAP IO roundtrip, cameras, datasets."""

import os

import numpy as np
import pytest

from outdoor_nerf_depth_tpu.data import cameras, colmap, datasets, rays


def _toy_model():
    cams = {
        1: colmap.Camera(1, "PINHOLE", 64, 48, np.array([60.0, 62.0, 32.0, 24.0]))
    }
    rng = np.random.default_rng(0)
    images = {}
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        images[i] = colmap.Image(
            i, q, rng.normal(size=3), 1, f"img_{i:03d}.png",
            rng.uniform(0, 64, (5, 2)), np.arange(5, dtype=np.int64),
        )
    points = {
        10 + j: colmap.Point3D(
            10 + j, rng.normal(size=3), (rng.uniform(0, 255, 3)).astype(np.uint8),
            0.5, np.array([1, 2], np.int32), np.array([0, 1], np.int32),
        )
        for j in range(7)
    }
    return cams, images, points


class TestColmapIO:
    def test_bin_roundtrip(self, tmp_path):
        cams, images, points = _toy_model()
        d = str(tmp_path)
        colmap.write_cameras_bin(cams, os.path.join(d, "cameras.bin"))
        colmap.write_images_bin(images, os.path.join(d, "images.bin"))
        colmap.write_points3d_bin(points, os.path.join(d, "points3D.bin"))
        cams2, images2, points2 = colmap.read_model(d, load_points=True)
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        assert cams2[1].model == "PINHOLE"
        for i in images:
            np.testing.assert_allclose(images2[i].qvec, images[i].qvec)
            np.testing.assert_allclose(images2[i].tvec, images[i].tvec)
            assert images2[i].name == images[i].name
            np.testing.assert_allclose(images2[i].xys, images[i].xys)
        for p in points:
            np.testing.assert_allclose(points2[p].xyz, points[p].xyz)

    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            R = colmap.quaternion_to_rotation(q)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
            np.testing.assert_allclose(colmap.rotation_to_quaternion(R), q, atol=1e-8)

    def test_load_scene_poses_invert_extrinsics(self, tmp_path):
        cams, images, points = _toy_model()
        d = str(tmp_path)
        colmap.write_cameras_bin(cams, os.path.join(d, "cameras.bin"))
        colmap.write_images_bin(images, os.path.join(d, "images.bin"))
        colmap.write_points3d_bin(points, os.path.join(d, "points3D.bin"))
        names, poses, pixtocam, dist, camtype, _ = colmap.load_scene(d)
        assert camtype == "perspective" and dist is None
        # Camera center must be invariant: c2w @ origin == -R^T t.
        for i, key in enumerate(images):
            im = images[key]
            want_center = -im.rotation().T @ im.tvec
            np.testing.assert_allclose(poses[i][:3, 3], want_center, atol=1e-8)
        # Intrinsics: pixtocam @ (cx, cy, 1) == optical axis.
        np.testing.assert_allclose(pixtocam @ [32.0, 24.0, 1.0], [0, 0, 1], atol=1e-8)


class TestPixelsToRays:
    def _setup(self):
        pixtocam = cameras.pinhole_pixtocam(50.0, 64, 48)
        c2w = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], axis=1)
        return pixtocam, c2w

    def test_center_pixel_points_backward(self):
        pixtocam, c2w = self._setup()
        # Principal point: (w/2-0.5, h/2-0.5) center offsets to exactly cx, cy.
        o, d, v, r, _ = cameras.pixels_to_rays(
            np.array([31.5]), np.array([23.5]), pixtocam, c2w
        )
        np.testing.assert_allclose(o[0], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(v[0], [0.0, 0.0, -1.0], atol=1e-7)

    def test_radii_match_pixel_footprint(self):
        pixtocam, c2w = self._setup()
        px, py = cameras.pixel_grid(64, 48)
        o, d, v, r, _ = cameras.pixels_to_rays(px, py, pixtocam, c2w)
        # For a pinhole at focal 50, neighbor-direction offset is 1/50.
        np.testing.assert_allclose(r, (1.0 / 50.0) * 2 / np.sqrt(12), rtol=1e-5)

    def test_undistort_identity_when_zero_coeffs(self):
        x = np.linspace(-0.5, 0.5, 11)
        ux, uy = cameras._undistort(x, x, {"k1": 0.0})
        np.testing.assert_allclose(ux, x, atol=1e-10)

    def test_undistort_inverts_distortion(self):
        k = {"k1": 0.1, "k2": 0.01, "p1": 0.001, "p2": -0.002}
        x = np.linspace(-0.4, 0.4, 9)
        y = np.linspace(-0.3, 0.3, 9)
        r = x * x + y * y
        d = 1 + k["k1"] * r + k["k2"] * r**2
        xd = d * x + 2 * k["p1"] * x * y + k["p2"] * (r + 2 * x * x)
        yd = d * y + 2 * k["p2"] * x * y + k["p1"] * (r + 2 * y * y)
        ux, uy = cameras._undistort(xd, yd, k)
        np.testing.assert_allclose(ux, x, atol=1e-7)
        np.testing.assert_allclose(uy, y, atol=1e-7)


class TestPoseNormalization:
    def test_pca_fits_unit_cube_and_reports_scale(self):
        rng = np.random.default_rng(2)
        poses = np.stack(
            [
                cameras.view_matrix(rng.normal(size=3), np.array([0.0, 0, 1]), p)
                for p in rng.normal(size=(12, 3)) * 40.0 + 100.0
            ]
        )
        new_poses, transform = cameras.normalize_poses_pca(poses)
        assert np.abs(new_poses[:, :3, 3]).max() <= 1.0 + 1e-6
        scale = cameras.pose_scale(transform)
        # Distances between camera centers shrink by exactly `scale`.
        d_old = np.linalg.norm(poses[0, :3, 3] - poses[1, :3, 3])
        d_new = np.linalg.norm(new_poses[0, :3, 3] - new_poses[1, :3, 3])
        np.testing.assert_allclose(d_new / d_old, scale, rtol=1e-6)

    def test_min_norm_normalization(self):
        rng = np.random.default_rng(3)
        poses = np.stack(
            [
                cameras.view_matrix(rng.normal(size=3), np.array([0.0, 0, 1]), p)
                for p in rng.normal(size=(8, 3)) * 10.0
            ]
        )
        new_poses, scale = cameras.normalize_poses_min_norm(poses)
        norms = np.linalg.norm(new_poses[:, :3, 3], axis=-1)
        np.testing.assert_allclose(norms.min(), 1.0, rtol=1e-6)


class TestDepthDecode:
    def test_basic_decode(self):
        raw = np.array([[0.0, 1.0, 512.0, 25600.0]])
        d = datasets.decode_depth_png(raw, scene_scale=2.0)
        assert d[0, 0] < 0 and d[0, 1] < 0  # below-threshold -> invalid
        np.testing.assert_allclose(d[0, 2], 2.0 * 2.0)
        np.testing.assert_allclose(d[0, 3], 100.0 * 2.0)

    def test_crop_range(self):
        raw = np.array([[512.0, 256.0 * 90]])
        d = datasets.decode_depth_png(raw, 1.0, crop_range=80.0)
        assert d[0, 0] > 0 and d[0, 1] < 0

    def test_keep_ratio_density(self):
        rng = np.random.default_rng(4)
        raw = rng.uniform(256, 256 * 70, (200, 300))
        d = datasets.decode_depth_png(raw, 1.0, keep_ratio=0.3, seed=0)
        density = np.count_nonzero(d > 0) / d.size
        np.testing.assert_allclose(density, 0.3, atol=0.02)
        # Deterministic under the same seed.
        d2 = datasets.decode_depth_png(raw, 1.0, keep_ratio=0.3, seed=0)
        np.testing.assert_array_equal(d, d2)


class TestSplits:
    def test_test_split_every_tenth_from_nine(self):
        idx = datasets.split_indices(25, "test")
        np.testing.assert_array_equal(idx, [9, 19])

    def test_train_split_complement_subsampled(self):
        train_full = datasets.split_indices(25, "train", sample_every=1)
        assert 9 not in train_full and 19 not in train_full
        assert len(train_full) == 23
        train_sparse = datasets.split_indices(25, "train", sample_every=4)
        np.testing.assert_array_equal(train_sparse, train_full[::4])


class TestSyntheticDataset:
    def test_train_batch_shapes(self):
        ds = datasets.SyntheticDataset("train", global_batch_size=64)
        batch = ds.sample_batch()
        assert isinstance(batch.rays, rays.Pixels)
        assert batch.rgb.shape == (64, 3)
        assert batch.depth_gt.shape == (64,)
        assert batch.rays.cam_idx.shape == (64, 1)

    def test_host_cast_batch_has_rays(self):
        ds = datasets.SyntheticDataset(
            "train", global_batch_size=32, cast_on_device=False
        )
        batch = ds.sample_batch()
        assert isinstance(batch.rays, rays.Rays)
        assert batch.rays.origins.shape == (32, 3)
        n = np.linalg.norm(np.asarray(batch.rays.viewdirs), axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)

    def test_image_batch_covers_image(self):
        ds = datasets.SyntheticDataset("test", global_batch_size=32)
        batch = ds.image_batch(1)
        assert batch.rgb.shape == (ds.height, ds.width, 3)
        assert isinstance(batch.rays, rays.Rays)
        np.testing.assert_allclose(np.asarray(batch.rgb), ds.images[1])

    def test_deferred_and_host_cast_agree(self):
        ds = datasets.SyntheticDataset("train", global_batch_size=16, seed=7)
        batch = ds.sample_batch()
        cast = cameras.cast_pixels(batch.rays, ds.cameras, ds.camtype)
        ds2 = datasets.SyntheticDataset(
            "train", global_batch_size=16, seed=7, cast_on_device=False
        )
        batch2 = ds2.sample_batch()
        np.testing.assert_allclose(
            np.asarray(cast.origins), np.asarray(batch2.rays.origins), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(cast.directions), np.asarray(batch2.rays.directions), atol=1e-6
        )

    def test_prefetch_iterator(self):
        ds = datasets.SyntheticDataset("train", global_batch_size=16)
        it = datasets.PrefetchIterator(ds.sample_batch)
        batches = [next(it) for _ in range(5)]
        assert len({b.rgb.tobytes() for b in batches}) > 1  # actually random


class TestPadToMultiple:
    def test_pads_and_reports(self):
        tree = {"a": np.ones((10, 3)), "b": np.zeros((10, 1))}
        padded, pad = rays.pad_to_multiple(tree, 8)
        assert pad == 6
        assert padded["a"].shape == (16, 3)
        padded2, pad2 = rays.pad_to_multiple(tree, 5)
        assert pad2 == 0 and padded2 is tree
