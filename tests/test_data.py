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


def _write_nerfpp_scene(root, n_images=3, h=8, w=10, max_depth=50.0):
    """Tiny on-disk NeRF++-layout scene (per-image txt + PNG dirs)."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(11)
    split_dir = os.path.join(root, "train")
    for sub in ("intrinsics", "pose", "rgb", "depth", "min_depth"):
        os.makedirs(os.path.join(split_dir, sub))
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 12.0
    K[0, 2], K[1, 2] = w / 2, h / 2
    min_depth_maps = []
    for i in range(n_images):
        name = f"{i:05d}"
        np.savetxt(os.path.join(split_dir, "intrinsics", name + ".txt"),
                   K.reshape(1, 16))
        pose = np.eye(4)
        pose[:3, 3] = rng.normal(size=3) * 0.1
        np.savetxt(os.path.join(split_dir, "pose", name + ".txt"),
                   pose.reshape(1, 16))
        rgb = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        PILImage.fromarray(rgb).save(os.path.join(split_dir, "rgb", name + ".png"))
        depth = (rng.uniform(2, 40, (h, w)) * 256).astype(np.uint16)
        PILImage.fromarray(depth).save(
            os.path.join(split_dir, "depth", name + ".png"))
        md = (rng.uniform(0.1, 0.9, (h, w)) * 255).astype(np.uint8)
        min_depth_maps.append(md)
        PILImage.fromarray(md).save(
            os.path.join(split_dir, "min_depth", name + ".png"))
    with open(os.path.join(split_dir, "max_depth.txt"), "w") as f:
        f.write(str(max_depth))
    with open(os.path.join(root, "scale"), "w") as f:
        f.write("0.02")
    return np.stack(min_depth_maps)


class TestNerfppSceneDataset:
    def test_loads_scene_and_scales_depth(self, tmp_path):
        _write_nerfpp_scene(str(tmp_path))
        ds = datasets.NerfppSceneDataset(str(tmp_path), "train", 16)
        assert ds.images.shape == (3, 8, 10, 3)
        assert ds.scene_scale == pytest.approx(0.02)
        valid = ds.depth_gt[ds.depth_gt > 0]
        # uint16/256 in [2, 40] m, x scale 0.02.
        assert valid.min() >= 2.0 * 0.02 - 1e-3
        assert valid.max() <= 40.0 * 0.02 + 1e-3

    def test_min_depth_becomes_per_ray_near(self, tmp_path):
        md = _write_nerfpp_scene(str(tmp_path), max_depth=50.0)
        ds = datasets.NerfppSceneDataset(str(tmp_path), "train", 16)
        batch = ds.sample_batch()
        px = np.asarray(batch.rays.pix_x).astype(np.int64)
        py = np.asarray(batch.rays.pix_y).astype(np.int64)
        ci = np.asarray(batch.rays.cam_idx)[..., 0]
        want = md[ci, py, px] / 255.0 * 50.0 + 1e-4
        np.testing.assert_allclose(np.asarray(batch.rays.near)[..., 0], want,
                                   rtol=1e-5)
        # And it survives ray casting into Rays.near.
        cast = cameras.cast_pixels(batch.rays, ds.cameras, ds.camtype)
        np.testing.assert_allclose(np.asarray(cast.near)[..., 0], want, rtol=1e-5)

    def test_near_constant_without_min_depth(self):
        ds = datasets.SyntheticDataset("train", global_batch_size=8)
        batch = ds.sample_batch()
        np.testing.assert_allclose(np.asarray(batch.rays.near), ds.near)


class TestRenderPaths:
    def _ring_poses(self, n=12, radius=3.0):
        poses = []
        for i in range(n):
            ang = 2 * np.pi * i / n
            pos = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.5])
            poses.append(cameras.view_matrix(pos, np.array([0.0, 0, 1]), pos))
        return np.stack(poses)

    def test_ellipse_path_count_and_orthonormal(self):
        poses = self._ring_poses()
        path = cameras.generate_ellipse_path(poses, n_frames=30)
        assert path.shape == (30, 3, 4)
        for p in path[::7]:
            np.testing.assert_allclose(p[:3, :3].T @ p[:3, :3], np.eye(3),
                                       atol=1e-8)

    def test_spiral_path_orbits_focus(self):
        poses = self._ring_poses()
        path = cameras.generate_spiral_path(poses, (0.5, 20.0), n_frames=24)
        assert path.shape == (24, 3, 4)
        for p in path[::5]:
            np.testing.assert_allclose(p[:3, :3].T @ p[:3, :3], np.eye(3),
                                       atol=1e-8)
        # Positions stay near the 90th-percentile radii of the inputs.
        assert np.abs(path[:, :3, 3]).max() <= np.abs(poses[:, :3, 3]).max() * 1.5

    def test_spline_path_interpolates_keyframes(self):
        poses = self._ring_poses(n=6)
        path = cameras.generate_spline_path(poses, n_interp=8, smoothness=0.0)
        assert path.shape == (8 * 5, 3, 4)
        # Exact interpolation (s=0): first output pose ~ first keyframe.
        np.testing.assert_allclose(path[0, :3, 3], poses[0, :3, 3], atol=1e-6)
        for p in path[::11]:
            np.testing.assert_allclose(p[:3, :3].T @ p[:3, :3], np.eye(3),
                                       atol=1e-7)
        # Path positions are continuous: no jumps bigger than the keyframe gap.
        jumps = np.linalg.norm(np.diff(path[:, :3, 3], axis=0), axis=-1)
        gaps = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=-1)
        assert jumps.max() < gaps.max()


def _save_png(arr, path):
    from PIL import Image as PILImage

    PILImage.fromarray(arr).save(path)


def _rand_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class TestDecomposeProjection:
    def test_round_trip(self):
        rng = np.random.default_rng(21)
        for _ in range(10):
            K = np.array([[40.0, 0.5, 16.0], [0, 42.0, 12.0], [0, 0, 1.0]])
            R = _rand_rotation(rng)
            t = rng.normal(size=3)
            P = K @ np.concatenate([R, t[:, None]], axis=1)
            K2, R2, center2 = datasets.decompose_projection(P * 3.7)
            np.testing.assert_allclose(K2, K, atol=1e-8)
            np.testing.assert_allclose(R2, R, atol=1e-8)
            np.testing.assert_allclose(center2, -R.T @ t, atol=1e-8)


class TestTanksAndTemplesFVS:
    def test_loads_pyramid_level_and_splits(self, tmp_path):
        rng = np.random.default_rng(22)
        base = os.path.join(str(tmp_path), "dense", "ibr3d_pw_0.25")
        os.makedirs(base)
        n = 10
        for i in range(n):
            img = (rng.uniform(size=(6, 8, 3)) * 255).astype(np.uint8)
            _save_png(img, os.path.join(base, f"im_{i:08d}.png"))
        Ks = np.tile(np.array([[7.0, 0, 4.0], [0, 7.0, 3.0], [0, 0, 1]]), (n, 1, 1))
        Rs = np.stack([_rand_rotation(rng) for _ in range(n)])
        ts = rng.normal(size=(n, 3))
        for name, arr in (("Ks", Ks), ("Rs", Rs), ("ts", ts)):
            np.save(os.path.join(base, f"{name}.npy"), arr)
        train = datasets.TanksAndTemplesFVSDataset(str(tmp_path), "train", 16)
        test = datasets.TanksAndTemplesFVSDataset(str(tmp_path), "test", 16)
        assert train.n_images == 8 and test.n_images == 2  # llffhold=8 on 10
        assert train.images.shape == (8, 6, 8, 3)
        # Poses normalized into the unit cube.
        assert np.abs(train.camtoworlds[:, :3, 3]).max() <= 1.0 + 1e-5
        batch = train.sample_batch()
        assert batch.rgb.shape == (16, 3)


class TestDTUDataset:
    def test_loads_and_decomposes(self, tmp_path):
        rng = np.random.default_rng(23)
        scan = os.path.join(str(tmp_path), "scan1")
        cal = os.path.join(scan, "cal18")
        os.makedirs(cal)
        n = 9
        K = np.array([[30.0, 0, 8.0], [0, 30.0, 6.0], [0, 0, 1.0]])
        for i in range(1, n + 1):
            img = (rng.uniform(size=(12, 16, 3)) * 255).astype(np.uint8)
            _save_png(img, os.path.join(scan, f"rect_{i:03d}_max.png"))
            R = _rand_rotation(rng)
            t = rng.normal(size=3)
            P = K @ np.concatenate([R, t[:, None]], axis=1)
            np.savetxt(os.path.join(cal, f"pos_{i:03d}.txt"), P)
        train = datasets.DTUDataset(scan, "train", 8)
        test = datasets.DTUDataset(scan, "test", 8)
        assert train.n_images + test.n_images == n
        assert test.n_images == 2  # idx 0, 8 of 9
        assert np.abs(train.camtoworlds[:, :3, 3]).max() <= 1.0 + 1e-5
        batch = train.sample_batch()
        assert batch.rgb.shape == (8, 3)


class TestNSVFDataset:
    def test_loads_and_normalizes_bbox(self, tmp_path):
        rng = np.random.default_rng(24)
        d = str(tmp_path)
        os.makedirs(os.path.join(d, "rgb"))
        os.makedirs(os.path.join(d, "pose"))
        np.savetxt(os.path.join(d, "intrinsics.txt"),
                   np.array([[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1.0]]))
        np.savetxt(os.path.join(d, "bbox.txt"),
                   np.array([[-2.0, -2, -2, 2, 2, 2, 0.1]]))
        for split_prefix, count in (("0_", 4), ("1_", 2)):
            for i in range(count):
                img = (rng.uniform(size=(12, 16, 4)) * 255).astype(np.uint8)
                _save_png(img, os.path.join(d, "rgb", f"{split_prefix}{i:04d}.png"))
                pose = np.eye(4)
                pose[:3, 3] = rng.normal(size=3)
                np.savetxt(os.path.join(d, "pose", f"{split_prefix}{i:04d}.txt"), pose)
        train = datasets.NSVFDataset(d, "train", 8)
        test = datasets.NSVFDataset(d, "test", 8)
        assert train.n_images == 4 and test.n_images == 2
        assert train.images.shape == (4, 12, 16, 3)  # RGBA composited
        assert train.scale == pytest.approx(2.0 * 1.05)
        batch = train.sample_batch()
        assert batch.rgb.shape == (8, 3)


class TestRTMVDataset:
    def test_loads_json_cameras(self, tmp_path):
        import json

        rng = np.random.default_rng(25)
        d = str(tmp_path)
        os.makedirs(os.path.join(d, "images"))
        n = 8
        for i in range(n):
            c2w = np.eye(4)
            c2w[:3, :3] = _rand_rotation(rng)
            c2w[:3, 3] = rng.normal(size=3)
            meta = {
                "camera_data": {
                    "cam2world": c2w.T.tolist(),
                    "intrinsics": {"fx": 20.0, "fy": 20.0, "cx": 8.0, "cy": 6.0},
                    "width": 16,
                    "height": 12,
                    "scene_center_3d_box": [0.0, 0, 0],
                    "scene_min_3d_box": [-1.0, -1, -1],
                    "scene_max_3d_box": [1.0, 1, 1],
                }
            }
            with open(os.path.join(d, f"{i:05d}.json"), "w") as f:
                json.dump(meta, f)
            img = (rng.uniform(size=(12, 16, 3)) * 255).astype(np.uint8)
            _save_png(img, os.path.join(d, "images", f"{i:05d}.png"))
        ds = datasets.RTMVDataset(d, "all", 8)
        assert ds.n_images == n
        assert ds.images.shape == (n, 12, 16, 3)
        # OpenGL flip applied: rotation determinant stays +1.
        dets = np.linalg.det(ds.camtoworlds[:, :3, :3])
        np.testing.assert_allclose(dets, 1.0, atol=1e-5)
        batch = ds.sample_batch()
        assert batch.rgb.shape == (8, 3)


class TestPadToMultiple:
    def test_pads_and_reports(self):
        tree = {"a": np.ones((10, 3)), "b": np.zeros((10, 1))}
        padded, pad = rays.pad_to_multiple(tree, 8)
        assert pad == 6
        assert padded["a"].shape == (16, 3)
        padded2, pad2 = rays.pad_to_multiple(tree, 5)
        assert pad2 == 0 and padded2 is tree


class TestSphereSceneDataset:
    """The analytic multi-view-consistent fixture behind quality_gate.py."""

    def test_deterministic_and_shaped(self):
        from outdoor_nerf_depth_tpu.data.datasets import SphereSceneDataset

        a = SphereSceneDataset("train", global_batch_size=16, n_images=12,
                               height=24, width=32)
        b = SphereSceneDataset("train", global_batch_size=16, n_images=12,
                               height=24, width=32)
        np.testing.assert_array_equal(a.images, b.images)
        np.testing.assert_array_equal(a.depth_gt, b.depth_gt)
        assert a.images.shape == (11, 24, 32, 3)  # 12 - 1 test view
        assert a.images.min() >= 0.0 and a.images.max() <= 1.0

    def test_split_disjoint(self):
        from outdoor_nerf_depth_tpu.data.datasets import SphereSceneDataset

        tr = SphereSceneDataset("train", 16, n_images=20, height=8, width=8)
        te = SphereSceneDataset("test", 16, n_images=20, height=8, width=8)
        assert tr.n_images == 18 and te.n_images == 2  # every 10th from 9

    def test_depth_is_geometrically_consistent(self):
        """Backproject valid-depth pixels to 3D: every point must lie on a
        scene surface (a sphere or the ground disk) and inside the bounds
        the NGP/NeRF++ configurations assume."""
        from outdoor_nerf_depth_tpu.data.datasets import SphereSceneDataset

        ds = SphereSceneDataset("train", 16, n_images=12, height=32,
                                width=48)
        batch = ds.image_batch(0)
        o = np.asarray(batch.rays.origins)
        d = np.asarray(batch.rays.viewdirs)
        t = np.asarray(batch.depth_gt)
        valid = t > 0
        assert valid.mean() > 0.2  # scene covers a decent solid angle
        pts = o[valid] + t[valid][..., None] * d[valid]
        assert np.abs(pts).max() < 0.5 + 1e-5  # inside the NGP cube

        dist_surface = np.full(len(pts), np.inf)
        for c, r in zip(ds._centers, ds._radii):
            dist_surface = np.minimum(
                dist_surface, np.abs(np.linalg.norm(pts - c, axis=-1) - r)
            )
        on_ground = (
            np.abs(pts[:, 2] - ds._ground_z) < 1e-4
        ) & (np.linalg.norm(pts[:, :2], axis=-1) < ds._ground_r)
        assert np.all((dist_surface < 1e-4) | on_ground)

    def test_multi_view_color_consistency(self):
        """Project a surface point seen in view A into view B: colors match
        (Lambertian shading is view-independent by construction)."""
        from outdoor_nerf_depth_tpu.data import cameras as cameras_lib
        from outdoor_nerf_depth_tpu.data.datasets import SphereSceneDataset

        ds = SphereSceneDataset("train", 16, n_images=24, height=48,
                                width=64)
        ba = ds.image_batch(0)
        o = np.asarray(ba.rays.origins)
        d = np.asarray(ba.rays.viewdirs)
        t = np.asarray(ba.depth_gt)

        # Use the adjacent camera (small baseline -> likely co-visible).
        c2w = np.concatenate(
            [ds.camtoworlds[1], np.array([[0, 0, 0, 1]], np.float32)], 0
        )
        w2c = np.linalg.inv(c2w)
        k = np.linalg.inv(ds.pixtocams)

        checked = 0
        for py in range(10, 38, 4):
            for px in range(10, 54, 6):
                if t[py, px] <= 0:
                    continue
                pt = o[py, px] + t[py, px] * d[py, px]
                cam = w2c[:3, :3] @ pt + w2c[:3, 3]
                if -cam[2] < 0.05:
                    continue
                uvw = k @ np.array([cam[0] / -cam[2], -cam[1] / -cam[2], 1.0])
                u, v = uvw[0], uvw[1]
                iu, iv = int(round(u)), int(round(v))
                if not (1 <= iu < 63 and 1 <= iv < 47):
                    continue
                # Occlusion check: view B's depth at that pixel must match
                # the point's distance to camera B.
                tb = np.asarray(ds.image_batch(1).depth_gt)[iv, iu]
                dist_b = np.linalg.norm(pt - c2w[:3, 3])
                if tb <= 0 or abs(tb - dist_b) > 0.02:
                    continue
                ca = ds.images[0, py, px]
                cb = ds.images[1, iv, iu]
                assert np.abs(ca - cb).max() < 0.25, (py, px, ca, cb)
                checked += 1
        assert checked >= 5


class TestSpherePriorEmulation:
    """Depth-prior emulations on the analytic scene (Table-6 sweep axes)."""

    def test_prior_error_ordering(self):
        from outdoor_nerf_depth_tpu.data import datasets as ds

        base = ds.SphereSceneDataset("train", 64, n_images=8)
        stereo = ds.SphereSceneDataset(
            "train", 64, n_images=8, depth_sup_type="stereo_like"
        )
        mono = ds.SphereSceneDataset(
            "train", 64, n_images=8, depth_sup_type="mono_like"
        )
        rgbonly = ds.SphereSceneDataset(
            "train", 64, n_images=8, depth_sup_type="rgbonly"
        )
        gt = base.depth_gt
        valid = gt > 0

        def rmse(sup):
            m = valid & (sup > 0)
            return float(np.sqrt(np.mean((sup[m] - gt[m]) ** 2)))

        assert np.array_equal(base.depth_sup, gt)
        # Noise magnitudes: gt exact < stereo < mono; rgbonly all-invalid.
        assert 0.0 < rmse(stereo.depth_sup) < rmse(mono.depth_sup)
        assert not np.any(rgbonly.depth_sup > 0)
        # Stereo holes: some valid-gt pixels dropped, most kept.
        stereo_valid = stereo.depth_sup > 0
        kept = stereo_valid[valid].mean()
        assert 0.7 < kept < 0.95
        # Determinism.
        stereo2 = ds.SphereSceneDataset(
            "train", 64, n_images=8, depth_sup_type="stereo_like"
        )
        assert np.array_equal(stereo.depth_sup, stereo2.depth_sup)

    def test_sparse_views(self):
        from outdoor_nerf_depth_tpu.data import datasets as ds

        dense = ds.SphereSceneDataset("train", 64, n_images=16)
        sparse = ds.SphereSceneDataset("train", 64, n_images=16, sample_every=4)
        assert len(sparse.images) < len(dense.images)
        test = ds.SphereSceneDataset("test", 64, n_images=16)
        assert len(test.images) + len(dense.images) == 16
