"""Loader parity against the REFERENCE's own dataset code (VERDICT r2 #3).

Real KITTI/Argoverse data is absent from this image, so the achievable
substitute for paper-table parity is loader-level parity: run the
reference's own loaders — the MipNeRF-360 LLFF dataset
(`/root/reference/nerf-methods/mipnerf360/internal/datasets.py:565-785`)
and the Instant-NGP ColmapDataset
(`/root/reference/nerf-methods/ngp-depth/datasets/colmap.py:17-243`) —
against the analytic KITTI fixture (`tools/make_kitti_fixture.py`) and diff
poses / scales / depths / splits tensor-for-tensor against ours. This
de-risks the #1 correctness trap (depth_scale bookkeeping, SURVEY "hard
parts" #3).

The reference code is imported READ-ONLY with stubs for packages absent
from this image (gin, dm_pix, rawpy, icecream, kornia) and for the
missing vendored `pycolmap` submodule (stubbed over our own COLMAP
reader — raw record parsing is cross-checked separately by feeding the
reference's `read_images_binary` the same bin files).
"""

import importlib.util
import os
import subprocess
import sys
import types

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIP_DIR = "/root/reference/nerf-methods/mipnerf360"
NGP_DIR = "/root/reference/nerf-methods/ngp-depth"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(MIP_DIR) and os.path.isdir(NGP_DIR)),
    reason="reference repo not present",
)

N_IMAGES = 20


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kitti_fixture"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools", "make_kitti_fixture.py"),
         out, str(N_IMAGES)],
        capture_output=True, text=True, cwd=REPO_ROOT,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return out


# ---------------------------------------------------------------------------
# Stub modules for dependencies the image lacks.
# ---------------------------------------------------------------------------


def _gin_stub():
    gin = types.ModuleType("gin")

    def configurable(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda x: x

    gin.configurable = configurable
    gin.add_config_file_search_path = lambda *a, **k: None
    gin.parse_config_files_and_bindings = lambda *a, **k: None
    gin.config_str = lambda: ""
    cfg = types.ModuleType("gin.config")
    cfg.external_configurable = lambda fn, *a, **k: fn
    gin.config = cfg
    return {"gin": gin, "gin.config": cfg}


def _simple_stubs():
    dm_pix = types.ModuleType("dm_pix")
    dm_pix.ssim = None
    rawpy = types.ModuleType("rawpy")
    icecream = types.ModuleType("icecream")
    icecream.ic = lambda *a, **k: (a[0] if a else None)
    return {"dm_pix": dm_pix, "rawpy": rawpy, "icecream": icecream}


def _kornia_stub():
    import torch

    kornia = types.ModuleType("kornia")

    def create_meshgrid(height, width, normalized_coordinates=True,
                        device="cpu", dtype=None):
        xs = torch.arange(width, dtype=torch.float32, device=device)
        ys = torch.arange(height, dtype=torch.float32, device=device)
        if normalized_coordinates:
            xs = 2.0 * xs / (width - 1) - 1.0
            ys = 2.0 * ys / (height - 1) - 1.0
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], dim=-1)[None]

    kornia.create_meshgrid = create_meshgrid
    return {"kornia": kornia}


def _pycolmap_stub():
    """Minimal SceneManager API over OUR colmap reader (the vendored
    pycolmap submodule is absent from the reference snapshot). The raw
    record parsing itself is cross-checked in TestColmapRecordParity by
    running the reference's own binary readers on the same files."""
    from outdoor_nerf_depth_tpu.data import colmap as our_colmap

    pycolmap = types.ModuleType("pycolmap")

    class _Cam:
        def __init__(self, c):
            self.fx, self.fy, self.cx, self.cy = c.fx, c.fy, c.cx, c.cy
            self.camera_type = c.model  # string form, handled by process()
            for i, k in enumerate(["k1", "k2", "k3", "k4"]):
                setattr(self, k, 0.0)
            self.p1 = self.p2 = 0.0

    class _Im:
        def __init__(self, im):
            self._R = our_colmap.quaternion_to_rotation(im.qvec)
            self.tvec = np.asarray(im.tvec)
            self.name = im.name

        def R(self):
            return self._R

    class SceneManager:
        def __init__(self, colmap_dir):
            self._dir = colmap_dir

        def load_cameras(self):
            cams, _, _ = our_colmap.read_model(self._dir)
            self.cameras = {k: _Cam(v) for k, v in cams.items()}

        def load_images(self):
            _, images, _ = our_colmap.read_model(self._dir)
            self.images = {k: _Im(v) for k, v in images.items()}

    pycolmap.SceneManager = SceneManager
    return {"pycolmap": pycolmap}


@pytest.fixture(scope="module")
def mip_internal():
    """Import the reference mipnerf360 `internal` package with stubs."""
    stubs = {**_gin_stub(), **_simple_stubs(), **_pycolmap_stub()}
    saved = {k: sys.modules.get(k) for k in stubs}
    saved_internal = {
        k: sys.modules.get(k)
        for k in list(sys.modules)
        if k == "internal" or k.startswith("internal.")
    }
    sys.modules.update(stubs)
    sys.path.insert(0, MIP_DIR)
    try:
        from internal import camera_utils, configs, datasets, utils  # noqa: F401

        yield types.SimpleNamespace(
            camera_utils=camera_utils,
            configs=configs,
            datasets=datasets,
            utils=utils,
        )
    finally:
        sys.path.remove(MIP_DIR)
        for k, v in {**saved, **saved_internal}.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in list(sys.modules):
            if (k == "internal" or k.startswith("internal.")) and k not in saved_internal:
                del sys.modules[k]


@pytest.fixture(scope="module")
def ngp_datasets():
    """Import the reference ngp-depth `datasets` package with stubs."""
    stubs = {**_simple_stubs(), **_kornia_stub()}
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, NGP_DIR)
    try:
        import datasets as ngp_ds  # noqa: F401
        from datasets import colmap as ngp_colmap
        from datasets import colmap_utils as ngp_colmap_utils
        from datasets import ray_utils as ngp_ray_utils

        yield types.SimpleNamespace(
            colmap=ngp_colmap,
            colmap_utils=ngp_colmap_utils,
            ray_utils=ngp_ray_utils,
        )
    finally:
        sys.path.remove(NGP_DIR)
        for k in list(sys.modules):
            if k == "datasets" or k.startswith("datasets."):
                del sys.modules[k]
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _our_driving_dataset(fixture_dir, split, **kw):
    from outdoor_nerf_depth_tpu.data import datasets as our_datasets

    return our_datasets.DrivingSceneDataset(
        os.path.join(fixture_dir, "dtu_format"),
        split,
        global_batch_size=64,
        near=0.1,
        far=150.0,
        depth_sup_type="stereo_crop",
        cast_on_device=False,
        **kw,
    )


class TestColmapRecordParity:
    """The reference's own binary COLMAP readers vs ours, same files."""

    def test_images_and_cameras_match(self, fixture_dir, ngp_datasets):
        from outdoor_nerf_depth_tpu.data import colmap as our_colmap

        sparse = os.path.join(fixture_dir, "dtu_format", "sparse/0")
        ref_ims = ngp_datasets.colmap_utils.read_images_binary(
            os.path.join(sparse, "images.bin")
        )
        our_ims = our_colmap.read_images_bin(os.path.join(sparse, "images.bin"))
        assert sorted(ref_ims) == sorted(our_ims)
        for k in ref_ims:
            assert ref_ims[k].name == our_ims[k].name
            np.testing.assert_allclose(ref_ims[k].qvec, our_ims[k].qvec, atol=1e-12)
            np.testing.assert_allclose(ref_ims[k].tvec, our_ims[k].tvec, atol=1e-12)
            # The reference's quaternion-to-rotation vs ours (atol covers
            # float32-grade rounding in the normalization order).
            np.testing.assert_allclose(
                ref_ims[k].qvec2rotmat(),
                our_colmap.quaternion_to_rotation(our_ims[k].qvec),
                atol=1e-7,
            )
        ref_cams = ngp_datasets.colmap_utils.read_cameras_binary(
            os.path.join(sparse, "cameras.bin")
        )
        our_cams = our_colmap.read_cameras_bin(os.path.join(sparse, "cameras.bin"))
        for k in ref_cams:
            assert ref_cams[k].model == our_cams[k].model
            np.testing.assert_allclose(ref_cams[k].params, our_cams[k].params)
            assert (ref_cams[k].width, ref_cams[k].height) == (
                our_cams[k].width, our_cams[k].height,
            )


class TestMipLoaderParity:
    """Full composed parity: the reference LLFF dataset vs DrivingSceneDataset."""

    @pytest.fixture(scope="class")
    def pair(self, fixture_dir, mip_internal):
        config = mip_internal.configs.Config()
        config.batch_size = 64
        config.factor = 0
        config.depth_sup_type = "stereo_crop"
        config.near, config.far = 0.1, 150.0
        config.auto_adjust_near_far = True
        config.sample_every = 1
        config.compute_depth_metrics = True
        data_dir = os.path.join(fixture_dir, "dtu_format")
        ref = {
            split: mip_internal.datasets.LLFF(split, data_dir, config)
            for split in ("train", "test")
        }
        ours = {
            split: _our_driving_dataset(fixture_dir, split)
            for split in ("train", "test")
        }
        return ref, ours, config

    @pytest.mark.parametrize("split", ["train", "test"])
    def test_poses_match(self, pair, split):
        ref, ours, _ = pair
        np.testing.assert_allclose(
            np.asarray(ref[split].camtoworlds, np.float64),
            np.asarray(ours[split].camtoworlds, np.float64),
            atol=1e-5,
        )

    def test_scale_and_near_far_match(self, pair):
        ref, ours, config = pair
        # transform_poses_pca scale folded into depth_scale by the reference.
        assert config.depth_scale == pytest.approx(
            ours["train"].scene_scale, rel=1e-6
        )
        assert ref["train"].near == pytest.approx(ours["train"].near, rel=1e-6)
        assert ref["train"].far == pytest.approx(ours["train"].far, rel=1e-6)

    @pytest.mark.parametrize("split", ["train", "test"])
    def test_images_and_intrinsics_match(self, pair, split):
        ref, ours, _ = pair
        np.testing.assert_allclose(
            np.asarray(ref[split].images), np.asarray(ours[split].images),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ref[split].pixtocams, np.float64).reshape(3, 3),
            np.asarray(ours[split].pixtocams, np.float64).reshape(3, 3),
            atol=1e-8,
        )

    @pytest.mark.parametrize("split", ["train", "test"])
    def test_depths_match(self, pair, split):
        ref, ours, _ = pair
        for ref_arr, our_arr in (
            (ref[split].disp_images, ours[split].depth_gt),
            (ref[split].disp_images_sup, ours[split].depth_sup),
        ):
            ref_arr = np.asarray(ref_arr)
            our_arr = np.asarray(our_arr)
            assert ref_arr.shape == our_arr.shape
            # Identical validity masks (reference marks invalid as negative).
            np.testing.assert_array_equal(ref_arr > 0, our_arr > 0)
            m = ref_arr > 0
            np.testing.assert_allclose(ref_arr[m], our_arr[m], rtol=1e-6)

    def test_split_sizes(self, pair):
        ref, ours, _ = pair
        assert ref["test"].images.shape[0] == ours["test"].images.shape[0] == 2
        assert ref["train"].images.shape[0] == ours["train"].images.shape[0] == 18


class TestNdcParity:
    def test_matches_reference_convert_to_ndc(self, mip_internal):
        from outdoor_nerf_depth_tpu.data import cameras as our_cameras

        rng = np.random.default_rng(5)
        n = 64
        origins = rng.normal(size=(n, 3)).astype(np.float64)
        directions = rng.normal(size=(n, 3))
        directions[:, 2] = -np.abs(directions[:, 2]) - 0.3  # dz < 0
        origins[:, 2] = -np.abs(origins[:, 2]) - 2.0
        focal, cx, cy = 400.0, 160.0, 120.0
        pixtocam = np.linalg.inv(
            np.array([[focal, 0, cx], [0, focal, cy], [0, 0, 1.0]])
        )
        ref_o, ref_d = mip_internal.camera_utils.convert_to_ndc(
            origins, directions, pixtocam, near=1.0
        )
        our_o, our_d = our_cameras.rays_to_ndc(
            origins, directions, pixtocam, near=1.0
        )
        np.testing.assert_allclose(our_o, ref_o, atol=1e-9)
        np.testing.assert_allclose(our_d, ref_d, atol=1e-9)


class TestMipSparseViewSplit:
    def test_sample_every_matches(self, mip_internal):
        """The sparse-view protocol: reference `datasets.py:741-760` vs our
        split_indices, across sample_every settings."""
        from outdoor_nerf_depth_tpu.data.datasets import split_indices

        for n, k in [(20, 1), (20, 2), (30, 4), (47, 3)]:
            test_ref = [i for i in range(9, n, 10)]
            trains = sorted(set(range(n)) - set(test_ref))
            train_ref = [trains[i] for i in range(0, len(trains), k)]
            np.testing.assert_array_equal(
                split_indices(n, "train", k), np.array(train_ref)
            )
            np.testing.assert_array_equal(
                split_indices(n, "test", 1), np.array(test_ref)
            )


class TestNgpLoaderParity:
    """The reference ColmapDataset conventions vs our equivalents."""

    @pytest.fixture(scope="class")
    def ref_ds(self, fixture_dir, ngp_datasets):
        return ngp_datasets.colmap.ColmapDataset(
            os.path.join(fixture_dir, "dtu_format"),
            split="train",
            downsample=1.0,
            mod_ratio=1,
            depth_folder="depths_gt",
        )

    def test_min_norm_normalization_matches(self, fixture_dir, ngp_datasets, ref_ds):
        from outdoor_nerf_depth_tpu.data import cameras as our_cameras
        from outdoor_nerf_depth_tpu.data import colmap as our_colmap

        names, poses_gl, _, _, _, pts = our_colmap.load_scene(
            os.path.join(fixture_dir, "dtu_format", "sparse/0"),
            load_points=True,
        )
        # The NGP reference keeps COLMAP/OpenCV axes; ours converts to
        # OpenGL — unflip for the comparison.
        order = np.argsort(names)
        poses_cv = (poses_gl @ np.diag([1.0, -1.0, -1.0, 1.0]))[order][:, :3]
        our_poses, our_scale = our_cameras.normalize_poses_min_norm(
            poses_cv, pts
        )
        assert ref_ds.depth_pose_scale == pytest.approx(our_scale, rel=1e-6)
        # Reference selects the train split; ours here is all views.
        from outdoor_nerf_depth_tpu.data.datasets import split_indices

        idx = split_indices(N_IMAGES, "train", 1)
        np.testing.assert_allclose(
            np.asarray(ref_ds.poses, np.float64),
            our_poses[idx],
            atol=1e-5,
        )

    def test_depth_channel_matches(self, fixture_dir, ref_ds):
        """rays[..., 3] = PNG/256/depth_pose_scale (reference
        `colmap.py:205`) vs our decode with the inverse-scale convention."""
        from outdoor_nerf_depth_tpu.data import datasets as our_datasets
        from outdoor_nerf_depth_tpu.data.datasets import split_indices

        scale = ref_ds.depth_pose_scale
        dtu = os.path.join(fixture_dir, "dtu_format")
        names = sorted(os.listdir(os.path.join(dtu, "images")))
        idx = split_indices(N_IMAGES, "train", 1)
        for row, i in [(0, idx[0]), (5, idx[5])]:
            raw = our_datasets.load_image(
                os.path.join(dtu, "depths_gt", names[i])
            )
            ours = our_datasets.decode_depth_png(raw, scene_scale=1.0 / scale)
            ref_depth = np.asarray(ref_ds.rays[row, :, 3]).reshape(ours.shape)
            m = ours > 0
            np.testing.assert_allclose(ref_depth[m], ours[m], rtol=1e-6)
            # Reference keeps raw/256/scale even below the validity floor;
            # our invalids are negative. Everything valid must agree. (The
            # first fixture view sees mostly sky — ~20% valid.)
            assert m.sum() > 0.1 * m.size

    def test_mod_ratio_matches_sample_every(self, fixture_dir, ngp_datasets):
        from outdoor_nerf_depth_tpu.data.datasets import split_indices

        ref2 = ngp_datasets.colmap.ColmapDataset(
            os.path.join(fixture_dir, "dtu_format"),
            split="train",
            downsample=1.0,
            mod_ratio=2,
            depth_folder="depths_gt",
        )
        assert ref2.poses.shape[0] == len(split_indices(N_IMAGES, "train", 2))
