"""Stereo benchmark data layer: PFM IO, list files, scanners, loaders.

Mirrors the reference data layer's contracts
(`CFNet/datasets/{readpfm,data_io,sceneflow_dataset,kitti_dataset}.py` +
`filenames/*.txt`) on synthetic fixtures in the real directory layouts.
"""

import os

import numpy as np
import pytest

from outdoor_nerf_depth_tpu.depth_priors import benchmark_data as bd
from outdoor_nerf_depth_tpu.utils.image import save_img_u8

H, W = 48, 96


def _save_disp_png(path, disp):
    """uint16 disparity PNG, value/256 = pixels (the KITTI codec)."""
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.asarray(disp) * 256.0).astype(np.uint16))


def _rand_img(rng):
    return rng.uniform(size=(H, W, 3))


def make_sceneflow_fixture(root, n=2, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        seq = os.path.join("A", "0000")
        for eye in ("left", "right"):
            d = os.path.join(root, "frames_finalpass", "TRAIN", seq, eye)
            os.makedirs(d, exist_ok=True)
            save_img_u8(_rand_img(rng), os.path.join(d, f"{i:04d}.png"))
        dd = os.path.join(root, "disparity", "TRAIN", seq, "left")
        os.makedirs(dd, exist_ok=True)
        disp = rng.uniform(1.0, 40.0, (H, W)).astype(np.float32)
        bd.write_pfm(os.path.join(dd, f"{i:04d}.pfm"), disp)
        rows.append((
            f"frames_finalpass/TRAIN/A/0000/left/{i:04d}.png",
            f"frames_finalpass/TRAIN/A/0000/right/{i:04d}.png",
            f"disparity/TRAIN/A/0000/left/{i:04d}.pfm",
        ))
    return rows


def make_kitti15_fixture(root, n=2, seed=1, with_disp=True):
    rng = np.random.default_rng(seed)
    rows = []
    for sub in ("image_2", "image_3") + (("disp_occ_0",) if with_disp else ()):
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)
    for i in range(n):
        name = f"{i:06d}_10.png"
        for sub in ("image_2", "image_3"):
            save_img_u8(_rand_img(rng),
                        os.path.join(root, "training", sub, name))
        disp_rel = None
        if with_disp:
            disp_rel = f"training/disp_occ_0/{name}"
            _save_disp_png(os.path.join(root, disp_rel),
                           rng.uniform(1.0, 40.0, (H, W)))
        rows.append((f"training/image_2/{name}", f"training/image_3/{name}",
                     disp_rel))
    return rows


class TestPfmIO:
    @pytest.mark.parametrize("shape", [(H, W), (H, W, 3)])
    def test_roundtrip(self, tmp_path, shape):
        rng = np.random.default_rng(0)
        data = rng.uniform(0, 100, shape).astype(np.float32)
        path = str(tmp_path / "x.pfm")
        bd.write_pfm(path, data)
        back, scale = bd.read_pfm(path)
        np.testing.assert_array_equal(back, data)
        assert scale == 1.0

    def test_reference_reader_agrees(self, tmp_path):
        """Our PFM writer must be readable by the reference's own reader
        (and vice versa through the shared format)."""
        import importlib.util

        ref = "/root/reference/depth-methods/stereo_matching/CFNet/datasets/readpfm.py"
        if not os.path.isfile(ref):
            pytest.skip("reference not available")
        spec = importlib.util.spec_from_file_location("ref_readpfm", ref)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rng = np.random.default_rng(1)
        data = rng.uniform(0, 192, (H, W)).astype(np.float32)
        path = str(tmp_path / "d.pfm")
        bd.write_pfm(path, data)
        theirs, _ = mod.readPFM(path)
        np.testing.assert_array_equal(theirs.astype(np.float32), data)

    def test_bad_header_raises(self, tmp_path):
        path = tmp_path / "bad.pfm"
        path.write_bytes(b"P6\n2 2\n255\n" + b"\0" * 12)
        with pytest.raises(ValueError, match="not a PFM"):
            bd.read_pfm(str(path))


class TestListFiles:
    def test_three_and_two_column(self, tmp_path):
        lf = tmp_path / "list.txt"
        lf.write_text("a/l.png a/r.png a/d.pfm\nb/l.png b/r.png\n")
        rows = bd.read_list_file(str(lf))
        assert rows[0] == ("a/l.png", "a/r.png", "a/d.pfm")
        assert rows[1] == ("b/l.png", "b/r.png", None)

    def test_roundtrip(self, tmp_path):
        rows = [("l", "r", "d"), ("l2", "r2", None)]
        lf = str(tmp_path / "list.txt")
        bd.write_list_file(lf, rows)
        assert bd.read_list_file(lf) == rows

    def test_empty_raises(self, tmp_path):
        lf = tmp_path / "list.txt"
        lf.write_text("\n")
        with pytest.raises(ValueError, match="empty"):
            bd.read_list_file(str(lf))

    def test_reference_list_format_parses(self):
        """The reference's shipped lists must parse as-is."""
        ref = ("/root/reference/depth-methods/stereo_matching/CFNet/"
               "filenames/kitti15_train.txt")
        if not os.path.isfile(ref):
            pytest.skip("reference not available")
        rows = bd.read_list_file(ref)
        assert all(d and d.endswith(".png") for _, _, d in rows)
        assert rows[0][0].startswith("training/image_2/")


class TestScanners:
    def test_sceneflow_scan_matches_layout(self, tmp_path):
        rows = make_sceneflow_fixture(str(tmp_path))
        scanned = bd.scan_sceneflow(str(tmp_path))
        assert scanned == rows

    def test_kitti2015_scan(self, tmp_path):
        rows = make_kitti15_fixture(str(tmp_path))
        assert bd.scan_kitti2015(str(tmp_path)) == rows

    def test_kitti2015_scan_without_gt(self, tmp_path):
        make_kitti15_fixture(str(tmp_path), with_disp=False)
        scanned = bd.scan_kitti2015(str(tmp_path))
        assert all(d is None for _, _, d in scanned)

    def test_pair_dirs_scan(self, tmp_path):
        rng = np.random.default_rng(3)
        for scene in ("artroom", "bandsaw"):
            d = tmp_path / scene
            os.makedirs(d)
            save_img_u8(_rand_img(rng), str(d / "im0.png"))
            save_img_u8(_rand_img(rng), str(d / "im1.png"))
            bd.write_pfm(str(d / "disp0GT.pfm"),
                         rng.uniform(1, 30, (H, W)).astype(np.float32))
        rows = bd.scan_pair_dirs(str(tmp_path))
        assert len(rows) == 2 and rows[0][2] == "artroom/disp0GT.pfm"


class TestStereoBenchmarkDataset:
    def test_sceneflow_train_batch(self, tmp_path):
        make_sceneflow_fixture(str(tmp_path))
        ds = bd.StereoBenchmarkDataset.from_scan(
            str(tmp_path), "sceneflow", crop=(32, 64), seed=0
        )
        assert ds.variant == "sceneflow"
        l, r, d = ds.sample_batch(2)
        assert l.shape == (2, 32, 64, 3) and d.shape == (2, 32, 64)
        assert d.max() > 0.5  # PFM disparities made it through

    def test_kitti_disp_codec(self, tmp_path):
        make_kitti15_fixture(str(tmp_path))
        ds = bd.StereoBenchmarkDataset.from_scan(
            str(tmp_path), "kitti2015", crop=(32, 64), augment=False, seed=0
        )
        assert ds.variant == "kitti"
        _, _, d = ds.sample_batch(1)
        # uint16/256 codec: quantization to 1/256 pixel, range preserved.
        assert 0.5 < d.max() < 41.0

    def test_determinism(self, tmp_path):
        make_sceneflow_fixture(str(tmp_path))
        mk = lambda: bd.StereoBenchmarkDataset.from_scan(
            str(tmp_path), "sceneflow", crop=(32, 64), seed=7
        )
        a, b = mk().sample_batch(2), mk().sample_batch(2)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_kitti_eval_pads_to_canonical(self, tmp_path):
        make_kitti15_fixture(str(tmp_path))
        ds = bd.StereoBenchmarkDataset.from_scan(
            str(tmp_path), "kitti2015", augment=False
        )
        b = ds.eval_batch(0)
        assert b["left"].shape == (1,) + bd.KITTI_EVAL_SHAPE + (3,)
        assert b["top_pad"] == bd.KITTI_EVAL_SHAPE[0] - H
        assert b["right_pad"] == bd.KITTI_EVAL_SHAPE[1] - W
        # Padding is excluded from the valid mask.
        assert not b["valid"][0, : b["top_pad"]].any()
        assert not b["valid"][0, :, W:].any()
        assert b["valid"][0, b["top_pad"]:, :W].any()

    def test_sceneflow_eval_crops_bottom_right(self, tmp_path):
        make_sceneflow_fixture(str(tmp_path))
        ds = bd.StereoBenchmarkDataset.from_scan(
            str(tmp_path), "sceneflow", augment=False
        )
        b = ds.eval_batch(0)
        # Fixture smaller than 512x960: crop clamps to the image.
        assert b["left"].shape == (1, H, W, 3)
        assert b["valid"].mean() > 0.9

    def test_from_list_file(self, tmp_path):
        rows = make_sceneflow_fixture(str(tmp_path))
        lf = str(tmp_path / "train.txt")
        bd.write_list_file(lf, rows)
        ds = bd.StereoBenchmarkDataset.from_list_file(
            str(tmp_path), lf, crop=(32, 64)
        )
        l, _, _ = ds.sample_batch(1)
        assert l.shape == (1, 32, 64, 3)

    def test_missing_gt_gives_zero_disp(self, tmp_path):
        make_kitti15_fixture(str(tmp_path), with_disp=False)
        ds = bd.StereoBenchmarkDataset.from_scan(
            str(tmp_path), "kitti2015", crop=(32, 64), variant="kitti"
        )
        _, _, d = ds.sample_batch(1)
        assert (d == 0).all()


class TestDisparityMetrics:
    def test_epe_d1(self):
        gt = np.full((10, 10), 50.0)
        pred = gt.copy()
        pred[0, :] = 60.0  # 10 px error on 10% of pixels: D1 counts them
        valid = np.ones_like(gt, bool)
        m = bd.disparity_metrics(pred, gt, valid)
        assert m["epe"] == pytest.approx(1.0)
        assert m["d1"] == pytest.approx(0.1)

    def test_invalid_excluded(self):
        gt = np.zeros((4, 4))
        m = bd.disparity_metrics(gt + 5, gt, np.zeros_like(gt, bool))
        assert m["n_valid"] == 0


class TestTrainPriorBenchmarkCli:
    def test_sceneflow_list_smoke_with_eval(self, tmp_path):
        """VERDICT r4 #6 'done' criterion: train_prior smoke on a
        SceneFlow-format fixture via a filename list, incl. EPE/D1 eval."""
        import train_prior

        root = tmp_path / "sf"
        rows = make_sceneflow_fixture(str(root))
        lf = str(tmp_path / "train.txt")
        bd.write_list_file(lf, rows)
        out = str(tmp_path / "params.msgpack")
        train_prior.main([
            "stereo", "--data", str(root), "--list-file", lf,
            "--eval-list", lf, "--steps", "2", "--batch", "1",
            "--crop", "32", "48", "--max-disparity", "32", "--out", out,
            "--print-every", "1", "--cpu",
        ])
        assert os.path.getsize(out) > 1000
