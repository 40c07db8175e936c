"""Tests for utils.raw and occupancy visibility culling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu.ops import occupancy as occ
from outdoor_nerf_depth_tpu.utils import raw


class TestBayer:
    def test_mask_partition(self):
        px, py = np.meshgrid(np.arange(8), np.arange(8), indexing="xy")
        mask = raw.pixels_to_bayer_mask(px, py)
        # Each pixel observes exactly one channel.
        np.testing.assert_allclose(mask.sum(-1), 1.0)
        # 2x2 tile: R once, G twice, B once.
        np.testing.assert_allclose(mask[:2, :2, 0].sum(), 1.0)
        np.testing.assert_allclose(mask[:2, :2, 1].sum(), 2.0)
        np.testing.assert_allclose(mask[:2, :2, 2].sum(), 1.0)

    def test_demosaic_constant_image(self):
        bayer = np.full((16, 16), 0.25, np.float32)
        rgb = raw.bilinear_demosaic(bayer)
        np.testing.assert_allclose(rgb, 0.25, atol=1e-5)

    def test_demosaic_recovers_channels(self):
        # Distinct constant values per RGGB site must land in their channel.
        yy, xx = np.mgrid[0:16, 0:16]
        bayer = np.where(
            (yy % 2 == 0) & (xx % 2 == 0), 1.0,
            np.where((yy % 2) != (xx % 2), 0.5, 0.1),
        ).astype(np.float32)
        rgb = raw.bilinear_demosaic(bayer)
        np.testing.assert_allclose(rgb[..., 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(rgb[..., 1], 0.5, atol=1e-4)
        np.testing.assert_allclose(rgb[..., 2], 0.1, atol=1e-4)


class TestRawHelpers:
    def test_exposure_values(self):
        meta = [{"ExposureTime": 0.01, "ISOSpeedRatings": 100},
                {"ExposureTime": 0.02, "ISOSpeedRatings": 400}]
        np.testing.assert_allclose(raw.exposure_values(meta), [0.001, 0.008])

    def test_normalize_exposure(self):
        imgs = np.random.default_rng(0).uniform(0, 4, (2, 8, 8, 3))
        out, level = raw.normalize_exposure(imgs, percentile=100)
        np.testing.assert_allclose(out.max(), 1.0, rtol=1e-6)
        np.testing.assert_allclose(level, imgs.max(), rtol=1e-6)

    def test_match_affine_color_exact_for_affine(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(8, 8, 3)).astype(np.float64)
        A = rng.normal(size=(3, 3))
        b = rng.normal(size=(3,)) * 0.1
        ref = img @ A.T + b
        out = raw.match_affine_color(img, ref)
        np.testing.assert_allclose(out, ref, atol=1e-8)

    def test_postprocess_raw_srgb(self):
        x = jnp.array([[[0.0, 0.25, 1.0], [2.0, 0.5, 0.1]]])
        y = np.asarray(raw.postprocess_raw(x, exposure=1.0))
        np.testing.assert_allclose(y[0, 0, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(y[0, 0, 2], 1.0, atol=1e-6)
        np.testing.assert_allclose(y[0, 1, 0], 1.0, atol=1e-6)  # clipped
        assert y[0, 0, 1] > 0.25  # sRGB curve brightens linear values

    def test_postprocess_raw_applies_cam2rgb(self):
        x = jnp.ones((2, 2, 3)) * 0.5
        m = np.diag([2.0, 1.0, 1.0])
        y = np.asarray(raw.postprocess_raw(x, cam2rgb=m, exposure=1.0))
        assert y[0, 0, 0] > y[0, 0, 1]  # red channel doubled pre-gamma

    def test_process_metadata_white_balances_neutral(self):
        # cam2rgb must map the sensor's measured white (AsShotNeutral) to
        # pure display white [1, 1, 1]: WB divides it out, and the
        # row-normalized CCM fixes the white point.
        meta = {
            "ExposureTime": 1 / 60,
            "AsShotNeutral": [0.5, 1.0, 0.6],
            "ColorMatrix2": [0.9, 0.1, 0.0, 0.05, 0.8, 0.15, 0.0, 0.2, 0.8],
            "BlackLevel": 64,
            "WhiteLevel": 1023,
        }
        out = raw.process_metadata([meta])
        got = out["cam2rgb"][0] @ np.array([0.5, 1.0, 0.6])
        np.testing.assert_allclose(got, np.ones(3), atol=1e-8)

    def test_shutter_seconds_variants(self):
        assert raw._shutter_seconds({"ExposureTime": 0.01}) == 0.01
        np.testing.assert_allclose(
            raw._shutter_seconds({"ShutterSpeed": "1/60"}), 1.0 / 60.0
        )
        # APEX ShutterSpeedValue = log2(1/seconds).
        np.testing.assert_allclose(
            raw._shutter_seconds({"ShutterSpeedValue": 6.0}), 1.0 / 64.0
        )

    def test_assemble_raw_dataset(self):
        rng = np.random.default_rng(3)
        raws = rng.uniform(64, 1023, size=(3, 8, 8)).astype(np.float32)
        base = {
            "AsShotNeutral": [0.6, 1.0, 0.7],
            "ColorMatrix2": list(np.eye(3).reshape(-1)),
            "BlackLevel": 64,
            "WhiteLevel": 1023,
        }
        metas = [
            dict(base, ExposureTime=1 / 30),   # slowest = brightest
            dict(base, ExposureTime=1 / 120),
            dict(base, ExposureTime=1 / 30),
        ]
        images, meta = raw.assemble_raw_dataset(raws, metas)
        assert images.shape == (3, 8, 8, 3)
        assert images.min() >= 0.0 and images.max() <= 1.0 + 1e-6
        # Brightest (slowest shutter) exposure gets index 0 and value 1.
        np.testing.assert_array_equal(meta["exposure_idx"], [0, 1, 0])
        np.testing.assert_allclose(meta["exposure_values"], [1.0, 0.25, 1.0])
        assert meta["exposure"] > 0
        assert set(meta["exposure_levels"]) == {80, 90, 97, 99, 100}
        post = np.asarray(meta["postprocess_fn"](images[0]))
        assert post.shape == (8, 8, 3)
        assert post.min() >= 0.0 and post.max() <= 1.0

    def test_match_images_affine_recovers_gt(self):
        rng = np.random.default_rng(4)
        gt = rng.uniform(size=(6, 6, 3))
        est = gt * np.array([1.5, 0.7, 2.0]) + np.array([0.1, -0.05, 0.2])
        out = raw.match_images_affine(est, gt)
        np.testing.assert_allclose(out, gt, atol=1e-10)


class TestVisibilityCulling:
    def _camera_looking_minus_z(self):
        # OpenGL c2w: camera at +5z looking toward origin (-z direction).
        c2w = np.eye(4)[:3]
        c2w[:, 3] = [0.0, 0.0, 5.0]
        return jnp.asarray(c2w[None], jnp.float32)

    def test_cells_behind_camera_culled(self):
        grid = occ.init_grid(scale=0.5, resolution=8)
        K = jnp.asarray(
            [[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1.0]], jnp.float32
        )
        culled = occ.mark_invisible_cells(
            grid, self._camera_looking_minus_z(), K, 32, 32, scale=0.5
        )
        culled = np.asarray(culled)
        # The scene cube sits in front of the camera with a wide FOV: most
        # cells visible (>= 0), none resurrected.
        assert (culled >= 0).mean() > 0.5

        # A camera looking AWAY (+z): everything is behind it.
        c2w = np.eye(4)[:3]
        c2w[:, 3] = [0, 0, -5.0]
        c2w[:3, :3] = np.diag([1.0, 1.0, 1.0])  # still looks -z, scene behind
        culled2 = np.asarray(
            occ.mark_invisible_cells(
                grid, jnp.asarray(c2w[None], jnp.float32), K, 32, 32, scale=0.5
            )
        )
        np.testing.assert_allclose(culled2, -1.0)

    def test_update_never_resurrects_invisible(self):
        grid = occ.init_grid(scale=0.5, resolution=8).at[0, :10].set(-1.0)
        dense = lambda pts: jnp.full(pts.shape[:-1], 5.0)
        g2 = occ.update_grid(jax.random.PRNGKey(0), grid, dense, 0.5)
        assert np.all(np.asarray(g2)[0, :10] == -1.0)
        assert np.asarray(g2)[0, 10:].max() > 0


class TestDngMetadata:
    """Pure-python TIFF/DNG tag reader (no rawpy in this image)."""

    def _write_tiff(self, path):
        """Minimal little-endian TIFF with an EXIF sub-IFD carrying the
        exposure tags the raw pipeline consumes."""
        import struct

        def entry(tag, ftype, count, value_bytes, heap, heap_base):
            if len(value_bytes) <= 4:
                inline = value_bytes + b"\0" * (4 - len(value_bytes))
                return struct.pack("<HHI", tag, ftype, count) + inline
            ptr = heap_base + len(heap)
            heap.extend(value_bytes)
            return struct.pack("<HHI", tag, ftype, count) + struct.pack(
                "<I", ptr
            )

        # Layout: header(8) | IFD0 | EXIF IFD | heap
        n0, n1 = 4, 2
        ifd0_off = 8
        exif_off = ifd0_off + 2 + 12 * n0 + 4
        heap_base = exif_off + 2 + 12 * n1 + 4
        heap = bytearray()

        ifd0 = struct.pack("<H", n0)
        ifd0 += entry(0x0100, 4, 1, struct.pack("<I", 32), heap, heap_base)
        ifd0 += entry(0x0101, 4, 1, struct.pack("<I", 16), heap, heap_base)
        ifd0 += entry(0xC61D, 4, 1, struct.pack("<I", 16383), heap, heap_base)
        ifd0 += entry(0x8769, 4, 1, struct.pack("<I", exif_off), heap,
                      heap_base)
        ifd0 += struct.pack("<I", 0)

        exif = struct.pack("<H", n1)
        exif += entry(0x829A, 5, 1, struct.pack("<II", 1, 60), heap,
                      heap_base)  # 1/60 s
        exif += entry(0x8827, 3, 1, struct.pack("<H", 800), heap, heap_base)
        exif += struct.pack("<I", 0)

        with open(path, "wb") as f:
            f.write(b"II" + struct.pack("<H", 42) + struct.pack("<I", ifd0_off))
            f.write(ifd0)
            f.write(exif)
            f.write(bytes(heap))

    def test_reads_exposure_tags(self, tmp_path):
        path = str(tmp_path / "frame.dng")
        self._write_tiff(path)
        meta = raw.read_dng_metadata(path)
        assert meta["ImageWidth"] == 32
        assert meta["ImageLength"] == 16
        assert meta["WhiteLevel"] == 16383
        assert meta["ISOSpeedRatings"] == 800
        np.testing.assert_allclose(meta["ExposureTime"], 1.0 / 60.0)
        # Feeds straight into the exposure-unit helper.
        np.testing.assert_allclose(
            raw.exposure_values([meta]), [1.0 / 60.0 * 800 / 1000.0]
        )

    def test_rejects_non_tiff(self, tmp_path):
        p = tmp_path / "x.dng"
        p.write_bytes(b"not a tiff")
        with pytest.raises(ValueError):
            raw.read_dng_metadata(str(p))
