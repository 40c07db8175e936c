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


def _write_dng(path, mosaic, tiled=False, cfa=(0, 1, 1, 2), compression=1):
    """Synthesize an uncompressed DNG: IFD0 carries a SubIFDs pointer to
    the raw CFA IFD (the layout real DNGs use — IFD0 is a preview)."""
    import struct

    h, w = mosaic.shape
    entries = []  # (tag, ftype, count, payload_bytes)

    def add(tag, ftype, count, payload):
        entries.append((tag, ftype, count, payload))

    add(0x0100, 4, 1, struct.pack("<I", w))
    add(0x0101, 4, 1, struct.pack("<I", h))
    add(0x0102, 3, 1, struct.pack("<H", 16))
    add(0x0103, 3, 1, struct.pack("<H", compression))
    add(0x0106, 3, 1, struct.pack("<H", 32803))  # CFA
    add(0x0115, 3, 1, struct.pack("<H", 1))
    add(0x828E, 1, 4, bytes(cfa))
    pix = mosaic.astype("<u2").tobytes()
    if tiled:
        tw = th = 8
        tiles = []
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                tile = np.zeros((th, tw), "<u2")
                ys, xs = min(th, h - y0), min(tw, w - x0)
                tile[:ys, :xs] = mosaic[y0 : y0 + ys, x0 : x0 + xs]
                tiles.append(tile.tobytes())
        add(0x0142, 4, 1, struct.pack("<I", tw))
        add(0x0143, 4, 1, struct.pack("<I", th))
        n = len(tiles)
        add(0x0144, 4, n, b"\0" * 4 * n)  # offsets patched below
        add(0x0145, 4, n, struct.pack(f"<{n}I", *[len(t) for t in tiles]))
        pix_chunks = tiles
    else:
        rps = 4
        strips = [
            mosaic[y : y + rps].astype("<u2").tobytes()
            for y in range(0, h, rps)
        ]
        n = len(strips)
        add(0x0116, 4, 1, struct.pack("<I", rps))
        add(0x0111, 4, n, b"\0" * 4 * n)  # offsets patched below
        add(0x0117, 4, n, struct.pack(f"<{n}I", *[len(s) for s in strips]))
        pix_chunks = strips

    # IFD0: dims of a fake preview + SubIFDs pointer to the raw IFD.
    ifd0_n = 3
    ifd0_off = 8
    raw_off = ifd0_off + 2 + 12 * ifd0_n + 4
    raw_n = len(entries)
    heap_base = raw_off + 2 + 12 * raw_n + 4
    heap = bytearray()

    def pack_entry(tag, ftype, count, payload):
        if len(payload) <= 4:
            return struct.pack("<HHI", tag, ftype, count) + payload + b"\0" * (
                4 - len(payload)
            )
        ptr = heap_base + len(heap)
        heap.extend(payload)
        return struct.pack("<HHI", tag, ftype, count) + struct.pack("<I", ptr)

    # Data chunks go after the heap; patch offsets into the entry payloads.
    heap_tmp_len = sum(len(p) for _, _, _, p in entries if len(p) > 4)
    data_base = heap_base + heap_tmp_len
    offs, pos = [], data_base
    for c in pix_chunks:
        offs.append(pos)
        pos += len(c)
    n = len(pix_chunks)
    off_payload = struct.pack(f"<{n}I", *offs)
    entries = [
        (t, ft, cn, off_payload if t in (0x0111, 0x0144) else p)
        for (t, ft, cn, p) in entries
    ]

    ifd0 = struct.pack("<H", ifd0_n)
    ifd0 += pack_entry(0x0100, 4, 1, struct.pack("<I", 4))
    ifd0 += pack_entry(0x0101, 4, 1, struct.pack("<I", 4))
    ifd0 += pack_entry(0x014A, 4, 1, struct.pack("<I", raw_off))
    ifd0 += struct.pack("<I", 0)
    raw_ifd = struct.pack("<H", raw_n)
    for t, ft, cn, p in entries:
        raw_ifd += pack_entry(t, ft, cn, p)
    raw_ifd += struct.pack("<I", 0)

    with open(path, "wb") as f:
        f.write(b"II" + __import__("struct").pack("<HI", 42, ifd0_off))
        f.write(ifd0)
        f.write(raw_ifd)
        f.write(bytes(heap))
        for c in pix_chunks:
            f.write(c)


class TestDngPixelDecode:
    """Uncompressed-DNG mosaic decode (VERDICT r2 #9): strip and tile
    layouts, CFA phase normalization, loud rejection of compressed files."""

    def _mosaic(self, h=16, w=32, seed=0):
        return np.random.default_rng(seed).integers(
            0, 2**14, (h, w)
        ).astype(np.uint16)

    def test_strip_roundtrip(self, tmp_path):
        m = self._mosaic()
        p = str(tmp_path / "strips.dng")
        _write_dng(p, m, tiled=False)
        got, meta = raw.read_dng(p)
        np.testing.assert_array_equal(got, m)

    def test_tile_roundtrip(self, tmp_path):
        m = self._mosaic(h=20, w=28)  # non-multiple of tile size
        p = str(tmp_path / "tiles.dng")
        _write_dng(p, m, tiled=True)
        got, _ = raw.read_dng(p)
        np.testing.assert_array_equal(got, m)

    def test_cfa_phase_normalized(self, tmp_path):
        # A GRBG file must come back shifted into RGGB phase: the pixel at
        # (0, 1) of the GRBG mosaic is the R sample that leads RGGB.
        m = self._mosaic()
        p = str(tmp_path / "grbg.dng")
        _write_dng(p, m, tiled=False, cfa=(1, 0, 2, 1))  # GRBG
        got, _ = raw.read_dng(p)
        np.testing.assert_array_equal(got, m[:, 1:31])

    def test_compressed_rejected(self, tmp_path):
        m = self._mosaic()
        p = str(tmp_path / "ljpeg.dng")
        _write_dng(p, m, compression=7)
        with pytest.raises(ValueError, match="compression 7"):
            raw.read_dng(p)

    def test_full_pipeline_from_dngs(self, tmp_path):
        # Decode -> assemble_raw_dataset: demosaic + exposure bookkeeping
        # runs end-to-end from files on disk.
        paths = []
        for i in range(2):
            m = self._mosaic(seed=i)
            p = str(tmp_path / f"f{i}.dng")
            _write_dng(p, m)
            paths.append(p)
        # read_dng returns metadata lacking exposure tags in this synthetic
        # file; patch assemble inputs through the public API instead.
        mosaics = [raw.read_dng(p)[0] for p in paths]
        metas = [
            dict(ExposureTime=1 / 60, ISOSpeedRatings=800,
                 AsShotNeutral=[1.0, 1.0, 1.0], BlackLevel=0.0,
                 WhiteLevel=2**14,
                 ColorMatrix2=list(np.linalg.inv(raw._RGB2XYZ).reshape(-1)))
            for _ in paths
        ]
        out = raw.assemble_raw_dataset(
            np.stack(mosaics).astype(np.float32), metas
        )
        images = out["images"] if isinstance(out, dict) else out[0]
        assert np.asarray(images).shape[-1] == 3
