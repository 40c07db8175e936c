"""Tests for the C++ dataplane: build, correctness vs numpy path, speed."""

import time

import numpy as np
import pytest

from outdoor_nerf_depth_tpu.data import datasets, native_batcher


pytestmark = pytest.mark.skipif(
    not native_batcher.is_available(),
    reason=f"native dataplane unavailable: {native_batcher.build_error()}",
)


@pytest.fixture(scope="module")
def dataset():
    return datasets.SyntheticDataset(
        "train", global_batch_size=256, n_images=4, height=24, width=32, seed=0
    )


class TestNativeBatcher:
    def test_batch_shapes_and_gather_consistency(self, dataset):
        nb = native_batcher.NativeRayBatcher(dataset, seed=1)
        batch = nb.sample_batch()
        assert batch.rgb.shape == (256, 3)
        assert batch.rays.origins.shape == (256, 3)
        # Every gathered rgb/depth must equal the source image at (cam, pixel)
        # reconstructed from the ray: verify via nearest-pixel reprojection.
        cam = batch.rays.cam_idx[:, 0]
        np.testing.assert_allclose(
            np.asarray(batch.rays.origins),
            dataset.camtoworlds[cam][:, :3, 3],
            atol=1e-6,
        )
        # rgb values must exist in the corresponding image.
        for i in range(0, 256, 37):
            img = dataset.images[cam[i]].reshape(-1, 3)
            assert (np.abs(img - batch.rgb[i]).sum(-1) < 1e-6).any()

    def test_rays_match_numpy_caster(self, dataset):
        from outdoor_nerf_depth_tpu.data import cameras as cameras_lib

        nb = native_batcher.NativeRayBatcher(dataset, seed=2)
        batch = nb.sample_batch()
        # Recompute directions for each sampled ray with the numpy caster by
        # inverting: find the pixel whose direction matches. Instead, cast
        # *all* pixels for camera 0 and check the sampled rays from that
        # camera appear among them.
        px, py = cameras_lib.pixel_grid(dataset.width, dataset.height)
        o, d, v, r, _ = cameras_lib.pixels_to_rays(
            px, py, dataset.pixtocams, dataset.camtoworlds[0]
        )
        d_all = d.reshape(-1, 3)
        mask = batch.rays.cam_idx[:, 0] == 0
        dirs = np.asarray(batch.rays.directions)[mask]
        for k in range(min(10, dirs.shape[0])):
            err = np.abs(d_all - dirs[k]).sum(-1).min()
            assert err < 1e-4, f"ray {k} not produced by numpy caster ({err})"
        # Radii formula matches.
        np.testing.assert_allclose(
            np.asarray(batch.rays.radii).ravel()[0],
            np.asarray(r).ravel()[0],
            rtol=1e-4,
        )

    def test_depth_values_from_source(self, dataset):
        nb = native_batcher.NativeRayBatcher(dataset, seed=3)
        batch = nb.sample_batch()
        assert batch.depth_gt is not None
        flat = dataset.depth_gt.reshape(dataset.n_images, -1)
        cam = batch.rays.cam_idx[:, 0]
        for i in range(0, 256, 41):
            assert (np.abs(flat[cam[i]] - batch.depth_gt[i]) < 1e-6).any()

    def test_deterministic_per_seed_stream(self, dataset):
        a = native_batcher.NativeRayBatcher(dataset, seed=7).sample_batch()
        b = native_batcher.NativeRayBatcher(dataset, seed=7).sample_batch()
        np.testing.assert_array_equal(a.rgb, b.rgb)
        c = native_batcher.NativeRayBatcher(dataset, seed=8).sample_batch()
        assert not np.array_equal(a.rgb, c.rgb)

    def test_throughput_exceeds_numpy_path(self):
        ds = datasets.SyntheticDataset(
            "train", global_batch_size=8192, n_images=8, height=94, width=310,
            seed=1, cast_on_device=False,
        )
        nb = native_batcher.NativeRayBatcher(ds, seed=4)
        nb.sample_batch()  # warm the lib

        t0 = time.perf_counter()
        for _ in range(10):
            nb.sample_batch()
        t_native = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(10):
            ds.sample_batch()
        t_numpy = time.perf_counter() - t0
        # The fused native path should comfortably beat numpy host casting.
        assert t_native < t_numpy, (t_native, t_numpy)
