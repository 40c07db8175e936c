"""Tests for the depth-prior generators (stereo + completion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu.depth_priors import completion, stereo

TINY_STEREO = dict(
    max_disparity=32,
    base_features=8,
    num_groups=4,
    concat_features=4,
    refine_offsets=2,
)


class TestCostVolume:
    def test_groupwise_correlation_shapes(self):
        rng = np.random.default_rng(0)
        l = jnp.asarray(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
        r = jnp.asarray(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
        out = stereo.groupwise_correlation(l, r, 4)
        assert out.shape == (2, 8, 12, 4)
        # Group 0 = mean of elementwise products of first 4 channels.
        want = (np.asarray(l)[..., :4] * np.asarray(r)[..., :4]).mean(-1)
        np.testing.assert_allclose(np.asarray(out)[..., 0], want, rtol=1e-5)

    def test_shift_right_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 8, 2)))
        s = stereo.shift_right_features(x, 3)
        np.testing.assert_allclose(np.asarray(s)[:, :, 3:], np.asarray(x)[:, :, :-3])
        np.testing.assert_allclose(np.asarray(s)[:, :, :3], 0.0)

    def test_cost_volume_peak_at_true_disparity(self):
        # Right image = left shifted by disparity d: correlation at slice d
        # must dominate.
        rng = np.random.default_rng(2)
        left = jnp.asarray(rng.normal(size=(1, 6, 32, 8)).astype(np.float32))
        true_d = 5
        right = stereo.shift_left_features(left, true_d)
        vol = stereo.build_cost_volume(left, right, 16, 4, 0)
        gwc = np.asarray(vol)[0, :, :, true_d + 4 :, :4].mean((1, 2, 3))
        assert gwc.argmax() == true_d

    def test_warp_by_disparity_inverts_shift(self):
        rng = np.random.default_rng(3)
        feat = jnp.asarray(rng.normal(size=(1, 4, 16, 3)).astype(np.float32))
        shifted = stereo.shift_left_features(feat, 2)  # shifted[x] = feat[x+2]
        # Sampling shifted at x - 2 recovers feat[x].
        warped = stereo.warp_by_disparity(shifted, jnp.full((1, 4, 16), 2.0))
        np.testing.assert_allclose(
            np.asarray(warped)[:, :, 2:-2], np.asarray(feat)[:, :, 2:-2], atol=1e-5
        )


class TestDisparityRegression:
    def test_delta_distribution(self):
        logits = jnp.full((1, 8, 2, 2), -1e9).at[:, 3].set(0.0)
        disp, var = stereo.disparity_regression(logits, jnp.arange(8.0))
        np.testing.assert_allclose(np.asarray(disp), 3.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(var), 0.0, atol=1e-3)

    def test_uniform_distribution_high_variance(self):
        logits = jnp.zeros((1, 8, 2, 2))
        disp, var = stereo.disparity_regression(logits, jnp.arange(8.0))
        np.testing.assert_allclose(np.asarray(disp), 3.5, atol=1e-4)
        assert float(var.min()) > 4.0


class TestStereoNet:
    @pytest.fixture(scope="class", params=["cfnet", "pcwnet"])
    def net_and_vars(self, request):
        model = stereo.StereoNet(variant=request.param, **TINY_STEREO)
        rng = np.random.default_rng(4)
        left = jnp.asarray(rng.uniform(size=(1, 32, 64, 3)).astype(np.float32))
        right = jnp.asarray(rng.uniform(size=(1, 32, 64, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), left, right)
        return model, variables, left, right

    def test_output_shapes_and_ranges(self, net_and_vars):
        model, variables, left, right = net_and_vars
        out = model.apply(variables, left, right)
        assert out["disparity"].shape == (1, 32, 64)
        assert out["confidence"].shape == (1, 32, 64)
        d = np.asarray(out["disparity"])
        assert np.all(d >= 0) and np.all(np.isfinite(d))
        c = np.asarray(out["confidence"])
        assert np.all(c >= 0) and np.all(c <= 1 + 1e-5)

    def test_training_step_reduces_loss(self, net_and_vars):
        model, variables, left, right = net_and_vars
        gt = jnp.full((1, 32, 64), 6.0)

        def loss_fn(v):
            out = model.apply(v, left, right)
            return stereo.multi_scale_loss(out, gt, model.max_disparity)

        l0, g = jax.value_and_grad(loss_fn)(variables)
        assert np.isfinite(float(l0))
        v2 = jax.tree_util.tree_map(lambda p, gr: p - 1e-3 * gr, variables, g)
        l1 = loss_fn(v2)
        assert float(l1) < float(l0)

    def test_disparity_to_depth(self):
        disp = jnp.array([[10.0, 0.0, 1.0]])
        depth = stereo.disparity_to_depth(disp, focal=700.0, baseline=0.54)
        np.testing.assert_allclose(float(depth[0, 0]), 700 * 0.54 / 10, rtol=1e-5)
        assert float(depth[0, 1]) == 0.0  # invalid disparity -> no depth


class TestCompletion:
    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(5)
        rgb = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        depth = rng.uniform(2, 60, (1, 32, 32)).astype(np.float32)
        sparse = jnp.asarray(np.where(rng.uniform(size=depth.shape) < 0.1, depth, 0))
        return rgb, sparse, jnp.asarray(depth)

    @pytest.mark.parametrize("cls", [completion.DepthCompletionNet,
                                     completion.GuidedCompletionNet])
    def test_forward_and_train_step(self, cls, data):
        rgb, sparse, gt = data
        model = cls(base_features=8)
        variables = model.init(jax.random.PRNGKey(0), rgb, sparse)
        pred = model.apply(variables, rgb, sparse)
        assert pred.shape == (1, 32, 32)
        assert np.all(np.asarray(pred) >= 0)

        def loss_fn(v):
            p = model.apply(v, rgb, sparse)
            return completion.masked_depth_mse(p, gt) + 0.01 * (
                completion.edge_aware_smoothness(p, rgb)
            )

        l0, g = jax.value_and_grad(loss_fn)(variables)
        v2 = jax.tree_util.tree_map(lambda p, gr: p - 1e-4 * gr, variables, g)
        l1 = loss_fn(v2)
        assert np.isfinite(float(l0)) and float(l1) < float(l0)

    def test_masked_losses_ignore_holes(self):
        pred = jnp.array([[5.0, 100.0]])
        target = jnp.array([[4.0, 0.0]])
        np.testing.assert_allclose(
            float(completion.masked_depth_mse(pred, target)), 1.0, rtol=1e-6
        )
        np.testing.assert_allclose(
            float(completion.masked_depth_l1(pred, target)), 1.0, rtol=1e-6
        )

    def test_smoothness_penalizes_noise(self):
        rgb = jnp.ones((1, 16, 16, 3)) * 0.5
        flat = jnp.ones((1, 16, 16)) * 10
        noisy = flat + jnp.asarray(
            np.random.default_rng(6).normal(0, 1, (1, 16, 16))
        )
        assert float(completion.edge_aware_smoothness(flat, rgb)) < 1e-6
        assert float(completion.edge_aware_smoothness(noisy, rgb)) > 0.1


class TestPoseAndWarp:
    def test_bilinear_sample_identity_and_bounds(self):
        from outdoor_nerf_depth_tpu.depth_priors import pose

        rng = np.random.default_rng(30)
        img = jnp.asarray(rng.uniform(size=(6, 8, 3)).astype(np.float32))
        xs, ys = jnp.meshgrid(jnp.arange(8.0), jnp.arange(6.0))
        out = pose.bilinear_sample(img, xs, ys)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
        # Outside -> zero.
        out2 = pose.bilinear_sample(img, xs + 100.0, ys)
        np.testing.assert_allclose(np.asarray(out2), 0.0)

    def test_inverse_warp_pure_translation(self):
        from outdoor_nerf_depth_tpu.depth_priors import pose

        rng = np.random.default_rng(31)
        h, w, z0, fx, dx = 24, 32, 10.0, 50.0, 4
        rgb = rng.uniform(size=(h, w, 3)).astype(np.float32)
        rgb_near = np.roll(rgb, dx, axis=1)  # feature at u appears at u+dx
        K = np.array([[fx, 0, (w - 1) / 2], [0, fx, (h - 1) / 2], [0, 0, 1]],
                     np.float32)
        t = np.array([dx * z0 / fx, 0, 0], np.float32)
        warped, valid = pose.inverse_warp(
            jnp.asarray(rgb_near), jnp.full((h, w), z0), jnp.eye(3), t, K
        )
        v = np.asarray(valid)
        assert v.sum() > 0.5 * v.size
        np.testing.assert_allclose(
            np.asarray(warped)[v], rgb[v], atol=1e-4
        )

    def test_warp_gradient_reaches_depth(self):
        from outdoor_nerf_depth_tpu.depth_priors import pose

        rng = np.random.default_rng(32)
        h, w = 16, 20
        rgb = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
        near = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
        K = np.array([[30.0, 0, 9.5], [0, 30.0, 7.5], [0, 0, 1]], np.float32)
        t = np.array([0.3, 0.0, 0.1], np.float32)

        def loss(depth):
            warped, valid = pose.inverse_warp(near, depth, jnp.eye(3), t, K)
            return completion.photometric_loss(warped, rgb, mask=valid)

        g = jax.grad(loss)(jnp.full((h, w), 5.0))
        g = np.asarray(g)
        assert np.all(np.isfinite(g)) and np.abs(g).sum() > 0

    def test_estimate_pose_pnp_translation(self):
        from outdoor_nerf_depth_tpu.depth_priors import pose

        pytest.importorskip("cv2")
        rng = np.random.default_rng(33)
        h, w, z0, dx = 128, 192, 10.0, 6
        fx = 100.0
        # Blob texture gives ORB corners to latch onto.
        base = rng.uniform(size=(h // 8, w // 8, 3))
        rgb = np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.float32)
        rgb += rng.normal(0, 0.02, rgb.shape).astype(np.float32)
        rgb = np.clip(rgb, 0, 1)
        rgb_near = np.roll(rgb, dx, axis=1)
        depth = np.full((h, w), z0, np.float32)
        K = np.array([[fx, 0, (w - 1) / 2], [0, fx, (h - 1) / 2], [0, 0, 1]],
                     np.float32)
        ok, R, t = pose.estimate_pose_pnp(rgb, rgb_near, depth, K)
        assert ok
        np.testing.assert_allclose(R, np.eye(3), atol=0.05)
        want_tx = dx * z0 / fx
        np.testing.assert_allclose(t[0], want_tx, atol=0.15)

    def test_multiscale_shapes(self):
        from outdoor_nerf_depth_tpu.depth_priors import pose

        img = jnp.ones((16, 24, 3))
        pyr = pose.multiscale(img, 3)
        assert [p.shape[:2] for p in pyr] == [(16, 24), (8, 12), (4, 6)]
        d = jnp.ones((16, 24))
        pyr_d = pose.multiscale(d, 2)
        assert pyr_d[1].shape == (8, 12)


class TestGeneratePriors:
    def test_stereo_prior_pipeline(self, tmp_path):
        import os

        from outdoor_nerf_depth_tpu.depth_priors import generate
        from outdoor_nerf_depth_tpu.utils.image import save_img_u8

        rng = np.random.default_rng(7)
        left_dir, right_dir = str(tmp_path / "l"), str(tmp_path / "r")
        out_dir = str(tmp_path / "out")
        os.makedirs(left_dir)
        os.makedirs(right_dir)
        for i in range(2):
            save_img_u8(rng.uniform(size=(32, 64, 3)), f"{left_dir}/{i:04d}.png")
            save_img_u8(rng.uniform(size=(32, 64, 3)), f"{right_dir}/{i:04d}.png")

        model = stereo.StereoNet(**TINY_STEREO)
        dummy = jnp.zeros((1, 32, 64, 3))
        params = model.init(jax.random.PRNGKey(0), dummy, dummy)
        kwargs = {k: v for k, v in TINY_STEREO.items() if k != "max_disparity"}
        generate.generate_stereo_priors(
            params, left_dir, right_dir, out_dir, focal=700.0, baseline=0.54,
            max_disparity=TINY_STEREO["max_disparity"], model_kwargs=kwargs,
            log_fn=lambda *_: None,
        )
        # Reconfigure net params via kwargs, so re-init with same sizes:
        files = sorted(os.listdir(out_dir))
        assert files == ["0000.png", "0001.png"]
        from outdoor_nerf_depth_tpu.data.datasets import load_image

        d = load_image(os.path.join(out_dir, files[0]))
        assert d.shape == (32, 64) and d.dtype == np.float32
