"""Tests for train.losses and train.metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu.train import losses, metrics


class TestRgbLoss:
    def test_mse_matches_direct(self):
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.uniform(size=(32, 3)))
        tgt = jnp.asarray(rng.uniform(size=(32, 3)))
        loss, mse = losses.rgb_loss(pred, tgt, kind="mse")
        np.testing.assert_allclose(float(loss), float(((pred - tgt) ** 2).mean()), rtol=1e-6)
        np.testing.assert_allclose(float(loss), float(mse), rtol=1e-6)

    def test_lossmult_zeroes_rays(self):
        pred = jnp.ones((4, 3))
        tgt = jnp.zeros((4, 3))
        lm = jnp.array([[1.0], [0.0], [0.0], [0.0]])
        loss, _ = losses.rgb_loss(pred, tgt, lossmult=lm)
        np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)

    def test_charb_close_to_l1_for_large_resid(self):
        pred, tgt = jnp.full((8, 3), 2.0), jnp.zeros((8, 3))
        loss, _ = losses.rgb_loss(pred, tgt, kind="charb")
        np.testing.assert_allclose(float(loss), 2.0, rtol=1e-4)


class TestExpectedDepthLoss:
    def test_invalid_rays_ignored(self):
        pred = jnp.array([5.0, 100.0])
        sup = jnp.array([4.0, -1.0])  # second invalid
        loss_all = losses.expected_depth_loss(pred, sup, reduce="mean_all")
        np.testing.assert_allclose(float(loss_all), 1.0 / 2, rtol=1e-6)
        loss_valid = losses.expected_depth_loss(pred, sup, reduce="mean_valid")
        np.testing.assert_allclose(float(loss_valid), 1.0, rtol=1e-6)

    def test_l1(self):
        pred = jnp.array([5.0, 2.0])
        sup = jnp.array([4.0, 4.5])
        loss = losses.expected_depth_loss(pred, sup, kind="l1", reduce="mean_valid")
        np.testing.assert_allclose(float(loss), (1.0 + 2.5) / 2, rtol=1e-6)


class TestKlLoss:
    def _setup(self, depth=3.0):
        t = jnp.linspace(1.0, 5.0, 17)[None]
        steps = 0.5 * (t[..., 1:] + t[..., :-1])
        lengths = jnp.diff(t, axis=-1)
        return steps, lengths

    def test_weight_at_depth_minimizes(self):
        steps, lengths = self._setup()
        sup = jnp.array([3.0])
        # All mass exactly at the supervised depth.
        on_target = jnp.zeros((1, 16)).at[0, 8].set(1.0)
        off_target = jnp.zeros((1, 16)).at[0, 0].set(1.0)
        l_on = losses.ds_nerf_kl_loss(on_target, sup, steps, lengths, sigma=0.01)
        l_off = losses.ds_nerf_kl_loss(off_target, sup, steps, lengths, sigma=0.01)
        assert float(l_on) < float(l_off)

    def test_invalid_depth_gives_zero(self):
        steps, lengths = self._setup()
        w = jnp.ones((1, 16)) / 16
        loss = losses.ds_nerf_kl_loss(w, jnp.array([-1.0]), steps, lengths, 0.1)
        np.testing.assert_allclose(float(loss), 0.0)

    def test_fg_far_masks_beyond_sphere(self):
        steps, lengths = self._setup()
        w = jnp.ones((1, 16)) / 16
        sup = jnp.array([3.0])
        loss_in = losses.ds_nerf_kl_loss(w, sup, steps, lengths, 0.1,
                                         fg_far=jnp.array([10.0]))
        loss_out = losses.ds_nerf_kl_loss(w, sup, steps, lengths, 0.1,
                                          fg_far=jnp.array([2.0]))
        assert float(loss_in) > 0
        np.testing.assert_allclose(float(loss_out), 0.0)

    def test_gradient_pulls_weights_toward_depth(self):
        steps, lengths = self._setup()
        sup = jnp.array([3.0])
        w = jnp.ones((1, 16)) / 16
        g = jax.grad(
            lambda w: losses.ds_nerf_kl_loss(w, sup, steps, lengths, 0.05)
        )(w)
        g = np.asarray(g)[0]
        # Gradient most negative (strongest increase pressure) near the depth.
        assert np.argmin(g) in (7, 8)


class TestGaussianNllLoss:
    def _setup(self):
        steps = jnp.linspace(1.0, 5.0, 16)[None].repeat(2, 0)
        return steps

    def test_inside_distribution_is_zero(self):
        steps = self._setup()
        # Prediction exactly at the measurement, with tiny predicted variance
        # and a generous measurement std -> the apply-mask is empty.
        w = jnp.zeros((2, 16)).at[:, 8].set(1.0)
        pred = steps[:, 8]
        sup = pred
        loss = losses.gaussian_nll_depth_loss(pred, steps, w, sup, 1.0)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_outside_mean_penalized(self):
        steps = self._setup()
        w = jnp.zeros((2, 16)).at[:, 8].set(1.0)
        pred = steps[:, 8]
        sup_off = pred + 3.0  # |delta| > std -> applied
        loss = losses.gaussian_nll_depth_loss(pred, steps, w, sup_off, 0.5)
        assert float(loss) > 0

    def test_invalid_rays_masked(self):
        steps = self._setup()
        w = jnp.ones((2, 16)) / 16
        pred = jnp.array([3.0, 3.0])
        sup = jnp.array([-1.0, -1.0])
        loss = losses.gaussian_nll_depth_loss(pred, steps, w, sup, 0.1)
        np.testing.assert_allclose(float(loss), 0.0)

    def test_matches_reference_masked_sum_form(self):
        # Hand-computed: variance term + mean term over applied rays / N.
        steps = self._setup()
        w = jnp.ones((2, 16)) / 16
        pred = jnp.array([3.0, 3.0])
        sup = jnp.array([5.0, -1.0])  # ray0 applied (|2| > 0.5), ray1 invalid
        std = 0.5
        pred_var = float(jnp.sum((steps[0] - 3.0) ** 2 / 16) + 1e-5)
        want = 0.5 * (np.log(pred_var) + 4.0 / pred_var) / 2  # / N rays
        loss = losses.gaussian_nll_depth_loss(pred, steps, w, sup, std)
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_gradient_finite(self):
        steps = self._setup()
        w = jnp.ones((2, 16)) / 16
        sup = jnp.array([4.5, 2.0])
        g = jax.grad(
            lambda p: losses.gaussian_nll_depth_loss(p, steps, w, sup, 0.2)
        )(jnp.array([3.0, 3.0]))
        assert np.all(np.isfinite(np.asarray(g)))


class TestUrfLoss:
    def test_perfect_prediction_is_small(self):
        t = jnp.linspace(1.0, 5.0, 33)[None]
        steps = 0.5 * (t[..., 1:] + t[..., :-1])
        sup = jnp.array([3.0])
        sigma = 0.3
        scale = sigma / losses.URF_SIGMA_SCALE
        target_w = jnp.exp(
            -((steps - 3.0) ** 2) / (2 * scale**2)
        ) / (scale * jnp.sqrt(2 * jnp.pi))
        good = losses.urban_rf_depth_loss(target_w, sup, jnp.array([3.0]), steps, sigma)
        bad = losses.urban_rf_depth_loss(
            jnp.roll(target_w, 10, axis=-1), sup, jnp.array([1.5]), steps, sigma
        )
        assert float(good) < float(bad)


class TestRegularizers:
    def test_interlevel_zero_for_identical_histograms(self):
        t = jnp.sort(jnp.asarray(np.random.default_rng(1).uniform(0, 1, (4, 9))), -1)
        w = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (4, 8)))
        w /= w.sum(-1, keepdims=True)
        hist = [dict(sdist=t, weights=w), dict(sdist=t, weights=w)]
        np.testing.assert_allclose(float(losses.interlevel_loss(hist)), 0.0, atol=1e-6)

    def test_interlevel_no_grad_to_final_level(self):
        t = jnp.linspace(0, 1, 9)[None].repeat(2, 0)
        w_nerf = jnp.ones((2, 8)) / 8

        def f(w_prop):
            hist = [dict(sdist=t, weights=w_prop), dict(sdist=t, weights=w_nerf * 2)]
            return losses.interlevel_loss(hist)

        g = jax.grad(f)(jnp.ones((2, 8)) / 16)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0

    def test_opacity_entropy_extremes(self):
        concentrated = losses.opacity_entropy_loss(jnp.array([0.0001, 0.9999]))
        uncertain = losses.opacity_entropy_loss(jnp.array([0.37, 0.37]))
        assert float(concentrated) < float(uncertain)

    def test_distortion_prefers_compact(self):
        t = jnp.linspace(0, 1, 17)[None]
        peaked = jnp.zeros((1, 16)).at[0, 8].set(1.0)
        spread = jnp.ones((1, 16)) / 16
        l1 = losses.distortion_loss([dict(sdist=t, weights=peaked)])
        l2 = losses.distortion_loss([dict(sdist=t, weights=spread)])
        assert float(l1) < float(l2)


class TestMetrics:
    def test_psnr_golden(self):
        np.testing.assert_allclose(float(metrics.mse_to_psnr(jnp.array(0.01))), 20.0,
                                   rtol=1e-4)
        np.testing.assert_allclose(
            float(metrics.psnr_to_mse(jnp.array(20.0))), 0.01, rtol=1e-4
        )

    def test_depth_metrics_perfect(self):
        gt = jnp.asarray(np.random.default_rng(3).uniform(1, 70, (64,)))
        m = metrics.depth_metrics(gt, gt)
        np.testing.assert_allclose(float(m["rmse"]), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(m["abs_rel"]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(m["delta_1"]), 1.0)

    def test_depth_metrics_cap_and_mask(self):
        gt = jnp.array([10.0, 100.0, -1.0, 40.0])  # 100 above cap, -1 invalid
        pred = jnp.array([12.0, 50.0, 5.0, 40.0])
        m = metrics.depth_metrics(pred, gt)
        np.testing.assert_allclose(float(m["n_valid"]), 2.0)
        want_rmse = np.sqrt((4.0 + 0.0) / 2)
        np.testing.assert_allclose(float(m["rmse"]), want_rmse, rtol=1e-5)

    def test_depth_scale_rescales(self):
        scale = 0.05
        gt_m = np.random.default_rng(4).uniform(5, 60, (32,))
        pred_m = gt_m * 1.1
        m_metric = metrics.depth_metrics(jnp.asarray(pred_m), jnp.asarray(gt_m))
        m_scaled = metrics.depth_metrics(
            jnp.asarray(pred_m * scale), jnp.asarray(gt_m * scale), depth_scale=scale
        )
        np.testing.assert_allclose(
            float(m_scaled["rmse"]), float(m_metric["rmse"]), rtol=1e-4
        )

    def test_prediction_above_cap_clamped(self):
        gt = jnp.array([70.0])
        pred = jnp.array([500.0])
        m = metrics.depth_metrics(pred, gt)
        np.testing.assert_allclose(float(m["rmse"]), 10.0, rtol=1e-5)

    def test_ssim_identity(self):
        img = jnp.asarray(np.random.default_rng(5).uniform(size=(16, 16, 3)))
        np.testing.assert_allclose(float(metrics.ssim(img, img)), 1.0, atol=1e-4)


def test_ssim_near_constant_regions_stay_in_range():
    """Regression: bf16-grade conv precision made var = E[x^2]-E[x]^2 go
    negative on near-constant (black-sky) windows, flipping the SSIM
    denominator sign (measured ssim=-3.08 on TPU for a render whose CPU
    ssim was 0.974). HIGHEST-precision conv + variance clamping pin it."""
    import jax
    import jax.numpy as jnp

    from outdoor_nerf_depth_tpu.train import metrics

    rng = np.random.RandomState(0)
    # Mostly exact-zero sky with a textured band, like the KITTI fixture.
    gt = np.zeros((94, 310, 3), np.float32)
    gt[70:, :, :] = rng.uniform(0.2, 0.6, (24, 310, 3))
    pred = gt + rng.normal(0, 0.01, gt.shape).astype(np.float32)
    pred[:70] = np.abs(rng.normal(0, 1e-4, (70, 310, 3))).astype(np.float32)
    s = float(metrics.ssim(jnp.asarray(pred), jnp.asarray(gt)))
    assert -1.0 <= s <= 1.0
    assert s > 0.9

    # Exactly-identical images score ~1 even when constant.
    s1 = float(metrics.ssim(jnp.asarray(gt), jnp.asarray(gt)))
    assert s1 > 0.99
