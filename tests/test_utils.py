"""Tests for utils.image, utils.vis, ops.guided_conv, offline evaluator."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from outdoor_nerf_depth_tpu.ops import guided_conv
from outdoor_nerf_depth_tpu.utils import image, vis


class TestIdempotentGuard:
    def test_experiment_finished_detection(self, tmp_path):
        import train as train_cli
        from outdoor_nerf_depth_tpu.train.config import Config

        exp = str(tmp_path / "exp")
        config = Config(exp_dir=exp, max_steps=100)
        assert not train_cli.experiment_finished(config)
        os.makedirs(os.path.join(exp, "checkpoints", "100"))
        assert not train_cli.experiment_finished(config)  # no renders yet
        os.makedirs(os.path.join(exp, "renders"))
        assert not train_cli.experiment_finished(config)  # renders empty
        open(os.path.join(exp, "renders", "color_000.png"), "w").close()
        assert train_cli.experiment_finished(config)


class TestSrgb:
    def test_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 256)
        np.testing.assert_allclose(
            np.asarray(image.srgb_to_linear(image.linear_to_srgb(x))), x, atol=1e-5
        )

    def test_known_values(self):
        np.testing.assert_allclose(float(image.linear_to_srgb(jnp.array(0.0))), 0.0,
                                   atol=1e-7)
        np.testing.assert_allclose(float(image.linear_to_srgb(jnp.array(1.0))), 1.0,
                                   atol=1e-5)
        # 18% gray maps to ~0.46 in sRGB.
        np.testing.assert_allclose(
            float(image.linear_to_srgb(jnp.array(0.18))), 0.4613, atol=1e-3
        )


class TestDownsample:
    def test_box_average(self):
        img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
        out = image.downsample(img, 2)
        np.testing.assert_allclose(out[..., 0], [[2.5, 4.5], [10.5, 12.5]])

    def test_rejects_nondivisible(self):
        import pytest

        with pytest.raises(ValueError):
            image.downsample(np.zeros((5, 4, 3)), 2)


class TestColorCorrect:
    def test_identity_when_matched(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0.1, 0.9, (16, 16, 3)).astype(np.float32)
        out = image.color_correct(img, img)
        np.testing.assert_allclose(out, img, atol=5e-3)

    def test_fixes_global_gain(self):
        rng = np.random.default_rng(1)
        ref = rng.uniform(0.1, 0.8, (24, 24, 3)).astype(np.float32)
        img = np.clip(ref * 0.7 + 0.05, 0, 1).astype(np.float32)
        out = image.color_correct(img, ref)
        before = np.abs(img - ref).mean()
        after = np.abs(out - ref).mean()
        assert after < 0.2 * before


class TestImageIO:
    def test_u8_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        img = rng.uniform(size=(8, 12, 3)).astype(np.float32)
        p = os.path.join(tmp_path, "img.png")
        image.save_img_u8(img, p)
        from outdoor_nerf_depth_tpu.data.datasets import load_image

        back = load_image(p) / 255.0
        np.testing.assert_allclose(back, img, atol=1.0 / 255)

    def test_depth_u16_roundtrip(self, tmp_path):
        depth = np.array([[1.5, 20.25], [79.996, 0.0]], np.float32)
        p = os.path.join(tmp_path, "d.png")
        image.save_depth_u16(depth, p)
        from outdoor_nerf_depth_tpu.data.datasets import load_image

        back = load_image(p) / 256.0
        np.testing.assert_allclose(back, depth, atol=1.0 / 256)


class TestVis:
    def test_colorize_shapes_and_invalid(self):
        val = np.array([[0.0, 1.0], [np.nan, 0.5]])
        rgb = vis.colorize(val, invalid_color=(1.0, 0.0, 0.0))
        assert rgb.shape == (2, 2, 3)
        np.testing.assert_allclose(rgb[1, 0], [1.0, 0.0, 0.0])
        assert rgb.min() >= 0 and rgb.max() <= 1

    def test_visualize_depth(self):
        depth = np.random.default_rng(3).uniform(1, 50, (8, 8))
        rgb = vis.visualize_depth(depth, acc=np.ones((8, 8)) * 0.5)
        assert rgb.shape == (8, 8, 3)
        assert rgb.max() <= 0.5 + 1e-6  # dimmed by acc

    def test_error_map_handles_invalid(self):
        pred = np.full((4, 4), 10.0)
        gt = np.full((4, 4), 12.0)
        gt[0, 0] = -1
        rgb = vis.depth_error_map(pred, gt)
        np.testing.assert_allclose(rgb[0, 0], [0.5, 0.5, 0.5])

    def test_ray_weight_strip(self):
        t = np.tile(np.linspace(0, 1, 9), (4, 1))
        w = np.random.default_rng(4).uniform(size=(4, 8))
        strip = vis.ray_weight_strip(t, w, width=64)
        assert strip.shape == (4, 64, 3)

    def test_side_by_side(self):
        a = np.zeros((4, 6, 3))
        b = np.ones((4, 5, 3))
        out = vis.side_by_side(a, b)
        assert out.shape == (4, 6 + 2 + 5, 3)


class TestGuidedConv:
    def test_uniform_kernel_is_box_filter(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(size=(1, 6, 6, 2)).astype(np.float32))
        w = jnp.full((1, 6, 6, 9, 2), 1.0 / 9.0)
        out = guided_conv.guided_local_conv(x, w)
        # Interior pixel = 3x3 mean.
        want = np.asarray(x)[0, 0:3, 0:3, 0].mean()
        np.testing.assert_allclose(float(out[0, 1, 1, 0]), want, rtol=1e-5)

    def test_identity_kernel(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.uniform(size=(2, 5, 5, 3)).astype(np.float32))
        w = jnp.zeros((2, 5, 5, 9, 3)).at[..., 4, :].set(1.0)  # center tap
        out = guided_conv.guided_local_conv(x, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_gradients_flow_to_both_inputs(self):
        x = jnp.ones((1, 4, 4, 1))
        w = jnp.full((1, 4, 4, 9, 1), 0.1)
        gx, gw = jax.grad(
            lambda x, w: jnp.sum(guided_conv.guided_local_conv(x, w)), argnums=(0, 1)
        )(x, w)
        assert float(jnp.abs(gx).sum()) > 0 and float(jnp.abs(gw).sum()) > 0


class TestOfflineEval:
    def test_end_to_end(self, tmp_path):
        from outdoor_nerf_depth_tpu.train import offline_eval

        rng = np.random.default_rng(7)
        gt_dir = os.path.join(tmp_path, "images")
        pred_dir = os.path.join(tmp_path, "preds")
        os.makedirs(gt_dir)
        os.makedirs(pred_dir)
        # 12 images -> test views at indices 9 (rank 0).
        imgs = rng.uniform(size=(12, 16, 16, 3)).astype(np.float32)
        for i, img in enumerate(imgs):
            image.save_img_u8(img, os.path.join(gt_dir, f"{i:06d}.png"))
        image.save_img_u8(imgs[9], os.path.join(pred_dir, "color_000.png"))

        out_path = os.path.join(tmp_path, "metrics.txt")
        per_image, mean = offline_eval.evaluate_renders(
            gt_dir, pred_dir, out_path=out_path, log_fn=lambda *_: None
        )
        assert len(per_image) == 1
        assert mean["psnr"] > 40  # identical up to 8-bit quantization
        assert os.path.exists(out_path)
