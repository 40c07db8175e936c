"""Tests for ops.mathx: safe numerics and TPU interpolation kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu.ops import mathx


class TestSafeTrig:
    def test_matches_sin_for_moderate_args(self):
        x = jnp.linspace(-50.0, 50.0, 1001)
        np.testing.assert_allclose(mathx.safe_sin(x), jnp.sin(x), atol=1e-6)
        np.testing.assert_allclose(mathx.safe_cos(x), jnp.cos(x), atol=1e-6)

    def test_finite_for_huge_args(self):
        x = jnp.array([1e10, -1e10, 1e20, 3e38])
        assert np.all(np.isfinite(mathx.safe_sin(x)))
        assert np.all(np.isfinite(mathx.safe_cos(x)))


class TestSafeExp:
    def test_forward_finite(self):
        x = jnp.array([-100.0, 0.0, 80.0, 100.0, 1000.0])
        y = mathx.safe_exp(x)
        assert np.all(np.isfinite(y))
        np.testing.assert_allclose(y[1], 1.0)

    def test_grad_finite_and_large_above_clamp(self):
        g = jax.grad(lambda x: mathx.safe_exp(x))(100.0)
        assert np.isfinite(g)
        assert g > 1e30  # True gradient at the clamp, not zero.

    def test_grad_matches_exp_below_clamp(self):
        g = jax.vmap(jax.grad(mathx.safe_exp))(jnp.linspace(-5, 5, 11))
        np.testing.assert_allclose(g, jnp.exp(jnp.linspace(-5, 5, 11)), rtol=1e-6)


class TestLrSchedule:
    def test_endpoints(self):
        lr0 = mathx.lr_schedule(0, 1e-3, 1e-5, 1000)
        lr1 = mathx.lr_schedule(1000, 1e-3, 1e-5, 1000)
        np.testing.assert_allclose(lr0, 1e-3, rtol=1e-4)
        np.testing.assert_allclose(lr1, 1e-5, rtol=1e-4)

    def test_log_linear_midpoint(self):
        mid = mathx.lr_schedule(500, 1e-3, 1e-5, 1000)
        np.testing.assert_allclose(mid, 1e-4, rtol=1e-4)

    def test_warmup_scales_start(self):
        lr = mathx.lr_schedule(0, 1e-3, 1e-5, 1000, warmup_steps=100, warmup_mult=0.1)
        np.testing.assert_allclose(lr, 1e-4, rtol=1e-5)
        lr_end = mathx.lr_schedule(
            100, 1e-3, 1e-5, 1000, warmup_steps=100, warmup_mult=0.1
        )
        expected = mathx.lr_schedule(100, 1e-3, 1e-5, 1000)
        np.testing.assert_allclose(lr_end, expected, rtol=1e-5)


class TestInterp:
    def _random_problem(self, rng, batch, n_knots, n_query):
        xp = np.sort(rng.uniform(-1, 1, (batch, n_knots)), axis=-1)
        fp = np.sort(rng.uniform(-1, 1, (batch, n_knots)), axis=-1)
        x = np.sort(rng.uniform(-0.95, 0.95, (batch, n_query)), axis=-1)
        return jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp)

    def test_sorted_matches_gather_variant(self):
        # The TPU (comparison) and GPU (gather) paths must agree — the
        # device-equivalence property the reference pins in
        # tests/stepfun_test.py::test_gpu_vs_tpu_resampling.
        x, xp, fp = self._random_problem(np.random.default_rng(0), 16, 33, 65)
        np.testing.assert_allclose(
            mathx.sorted_interp(x, xp, fp),
            mathx.gather_interp(x, xp, fp),
            atol=1e-5,
        )

    def test_matches_numpy_interp(self):
        x, xp, fp = self._random_problem(np.random.default_rng(1), 4, 17, 31)
        got = np.asarray(mathx.sorted_interp(x, xp, fp))
        for b in range(4):
            want = np.interp(x[b], xp[b], fp[b])
            np.testing.assert_allclose(got[b], want, atol=1e-5)

    def test_out_of_range_clamps(self):
        xp = jnp.array([[0.0, 1.0, 2.0]])
        fp = jnp.array([[10.0, 20.0, 30.0]])
        x = jnp.array([[-5.0, 5.0]])
        got = mathx.sorted_interp(x, xp, fp)
        np.testing.assert_allclose(got, [[10.0, 30.0]])

    def test_grad_is_finite(self):
        x, xp, fp = self._random_problem(np.random.default_rng(2), 2, 9, 5)
        g = jax.grad(lambda f: jnp.sum(mathx.sorted_interp(x, xp, f)))(fp)
        assert np.all(np.isfinite(g))


class TestSearchsortedPair:
    def test_matches_numpy_for_interior_queries(self):
        rng = np.random.default_rng(3)
        a = np.sort(rng.uniform(0, 1, (17,)))
        v = rng.uniform(a[0], a[-1], (33,))
        lo, hi = mathx.searchsorted_pair(jnp.asarray(a)[None], jnp.asarray(v)[None])
        want_hi = np.searchsorted(a, v, side="right")
        np.testing.assert_array_equal(np.asarray(hi)[0], want_hi)
        np.testing.assert_array_equal(np.asarray(lo)[0], want_hi - 1)

    def test_out_of_range_pins_to_ends(self):
        a = jnp.array([[0.0, 1.0, 2.0]])
        lo, hi = mathx.searchsorted_pair(a, jnp.array([[-1.0, 3.0]]))
        np.testing.assert_array_equal(lo[0], [0, 2])
        np.testing.assert_array_equal(hi[0], [0, 2])


def test_log_lerp_validates_endpoints():
    with pytest.raises(ValueError):
        mathx.log_lerp(0.5, -1.0, 1.0)
