"""Tests for ops.volren: Monte-Carlo checks of frustum Gaussians, compositing."""

import jax.numpy as jnp
import numpy as np

from outdoor_nerf_depth_tpu.ops import volren


class TestGaussianizeCone:
    def test_matches_monte_carlo_moments(self):
        # Sample points uniformly inside the conical frustum and compare the
        # empirical axial mean/var and radial var against the closed form —
        # the reference's strategy in tests/render_test.py:260-330.
        rng = np.random.default_rng(0)
        t0, t1, r = 1.5, 2.5, 0.1
        n = 400_000
        # Uniform in volume: p(t) ∝ t^2 within [t0, t1].
        u = rng.uniform(size=n)
        t = (t0**3 + u * (t1**3 - t0**3)) ** (1.0 / 3.0)
        radius = t * r * np.sqrt(rng.uniform(size=n))
        theta = rng.uniform(0, 2 * np.pi, n)
        x, y = radius * np.cos(theta), radius * np.sin(theta)

        d = jnp.array([0.0, 0.0, 1.0])
        t_mean, t_var, r_var = volren.gaussianize_cone(
            d, jnp.array(t0), jnp.array(t1), jnp.array(r)
        )
        np.testing.assert_allclose(float(t_mean), t.mean(), rtol=1e-3)
        np.testing.assert_allclose(float(t_var), t.var(), rtol=2e-2)
        np.testing.assert_allclose(float(r_var), x.var(), rtol=2e-2)
        np.testing.assert_allclose(float(r_var), y.var(), rtol=2e-2)

    def test_finite_for_degenerate_frustum(self):
        d = jnp.array([0.0, 0.0, 1.0])
        vals = volren.gaussianize_cone(d, jnp.array(0.0), jnp.array(0.0), jnp.array(0.1))
        assert all(np.isfinite(float(v)) for v in vals)


class TestLiftTo3d:
    def test_diagonal_matches_full(self):
        rng = np.random.default_rng(1)
        d = jnp.asarray(rng.normal(size=(8, 3)))
        t_mean = jnp.asarray(rng.uniform(1, 2, (8, 4)))
        t_var = jnp.asarray(rng.uniform(0.01, 0.1, (8, 4)))
        r_var = jnp.asarray(rng.uniform(0.01, 0.1, (8, 4)))
        _, cov_diag = volren.lift_to_3d(d, t_mean, t_var, r_var, diagonal=True)
        _, cov_full = volren.lift_to_3d(d, t_mean, t_var, r_var, diagonal=False)
        np.testing.assert_allclose(
            np.asarray(cov_diag),
            np.diagonal(np.asarray(cov_full), axis1=-2, axis2=-1),
            rtol=1e-5, atol=1e-6,
        )

    def test_mean_along_direction(self):
        d = jnp.array([[2.0, 0.0, 0.0]])
        mean, _ = volren.lift_to_3d(
            d, jnp.array([[3.0]]), jnp.array([[0.1]]), jnp.array([[0.1]]), True
        )
        np.testing.assert_allclose(np.asarray(mean)[0, 0], [6.0, 0.0, 0.0])


class TestCastRays:
    def test_shapes_and_origin_offset(self):
        rng = np.random.default_rng(2)
        origins = jnp.asarray(rng.normal(size=(16, 3)))
        dirs = jnp.asarray(rng.normal(size=(16, 3)))
        tdist = jnp.sort(jnp.asarray(rng.uniform(1, 5, (16, 9))), axis=-1)
        radii = jnp.full((16, 1), 0.01)
        means, covs = volren.cast_rays(tdist, origins, dirs, radii, diagonal=False)
        assert means.shape == (16, 8, 3)
        assert covs.shape == (16, 8, 3, 3)
        means0, _ = volren.cast_rays(
            tdist, jnp.zeros_like(origins), dirs, radii, diagonal=False
        )
        np.testing.assert_allclose(
            np.asarray(means - origins[:, None, :]), np.asarray(means0), atol=1e-5
        )


class TestAlphaComposite:
    def test_weights_bounded_and_transmittance_decreasing(self):
        rng = np.random.default_rng(3)
        density = jnp.asarray(rng.uniform(0, 5, (32, 16)))
        tdist = jnp.sort(jnp.asarray(rng.uniform(1, 10, (32, 17))), axis=-1)
        dirs = jnp.asarray(rng.normal(size=(32, 3)))
        w, alpha, trans = volren.alpha_composite_weights(density, tdist, dirs)
        assert np.all(np.asarray(w) >= 0)
        assert np.all(np.asarray(w).sum(-1) <= 1 + 1e-5)
        assert np.all(np.diff(np.asarray(trans), axis=-1) <= 1e-6)
        np.testing.assert_allclose(np.asarray(w), np.asarray(alpha * trans))

    def test_extreme_density_stays_finite(self):
        density = jnp.full((4, 8), 1e10)
        tdist = jnp.tile(jnp.linspace(1, 2, 9), (4, 1))
        dirs = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1))
        w, _, _ = volren.alpha_composite_weights(density, tdist, dirs)
        assert np.all(np.isfinite(np.asarray(w)))
        np.testing.assert_allclose(np.asarray(w)[:, 0], 1.0, atol=1e-5)

    def test_opaque_background_sums_to_one(self):
        density = jnp.zeros((4, 8))
        tdist = jnp.tile(jnp.linspace(1, 2, 9), (4, 1))
        dirs = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1))
        w, _, _ = volren.alpha_composite_weights(
            density, tdist, dirs, opaque_background=True
        )
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)

    def test_direction_norm_scales_optical_depth(self):
        density = jnp.ones((1, 8))
        tdist = jnp.linspace(0, 1, 9)[None]
        w1, _, _ = volren.alpha_composite_weights(
            density, tdist, jnp.array([[0.0, 0.0, 1.0]])
        )
        w2, _, _ = volren.alpha_composite_weights(
            density, tdist, jnp.array([[0.0, 0.0, 2.0]])
        )
        assert float(w2.sum()) > float(w1.sum())


class TestComposite:
    def _delta_scene(self, hit_bin=10, n=32):
        # All mass in one bin -> depth should equal that bin's midpoint.
        tdist = jnp.tile(jnp.linspace(1.0, 9.0, n + 1), (4, 1))
        weights = jnp.zeros((4, n)).at[:, hit_bin].set(1.0)
        rgbs = jnp.ones((4, n, 3)) * 0.5
        return tdist, weights, rgbs

    def test_delta_depth(self):
        tdist, weights, rgbs = self._delta_scene()
        out = volren.composite(
            rgbs, weights, tdist, jnp.zeros(3), jnp.full((4, 1), 100.0), True
        )
        mid = 0.5 * (tdist[0, 10] + tdist[0, 11])
        np.testing.assert_allclose(np.asarray(out["depth"]), mid, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["distance_mean"]), mid, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["acc"]), 1.0, atol=1e-6)

    def test_background_fill(self):
        tdist = jnp.tile(jnp.linspace(1.0, 9.0, 9), (2, 1))
        weights = jnp.zeros((2, 8))
        rgbs = jnp.zeros((2, 8, 3))
        out = volren.composite(
            rgbs, weights, tdist, jnp.array([1.0, 0.5, 0.25]), jnp.full((2, 1), 10.0),
            False,
        )
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.tile([1.0, 0.5, 0.25], (2, 1)), atol=1e-6
        )

    def test_percentile_ordering_and_median(self):
        rng = np.random.default_rng(4)
        tdist = jnp.sort(jnp.asarray(rng.uniform(1, 10, (16, 33))), axis=-1)
        w = jnp.asarray(rng.uniform(0, 1, (16, 32)))
        w = w / w.sum(-1, keepdims=True) * 0.9
        rgbs = jnp.asarray(rng.uniform(0, 1, (16, 32, 3)))
        out = volren.composite(
            rgbs, w, tdist, jnp.zeros(3), jnp.full((16, 1), 50.0), True
        )
        p5 = np.asarray(out["distance_percentile_5"])
        p50 = np.asarray(out["distance_median"])
        p95 = np.asarray(out["distance_percentile_95"])
        assert np.all(p5 <= p50 + 1e-5) and np.all(p50 <= p95 + 1e-5)

    def test_extras_are_composited(self):
        tdist, weights, rgbs = self._delta_scene()
        feat = jnp.ones((4, 32, 5)) * 2.0
        out = volren.composite(
            rgbs, weights, tdist, jnp.zeros(3), jnp.full((4, 1), 100.0), True,
            extras={"feat": feat, "missing": None},
        )
        np.testing.assert_allclose(np.asarray(out["feat"]), 2.0, atol=1e-6)
        assert "missing" not in out
