"""Tests for ops.geometry: sphere intersection and inverted-sphere warp."""

import jax.numpy as jnp
import numpy as np

from outdoor_nerf_depth_tpu.ops import geometry


class TestIntersectUnitSphere:
    def test_ray_from_origin(self):
        d = jnp.array([[0.0, 0.0, 2.0], [3.0, 0.0, 0.0]])
        o = jnp.zeros((2, 3))
        t, valid = geometry.intersect_unit_sphere(o, d)
        np.testing.assert_allclose(np.asarray(t), [0.5, 1.0 / 3.0], atol=1e-6)
        assert np.all(np.asarray(valid))

    def test_exit_point_on_sphere(self):
        rng = np.random.default_rng(0)
        o = jnp.asarray(rng.uniform(-0.3, 0.3, (64, 3)))
        d = jnp.asarray(rng.normal(size=(64, 3)))
        t, valid = geometry.intersect_unit_sphere(o, d)
        assert np.all(np.asarray(valid))
        exit_pts = np.asarray(o + t[..., None] * d)
        np.testing.assert_allclose(np.linalg.norm(exit_pts, axis=-1), 1.0, atol=1e-5)

    def test_invalid_ray_flagged_finite(self):
        # Origin outside the sphere pointing away: no intersection.
        o = jnp.array([[5.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 1.0, 0.0]])
        t, valid = geometry.intersect_unit_sphere(o, d)
        assert not bool(valid[0])
        assert np.isfinite(float(t[0]))


class TestInvertedSpherePoints:
    def test_unit_inv_radius_is_exit_point(self):
        rng = np.random.default_rng(1)
        o = jnp.asarray(rng.uniform(-0.3, 0.3, (32, 3)))
        d = jnp.asarray(rng.normal(size=(32, 3)))
        pts, t_metric = geometry.inverted_sphere_points(o, d, jnp.ones((32,)))
        t_exit, _ = geometry.intersect_unit_sphere(o, d)
        exit_pts = np.asarray(o + t_exit[..., None] * d)
        np.testing.assert_allclose(np.asarray(pts)[:, :3], exit_pts, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_metric), np.asarray(t_exit), atol=1e-4)

    def test_point_lies_on_radius_shell(self):
        # The returned unit vector scaled by 1/inv_r must lie on the ray.
        rng = np.random.default_rng(2)
        o = jnp.asarray(rng.uniform(-0.2, 0.2, (64, 3)))
        d = jnp.asarray(rng.normal(size=(64, 3)))
        inv_r = jnp.asarray(rng.uniform(0.05, 0.9, (64,)))
        pts, t_metric = geometry.inverted_sphere_points(o, d, inv_r)
        world = np.asarray(pts)[:, :3] / np.asarray(inv_r)[:, None]
        on_ray = np.asarray(o + t_metric[..., None] * d)
        np.testing.assert_allclose(world, on_ray, atol=1e-3)

    def test_fourth_channel_is_inverse_radius(self):
        o = jnp.zeros((4, 3))
        d = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (4, 1))
        inv_r = jnp.array([0.1, 0.3, 0.5, 0.9])
        pts, _ = geometry.inverted_sphere_points(o, d, inv_r)
        np.testing.assert_allclose(np.asarray(pts)[:, 3], np.asarray(inv_r))

    def test_depth_grows_as_radius_grows(self):
        o = jnp.zeros((8, 3))
        d = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (8, 1))
        inv_r = jnp.linspace(0.9, 0.05, 8)
        _, t_metric = geometry.inverted_sphere_points(o, d, inv_r)
        assert np.all(np.diff(np.asarray(t_metric)) > 0)
