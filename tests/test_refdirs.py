"""Tests for ops.refdirs and the normals/IDE options of the cone MLP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu.ops import refdirs


class TestReflect:
    def test_mirror_reflection(self):
        n = jnp.array([[0.0, 0.0, 1.0]])
        v = jnp.array([[1.0, 0.0, 1.0]]) / np.sqrt(2)
        r = refdirs.reflect(v, n)
        np.testing.assert_allclose(
            np.asarray(r)[0], [-1 / np.sqrt(2), 0.0, 1 / np.sqrt(2)], atol=1e-6
        )

    def test_preserves_norm_and_dot(self):
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(32, 3)))
        n = refdirs.l2_normalize(jnp.asarray(rng.normal(size=(32, 3))))
        r = refdirs.reflect(v, n)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(r), axis=-1),
            np.linalg.norm(np.asarray(v), axis=-1),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.sum(np.asarray(r) * np.asarray(n), -1),
            np.sum(np.asarray(v) * np.asarray(n), -1),
            rtol=1e-4, atol=1e-5,
        )


class TestIde:
    def test_zero_roughness_matches_scipy_sph_harm(self):
        scipy_special = pytest.importorskip("scipy.special")
        rng = np.random.default_rng(1)
        d = rng.normal(size=(64, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        theta = np.arccos(d[:, 2])
        phi = np.arctan2(d[:, 1], d[:, 0])

        enc = refdirs.generate_dir_enc_fn(3)(jnp.asarray(d))
        enc = np.asarray(enc)

        # Column layout: real parts then imaginary parts over (m, l) pairs
        # l in {1, 2, 4}, m in 0..l.
        ml = []
        for i in range(3):
            l = 2**i
            ml.extend((m, l) for m in range(l + 1))
        m_cols = len(ml)
        sph = getattr(scipy_special, "sph_harm_y", None)
        for col, (m, l) in enumerate(ml):
            if sph is not None:
                want = scipy_special.sph_harm_y(l, m, theta, phi)
            else:
                want = scipy_special.sph_harm(m, l, phi, theta)
            np.testing.assert_allclose(enc[:, col], np.real(want), atol=2e-4)
            np.testing.assert_allclose(
                enc[:, m_cols + col], np.imag(want), atol=2e-4
            )

    def test_roughness_attenuates(self):
        d = refdirs.l2_normalize(
            jnp.asarray(np.random.default_rng(2).normal(size=(16, 3)))
        )
        ide = refdirs.generate_ide_fn(4)
        sharp = np.abs(np.asarray(ide(d, jnp.zeros((16, 1)))))
        rough = np.abs(np.asarray(ide(d, jnp.ones((16, 1)))))
        # Constant-ish l=1 terms shrink less than high-l terms; total shrinks.
        assert rough.mean() < sharp.mean()

    def test_weighted_mae(self):
        n = jnp.array([[[0.0, 0.0, 1.0]], [[1.0, 0.0, 0.0]]])
        gt = jnp.array([[[0.0, 0.0, 1.0]], [[0.0, 0.0, 1.0]]])
        w = jnp.ones((2, 1))
        mae = refdirs.weighted_mae_degrees(w, n, gt)
        np.testing.assert_allclose(float(mae), 45.0, atol=0.1)


class TestMlpNormals:
    def _rays_gaussians(self, n=4, s=3):
        rng = np.random.default_rng(3)
        means = jnp.asarray(rng.uniform(-0.4, 0.4, (n, s, 3)).astype(np.float32))
        covs = jnp.tile(jnp.eye(3) * 1e-4, (n, s, 1, 1))
        viewdirs = refdirs.l2_normalize(
            jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        )
        return means, covs, viewdirs

    def test_density_normals_are_unit_and_finite(self):
        from outdoor_nerf_depth_tpu.models.mlps import ConeFieldMLP

        mlp = ConeFieldMLP(
            net_depth=2, net_width=16, bottleneck_width=8,
            net_width_viewdirs=8, max_deg_point=4,
            compute_density_normals=True, enable_pred_normals=True,
        )
        means, covs, viewdirs = self._rays_gaussians()
        variables = mlp.init(jax.random.PRNGKey(0), None, means, covs, viewdirs)
        out = mlp.apply(variables, None, means, covs, viewdirs)
        for key in ("normals", "normals_pred"):
            n = np.asarray(out[key])
            assert n.shape == (4, 3, 3)
            assert np.all(np.isfinite(n))
            np.testing.assert_allclose(
                np.linalg.norm(n, axis=-1), 1.0, atol=1e-3
            )

    def test_normals_match_finite_difference(self):
        from outdoor_nerf_depth_tpu.models.mlps import ConeFieldMLP

        mlp = ConeFieldMLP(
            net_depth=2, net_width=16, bottleneck_width=8,
            net_width_viewdirs=8, max_deg_point=2,
            compute_density_normals=True, disable_rgb=True,
        )
        means, covs, viewdirs = self._rays_gaussians(n=2, s=2)
        variables = mlp.init(jax.random.PRNGKey(1), None, means, covs, viewdirs)
        out = mlp.apply(variables, None, means, covs, viewdirs)

        # Finite-difference gradient of raw density wrt position.
        def raw_density(m):
            return mlp.apply(
                variables, m, covs, method=ConeFieldMLP.predict_density
            )[0]

        eps = 1e-3
        grads = []
        for axis in range(3):
            dm = jnp.zeros_like(means).at[..., axis].add(eps)
            grads.append((raw_density(means + dm) - raw_density(means - dm)) / (2 * eps))
        fd = -np.stack([np.asarray(g) for g in grads], axis=-1)
        fd = fd / np.maximum(1e-12, np.linalg.norm(fd, axis=-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(out["normals"]), fd, atol=2e-2)

    def test_reflection_and_ide_path_runs(self):
        from outdoor_nerf_depth_tpu.models.mlps import ConeFieldMLP

        mlp = ConeFieldMLP(
            net_depth=2, net_width=16, bottleneck_width=8,
            net_width_viewdirs=8, max_deg_point=2,
            compute_density_normals=True, use_reflections=True,
            use_directional_enc=True, enable_pred_roughness=True,
            use_n_dot_v=True,
        )
        means, covs, viewdirs = self._rays_gaussians()
        variables = mlp.init(jax.random.PRNGKey(2), None, means, covs, viewdirs)
        out = mlp.apply(variables, None, means, covs, viewdirs)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))
        assert out["roughness"].shape == (4, 3, 1)

    def test_orientation_loss_wiring(self):
        from outdoor_nerf_depth_tpu.train import losses

        rng = np.random.default_rng(4)
        history = [
            dict(
                weights=jnp.asarray(rng.uniform(0, 0.2, (4, 3))),
                normals_pred=refdirs.l2_normalize(
                    jnp.asarray(rng.normal(size=(4, 3, 3)))
                ),
                normals=refdirs.l2_normalize(
                    jnp.asarray(rng.normal(size=(4, 3, 3)))
                ),
            )
        ]
        viewdirs = refdirs.l2_normalize(jnp.asarray(rng.normal(size=(4, 3))))
        l_orient = losses.orientation_loss(history, viewdirs, 0.0, 1.0)
        l_pred = losses.predicted_normal_loss(history, 0.0, 1.0)
        assert np.isfinite(float(l_orient)) and float(l_orient) >= 0
        assert np.isfinite(float(l_pred))
