"""Tests for ops.spaces: contraction, warps, Gaussian tracking, encodings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu.ops import spaces


class TestContract:
    def test_identity_inside_unit_ball(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-0.57, 0.57, (64, 3))  # |x| < 1
        np.testing.assert_allclose(spaces.contract(jnp.asarray(x)), x, atol=1e-6)

    def test_output_bounded_by_two(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(-100, 100, (256, 3))
        z = np.asarray(spaces.contract(jnp.asarray(x)))
        assert np.all(np.linalg.norm(z, axis=-1) < 2.0)

    def test_uncontract_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(-10, 10, (128, 3))
        z = spaces.contract(jnp.asarray(x))
        np.testing.assert_allclose(spaces.uncontract(z), x, rtol=1e-4, atol=1e-4)

    def test_finite_grad_at_origin(self):
        g = jax.jacfwd(spaces.contract)(jnp.zeros((3,)))
        assert np.all(np.isfinite(g))

    def test_continuous_at_unit_sphere(self):
        d = jnp.array([0.6, 0.48, 0.64])  # unit direction
        inside = spaces.contract(d * 0.999999)
        outside = spaces.contract(d * 1.000001)
        np.testing.assert_allclose(inside, outside, atol=1e-4)


class TestTrackGaussian:
    def test_linear_fn_exact(self):
        rng = np.random.default_rng(3)
        A = jnp.asarray(rng.normal(size=(3, 3)))
        # Explicit HIGHEST precision: the platform's default matmul is
        # bf16-grade, which would swamp the tolerance.
        fn = lambda x: jnp.matmul(x, A.T, precision=jax.lax.Precision.HIGHEST)
        mean = jnp.asarray(rng.normal(size=(5, 3)))
        sqrt = rng.normal(size=(5, 3, 3))
        cov = jnp.asarray(sqrt @ np.swapaxes(sqrt, -1, -2))
        m2, c2 = spaces.track_gaussian(fn, mean, cov)
        np.testing.assert_allclose(m2, fn(mean), rtol=1e-5)
        want = np.asarray(A) @ np.asarray(cov) @ np.asarray(A).T
        np.testing.assert_allclose(np.asarray(c2), want, rtol=1e-4, atol=1e-5)

    def test_nonlinear_matches_explicit_jacobian(self):
        mean = jnp.array([[1.3, -0.2, 2.0]])
        sqrt = np.random.default_rng(4).normal(size=(1, 3, 3)) * 0.1
        cov = jnp.asarray(sqrt @ np.swapaxes(sqrt, -1, -2))
        m2, c2 = spaces.track_gaussian(spaces.contract, mean, cov)
        J = jax.jacfwd(spaces.contract)(mean[0])
        want = np.asarray(J) @ np.asarray(cov[0]) @ np.asarray(J).T
        np.testing.assert_allclose(np.asarray(c2[0]), want, rtol=1e-4, atol=1e-6)

    def test_rejects_diagonal_cov(self):
        with pytest.raises(ValueError):
            spaces.track_gaussian(lambda x: x, jnp.zeros((4, 3)), jnp.zeros((4, 3)))


class TestRayWarps:
    @pytest.mark.parametrize("warp", [None, "reciprocal", "log", "sqrt", "piecewise"])
    def test_endpoints_and_roundtrip(self, warp):
        near, far = jnp.array([0.5]), jnp.array([100.0])
        t_to_s, s_to_t = spaces.metric_to_normalized(warp, near, far)
        np.testing.assert_allclose(t_to_s(near), 0.0, atol=1e-6)
        np.testing.assert_allclose(t_to_s(far), 1.0, atol=1e-5)
        s = jnp.linspace(0.0, 1.0, 11)
        np.testing.assert_allclose(t_to_s(s_to_t(s)), s, atol=1e-4)

    def test_callable_warp(self):
        near, far = jnp.array([1.0]), jnp.array([50.0])
        t_to_s, s_to_t = spaces.metric_to_normalized(jnp.reciprocal, near, far)
        # Reciprocal spacing: s=0.5 maps to the harmonic mean point.
        t_half = s_to_t(jnp.array([0.5]))
        np.testing.assert_allclose(t_half, 1.0 / (0.5 / 50.0 + 0.5 / 1.0), rtol=1e-5)

    def test_unknown_warp_raises(self):
        with pytest.raises(ValueError):
            spaces.metric_to_normalized("cubic", jnp.array([1.0]), jnp.array([2.0]))


class TestEncodings:
    def test_ipe_equals_pe_at_zero_variance(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(-1, 1, (32, 3)))
        ipe = spaces.integrated_pos_enc(x, jnp.zeros_like(x), 0, 4)
        pe = spaces.pos_enc(x, 0, 4, append_identity=False)
        np.testing.assert_allclose(np.asarray(ipe), np.asarray(pe), atol=1e-5)

    def test_ipe_attenuates_with_variance(self):
        x = jnp.asarray(np.random.default_rng(6).uniform(-1, 1, (16, 3)))
        lo = spaces.integrated_pos_enc(x, jnp.full_like(x, 1e-4), 0, 6)
        hi = spaces.integrated_pos_enc(x, jnp.full_like(x, 10.0), 0, 6)
        assert np.abs(np.asarray(hi)).mean() < np.abs(np.asarray(lo)).mean()

    def test_expected_sin_limits(self):
        x = jnp.linspace(-3, 3, 7)
        np.testing.assert_allclose(
            spaces.expected_sin(x, jnp.zeros_like(x)), jnp.sin(x), atol=1e-6
        )
        big = spaces.expected_sin(x, jnp.full_like(x, 1e4))
        np.testing.assert_allclose(np.asarray(big), 0.0, atol=1e-6)

    def test_pos_enc_identity_prefix(self):
        x = jnp.asarray(np.random.default_rng(7).uniform(-1, 1, (8, 3)))
        enc = spaces.pos_enc(x, 0, 4, append_identity=True)
        np.testing.assert_allclose(np.asarray(enc)[..., :3], np.asarray(x))
        assert enc.shape[-1] == 3 + 2 * 3 * 4

    def test_project_and_diagonalize_matches_dense(self):
        rng = np.random.default_rng(8)
        basis = jnp.asarray(rng.normal(size=(3, 7)).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        sqrt = rng.normal(size=(4, 3, 3)).astype(np.float32)
        cov = jnp.asarray(sqrt @ np.swapaxes(sqrt, -1, -2))
        m, v = spaces.project_and_diagonalize(mean, cov, basis)
        want_m = np.asarray(mean) @ np.asarray(basis)
        want_v = np.einsum(
            "dm,bde,em->bm", np.asarray(basis), np.asarray(cov), np.asarray(basis)
        )
        np.testing.assert_allclose(np.asarray(m), want_m, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), want_v, rtol=1e-3, atol=1e-4)


class TestSphereBasis:
    def test_octahedron_once_is_axes(self):
        basis = np.asarray(spaces.sphere_basis("octahedron", 1))
        assert basis.shape == (3, 3)
        # Columns are +-unit axes: |basis| is a permutation matrix.
        np.testing.assert_allclose(
            np.sort(np.abs(basis), axis=0), np.array([[0, 0, 0], [0, 0, 0], [1, 1, 1.0]]),
            atol=1e-6,
        )

    def test_icosahedron_twice_shape_and_unit_norm(self):
        basis = np.asarray(spaces.sphere_basis("icosahedron", 2))
        assert basis.shape == (3, 21)
        np.testing.assert_allclose(np.linalg.norm(basis, axis=0), 1.0, atol=1e-5)

    def test_no_antipodal_pairs_remain(self):
        basis = np.asarray(spaces.sphere_basis("icosahedron", 2)).T
        d = np.linalg.norm(basis[:, None, :] + basis[None, :, :], axis=-1)
        assert d.min() > 1e-2
