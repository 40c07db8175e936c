"""Pallas fused compositing weights vs the pure-jnp reference (fw + grad)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu.ops import pallas_volren, volren


def _random_tau(shape, seed=0, scale=2.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(*shape) * scale, jnp.float32)


@pytest.mark.parametrize("shape", [(4, 32), (130, 192), (3, 5, 64)])
def test_forward_matches_reference(shape):
    tau = _random_tau(shape)
    got = pallas_volren.weights_from_tau(tau, True)
    want = pallas_volren.weights_from_tau_reference(tau)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_forward_matches_alpha_composite_weights():
    # Same weights as ops.volren.alpha_composite_weights given identical
    # metric optical depth.
    rng = np.random.RandomState(1)
    n, s = 8, 48
    density = jnp.asarray(rng.rand(n, s) * 3.0, jnp.float32)
    tdist = jnp.sort(jnp.asarray(rng.rand(n, s + 1) * 10.0, jnp.float32), axis=-1)
    dirs = jnp.asarray(rng.randn(n, 3), jnp.float32)
    metric_delta = jnp.diff(tdist, axis=-1) * jnp.linalg.norm(
        dirs[:, None, :], axis=-1
    )
    tau = density * metric_delta
    want, _, _ = volren.alpha_composite_weights(density, tdist, dirs)
    got = pallas_volren.weights_from_tau(tau, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradient_matches_autodiff_reference():
    tau = _random_tau((6, 40), seed=2)
    # Scalar losses touching every output path: weighted sums emulate the
    # rgb/depth/acc reductions downstream of the weights.
    coefs = jnp.asarray(np.random.RandomState(3).randn(6, 40), jnp.float32)

    def loss_pallas(t):
        return jnp.sum(coefs * pallas_volren.weights_from_tau(t, True))

    def loss_ref(t):
        return jnp.sum(coefs * pallas_volren.weights_from_tau_reference(t))

    g_got = jax.grad(loss_pallas)(tau)
    g_want = jax.grad(loss_ref)(tau)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-5)


def test_gradient_early_termination_region():
    # Saturated rays: samples behind an opaque wall get ~zero weight AND
    # ~zero gradient (the CUDA kernel's early-exit region).
    tau = jnp.concatenate(
        [jnp.full((2, 4), 10.0), _random_tau((2, 28), seed=4)], axis=-1
    )
    g = jax.grad(lambda t: jnp.sum(pallas_volren.weights_from_tau(t, True) ** 2))(tau)
    assert np.all(np.abs(np.asarray(g)[:, 8:]) < 1e-8)
    assert np.all(np.isfinite(np.asarray(g)))


def test_multichip_sharded_jit():
    # The custom_partitioning rule: under a multi-device jit with the ray
    # axis sharded, the kernel runs per-shard (rows/n_dev each), outputs keep
    # the input sharding, and fwd+grad match the jnp reference.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    mesh = Mesh(np.array(devs).reshape(-1), ("data",))
    tau = _random_tau((16 * len(devs), 40), seed=7)
    tau_sharded = jax.device_put(tau, NamedSharding(mesh, P("data", None)))
    coefs = jnp.asarray(
        np.random.RandomState(8).randn(*tau.shape), jnp.float32
    )
    coefs_sharded = jax.device_put(coefs, NamedSharding(mesh, P("data", None)))

    @jax.jit
    def fwd_and_grad(t, c):
        w = pallas_volren.weights_from_tau(t, True)
        g = jax.grad(
            lambda tt: jnp.sum(c * pallas_volren.weights_from_tau(tt, True))
        )(t)
        return w, g

    w, g = fwd_and_grad(tau_sharded, coefs_sharded)
    # P("data") and P("data", None) are the same sharding, different spellings.
    assert tuple(w.sharding.spec)[:1] == ("data",)
    w_want = pallas_volren.weights_from_tau_reference(tau)
    g_want = jax.grad(
        lambda tt: jnp.sum(coefs * pallas_volren.weights_from_tau_reference(tt))
    )(tau)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want), atol=1e-5)


def test_padding_is_invisible():
    # Non-aligned S and ray counts exercise the internal pad/slice.
    tau = _random_tau((7, 33), seed=5)
    got = pallas_volren.weights_from_tau(tau, True)
    want = pallas_volren.weights_from_tau_reference(tau)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    assert got.shape == tau.shape
