"""Tests for the lane-folded Pallas prefix sum (ops/pallas_scan.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu.ops import pallas_scan


class TestCumsum:
    @pytest.mark.parametrize("n", [7, 512, 4096, 4097, 12345])
    @pytest.mark.parametrize("lanes", [16, 8, 128])
    def test_matches_jnp(self, n, lanes):
        rng = np.random.default_rng(n + lanes)
        x = rng.normal(size=(n, lanes)).astype(np.float32)
        got = pallas_scan.cumsum(jnp.asarray(x), block_rows=64,
                                 interpret=True)
        want = np.cumsum(x, axis=0)
        # Blocked accumulation reassociates the sum: ~1e-4-scale drift on
        # long random walks is float noise, not error.
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-3)

    def test_multi_block_carry(self):
        # Several grid steps: the carry must thread through.
        x = jnp.ones((4096, 16), jnp.float32)
        got = pallas_scan.cumsum(x, block_rows=32, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got[:, 0]), np.arange(1, 4097, dtype=np.float32)
        )

    @pytest.mark.parametrize("n", [100, 1025])
    def test_batched_independent_scans(self, n):
        rng = np.random.default_rng(n)
        x = rng.normal(size=(3, n, 16)).astype(np.float32)
        got = pallas_scan.cumsum_batched(jnp.asarray(x), block_rows=32,
                                         interpret=True)
        want = np.cumsum(x, axis=1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-3)
        # No leakage: element 1's first row must equal its own input.
        np.testing.assert_allclose(np.asarray(got[1, 0]), x[1, 0],
                                   rtol=1e-6)

    def test_bad_lanes_raise(self):
        with pytest.raises(ValueError, match="divide"):
            pallas_scan.cumsum(jnp.ones((8, 48)), interpret=True)

    def test_multi_device_mesh_disables_pallas_path(self):
        """SPMD can't partition the pallas scan: the step factory must
        gate it off for >1-device meshes and on for single-device."""
        from outdoor_nerf_depth_tpu import parallel
        from outdoor_nerf_depth_tpu.train import step as step_lib

        mesh = parallel.make_mesh()  # 8 virtual CPU devices (conftest)
        assert len(mesh.devices.flat) > 1
        step_lib._configure_pallas_scan(mesh)
        assert not pallas_scan._ENABLED
        single = jax.sharding.Mesh(
            np.array(jax.devices()[:1]), ("data",)
        )
        step_lib._configure_pallas_scan(single)
        assert pallas_scan._ENABLED

    def test_shard_map_table_grad_matches_plain(self):
        """With a multi-device mesh bound, the table gradient runs as
        per-device segment sums + psum inside shard_map; it must match the
        unsharded global reduction."""
        import jax.numpy as jnp

        from outdoor_nerf_depth_tpu import parallel
        from outdoor_nerf_depth_tpu.ops import hashgrid

        mesh = parallel.make_mesh()
        res = hashgrid.level_resolutions(4, 4, 64)
        fn = hashgrid._oct_split_grad_encode(
            tuple(int(r) for r in res), 2**10
        )
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (256, 3))
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))

        def loss(x, t):
            return jnp.sum(jnp.sin(3.0 * fn(x, t)))

        try:
            hashgrid.set_grad_mesh(None)
            g_plain = jax.jit(jax.grad(loss, argnums=1))(x, table)
            hashgrid.set_grad_mesh(mesh)
            xs = jax.device_put(x, parallel.batch_sharding(mesh))
            g_shard = jax.jit(jax.grad(loss, argnums=1))(xs, table)
        finally:
            hashgrid.set_grad_mesh(None)
        np.testing.assert_allclose(
            np.asarray(g_shard), np.asarray(g_plain), rtol=1e-4, atol=2e-5
        )

    def test_auto_fallback_off_tpu(self):
        # On CPU, cumsum_auto must route to jnp and still be correct.
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(100, 16)), jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(pallas_scan.cumsum_auto(x)),
            np.cumsum(np.asarray(x), axis=0),
            rtol=1e-6, atol=1e-5,
        )
