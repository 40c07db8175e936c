"""Tests for the NGP stack: hash grid, morton/occupancy, the full model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu.models import ngp
from outdoor_nerf_depth_tpu.ops import hashgrid, occupancy as occ


class TestHashGrid:
    def test_resolutions_match_reference_rule(self):
        # L=16, Nmin=16, Nmax=2048: growth b ~= 1.3819 (the NGP paper).
        res = hashgrid.level_resolutions(16, 16, 2048)
        assert res[0] == 16 and res[-1] == 2048
        assert np.all(np.diff(res) > 0)
        np.testing.assert_allclose(
            hashgrid.growth_factor(16, 16, 2048), 1.3819, atol=1e-3
        )

    def test_encode_shape_and_determinism(self):
        enc = hashgrid.HashGridEncoding(n_levels=4, n_features=2,
                                        log2_table_size=10, base_resolution=4,
                                        max_resolution=32)
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(17, 3)))
        vars_ = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(vars_, x)
        assert out.shape == (17, 8)
        np.testing.assert_array_equal(out, enc.apply(vars_, x))

    def test_encoding_is_continuous(self):
        enc = hashgrid.HashGridEncoding(n_levels=2, n_features=2,
                                        log2_table_size=12, base_resolution=4,
                                        max_resolution=8)
        x = jnp.array([[0.31, 0.52, 0.77]])
        vars_ = enc.init(jax.random.PRNGKey(1), x)
        a = enc.apply(vars_, x)
        b = enc.apply(vars_, x + 1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_grads_hit_only_touched_rows(self):
        enc = hashgrid.HashGridEncoding(n_levels=1, n_features=1,
                                        log2_table_size=12, base_resolution=4,
                                        max_resolution=4)
        x = jnp.array([[0.1, 0.1, 0.1]])
        vars_ = enc.init(jax.random.PRNGKey(2), x)
        g = jax.grad(lambda v: jnp.sum(enc.apply(v, x)))(vars_)
        table_grad = np.asarray(jax.tree_util.tree_leaves(g)[0])
        touched = np.count_nonzero(np.abs(table_grad).sum(-1))
        assert 0 < touched <= 8  # exactly the 8 corners of one cell

    def test_packed_gather_layout_is_exact(self):
        # The TPU wide-row gather layout (encode pack_rows) must reproduce
        # the plain [F]-row gather bit-for-bit: same values, different
        # fetch granularity.
        rng = jax.random.PRNGKey(5)
        x = jax.random.uniform(rng, (257, 3))
        table = jax.random.normal(rng, (4, 2**10, 2))
        res = hashgrid.level_resolutions(4, 4, 32)
        a = hashgrid.encode(x, table, res, 2**10, pack_rows=0)
        b = hashgrid.encode(x, table, res, 2**10, pack_rows=64)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Gradients agree too (scatter via wide rows).
        ga = jax.grad(lambda t: jnp.sum(
            hashgrid.encode(x, t, res, 2**10, pack_rows=0) ** 2))(table)
        gb = jax.grad(lambda t: jnp.sum(
            hashgrid.encode(x, t, res, 2**10, pack_rows=64) ** 2))(table)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-6)

    def test_quad_layout_rejects_pack_rows(self):
        """layout='quad' + pack_rows>1 must be a loud error: the packed
        path interprets indices under the corner hash, so letting a perf
        knob silently change the hash function would corrupt trained
        tables (ADVICE r2, medium)."""
        enc = hashgrid.HashGridEncoding(
            n_levels=2, n_features=2, log2_table_size=10, base_resolution=4,
            max_resolution=8, layout="quad", pack_rows=64,
        )
        x = jnp.zeros((4, 3))
        with pytest.raises(ValueError, match="pack_rows"):
            enc.init(jax.random.PRNGKey(0), x)
        bad = hashgrid.HashGridEncoding(
            n_levels=2, n_features=2, log2_table_size=10, base_resolution=4,
            max_resolution=8, layout="typo",
        )
        with pytest.raises(ValueError, match="layout"):
            bad.init(jax.random.PRNGKey(0), x)

    def test_sorted_grad_matches_autodiff(self):
        """The collision-free sorted table gradient and the analytic
        position gradient must match plain AD through the scatter path."""
        rng = jax.random.PRNGKey(6)
        x = jax.random.uniform(rng, (97, 3), minval=0.01, maxval=0.99)
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))
        res = hashgrid.level_resolutions(4, 4, 32)
        fn = hashgrid._sorted_grad_encode(tuple(int(r) for r in res), 2**10)

        out_sorted = fn(x, table)
        out_plain = hashgrid.encode(x, table, res, 2**10)
        np.testing.assert_allclose(
            np.asarray(out_sorted), np.asarray(out_plain), rtol=1e-6
        )

        def loss_sorted(x, t):
            return jnp.sum(jnp.sin(3.0 * fn(x, t)))

        def loss_plain(x, t):
            return jnp.sum(jnp.sin(3.0 * hashgrid.encode(x, t, res, 2**10)))

        gx_s, gt_s = jax.grad(loss_sorted, argnums=(0, 1))(x, table)
        gx_p, gt_p = jax.grad(loss_plain, argnums=(0, 1))(x, table)
        # The run-boundary prefix-sum reduction computes each row as a
        # difference of two large cumsums — f32 cancellation bounds the
        # agreement to ~1e-4 absolute (<< SGD gradient noise; tcnn
        # accumulates table grads in fp16).
        np.testing.assert_allclose(
            np.asarray(gt_s), np.asarray(gt_p), rtol=1e-2, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(gx_s), np.asarray(gx_p), rtol=1e-4, atol=1e-5
        )

    def test_sorted_row_sums(self):
        rng = np.random.default_rng(7)
        idx = jnp.asarray(rng.integers(0, 50, (4096,)), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(4096, 2)), jnp.float32)
        got = hashgrid._sorted_row_sums(idx, vals, 50)
        want = np.zeros((50, 2), np.float32)
        np.add.at(want, np.asarray(idx), np.asarray(vals))
        # Boundary-pair differences accumulate csum rounding linearly in
        # the (worst-case, unclustered) runs-per-row count: ~1e-3 absolute
        # here, same class as tcnn's fp16 atomic accumulation error.
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-2,
                                   atol=2e-3)

    def test_quad_encode_matches_naive_linear_hash(self):
        """encode_quad (packed rows, 2 gathers) must equal a naive 8-corner
        gather that uses the same y,z-linear hash."""
        rng = jax.random.PRNGKey(11)
        x = jax.random.uniform(rng, (193, 3))
        t_size = 2**10
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, t_size, 2))
        res = hashgrid.level_resolutions(4, 4, 64)  # crosses dense->hashed

        def naive(x, table):
            outs = []
            xc = jnp.clip(x, 0.0, 1.0)
            for level in range(len(res)):
                r = int(res[level])
                pos = xc * r
                cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, r - 1)
                frac = pos - cell
                acc = 0.0
                for dx_ in (0, 1):
                    for dy in (0, 1):
                        for dz in (0, 1):
                            corner = cell + jnp.array([dx_, dy, dz])
                            idx, _ = hashgrid._quad_base_index(
                                corner, r, t_size
                            )
                            if (r + 1) ** 3 > t_size:
                                idx = idx & (t_size - 1)
                            w = (
                                jnp.where(dx_, frac[..., 0], 1 - frac[..., 0])
                                * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
                                * jnp.where(dz, frac[..., 2], 1 - frac[..., 2])
                            )
                            acc = acc + w[..., None] * table[level][idx]
                outs.append(acc)
            return jnp.concatenate(outs, axis=-1)

        got = hashgrid.encode_quad(x, table, res, t_size)
        want = naive(x, table)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_quad_grad_matches_autodiff(self):
        """Quad custom VJP (packed sorted reduction + fold, analytic x
        grad) must match plain AD through encode_quad's scatter path."""
        rng = jax.random.PRNGKey(12)
        x = jax.random.uniform(rng, (97, 3), minval=0.01, maxval=0.99)
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))
        res = hashgrid.level_resolutions(4, 4, 64)
        fn = hashgrid._quad_grad_encode(tuple(int(r) for r in res), 2**10)

        np.testing.assert_allclose(
            np.asarray(fn(x, table)),
            np.asarray(hashgrid.encode_quad(x, table, res, 2**10)),
            rtol=1e-6,
        )

        def loss_sorted(x, t):
            return jnp.sum(jnp.sin(3.0 * fn(x, t)))

        def loss_plain(x, t):
            return jnp.sum(
                jnp.sin(3.0 * hashgrid.encode_quad(x, t, res, 2**10))
            )

        gx_s, gt_s = jax.grad(loss_sorted, argnums=(0, 1))(x, table)
        gx_p, gt_p = jax.grad(loss_plain, argnums=(0, 1))(x, table)
        np.testing.assert_allclose(
            np.asarray(gt_s), np.asarray(gt_p), rtol=1e-2, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(gx_s), np.asarray(gx_p), rtol=1e-4, atol=1e-5
        )

    def test_oct_encode_matches_quad(self):
        """oct (1 gather, 8-corner rows) and quad (2 gathers) pack the SAME
        fully-linear hash: outputs must agree exactly on the same table,
        across dense and hashed levels."""
        rng = jax.random.PRNGKey(21)
        x = jax.random.uniform(rng, (211, 3))
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))
        res = hashgrid.level_resolutions(4, 4, 64)  # mix of dense + hashed
        a = hashgrid.encode_oct(x, table, res, 2**10)
        b = hashgrid.encode_quad(x, table, res, 2**10)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_oct_grad_matches_autodiff(self):
        """Oct custom VJP (packed sorted reduction + 8-roll fold, analytic
        x grad) must match plain AD through encode_oct's scatter path."""
        rng = jax.random.PRNGKey(22)
        x = jax.random.uniform(rng, (97, 3), minval=0.01, maxval=0.99)
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))
        res = hashgrid.level_resolutions(4, 4, 64)
        fn = hashgrid._oct_grad_encode(tuple(int(r) for r in res), 2**10)

        np.testing.assert_allclose(
            np.asarray(fn(x, table)),
            np.asarray(hashgrid.encode_oct(x, table, res, 2**10)),
            rtol=1e-6,
        )

        def loss_sorted(x, t):
            return jnp.sum(jnp.sin(3.0 * fn(x, t)))

        def loss_plain(x, t):
            return jnp.sum(
                jnp.sin(3.0 * hashgrid.encode_oct(x, t, res, 2**10))
            )

        gx_s, gt_s = jax.grad(loss_sorted, argnums=(0, 1))(x, table)
        gx_p, gt_p = jax.grad(loss_plain, argnums=(0, 1))(x, table)
        np.testing.assert_allclose(
            np.asarray(gt_s), np.asarray(gt_p), rtol=1e-2, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(gx_s), np.asarray(gx_p), rtol=1e-4, atol=1e-5
        )

    def test_osplit_encode_matches_oct(self):
        """osplit (per-level bf16 tables) packs the SAME linear hash as
        oct: with bf16-representable table values the outputs must agree
        exactly across dense and hashed levels."""
        rng = jax.random.PRNGKey(31)
        x = jax.random.uniform(rng, (211, 3))
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))
        table = table.astype(jnp.bfloat16).astype(jnp.float32)  # bf16 grid
        res = hashgrid.level_resolutions(4, 4, 64)  # mix of dense + hashed
        a = hashgrid.encode_oct_split(x, table, res, 2**10)
        b = hashgrid.encode_oct(x, table, res, 2**10)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        # Prepared-tables path (the eval renderer) matches too.
        phys = hashgrid.build_oct_tables_split(table, res, 2**10)
        c = hashgrid.encode_oct_split(x, table, res, 2**10, phys)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)

    def test_osplit_grad_matches_autodiff(self):
        """osplit custom VJP (per-level sorted reduction + roll fold) must
        match plain AD through encode_oct_split's scatter path."""
        rng = jax.random.PRNGKey(32)
        x = jax.random.uniform(rng, (97, 3), minval=0.01, maxval=0.99)
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))
        res = hashgrid.level_resolutions(4, 4, 64)
        fn = hashgrid._oct_split_grad_encode(tuple(int(r) for r in res), 2**10)

        np.testing.assert_allclose(
            np.asarray(fn(x, table)),
            np.asarray(hashgrid.encode_oct_split(x, table, res, 2**10)),
            rtol=1e-6,
        )

        def loss_sorted(x, t):
            return jnp.sum(jnp.sin(3.0 * fn(x, t)))

        def loss_plain(x, t):
            return jnp.sum(
                jnp.sin(3.0 * hashgrid.encode_oct_split(x, t, res, 2**10))
            )

        gx_s, gt_s = jax.grad(loss_sorted, argnums=(0, 1))(x, table)
        gx_p, gt_p = jax.grad(loss_plain, argnums=(0, 1))(x, table)
        # Plain AD pushes the table cotangent back through the f32->bf16
        # cast, ROUNDING each per-corner contribution to bf16 before the
        # scatter accumulates it; the custom VJP keeps the whole reduction
        # in f32 (strictly more accurate — pinned against the f32 oct VJP
        # in the next test). The comparison here is bf16-grade.
        np.testing.assert_allclose(
            np.asarray(gt_s), np.asarray(gt_p), rtol=0.15, atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(gx_s), np.asarray(gx_p), rtol=1e-2, atol=1e-3
        )

    def test_osplit_rowsum_modes_agree(self, monkeypatch):
        """The merged single-sort pipeline and the r4 three-sort pipeline
        must produce identical table gradients (both scatter-free exact
        f32 segment sums, just different boundary machinery)."""
        rng = jax.random.PRNGKey(33)
        x = jax.random.uniform(rng, (211, 3), minval=0.01, maxval=0.99)
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))
        res = hashgrid.level_resolutions(4, 4, 64)
        fn = hashgrid._oct_split_grad_encode(tuple(int(r) for r in res), 2**10)

        def loss(x, t):
            return jnp.sum(jnp.sin(3.0 * fn(x, t)))

        grads = {}
        for mode in ("threesort", "merged"):
            monkeypatch.setenv("ONDT_OSPLIT_ROWSUMS", mode)
            # fresh jit so the env choice re-traces
            grads[mode] = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, table)
        # Both are exact f32 segment sums; the prefix accumulation order
        # differs (merged interleaves sentinel zeros), so allow
        # reassociation-level noise.
        np.testing.assert_allclose(
            np.asarray(grads["merged"][1]),
            np.asarray(grads["threesort"][1]),
            rtol=1e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(grads["merged"][0]),
            np.asarray(grads["threesort"][0]),
            rtol=1e-4, atol=2e-5,
        )

    def test_osplit_grad_vs_oct_f32_reference(self, monkeypatch):
        """The osplit table gradient (computed in f32 from exact w*g
        products, ONDT_OSPLIT_GRAD_GATHER=f32) must match the oct VJP's
        table gradient bit-for-bit up to summation order — bf16 only
        touches the FORWARD features on this path."""
        monkeypatch.setenv("ONDT_OSPLIT_GRAD_GATHER", "f32")
        rng = jax.random.PRNGKey(33)
        x = jax.random.uniform(rng, (97, 3), minval=0.01, maxval=0.99)
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))
        res = hashgrid.level_resolutions(4, 4, 64)
        res_key = tuple(int(r) for r in res)
        fn_split = hashgrid._oct_split_grad_encode(res_key, 2**10)
        fn_oct = hashgrid._oct_grad_encode(res_key, 2**10)
        g = jax.random.normal(jax.random.fold_in(rng, 2), (97, 8))
        _, vjp_split = jax.vjp(lambda t: fn_split(x, t), table)
        _, vjp_oct = jax.vjp(lambda t: fn_oct(x, t), table)
        np.testing.assert_allclose(
            np.asarray(vjp_split(g)[0]),
            np.asarray(vjp_oct(g)[0]),
            rtol=1e-3, atol=1e-5,
        )

    def test_osplit_grad_bf16_gather_close_to_f32(self, monkeypatch):
        """The default bf16 gather source (each w*g product rounded to
        bf16 before the f32 segment accumulation — the speed-of-light
        choice, gather cost scales with SOURCE bytes) must stay within
        bf16-grade tolerance of the exact-f32 pipeline."""
        rng = jax.random.PRNGKey(7)
        x = jax.random.uniform(rng, (523, 3), minval=0.01, maxval=0.99)
        table = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2**10, 2))
        res = hashgrid.level_resolutions(4, 4, 64)
        fn = hashgrid._oct_split_grad_encode(
            tuple(int(r) for r in res), 2**10)

        def loss(x, t):
            return jnp.sum(jnp.sin(3.0 * fn(x, t)))

        grads = {}
        for mode in ("f32", "bf16"):
            monkeypatch.setenv("ONDT_OSPLIT_GRAD_GATHER", mode)
            grads[mode] = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, table)
        # Table grad: per-element bf16 rounding (~2^-8 rel) accumulated in
        # f32; x grad is untouched by the gather dtype (exact path).
        # atol covers catastrophic-cancellation rows whose exact segment
        # sum is near zero (bf16 rounding leaves an O(1e-2) absolute
        # residue there while every well-conditioned row matches to rtol).
        np.testing.assert_allclose(
            np.asarray(grads["bf16"][1]), np.asarray(grads["f32"][1]),
            rtol=2e-2, atol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(grads["bf16"][0]), np.asarray(grads["f32"][0]),
            rtol=1e-5, atol=1e-6,
        )

    def test_oct_trimmed_dense_boundary_level(self):
        """Dense level with (res+1)^3 barely <= T (res=9, s^3=1000 vs
        T=1024): the trimmed phys table's roll-fold must stay exact even
        though s^3 + corner offsets exceeds T (the wrapped roll rows must
        land on never-gathered / zero rows)."""
        rng = jax.random.PRNGKey(33)
        t_size = 2**10
        res = np.array([4, 9, 31], np.int32)  # dense, boundary-dense, hashed
        x = jax.random.uniform(rng, (301, 3), minval=0.001, maxval=0.999)
        table = jax.random.normal(jax.random.fold_in(rng, 1), (3, t_size, 2))

        np.testing.assert_allclose(
            np.asarray(hashgrid.encode_oct(x, table, res, t_size)),
            np.asarray(hashgrid.encode_quad(x, table, res, t_size)),
            atol=1e-6,
        )

        fn = hashgrid._oct_grad_encode(tuple(int(r) for r in res), t_size)

        def loss_vjp(x, t):
            return jnp.sum(jnp.sin(3.0 * fn(x, t)))

        def loss_ad(x, t):
            return jnp.sum(
                jnp.sin(3.0 * hashgrid.encode_oct(x, t, res, t_size))
            )

        gx_s, gt_s = jax.grad(loss_vjp, argnums=(0, 1))(x, table)
        gx_p, gt_p = jax.grad(loss_ad, argnums=(0, 1))(x, table)
        np.testing.assert_allclose(
            np.asarray(gt_s), np.asarray(gt_p), rtol=1e-2, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(gx_s), np.asarray(gx_p), rtol=1e-4, atol=1e-5
        )

    def test_sorted_row_sums_gather_variant(self):
        rng = np.random.default_rng(13)
        idx = jnp.asarray(rng.integers(0, 50, (4096,)), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(4096, 8)), jnp.float32)
        got = hashgrid._sorted_row_sums_gather(idx, vals, 50)
        want = np.zeros((50, 8), np.float32)
        np.add.at(want, np.asarray(idx), np.asarray(vals))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-2,
                                   atol=2e-3)

    def test_layouts_both_train(self):
        # All layouts expose the same module contract; a gradient step
        # moves only touched rows in any.
        for layout in ("oct", "quad", "corner"):
            enc = hashgrid.HashGridEncoding(
                n_levels=2, n_features=2, log2_table_size=10,
                base_resolution=4, max_resolution=8, layout=layout)
            x = jnp.asarray(
                np.random.default_rng(3).uniform(0.05, 0.95, size=(33, 3)))
            vars_ = enc.init(jax.random.PRNGKey(4), x)
            out = enc.apply(vars_, x)
            assert out.shape == (33, 4)
            g = jax.grad(lambda v: jnp.sum(enc.apply(v, x) ** 2))(vars_)
            assert np.isfinite(
                np.asarray(jax.tree_util.tree_leaves(g)[0])).all()

    def test_dense_levels_interpolate_exactly(self):
        # A coarse level with injective indexing behaves as a voxel grid:
        # value at a corner equals its table entry.
        table = jnp.zeros((1, 2**12, 2)).at[0, :, :].set(0.0)
        res = np.array([4])
        # Corner (1,2,3) of a 4^3 grid -> dense index 1 + 2*5 + 3*25 = 86.
        table = table.at[0, 86, :].set(jnp.array([3.0, 7.0]))
        x = jnp.array([[0.25, 0.5, 0.75]])  # exactly cell corner (1,2,3)
        out = hashgrid.encode(x, table, res, 2**12)
        np.testing.assert_allclose(np.asarray(out)[0], [3.0, 7.0], atol=1e-5)


class TestSphericalHarmonics:
    def test_constant_term(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        sh = hashgrid.spherical_harmonics(d)
        np.testing.assert_allclose(float(sh[0, 0]), 0.28209479, rtol=1e-5)

    def test_orthonormality_monte_carlo(self):
        # E[Y_i Y_j] over the sphere = delta_ij / (4 pi).
        rng = np.random.default_rng(3)
        d = rng.normal(size=(200_000, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        sh = np.asarray(hashgrid.spherical_harmonics(jnp.asarray(d)))
        gram = (sh.T @ sh) / len(d) * 4 * np.pi
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    def test_trunc_exp_grad_clamped(self):
        g = jax.grad(lambda x: hashgrid.truncated_exp(x))(100.0)
        np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)
        g2 = jax.grad(lambda x: hashgrid.truncated_exp(x))(1.0)
        np.testing.assert_allclose(float(g2), np.e, rtol=1e-5)


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.default_rng(4)
        coords = jnp.asarray(rng.integers(0, 1024, (256, 3)), jnp.int32)
        codes = occ.morton3d(coords)
        back = occ.morton3d_invert(codes)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))

    def test_golden_values(self):
        # (1,0,0)->1, (0,1,0)->2, (0,0,1)->4, (1,1,1)->7, (2,0,0)->8.
        coords = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1], [2, 0, 0]])
        np.testing.assert_array_equal(
            np.asarray(occ.morton3d(coords)), [1, 2, 4, 7, 8]
        )


class TestOccupancyGeometry:
    def test_num_cascades(self):
        assert occ.num_cascades(0.5) == 1
        assert occ.num_cascades(4.0) == 4
        assert occ.num_cascades(16.0) == 6

    def test_point_cascade_assignment(self):
        x = jnp.array([[0.1, 0.0, 0.0], [0.9, 0.0, 0.0], [3.5, 0.0, 0.0]])
        casc = np.asarray(occ.point_cascade(x, scale=4.0))
        np.testing.assert_array_equal(casc, [0, 1, 3])

    def test_lookup_round_trip(self):
        # Mark the cell containing a point; lookup must see it occupied.
        grid = occ.init_grid(scale=1.0, resolution=16)
        x = jnp.array([[0.3, -0.2, 0.1]])
        casc = occ.point_cascade(x, 1.0)
        flat, _ = occ.cell_index(x, casc, 1.0, 16)
        grid = grid.at[casc[0], flat[0]].set(1.0)
        assert bool(occ.lookup(grid, x, 1.0, 0.5)[0])
        assert not bool(occ.lookup(grid, -x, 1.0, 0.5)[0])


class TestGridUpdate:
    def test_full_sweep_marks_dense_region(self):
        grid = occ.init_grid(scale=0.5, resolution=8)
        # Density: a ball of radius 0.2 at origin.
        density_fn = lambda pts: jnp.where(
            jnp.linalg.norm(pts, axis=-1) < 0.2, 10.0, 0.0
        )
        grid = occ.update_grid(jax.random.PRNGKey(0), grid, density_fn, 0.5)
        occupied_frac = float((grid[0] > 0.01).mean())
        assert 0.01 < occupied_frac < 0.3  # ball fills ~3% of the cube

        center = occ.lookup(grid, jnp.zeros((1, 3)), 0.5, 0.01)
        assert bool(center[0])
        corner = occ.lookup(grid, jnp.full((1, 3), 0.45), 0.5, 0.01)
        assert not bool(corner[0])

    def test_decay_without_refresh(self):
        grid = occ.init_grid(scale=0.5, resolution=8) + 1.0
        zero_density = lambda pts: jnp.zeros(pts.shape[:-1])
        g2 = occ.update_grid(jax.random.PRNGKey(1), grid, zero_density, 0.5,
                             decay=0.9)
        np.testing.assert_allclose(np.asarray(g2).max(), 0.9, atol=1e-6)


class TestMarching:
    def test_aabb_intersection(self):
        o = jnp.array([[0.0, 0.0, -2.0], [5.0, 5.0, 5.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        t0, t1, hit = occ.intersect_aabb(o, d, 1.0)
        assert bool(hit[0]) and not bool(hit[1])
        np.testing.assert_allclose(float(t0[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(t1[0]), 3.0, atol=1e-5)

    def test_candidates_sorted_in_range(self):
        t0 = jnp.array([0.1, 1.0])
        t1 = jnp.array([5.0, 8.0])
        edges = occ.march_candidates(jax.random.PRNGKey(0), t0, t1, 64)
        e = np.asarray(edges)
        assert np.all(np.diff(e, axis=-1) > 0)
        np.testing.assert_allclose(e[:, 0], np.asarray(t0), rtol=1e-5)
        np.testing.assert_allclose(e[:, -1], np.asarray(t1), rtol=1e-5)

    def test_compaction_takes_first_occupied(self):
        edges = jnp.linspace(0.0, 1.0, 9)[None]  # 8 intervals
        occupied = jnp.array([[False, True, False, True, True, False, False, True]])
        # Exact mode (eval path): the first three occupied intervals 1,3,4.
        t_mid, dt, valid = occ.compact_occupied(edges, occupied, 3,
                                                subsample=False)
        np.testing.assert_allclose(
            np.asarray(t_mid)[0], [0.1875, 0.4375, 0.5625], atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(dt)[0], 0.125, atol=1e-6)
        assert np.all(np.asarray(valid)[0])
        # Budgeted mode (train path): 4 occupied > 3 -> stride k=2 keeps
        # occupied ranks 0 and 2 (intervals 1, 4), dt doubled.
        t_mid, dt, valid = occ.compact_occupied(edges, occupied, 3)
        np.testing.assert_allclose(
            np.asarray(t_mid)[0][:2], [0.1875, 0.5625], atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(dt)[0][:2], 0.25, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(valid)[0], [True, True, False])

    def test_compaction_pads_when_starved(self):
        edges = jnp.linspace(0.0, 1.0, 9)[None]
        occupied = jnp.zeros((1, 8), bool).at[0, 2].set(True)
        t_mid, dt, valid = occ.compact_occupied(edges, occupied, 4)
        assert np.asarray(valid)[0].tolist() == [True, False, False, False]
        np.testing.assert_allclose(np.asarray(dt)[0, 1:], 0.0)


class TestHashGridModel:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        from tests.test_models import _unit_sphere_rays

        model = ngp.HashGridModel(
            scale=0.5,
            max_samples=16,
            n_candidates=64,
            field_params=dict(n_levels=2, log2_table_size=10,
                              base_resolution=4, max_resolution=16,
                              hidden_width=16, geo_features=7),
        )
        rays = _unit_sphere_rays()
        variables = model.init(
            jax.random.PRNGKey(0), rng=None, rays=rays, train_frac=1.0,
            compute_extras=False,
        )
        return model, variables

    def test_dense_forward(self, model_and_vars):
        from tests.test_models import _unit_sphere_rays

        model, variables = model_and_vars
        rays = _unit_sphere_rays(n=8, seed=7)
        renderings, history = model.apply(
            variables, jax.random.PRNGKey(1), rays, compute_extras=True
        )
        r = renderings[-1]
        assert r["rgb"].shape == (8, 3)
        assert np.all(np.isfinite(np.asarray(r["rgb"])))
        assert history[-1]["weights"].shape == (8, 16)
        assert np.all(np.asarray(r["samples_per_ray"]) == 16)

    def test_occupancy_skips_empty_space(self, model_and_vars):
        from tests.test_models import _unit_sphere_rays

        model, variables = model_and_vars
        rays = _unit_sphere_rays(n=8, seed=8)
        grid = occ.init_grid(0.5, model.grid_resolution)  # all empty
        renderings, _ = model.apply(
            variables, None, rays, occupancy=grid
        )
        # Nothing occupied -> no valid samples -> zero opacity.
        np.testing.assert_allclose(np.asarray(renderings[-1]["acc"]), 0.0,
                                   atol=1e-6)

    def test_grads_flow_through_table(self, model_and_vars):
        from tests.test_models import _unit_sphere_rays

        model, variables = model_and_vars
        rays = _unit_sphere_rays(n=4, seed=9)

        def loss(v):
            renderings, _ = model.apply(v, None, rays)
            return jnp.mean((renderings[-1]["rgb"] - 0.4) ** 2)

        g = jax.grad(loss)(variables)
        leaves = {jax.tree_util.keystr(p): x
                  for p, x in jax.tree_util.tree_leaves_with_path(g)}
        table_grads = [v for k, v in leaves.items() if "table" in k]
        assert table_grads and float(jnp.abs(table_grads[0]).sum()) > 0

    def test_sample_budget_exact_when_no_overflow(self, model_and_vars):
        """With budget >= max_samples' worth of valid slots the compacted
        render must equal the dense render exactly (same points, same
        field, only evaluation order differs), outputs AND gradients."""
        from tests.test_models import _unit_sphere_rays

        model, variables = model_and_vars
        # Force the sorted-segment f32 table gradient (the TPU path):
        # grad_mode="auto" on CPU falls back to plain AD, whose cotangent
        # accumulates THROUGH the f32->bf16 physical-table cast in bf16
        # granularity — order-dependent at ~2^-11, which would swamp this
        # equivalence check with batch-arrangement noise.
        fp = dict(model.field_params or {})
        fp["grad_mode"] = "sorted"
        model = model.clone(field_params=fp)
        compact = model.clone(sample_budget=model.max_samples - 1)
        # All slots valid here (no occupancy grid -> dense marching), so a
        # budget of K-1 would overflow; use an occupancy grid that blanks
        # most of space to create realistic sparsity instead.
        grid = occ.init_grid(0.5, model.grid_resolution)
        # Occupy only the central cells: rays get few valid samples.
        g0 = np.array(grid)
        g0[:, :] = 0.0
        res = model.grid_resolution
        dens = g0.reshape(g0.shape[0], res, res, res)
        dens[:, res // 4: 3 * res // 4,
             res // 4: 3 * res // 4,
             res // 4: 3 * res // 4] = 1.0
        grid = jnp.asarray(dens.reshape(g0.shape))
        rays = _unit_sphere_rays(n=8, seed=11)

        with jax.default_matmul_precision("float32"):
            out_d, hist_d = model.apply(variables, None, rays,
                                        occupancy=grid)
            out_c, hist_c = compact.apply(variables, None, rays,
                                          occupancy=grid)
        n_valid = int(np.asarray(hist_d[-1]["valid"]).sum())
        assert 0 < n_valid <= 8 * (model.max_samples - 1)  # no overflow
        for k in ("rgb", "depth", "acc"):
            np.testing.assert_allclose(
                np.asarray(out_c[-1][k]), np.asarray(out_d[-1][k]),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )

        def loss(m):
            def f(v):
                r, _ = m.apply(v, None, rays, occupancy=grid)
                return jnp.mean((r[-1]["rgb"] - 0.4) ** 2)
            return f

        with jax.default_matmul_precision("float32"):
            gd = jax.grad(loss(model))(variables)
            gc = jax.grad(loss(compact))(variables)
        for (pd, xd), (pc, xc) in zip(
            jax.tree_util.tree_leaves_with_path(gd),
            jax.tree_util.tree_leaves_with_path(gc),
        ):
            np.testing.assert_allclose(
                np.asarray(xc), np.asarray(xd), rtol=5e-3, atol=1e-6,
                err_msg=jax.tree_util.keystr(pd),
            )

    def test_sample_budget_overflow_caps_per_ray(self, model_and_vars):
        """Dense marching (every slot valid) with a small budget must keep
        each ray's FIRST `budget` samples — uniform per-ray cap, never
        whole-ray drops — and still render finite outputs."""
        from tests.test_models import _unit_sphere_rays

        model, variables = model_and_vars
        budget = 4
        compact = model.clone(sample_budget=budget)
        rays = _unit_sphere_rays(n=8, seed=12)
        out_c, _ = compact.apply(variables, None, rays)  # no grid: all valid
        r = out_c[-1]
        assert np.all(np.isfinite(np.asarray(r["rgb"])))
        # Every ray keeps exactly `budget` slots: acc from a truncated
        # dense render equals the dense render truncated to first 4 slots.
        out_d, hist_d = model.apply(variables, None, rays)
        w_d = np.asarray(hist_d[-1]["weights"])[:, :budget]
        np.testing.assert_allclose(
            np.asarray(r["acc"]), w_d.sum(-1), rtol=1e-5, atol=1e-6
        )

    def test_hdr_tonemapper_path(self):
        from tests.test_models import _unit_sphere_rays

        model = ngp.HashGridModel(
            scale=0.5,
            max_samples=8,
            n_candidates=32,
            field_params=dict(n_levels=2, log2_table_size=10,
                              base_resolution=4, max_resolution=16,
                              hidden_width=16, geo_features=7,
                              rgb_activation="none", tonemap_width=8),
        )
        rays = _unit_sphere_rays(n=4, seed=12)
        variables = model.init(
            jax.random.PRNGKey(0), rng=None, rays=rays, train_frac=1.0,
            compute_extras=False,
        )
        names = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
        assert any("tonemap_hidden0" in n for n in names)
        renderings, _ = model.apply(variables, None, rays)
        ldr = np.asarray(renderings[-1]["rgb"])
        assert np.all(np.isfinite(ldr)) and ldr.min() >= 0.0

        # Exposure shifts the tonemapper input -> changes the output.
        rays_expo = rays.replace(
            exposure_values=jnp.full(rays.near.shape, 8.0)
        )
        renderings2, _ = model.apply(variables, None, rays_expo)
        assert not np.allclose(np.asarray(renderings2[-1]["rgb"]), ldr)

        # Radiance output mode is unbounded-positive, not sigmoid-squashed.
        model_hdr = model.clone(output_radiance=True)
        renderings3, _ = model_hdr.apply(variables, None, rays)
        assert np.all(np.isfinite(np.asarray(renderings3[-1]["rgb"])))

    def test_occupancy_update_fn_and_train_step(self):
        import outdoor_nerf_depth_tpu.parallel as parallel
        from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
        from outdoor_nerf_depth_tpu.train import step as step_lib
        from outdoor_nerf_depth_tpu.train.config import Config

        config = Config(
            model="ngp",
            model_params=dict(
                scale=0.5, max_samples=16, n_candidates=64,
                field_params=dict(n_levels=2, log2_table_size=10,
                                  base_resolution=4, max_resolution=16,
                                  hidden_width=16, geo_features=7),
            ),
            batch_size=64,
            lambda_depth=0.1,
            depth_loss_type="mse",
            depth_loss_reduce="mean_valid",
            interlevel_loss_mult=0.0,
            distortion_loss_mult=1e-3,
            opacity_loss_mult=1e-3,
            occupancy_cells_per_update=64,
            lr_delay_steps=0,
        )
        dataset = datasets_lib.SyntheticDataset("train", global_batch_size=64,
                                                seed=5)
        mesh = parallel.make_mesh()
        model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
        train_step = step_lib.make_train_step(
            config, model, mesh, cameras=dataset.cameras,
            camtype=dataset.camtype,
        )
        occ_update = step_lib.make_occupancy_update_fn(config, model, mesh)
        assert occ_update is not None

        grid = occ.init_grid(model.scale, model.grid_resolution)
        grid = occ_update(state.params, grid, jax.random.PRNGKey(2), True)
        assert np.asarray(grid).max() > 0  # density got written

        losses = []
        for i in range(6):
            batch = parallel.shard_batch(dataset.sample_batch(), mesh)
            state, stats = train_step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(3), i),
                0.5, grid,
            )
            losses.append(float(stats["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestIterativeEvalRenderer:
    """render_eval: the occupancy-aware alive-ray test renderer."""

    @pytest.fixture(scope="class")
    def model_and_vars(self):
        from tests.test_models import _unit_sphere_rays

        model = ngp.HashGridModel(
            scale=0.5,
            max_samples=32,
            n_candidates=128,
            grid_resolution=16,
            eval_samples_per_round=16,
            eval_candidates_per_round=32,
            eval_max_total_samples=256,
            field_params=dict(n_levels=2, log2_table_size=10,
                              base_resolution=4, max_resolution=16,
                              hidden_width=16, geo_features=7),
        )
        rays = _unit_sphere_rays()
        variables = model.init(
            jax.random.PRNGKey(0), rng=None, rays=rays, train_frac=1.0,
            compute_extras=False,
        )
        return model, variables

    def test_empty_grid_renders_background(self, model_and_vars):
        from tests.test_models import _unit_sphere_rays

        model, variables = model_and_vars
        rays = _unit_sphere_rays(n=8, seed=11)
        grid = occ.init_grid(0.5, model.grid_resolution)  # all empty
        out = model.apply(variables, rays, grid,
                          method=ngp.HashGridModel.render_eval)
        np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out["samples_per_ray"]), 0)
        # bg_intensity_range is (0, 0) -> black.
        np.testing.assert_allclose(np.asarray(out["rgb"]), 0.0, atol=1e-6)

    def test_matches_dense_quadrature(self, model_and_vars):
        """On a fully-occupied grid the iterative renderer must reproduce
        the volume-rendering integral computed by brute-force fine
        quadrature of the same field (ground truth, no marching logic)."""
        from tests.test_models import _unit_sphere_rays

        model, variables = model_and_vars
        rays = _unit_sphere_rays(n=6, seed=12)
        grid = occ.init_grid(0.5, model.grid_resolution) + 1.0
        out = model.apply(variables, rays, grid,
                          method=ngp.HashGridModel.render_eval)

        t_near, t_far, hit = occ.intersect_aabb(
            rays.origins, rays.viewdirs, 0.5, near_min=model.near_distance
        )
        t_near = jnp.maximum(t_near, rays.near[..., 0])
        t_far = jnp.maximum(jnp.minimum(t_far, rays.far[..., 0]),
                            t_near + 1e-4)
        n = 8192
        frac = jnp.linspace(0.0, 1.0, n + 1)
        edges = t_near[:, None] + (t_far - t_near)[:, None] * frac
        mids = 0.5 * (edges[:, :-1] + edges[:, 1:])
        dt = jnp.diff(edges, axis=-1)
        pts = rays.origins[:, None, :] + mids[..., None] * rays.viewdirs[:, None, :]
        sigma, rgb = model.apply(
            variables, pts, rays.viewdirs[:, None, :],
            method=lambda m, p, v: m.field(p, v),
        )
        tau = sigma * dt
        trans = jnp.exp(-jnp.concatenate(
            [jnp.zeros_like(tau[:, :1]), jnp.cumsum(tau[:, :-1], -1)], -1))
        w = trans * (1.0 - jnp.exp(-tau))
        rgb_ref = jnp.sum(w[..., None] * rgb, axis=-2)
        acc_ref = jnp.sum(w, axis=-1)
        depth_ref = jnp.sum(w * mids, axis=-1)

        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(rgb_ref), atol=0.02
        )
        np.testing.assert_allclose(
            np.asarray(out["acc"]), np.asarray(acc_ref), atol=0.02
        )
        np.testing.assert_allclose(
            np.asarray(out["depth"]), np.asarray(depth_ref), atol=0.02
        )

    def test_early_termination_stops_rounds(self, model_and_vars):
        from tests.test_models import _unit_sphere_rays

        model, variables = model_and_vars
        rays = _unit_sphere_rays(n=8, seed=13)
        grid = occ.init_grid(0.5, model.grid_resolution) + 1.0
        # An opaque field (huge sigma) must retire every ray in round one.
        opaque = model.clone(eval_early_stop_eps=0.999999)
        out = opaque.apply(variables, rays, grid,
                           method=ngp.HashGridModel.render_eval)
        assert int(np.asarray(out["rounds"]).max()) <= 2

    def test_render_fn_dispatch(self, model_and_vars):
        import outdoor_nerf_depth_tpu.parallel as parallel
        from outdoor_nerf_depth_tpu.train import step as step_lib
        from outdoor_nerf_depth_tpu.train.config import Config
        from tests.test_models import _unit_sphere_rays

        model, variables = model_and_vars
        mesh = parallel.make_mesh()
        config = Config(model="ngp", ngp_eval_renderer="iterative")
        render_chunk = step_lib.make_render_fn(config, model, mesh)
        rays = _unit_sphere_rays(n=8, seed=14)
        grid = occ.init_grid(0.5, model.grid_resolution) + 1.0
        out = render_chunk(variables, rays, grid)
        assert "rounds" in out  # iterative path taken
        out2 = render_chunk(variables, rays, None)
        assert "rounds" not in out2  # dense fallback without a grid


class TestCalcDt:
    def test_matches_reference_clamp(self):
        # reference raymarching.cu:11-18: clamp(t*f, SQRT3/max, SQRT3*2s/g).
        s3 = float(np.sqrt(3.0))
        dt = occ.calc_dt(jnp.array([0.0, 1.0, 1e6]), 1.0 / 256, 1024, 128, 4.0)
        np.testing.assert_allclose(
            np.asarray(dt),
            [s3 / 1024, max(1.0 / 256, s3 / 1024), s3 * 8.0 / 128],
            rtol=1e-6,
        )

    def test_bounded_scene_uses_min_step(self):
        dt = occ.calc_dt(jnp.array([5.0]), 0.0, 1024, 128, 0.5)
        np.testing.assert_allclose(
            np.asarray(dt), [np.sqrt(3.0) / 1024], rtol=1e-6
        )


class TestPoseRefinement:
    """optimize_ext: learnable per-image SE(3) deltas (reference opt.py:58)."""

    def test_pose_params_receive_gradient(self):
        from tests.test_models import _unit_sphere_rays

        model = ngp.HashGridModel(
            scale=0.5, max_samples=8, n_candidates=32,
            optimize_ext=True, num_images=4,
            field_params=dict(n_levels=2, log2_table_size=10,
                              base_resolution=4, max_resolution=16,
                              hidden_width=16, geo_features=7),
        )
        rays = _unit_sphere_rays(n=8, seed=21)
        variables = model.init(jax.random.PRNGKey(0), rng=None, rays=rays,
                               train_frac=1.0, compute_extras=False)
        flat = {jax.tree_util.keystr(p): x
                for p, x in jax.tree_util.tree_leaves_with_path(variables)}
        assert any("pose_dR" in k for k in flat)
        assert any("pose_dT" in k for k in flat)

        def loss(v):
            renderings, _ = model.apply(v, None, rays)
            return jnp.mean((renderings[-1]["rgb"] - 0.3) ** 2) + jnp.mean(
                renderings[-1]["depth"]
            )

        g = jax.grad(loss)(variables)
        gflat = {jax.tree_util.keystr(p): x
                 for p, x in jax.tree_util.tree_leaves_with_path(g)}
        g_dt = [v for k, v in gflat.items() if "pose_dT" in k][0]
        assert np.all(np.isfinite(np.asarray(g_dt)))
        assert float(jnp.abs(g_dt).sum()) > 0

    def test_nonzero_delta_moves_rays(self):
        from tests.test_models import _unit_sphere_rays

        model = ngp.HashGridModel(
            scale=0.5, max_samples=8, n_candidates=32,
            optimize_ext=True, num_images=4,
            field_params=dict(n_levels=2, log2_table_size=10,
                              base_resolution=4, max_resolution=16,
                              hidden_width=16, geo_features=7),
        )
        rays = _unit_sphere_rays(n=8, seed=22)
        variables = model.init(jax.random.PRNGKey(0), rng=None, rays=rays,
                               train_frac=1.0, compute_extras=False)
        base, _ = model.apply(variables, None, rays)

        import flax

        v2 = flax.core.unfreeze(variables) if hasattr(flax.core, "unfreeze") else dict(variables)
        v2 = jax.tree_util.tree_map(lambda x: x, variables)
        v2["params"]["pose_dT"]["embedding"] = (
            v2["params"]["pose_dT"]["embedding"] + 0.05
        )
        moved, _ = model.apply(v2, None, rays)
        assert not np.allclose(
            np.asarray(base[-1]["depth"]), np.asarray(moved[-1]["depth"])
        )


class TestCompactionSubsampling:
    """Over-budget rays must keep full-segment coverage, not the near end
    (the dense-warmup billboard failure seen in the quality gate)."""

    def test_stride_covers_full_segment(self):
        edges = jnp.linspace(0.0, 1.0, 17)[None]  # 16 intervals, all occupied
        occupied = jnp.ones((1, 16), bool)
        t_mid, dt, valid = occ.compact_occupied(edges, occupied, 4)
        assert bool(valid.all())
        # stride k=4 -> picks intervals 0, 4, 8, 12 spanning the segment.
        np.testing.assert_allclose(
            np.asarray(t_mid[0]),
            [0.03125, 0.28125, 0.53125, 0.78125], atol=1e-6,
        )
        # dt scaled by the stride: optical depth conserved for constant
        # density (4 intervals x width/16 x 4 = full unit length).
        np.testing.assert_allclose(float(dt.sum()), 1.0, atol=1e-6)

    def test_under_budget_unchanged(self):
        edges = jnp.linspace(0.0, 1.0, 9)[None]
        occupied = jnp.array([[False, True, False, True, True, False,
                               False, True]])
        a = occ.compact_occupied(edges, occupied, 4, subsample=True)
        b = occ.compact_occupied(edges, occupied, 4, subsample=False)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    def test_model_trains_full_range_under_dense_grid(self):
        """With a fully-occupied grid and budget < candidates, training
        samples must span the ray's full segment."""
        from tests.test_models import _unit_sphere_rays

        model = ngp.HashGridModel(
            scale=0.5, max_samples=16, n_candidates=64,
            field_params=dict(n_levels=2, log2_table_size=10,
                              base_resolution=4, max_resolution=16,
                              hidden_width=16, geo_features=7),
        )
        rays = _unit_sphere_rays(n=4, seed=40)
        variables = model.init(jax.random.PRNGKey(0), rng=None, rays=rays,
                               train_frac=1.0, compute_extras=False)
        grid = occ.init_grid(0.5, model.grid_resolution) + 1.0
        _, history = model.apply(variables, None, rays, occupancy=grid)
        steps = np.asarray(history[-1]["steps"])
        t_far = np.asarray(
            occ.intersect_aabb(rays.origins, rays.viewdirs, 0.5,
                               near_min=model.near_distance)[1]
        )
        # Deepest sample reaches (nearly) the scene exit on every ray.
        assert np.all(steps.max(-1) > 0.85 * t_far)
