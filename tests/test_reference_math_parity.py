"""Model-math parity against the REFERENCE's own mip-NeRF 360 internals.

VERDICT r3 missing #1: the loader-parity suite proved the *data*
bookkeeping against the reference's imported code; this module does the
same for the *model/loss* math. The reference's MipNeRF-360 internals are
pure JAX and CPU-importable with the stubs the loader suite already built,
so every core function is imported READ-ONLY and asserted numerically
equivalent to ours on random inputs:

  * `internal/stepfun.py:30-342`  <-> `ops/stepfuns.py` (searchsorted,
    query, inner_outer, lossfun_outer, dilation, CDF inversion, sampling,
    distortion, percentiles, resample)
  * `internal/coord.py:21-133`    <-> `ops/spaces.py` (contract,
    construct_ray_warps, track_linearize, IPE, lift_and_diagonalize)
  * `internal/render.py:21-216`   <-> `ops/volren.py` (frustum Gaussians,
    compute_alpha_weights, volumetric_rendering incl. log-space
    distance_mean and weighted percentiles)
  * `internal/math.py:26-127`     <-> `ops/mathx.py` (safe trig/exp, LR
    decay, sorted_interp)
  * `internal/depth_loss.py:5-103` + `internal/train_utils.py:72-157`
                                  <-> `train/losses.py` (mse/l1/kl/urf
    depth supervision, interlevel + distortion regularizers)

Where the reference offers a GPU and a TPU variant of the same routine
(interp vs sorted_interp, invert_cdf's `use_gpu_resampling`), ours is
checked against BOTH. Random-input equivalence at f32 (CPU, HIGHEST
matmul precision) to tolerances consistent with reordered-but-identical
arithmetic.

Shape conventions for the depth losses: the reference's `depth_loss.py`
is written in the nerfstudio convention (trailing singleton channel:
weights [B,S,1], depth [B,1]) — its reductions (`sum(-2)`) only implement
the paper's per-ray sums under those shapes. The parity tests feed the
reference that convention and ours the flat [B,S]/[B] convention, which is
the semantics our trainer uses.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Reuse the loader-parity suite's stub machinery (gin/dm_pix/rawpy/
# icecream/pycolmap) — pytest puts tests/ on sys.path.
import test_reference_parity as loader_parity

MIP_DIR = loader_parity.MIP_DIR

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MIP_DIR), reason="reference repo not present"
)


@pytest.fixture(scope="module")
def ref():
    """Reference `internal` math modules, imported read-only with stubs."""
    stubs = {
        **loader_parity._gin_stub(),
        **loader_parity._simple_stubs(),
        **loader_parity._pycolmap_stub(),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    saved_internal = {
        k: sys.modules.get(k)
        for k in list(sys.modules)
        if k == "internal" or k.startswith("internal.")
    }
    sys.modules.update(stubs)
    sys.path.insert(0, MIP_DIR)
    try:
        from internal import coord, depth_loss, math, render, stepfun, train_utils

        yield types.SimpleNamespace(
            coord=coord,
            depth_loss=depth_loss,
            math=math,
            render=render,
            stepfun=stepfun,
            train_utils=train_utils,
        )
    finally:
        sys.path.remove(MIP_DIR)
        for k, v in {**saved, **saved_internal}.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in list(sys.modules):
            if (k == "internal" or k.startswith("internal.")) and k not in saved_internal:
                del sys.modules[k]


def _rng(i):
    return jax.random.PRNGKey(i)


def _hist(key, batch=6, bins=9, t_lo=0.0, t_hi=1.0):
    """A random step function: sorted edges t [B, bins+1], weights w >= 0."""
    k1, k2 = jax.random.split(key)
    t = jnp.sort(
        jax.random.uniform(k1, (batch, bins + 1), minval=t_lo, maxval=t_hi),
        axis=-1,
    )
    # Keep edges distinct so density conversion is well-conditioned.
    t = t + jnp.arange(bins + 1) * 1e-3
    w = jax.random.uniform(k2, (batch, bins))
    return t, w


def _norm_w(w):
    return w / jnp.sum(w, axis=-1, keepdims=True)


class TestStepfunParity:
    def test_searchsorted(self, ref):
        from outdoor_nerf_depth_tpu.ops import mathx

        t, _ = _hist(_rng(0))
        q = jax.random.uniform(_rng(1), (6, 13), minval=-0.2, maxval=1.4)
        lo_r, hi_r = ref.stepfun.searchsorted(t, q)
        lo_o, hi_o = mathx.searchsorted_pair(t, q)
        np.testing.assert_array_equal(lo_r, lo_o)
        np.testing.assert_array_equal(hi_r, hi_o)

    def test_query(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        t, w = _hist(_rng(2))
        q = jax.random.uniform(_rng(3), (6, 17), minval=-0.3, maxval=1.5)
        np.testing.assert_allclose(
            ref.stepfun.query(q, t, w, outside_value=-7.0),
            stepfuns.query(q, t, w, fill=-7.0),
            rtol=1e-6,
        )

    def test_inner_outer_and_lossfun_outer(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        t0, w0 = _hist(_rng(4), bins=8)
        t1, w1 = _hist(_rng(5), bins=12)
        inner_r, outer_r = ref.stepfun.inner_outer(t0, t1, w1)
        inner_o, outer_o = stepfuns.inner_outer(t0, t1, w1)
        np.testing.assert_allclose(inner_r, inner_o, atol=1e-6)
        np.testing.assert_allclose(outer_r, outer_o, atol=1e-6)
        np.testing.assert_allclose(
            ref.stepfun.lossfun_outer(t0, w0, t1, w1),
            stepfuns.outer_envelope_loss(t0, w0, t1, w1),
            rtol=1e-5,
            atol=1e-7,
        )

    def test_pdf_weight_roundtrip(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        t, w = _hist(_rng(6))
        p_r = ref.stepfun.weight_to_pdf(t, w)
        p_o = stepfuns.weights_to_density(t, w)
        np.testing.assert_allclose(p_r, p_o, rtol=1e-6)
        np.testing.assert_allclose(
            ref.stepfun.pdf_to_weight(t, p_r),
            stepfuns.density_to_weights(t, p_o),
            rtol=1e-6,
        )

    def test_max_dilate_weights(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        t, w = _hist(_rng(7))
        for renorm in (False, True):
            t_r, w_r = ref.stepfun.max_dilate_weights(
                t, w, 0.03, domain=(0.0, 1.1), renormalize=renorm
            )
            t_o, w_o = stepfuns.max_dilate_weights(
                t, w, 0.03, domain=(0.0, 1.1), renormalize=renorm
            )
            np.testing.assert_allclose(t_r, t_o, atol=1e-7)
            np.testing.assert_allclose(w_r, w_o, rtol=1e-5, atol=1e-7)

    def test_integrate_weights(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        _, w = _hist(_rng(8))
        np.testing.assert_allclose(
            ref.stepfun.integrate_weights(_norm_w(w)),
            stepfuns.integrate_weights(_norm_w(w)),
            atol=1e-7,
        )

    def test_invert_cdf_both_variants(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        t, _ = _hist(_rng(9))
        logits = jax.random.normal(_rng(10), (6, 9))
        u = jnp.sort(jax.random.uniform(_rng(11), (6, 15)), axis=-1)
        for gpu in (False, True):
            np.testing.assert_allclose(
                ref.stepfun.invert_cdf(u, t, logits, use_gpu_resampling=gpu),
                stepfuns.invert_cdf(u, t, logits, use_gather_interp=gpu),
                atol=1e-6,
            )

    def test_sample_deterministic_and_jittered(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        t, _ = _hist(_rng(12))
        logits = jax.random.normal(_rng(13), (6, 9))
        for det_center in (False, True):
            np.testing.assert_allclose(
                ref.stepfun.sample(
                    None, t, logits, 11, deterministic_center=det_center
                ),
                stepfuns.sample(
                    None, t, logits, 11, deterministic_center=det_center
                ),
                atol=1e-6,
            )
        # Same PRNG key => the jitter draw is identical, so outputs match.
        for single in (False, True):
            np.testing.assert_allclose(
                ref.stepfun.sample(_rng(14), t, logits, 11, single_jitter=single),
                stepfuns.sample(_rng(14), t, logits, 11, single_jitter=single),
                atol=1e-6,
            )

    def test_sample_intervals(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        t, _ = _hist(_rng(15))
        logits = jax.random.normal(_rng(16), (6, 9))
        for single in (False, True):
            np.testing.assert_allclose(
                ref.stepfun.sample_intervals(
                    _rng(17), t, logits, 8, single_jitter=single, domain=(0.0, 1.1)
                ),
                stepfuns.sample_intervals(
                    _rng(17), t, logits, 8, single_jitter=single, domain=(0.0, 1.1)
                ),
                atol=1e-6,
            )

    def test_lossfun_distortion(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        t, w = _hist(_rng(18))
        np.testing.assert_allclose(
            ref.stepfun.lossfun_distortion(t, w),
            stepfuns.distortion_loss(t, w),
            rtol=1e-5,
        )

    def test_interval_distortion(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        k = jax.random.split(_rng(19), 4)
        lo0 = jax.random.uniform(k[0], (32,))
        hi0 = lo0 + jax.random.uniform(k[1], (32,)) + 1e-3
        lo1 = jax.random.uniform(k[2], (32,))
        hi1 = lo1 + jax.random.uniform(k[3], (32,)) + 1e-3
        np.testing.assert_allclose(
            ref.stepfun.interval_distortion(lo0, hi0, lo1, hi1),
            stepfuns.interval_distortion(lo0, hi0, lo1, hi1),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_weighted_percentile(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        t, w = _hist(_rng(20))
        w = _norm_w(w)
        np.testing.assert_allclose(
            ref.stepfun.weighted_percentile(t, w, [5, 50, 95]),
            stepfuns.weighted_percentile(t, w, [5, 50, 95]),
            atol=1e-6,
        )

    def test_resample(self, ref):
        from outdoor_nerf_depth_tpu.ops import stepfuns

        tp, vp = _hist(_rng(21), bins=10)
        t, _ = _hist(_rng(22), bins=7)
        for use_avg in (False, True):
            np.testing.assert_allclose(
                ref.stepfun.resample(t, tp, vp, use_avg=use_avg),
                stepfuns.resample(t, tp, vp, use_avg=use_avg),
                rtol=1e-4,
                atol=1e-6,
            )


class TestCoordParity:
    def test_contract_inv(self, ref):
        from outdoor_nerf_depth_tpu.ops import spaces

        x = jax.random.normal(_rng(30), (128, 3)) * 3.0
        z_r = ref.coord.contract(x)
        z_o = spaces.contract(x)
        np.testing.assert_allclose(z_r, z_o, atol=1e-7)
        np.testing.assert_allclose(
            ref.coord.inv_contract(z_r), spaces.uncontract(z_o), atol=1e-5
        )

    def test_track_linearize(self, ref):
        from outdoor_nerf_depth_tpu.ops import spaces

        mean = jax.random.normal(_rng(31), (16, 3)) * 2.0
        half = jax.random.normal(_rng(32), (16, 3, 3)) * 0.1
        cov = half @ jnp.swapaxes(half, -1, -2) + 0.01 * jnp.eye(3)
        m_r, c_r = ref.coord.track_linearize(ref.coord.contract, mean, cov)
        m_o, c_o = spaces.track_gaussian(spaces.contract, mean, cov)
        np.testing.assert_allclose(m_r, m_o, atol=1e-6)
        np.testing.assert_allclose(c_r, c_o, atol=1e-5)

    def test_construct_ray_warps(self, ref):
        from outdoor_nerf_depth_tpu.ops import spaces

        t_near = jnp.full((8, 1), 0.3)
        t_far = jnp.full((8, 1), 90.0)
        t = jnp.linspace(0.31, 89.0, 33)[None, :] * jnp.ones((8, 1))
        s = jnp.linspace(0.01, 0.99, 33)[None, :] * jnp.ones((8, 1))
        cases = [
            (None, None),
            ("piecewise", "piecewise"),
            (jnp.reciprocal, "reciprocal"),
            (jnp.log, "log"),
            (jnp.sqrt, "sqrt"),
        ]
        for ref_fn, our_name in cases:
            t2s_r, s2t_r = ref.coord.construct_ray_warps(ref_fn, t_near, t_far)
            t2s_o, s2t_o = spaces.metric_to_normalized(our_name, t_near, t_far)
            np.testing.assert_allclose(t2s_r(t), t2s_o(t), rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(s2t_r(s), s2t_o(s), rtol=1e-5)

    def test_expected_sin_and_ipe(self, ref):
        from outdoor_nerf_depth_tpu.ops import spaces

        mean = jax.random.normal(_rng(33), (32, 3)) * 2.0
        var = jax.random.uniform(_rng(34), (32, 3)) * 0.5
        np.testing.assert_allclose(
            ref.coord.expected_sin(mean, var),
            spaces.expected_sin(mean, var),
            atol=1e-7,
        )
        np.testing.assert_allclose(
            ref.coord.integrated_pos_enc(mean, var, 0, 6),
            spaces.integrated_pos_enc(mean, var, 0, 6),
            atol=1e-6,
        )

    def test_pos_enc(self, ref):
        from outdoor_nerf_depth_tpu.ops import spaces

        x = jax.random.normal(_rng(35), (32, 3))
        for append in (False, True):
            np.testing.assert_allclose(
                ref.coord.pos_enc(x, 0, 8, append_identity=append),
                spaces.pos_enc(x, 0, 8, append_identity=append),
                atol=1e-6,
            )

    def test_lift_and_diagonalize(self, ref):
        from outdoor_nerf_depth_tpu.ops import spaces

        mean = jax.random.normal(_rng(36), (16, 3))
        half = jax.random.normal(_rng(37), (16, 3, 3)) * 0.2
        cov = half @ jnp.swapaxes(half, -1, -2)
        basis = jnp.asarray(np.linalg.qr(np.random.RandomState(0).randn(3, 3))[0])
        m_r, v_r = ref.coord.lift_and_diagonalize(mean, cov, basis)
        m_o, v_o = spaces.project_and_diagonalize(mean, cov, basis)
        np.testing.assert_allclose(m_r, m_o, atol=1e-6)
        np.testing.assert_allclose(v_r, v_o, atol=1e-6)


class TestMathParity:
    def test_safe_trig(self, ref):
        from outdoor_nerf_depth_tpu.ops import mathx

        x = jnp.concatenate(
            [jax.random.normal(_rng(40), (64,)) * 50.0, jnp.array([1e8, -1e8, 4e4])]
        )
        np.testing.assert_allclose(ref.math.safe_sin(x), mathx.safe_sin(x), atol=1e-6)
        np.testing.assert_allclose(ref.math.safe_cos(x), mathx.safe_cos(x), atol=1e-6)

    def test_safe_exp_value_and_grad(self, ref):
        from outdoor_nerf_depth_tpu.ops import mathx

        x = jnp.array([-5.0, 0.0, 10.0, 87.9, 100.0, 500.0])
        np.testing.assert_allclose(
            ref.math.safe_exp(x), mathx.safe_exp(x), rtol=1e-6
        )
        g_r = jax.vmap(jax.grad(ref.math.safe_exp))(x)
        g_o = jax.vmap(jax.grad(mathx.safe_exp))(x)
        np.testing.assert_allclose(g_r, g_o, rtol=1e-6)
        assert np.all(np.isfinite(g_o))

    def test_lr_decay(self, ref):
        from outdoor_nerf_depth_tpu.ops import mathx

        steps = jnp.array([0.0, 10.0, 250.0, 999.0, 1000.0])
        for delay, mult in ((0, 1.0), (100, 0.01)):
            np.testing.assert_allclose(
                ref.math.learning_rate_decay(steps, 2e-3, 2e-5, 1000, delay, mult),
                mathx.lr_schedule(steps, 2e-3, 2e-5, 1000, delay, mult),
                rtol=1e-6,
            )

    def test_sorted_interp_vs_both_reference_variants(self, ref):
        from outdoor_nerf_depth_tpu.ops import mathx

        xp = jnp.sort(jax.random.uniform(_rng(41), (6, 11)), axis=-1)
        fp = jnp.sort(jax.random.normal(_rng(42), (6, 11)), axis=-1)
        x = jnp.sort(
            jax.random.uniform(_rng(43), (6, 9), minval=-0.2, maxval=1.2), axis=-1
        )
        np.testing.assert_allclose(
            ref.math.sorted_interp(x, xp, fp), mathx.sorted_interp(x, xp, fp),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            ref.math.interp(x, xp, fp), mathx.gather_interp(x, xp, fp), atol=1e-6
        )


class TestRenderParity:
    def _rays(self, key, batch=8, n=12):
        ks = jax.random.split(key, 4)
        d = jax.random.normal(ks[0], (batch, 3))
        tdist = jnp.sort(
            jax.random.uniform(ks[1], (batch, n + 1), minval=0.1, maxval=5.0),
            axis=-1,
        )
        density = jax.random.uniform(ks[2], (batch, n)) * 3.0
        origins = jax.random.normal(ks[3], (batch, 3))
        return d, tdist, density, origins

    def test_conical_frustum_to_gaussian(self, ref):
        from outdoor_nerf_depth_tpu.ops import volren

        d, tdist, _, _ = self._rays(_rng(50))
        t0, t1 = tdist[..., :-1], tdist[..., 1:]
        for diag in (True, False):
            m_r, c_r = ref.render.conical_frustum_to_gaussian(
                d, t0, t1, 0.02, diag, stable=True
            )
            m_o, c_o = volren.lift_to_3d(
                d, *volren.gaussianize_cone(d, t0, t1, 0.02), diagonal=diag
            )
            np.testing.assert_allclose(m_r, m_o, rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(c_r, c_o, rtol=1e-4, atol=1e-8)

    def test_cylinder_to_gaussian(self, ref):
        from outdoor_nerf_depth_tpu.ops import volren

        d, tdist, _, _ = self._rays(_rng(51))
        t0, t1 = tdist[..., :-1], tdist[..., 1:]
        radius = jnp.full((8, 1), 0.05)
        m_r, c_r = ref.render.cylinder_to_gaussian(d, t0, t1, radius, True)
        m_o, c_o = volren.lift_to_3d(
            d, *volren.gaussianize_cylinder(d, t0, t1, radius), diagonal=True
        )
        np.testing.assert_allclose(m_r, m_o, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(c_r, c_o, rtol=1e-5, atol=1e-8)

    def test_cast_rays(self, ref):
        from outdoor_nerf_depth_tpu.ops import volren

        d, tdist, _, origins = self._rays(_rng(52))
        radii = jnp.full((8, 1), 0.01)
        for shape in ("cone", "cylinder"):
            m_r, c_r = ref.render.cast_rays(tdist, origins, d, radii, shape, True)
            m_o, c_o = volren.cast_rays(
                tdist, origins, d, radii, ray_shape=shape, diagonal=True
            )
            np.testing.assert_allclose(m_r, m_o, rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(c_r, c_o, rtol=1e-4, atol=1e-8)

    def test_compute_alpha_weights(self, ref):
        from outdoor_nerf_depth_tpu.ops import volren

        d, tdist, density, _ = self._rays(_rng(53))
        for opaque in (False, True):
            w_r, a_r, t_r = ref.render.compute_alpha_weights(
                density, tdist, d, opaque_background=opaque
            )
            w_o, a_o, t_o = volren.alpha_composite_weights(
                density, tdist, d, opaque_background=opaque
            )
            np.testing.assert_allclose(w_r, w_o, atol=1e-6)
            np.testing.assert_allclose(a_r, a_o, atol=1e-6)
            np.testing.assert_allclose(t_r, t_o, atol=1e-6)

    def test_volumetric_rendering(self, ref):
        from outdoor_nerf_depth_tpu.ops import volren

        d, tdist, density, _ = self._rays(_rng(54))
        w_r, _, _ = ref.render.compute_alpha_weights(density, tdist, d)
        rgbs = jax.random.uniform(_rng(55), (8, 12, 3))
        bg = jnp.array([0.3, 0.5, 0.7])
        t_far = jnp.full((8, 1), 6.0)
        extras = {"feat": jax.random.normal(_rng(56), (8, 12, 2))}
        out_r = ref.render.volumetric_rendering(
            rgbs, w_r, tdist, bg, t_far, True, extras=extras
        )
        out_o = volren.composite(
            rgbs, w_r, tdist, bg, t_far, compute_extras=True, extras=extras
        )
        for key in (
            "rgb", "acc", "feat", "distance_mean", "depth",
            "distance_percentile_5", "distance_median", "distance_percentile_95",
        ):
            np.testing.assert_allclose(
                out_r[key], out_o[key], rtol=1e-5, atol=1e-5, err_msg=key
            )


class TestDepthLossParity:
    """mse/l1/kl/urf supervision vs `depth_loss.py` + `train_utils.py`.

    Reference gets nerfstudio-convention shapes (trailing singleton), ours
    gets flat [B,S]/[B] — see module docstring.
    """

    B, S = 16, 16

    def _setup(self, key):
        ks = jax.random.split(key, 5)
        tdist = jnp.sort(
            jax.random.uniform(ks[0], (self.B, self.S + 1), minval=0.5, maxval=20.0),
            axis=-1,
        )
        d = jax.random.normal(ks[1], (self.B, 3))
        density = jax.random.uniform(ks[2], (self.B, self.S)) * 0.5
        from outdoor_nerf_depth_tpu.ops import volren

        w, _, _ = volren.alpha_composite_weights(density, tdist, d)
        depth_sup = jax.random.uniform(ks[3], (self.B,), minval=0.0, maxval=18.0)
        # ~1/4 invalid rays.
        depth_sup = jnp.where(depth_sup < 4.0, 0.0, depth_sup)
        depth_pred = jax.random.uniform(ks[4], (self.B,), minval=1.0, maxval=18.0)
        return tdist, d, w, depth_sup, depth_pred

    def test_kl_and_urf_losses(self, ref):
        """The DS-NeRF KL and URF loss kernels (`depth_loss.py:5-64`).

        The reference kernels originate in nerfstudio and are only
        shape-consistent under that convention (weights/steps/lengths
        [B,S,1], depth [B,1] — their `sum(-2)` is the per-ray sample sum);
        the `depth_loss()` dispatcher's own slicing then feeds them 2-D
        tensors, which is a latent shape bug in the reference, not a
        semantics difference. Parity is asserted kernel-for-kernel with
        steps/lengths derived exactly as both dispatchers derive them.
        """
        from outdoor_nerf_depth_tpu.train import losses

        tdist, d, w, depth_sup, depth_pred = self._setup(_rng(60))
        sigma = 0.7
        steps = 0.5 * (tdist[..., :-1] + tdist[..., 1:])
        lengths = jnp.diff(tdist, axis=-1) * jnp.linalg.norm(
            d[..., None, :], axis=-1
        )
        loss_r = ref.depth_loss.ds_nerf_depth_loss(
            w[..., None], depth_sup[..., None], steps[..., None],
            lengths[..., None], sigma,
        )
        loss_o = losses.ds_nerf_kl_loss(w, depth_sup, steps, lengths, sigma)
        np.testing.assert_allclose(loss_r, loss_o, rtol=1e-5, err_msg="kl")

        loss_r = ref.depth_loss.urban_radiance_field_depth_loss(
            w[..., None], depth_sup[..., None], depth_pred[..., None],
            steps[..., None], sigma,
        )
        loss_o = losses.urban_rf_depth_loss(w, depth_sup, depth_pred, steps, sigma)
        np.testing.assert_allclose(loss_r, loss_o, rtol=1e-5, err_msg="urf")

        # And the dispatcher-side derivation: our history dispatcher must
        # produce the same kl value as the hand-derived steps/lengths path.
        np.testing.assert_allclose(
            losses.depth_loss_from_history(
                {"weights": w, "tdist": tdist}, depth_sup, depth_pred, d,
                sigma, kind="kl",
            ),
            losses.ds_nerf_kl_loss(w, depth_sup, steps, lengths, sigma),
            rtol=1e-6,
        )

    def test_mse_l1_branch(self, ref):
        """The train_utils.py:108-121 disparity mse/l1 formula."""
        from outdoor_nerf_depth_tpu.train import losses

        _, _, _, depth_sup, depth_pred = self._setup(_rng(61))
        mask = depth_sup > 0
        ref_mse = jnp.mean((mask * depth_pred - mask * depth_sup) ** 2)
        ref_l1 = jnp.mean(jnp.abs(mask * depth_pred - mask * depth_sup))
        np.testing.assert_allclose(
            ref_mse,
            losses.expected_depth_loss(depth_pred, depth_sup, kind="mse"),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            ref_l1,
            losses.expected_depth_loss(depth_pred, depth_sup, kind="l1"),
            rtol=1e-6,
        )


class TestRegularizerParity:
    def _history(self, key, levels=3):
        out = []
        for i in range(levels):
            t, w = _hist(jax.random.fold_in(key, i), batch=8, bins=8 + 4 * i)
            out.append({"sdist": t, "weights": w * 0.1})
        return out

    def test_interlevel_loss(self, ref):
        from outdoor_nerf_depth_tpu.train import losses

        hist = self._history(_rng(70))
        cfg = types.SimpleNamespace(interlevel_loss_mult=1.0)
        np.testing.assert_allclose(
            ref.train_utils.interlevel_loss(hist, cfg),
            losses.interlevel_loss(hist),
            rtol=1e-5,
        )

    def test_distortion_loss(self, ref):
        from outdoor_nerf_depth_tpu.train import losses

        hist = self._history(_rng(71))
        cfg = types.SimpleNamespace(distortion_loss_mult=1.0)
        np.testing.assert_allclose(
            ref.train_utils.distortion_loss(hist, cfg),
            losses.distortion_loss(hist),
            rtol=1e-5,
        )


class TestRefUtilsParity:
    """Ref-NeRF direction machinery vs `internal/ref_utils.py`."""

    @pytest.fixture(scope="class")
    def ref_utils(self, ref):
        import math as _pymath

        sys.path.insert(0, MIP_DIR)
        # The reference calls np.math.factorial; numpy 2.x removed the
        # np.math alias. Shim it for the duration of these tests only.
        had = hasattr(np, "math")
        if not had:
            np.math = _pymath
        try:
            from internal import ref_utils as m
            yield m
        finally:
            sys.path.remove(MIP_DIR)
            if not had and hasattr(np, "math"):
                del np.math

    def test_reflect_and_normalize(self, ref_utils):
        from outdoor_nerf_depth_tpu.ops import refdirs

        v = jax.random.normal(_rng(80), (64, 3))
        n = ref_utils.l2_normalize(jax.random.normal(_rng(81), (64, 3)))
        np.testing.assert_allclose(
            ref_utils.l2_normalize(v), refdirs.l2_normalize(v), atol=1e-6
        )
        np.testing.assert_allclose(
            ref_utils.reflect(v, n), refdirs.reflect(v, n), atol=1e-6
        )

    def test_weighted_mae(self, ref_utils):
        from outdoor_nerf_depth_tpu.ops import refdirs

        w = jax.random.uniform(_rng(82), (32,))
        n1 = ref_utils.l2_normalize(jax.random.normal(_rng(83), (32, 3)))
        n2 = ref_utils.l2_normalize(jax.random.normal(_rng(84), (32, 3)))
        np.testing.assert_allclose(
            ref_utils.compute_weighted_mae(w, n1, n2),
            refdirs.weighted_mae_degrees(w, n1, n2),
            rtol=1e-5,
        )

    def test_ide_and_dir_enc(self, ref_utils):
        from outdoor_nerf_depth_tpu.ops import refdirs

        d = ref_utils.l2_normalize(jax.random.normal(_rng(85), (48, 3)))
        kappa_inv = jax.random.uniform(_rng(86), (48, 1)) * 0.2
        for deg in (2, 4):
            np.testing.assert_allclose(
                ref_utils.generate_ide_fn(deg)(d, kappa_inv),
                refdirs.generate_ide_fn(deg)(d, kappa_inv),
                atol=1e-5,
            )
        np.testing.assert_allclose(
            ref_utils.generate_dir_enc_fn(4)(d),
            refdirs.generate_dir_enc_fn(4)(d),
            atol=1e-5,
        )


class TestGeopolyParity:
    """Geodesic basis vs `internal/geopoly.py:78-124` (as a direction SET —
    tesselation vertex ordering is not part of the contract)."""

    @pytest.fixture(scope="class")
    def geopoly(self, ref):
        sys.path.insert(0, MIP_DIR)
        try:
            from internal import geopoly as m
            yield m
        finally:
            sys.path.remove(MIP_DIR)

    @pytest.mark.parametrize("shape,tess", [("icosahedron", 2),
                                            ("octahedron", 2)])
    def test_basis_direction_set(self, geopoly, shape, tess):
        from outdoor_nerf_depth_tpu.ops import spaces

        ref_basis = np.asarray(geopoly.generate_basis(shape, tess))  # [n, 3]
        ours = np.asarray(spaces.sphere_basis(shape, tess)).T        # [m, 3]
        assert ref_basis.shape == ours.shape
        # Every reference direction appears in ours up to sign (symmetries
        # were removed with an arbitrary sign pick) and vice versa.
        d2 = np.minimum(
            np.sum((ref_basis[:, None] - ours[None]) ** 2, -1),
            np.sum((ref_basis[:, None] + ours[None]) ** 2, -1),
        )
        assert np.max(np.min(d2, axis=1)) < 1e-8
        assert np.max(np.min(d2, axis=0)) < 1e-8


class TestNerfppInvertedSphereParity:
    """NeRF++ background parametrization vs the torch reference
    (`nerfplusplus/ddp_model.py:16-45` depth2pts_outside and the
    intersect_sphere helper) — the trickiest geometry in that backend
    (Rodrigues rotation of the unit-sphere exit point + real-depth
    recovery)."""

    NPP_DIR = "/root/reference/nerf-methods/nerfplusplus"

    @pytest.fixture(scope="class")
    def ref_npp(self):
        if not os.path.isdir(self.NPP_DIR):
            pytest.skip("nerfplusplus reference not present")
        saved = {k: sys.modules.get(k) for k in ("utils", "nerf_network",
                                                 "ddp_model")}
        sys.path.insert(0, self.NPP_DIR)
        try:
            import ddp_model
            yield ddp_model
        finally:
            sys.path.remove(self.NPP_DIR)
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v

    def test_depth2pts_outside(self, ref_npp):
        import torch

        from outdoor_nerf_depth_tpu.ops import geometry

        rng = np.random.RandomState(5)
        ray_o = (rng.uniform(-0.5, 0.5, (64, 3))).astype(np.float32)
        ray_d = rng.normal(size=(64, 3)).astype(np.float32)
        inv_r = rng.uniform(0.05, 1.0, (64,)).astype(np.float32)

        pts_r, depth_r = ref_npp.depth2pts_outside(
            torch.from_numpy(ray_o), torch.from_numpy(ray_d),
            torch.from_numpy(inv_r),
        )
        pts_o, t_o = geometry.inverted_sphere_points(
            jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(inv_r)
        )
        np.testing.assert_allclose(
            pts_r.numpy(), np.asarray(pts_o), atol=2e-5
        )
        np.testing.assert_allclose(
            depth_r.numpy(), np.asarray(t_o), rtol=1e-4, atol=1e-4
        )

    def test_intersect_sphere(self, ref_npp):
        import torch

        from outdoor_nerf_depth_tpu.ops import geometry

        rng = np.random.RandomState(6)
        ray_o = (rng.uniform(-0.5, 0.5, (64, 3))).astype(np.float32)
        ray_d = rng.normal(size=(64, 3)).astype(np.float32)
        # The reference's intersect_sphere lives in ddp_train_nerf /
        # ddp_model depending on snapshot; recompute its formula directly
        # (d1 + d2 from ddp_model.py:21-27) as the ground truth.
        o, d = torch.from_numpy(ray_o), torch.from_numpy(ray_d)
        d1 = -torch.sum(d * o, dim=-1) / torch.sum(d * d, dim=-1)
        p = o + d1.unsqueeze(-1) * d
        d2 = torch.sqrt(1.0 - torch.sum(p * p, -1)) / torch.norm(d, dim=-1)
        t_exit, valid = geometry.intersect_unit_sphere(
            jnp.asarray(ray_o), jnp.asarray(ray_d)
        )
        assert bool(np.all(np.asarray(valid)))
        np.testing.assert_allclose(
            (d1 + d2).numpy(), np.asarray(t_exit), rtol=1e-5, atol=1e-5
        )
