"""Tests for the model plugins: shapes, gradients, rendering invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outdoor_nerf_depth_tpu import models
from outdoor_nerf_depth_tpu.data import rays as rays_lib


def _unit_sphere_rays(n=6, seed=0):
    """Rays with origins inside the unit sphere (NeRF++ requirement)."""
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-0.25, 0.25, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    viewdirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return rays_lib.Rays(
        origins=jnp.asarray(origins),
        directions=jnp.asarray(dirs),
        viewdirs=jnp.asarray(viewdirs),
        radii=jnp.full((n, 1), 1e-3),
        imageplane=jnp.zeros((n, 2)),
        lossmult=jnp.ones((n, 1)),
        near=jnp.full((n, 1), 0.01),
        far=jnp.full((n, 1), 30.0),
        cam_idx=jnp.zeros((n, 1), jnp.int32),
    )


SMALL_MIP = dict(
    num_prop_samples=8,
    num_nerf_samples=4,
    num_levels=3,
    nerf_mlp_params=dict(net_depth=2, net_width=16, bottleneck_width=8,
                         net_width_viewdirs=8, max_deg_point=4),
    prop_mlp_params=dict(net_depth=2, net_width=16, max_deg_point=4),
)

SMALL_NERFPP = dict(
    cascade_samples=(8, 8),
    net_depth=2,
    net_width=16,
    pos_degrees=4,
    view_degrees=2,
)


class TestProposalModel:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = models.build("mipnerf360", **SMALL_MIP)
        rays = _unit_sphere_rays()
        variables = model.init(
            jax.random.PRNGKey(0), rng=None, rays=rays, train_frac=1.0,
            compute_extras=False,
        )
        return model, variables

    def test_output_structure(self, model_and_vars):
        model, variables = model_and_vars
        rays = _unit_sphere_rays()
        renderings, history = model.apply(
            variables, jax.random.PRNGKey(1), rays, train_frac=0.5,
            compute_extras=True,
        )
        assert len(renderings) == 3 and len(history) == 3
        final = renderings[-1]
        assert final["rgb"].shape == (6, 3)
        assert final["depth"].shape == (6,)
        assert final["distance_mean"].shape == (6,)
        assert history[-1]["weights"].shape == (6, 4)
        assert history[-1]["tdist"].shape == (6, 5)
        assert history[0]["weights"].shape == (6, 8)

    def test_outputs_finite_and_bounded(self, model_and_vars):
        model, variables = model_and_vars
        rays = _unit_sphere_rays(n=16, seed=3)
        renderings, history = model.apply(
            variables, None, rays, train_frac=1.0, compute_extras=True
        )
        for r in renderings:
            assert np.all(np.isfinite(np.asarray(r["rgb"])))
        final = renderings[-1]
        d = np.asarray(final["depth"])
        assert np.all(d >= 0.009) and np.all(d <= 30.1)
        w = np.asarray(history[-1]["weights"])
        assert np.all(w >= 0) and np.all(w.sum(-1) <= 1 + 1e-5)

    def test_deterministic_when_rng_none(self, model_and_vars):
        model, variables = model_and_vars
        rays = _unit_sphere_rays()
        out1, _ = model.apply(variables, None, rays, train_frac=1.0,
                              compute_extras=False)
        out2, _ = model.apply(variables, None, rays, train_frac=1.0,
                              compute_extras=False)
        np.testing.assert_array_equal(
            np.asarray(out1[-1]["rgb"]), np.asarray(out2[-1]["rgb"])
        )

    def test_gradients_flow_to_all_mlps(self, model_and_vars):
        model, variables = model_and_vars
        rays = _unit_sphere_rays()

        def loss(params):
            renderings, history = model.apply(
                params, None, rays, train_frac=1.0, compute_extras=False
            )
            # Interlevel-like term so the proposal MLP receives gradient too.
            prop_w = history[0]["weights"]
            return jnp.mean((renderings[-1]["rgb"] - 0.5) ** 2) + 0.01 * jnp.mean(
                prop_w**2
            )

        grads = jax.grad(loss)(variables)
        flat = jax.tree_util.tree_leaves_with_path(grads["params"])
        nerf_norm = sum(
            float(jnp.abs(g).sum())
            for p, g in flat
            if "nerf_mlp" in jax.tree_util.keystr(p)
        )
        prop_norm = sum(
            float(jnp.abs(g).sum())
            for p, g in flat
            if "prop_mlp" in jax.tree_util.keystr(p)
        )
        assert nerf_norm > 0 and prop_norm > 0
        assert np.isfinite(nerf_norm) and np.isfinite(prop_norm)

    def test_tdist_within_near_far(self, model_and_vars):
        model, variables = model_and_vars
        rays = _unit_sphere_rays()
        _, history = model.apply(
            variables, jax.random.PRNGKey(2), rays, train_frac=0.0,
            compute_extras=False,
        )
        for level in history:
            t = np.asarray(level["tdist"])
            assert t.min() >= 0.01 - 1e-5
            assert t.max() <= 30.0 + 1e-3
            assert np.all(np.diff(t, axis=-1) >= -1e-5)


class TestInvertedSphereModel:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = models.build("nerfpp", **SMALL_NERFPP)
        rays = _unit_sphere_rays()
        variables = model.init(
            jax.random.PRNGKey(0), rng=None, rays=rays, train_frac=1.0,
            compute_extras=False,
        )
        return model, variables

    def test_output_structure(self, model_and_vars):
        model, variables = model_and_vars
        rays = _unit_sphere_rays()
        renderings, history = model.apply(
            variables, jax.random.PRNGKey(1), rays, train_frac=1.0,
            compute_extras=True,
        )
        assert len(renderings) == 2
        assert renderings[0]["rgb"].shape == (6, 3)
        # Fine level: coarse 8 + resampled 8 = 16 fg samples.
        assert history[1]["weights"].shape == (6, 16)
        assert renderings[1]["bg_lambda"].shape == (6,)

    def test_composite_weights_partition(self, model_and_vars):
        # fg weight + bg_lambda must account for all transmittance: the fg
        # weights sum to ~(1 - bg_lambda) by construction.
        model, variables = model_and_vars
        rays = _unit_sphere_rays(n=12, seed=5)
        renderings, _ = model.apply(
            variables, None, rays, train_frac=1.0, compute_extras=False
        )
        for r in renderings:
            fg_sum = np.asarray(r["fg_weights"]).sum(-1)
            lam = np.asarray(r["bg_lambda"])
            np.testing.assert_allclose(fg_sum + lam, 1.0, atol=2e-3)

    def test_depth_composition(self, model_and_vars):
        model, variables = model_and_vars
        rays = _unit_sphere_rays()
        renderings, _ = model.apply(
            variables, None, rays, train_frac=1.0, compute_extras=False
        )
        r = renderings[-1]
        np.testing.assert_allclose(
            np.asarray(r["depth"]),
            np.asarray(r["fg_depth"]) + np.asarray(r["bg_depth"]),
            rtol=1e-5,
        )

    def test_gradients_finite(self, model_and_vars):
        model, variables = model_and_vars
        rays = _unit_sphere_rays()

        def loss(params):
            renderings, _ = model.apply(
                params, None, rays, train_frac=1.0, compute_extras=False
            )
            return jnp.mean((renderings[-1]["rgb"] - 0.3) ** 2) + 0.1 * jnp.mean(
                renderings[-1]["depth"]
            )

        grads = jax.tree_util.tree_leaves(jax.grad(loss)(variables))
        assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)
        assert sum(float(jnp.abs(g).sum()) for g in grads) > 0

    def test_fine_level_steps_sorted(self, model_and_vars):
        model, variables = model_and_vars
        rays = _unit_sphere_rays()
        _, history = model.apply(
            variables, jax.random.PRNGKey(4), rays, train_frac=1.0,
            compute_extras=False,
        )
        steps = np.asarray(history[1]["steps"])
        assert np.all(np.diff(steps, axis=-1) >= -1e-6)


def test_build_rejects_unknown():
    with pytest.raises(ValueError):
        models.build("gaussian_splats")


class TestLearnedExposureScaling:
    """Per-image rgb scaling offsets (reference models.py:66-121, 229-262)."""

    def test_param_exists_and_gets_gradient(self):
        from outdoor_nerf_depth_tpu.models.mipnerf360 import ProposalModel

        model = ProposalModel(
            num_prop_samples=8, num_nerf_samples=4, num_levels=2,
            learned_exposure_scaling=True, num_glo_embeddings=4,
            nerf_mlp_params=dict(net_depth=2, net_width=16,
                                 bottleneck_width=8, net_width_viewdirs=8,
                                 max_deg_point=4),
            prop_mlp_params=dict(net_depth=2, net_width=16, max_deg_point=4),
        )
        rays = _unit_sphere_rays(n=8, seed=30)
        variables = model.init(jax.random.PRNGKey(0), rng=None, rays=rays,
                               train_frac=1.0, compute_extras=False,
                               zero_glo=False)
        flat = {jax.tree_util.keystr(p): x
                for p, x in jax.tree_util.tree_leaves_with_path(variables)}
        assert any("exposure_scaling" in k for k in flat)

        def loss(v):
            renderings, _ = model.apply(v, None, rays, zero_glo=False)
            return jnp.mean((renderings[-1]["rgb"] - 0.2) ** 2)

        g = jax.grad(loss)(variables)
        gflat = {jax.tree_util.keystr(p): x
                 for p, x in jax.tree_util.tree_leaves_with_path(g)}
        g_expo = [v for k, v in gflat.items() if "exposure_scaling" in k][0]
        assert float(jnp.abs(g_expo).sum()) > 0

    def test_zero_glo_disables_scaling(self):
        from outdoor_nerf_depth_tpu.models.mipnerf360 import ProposalModel

        model = ProposalModel(
            num_prop_samples=8, num_nerf_samples=4, num_levels=2,
            learned_exposure_scaling=True, num_glo_embeddings=4,
            nerf_mlp_params=dict(net_depth=2, net_width=16,
                                 bottleneck_width=8, net_width_viewdirs=8,
                                 max_deg_point=4),
            prop_mlp_params=dict(net_depth=2, net_width=16, max_deg_point=4),
        )
        rays = _unit_sphere_rays(n=8, seed=31)
        variables = model.init(jax.random.PRNGKey(0), rng=None, rays=rays,
                               train_frac=1.0, compute_extras=False,
                               zero_glo=False)
        # Perturb the offsets: eval path (zero_glo=True) must be unaffected.
        v2 = jax.tree_util.tree_map(lambda x: x, variables)
        v2["params"]["exposure_scaling"]["embedding"] = (
            v2["params"]["exposure_scaling"]["embedding"] + 0.5
        )
        a, _ = model.apply(variables, None, rays, zero_glo=True)
        b, _ = model.apply(v2, None, rays, zero_glo=True)
        np.testing.assert_array_equal(
            np.asarray(a[-1]["rgb"]), np.asarray(b[-1]["rgb"])
        )
        c, _ = model.apply(v2, None, rays, zero_glo=False)
        assert not np.allclose(np.asarray(a[-1]["rgb"]), np.asarray(c[-1]["rgb"]))
