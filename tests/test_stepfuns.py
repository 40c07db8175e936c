"""Tests for ops.stepfuns, following the reference test strategy:

brute-force numpy reimplementations, Monte-Carlo validation of closed forms,
and golden invariants (cf. `/root/reference/nerf-methods/mipnerf360/tests/
stepfun_test.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from outdoor_nerf_depth_tpu.ops import stepfuns


def _rand_stepfun(rng, batch, n):
    t = np.sort(rng.uniform(0.0, 1.0, (batch, n + 1)), axis=-1)
    w = rng.uniform(0.0, 1.0, (batch, n))
    w = w / w.sum(-1, keepdims=True)
    return jnp.asarray(t), jnp.asarray(w)


def _inner_outer_brute(t0, t1, y1):
    """O(n*m) per-bin loop reference for inner/outer measures."""
    inner = np.zeros(t0.shape[0] - 1)
    outer = np.zeros(t0.shape[0] - 1)
    for i in range(t0.shape[0] - 1):
        lo, hi = t0[i], t0[i + 1]
        for j in range(t1.shape[0] - 1):
            jlo, jhi = t1[j], t1[j + 1]
            if jlo >= lo and jhi <= hi:
                inner[i] += y1[j]
            if jhi > lo and jlo < hi:
                outer[i] += y1[j]
    return inner, outer


class TestInnerOuter:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            t1 = np.sort(rng.uniform(0, 1, 9))
            y1 = rng.uniform(0, 1, 8)
            t0 = np.sort(rng.uniform(0, 1, 6))
            inner, outer = stepfuns.inner_outer(
                jnp.asarray(t0)[None], jnp.asarray(t1)[None], jnp.asarray(y1)[None]
            )
            binner, bouter = _inner_outer_brute(t0, t1, y1)
            np.testing.assert_allclose(inner[0], binner, atol=1e-5)
            np.testing.assert_allclose(outer[0], bouter, atol=1e-5)

    def test_inner_below_outer(self):
        rng = np.random.default_rng(1)
        t1, y1 = _rand_stepfun(rng, 8, 16)
        t0, _ = _rand_stepfun(rng, 8, 7)
        inner, outer = stepfuns.inner_outer(t0, t1, y1)
        assert np.all(np.asarray(inner) <= np.asarray(outer) + 1e-6)


class TestOuterEnvelopeLoss:
    def test_zero_when_proposal_is_envelope(self):
        # A proposal identical to the NeRF histogram upper-bounds it, so the
        # envelope loss must vanish.
        rng = np.random.default_rng(2)
        t, w = _rand_stepfun(rng, 4, 16)
        loss = stepfuns.outer_envelope_loss(t, w, t, w)
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)

    def test_positive_when_proposal_misses_mass(self):
        # NeRF mass in bin 0, proposal mass two bins away (adjacent bins
        # share an endpoint and legitimately count toward the outer measure).
        t = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
        w = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        w_prop = jnp.array([[0.0, 0.0, 0.0, 1.0]])
        loss = stepfuns.outer_envelope_loss(t, w, t, w_prop)
        assert float(jnp.sum(loss)) > 0.1


class TestIntegrateInvert:
    def test_cdf_endpoints(self):
        rng = np.random.default_rng(3)
        _, w = _rand_stepfun(rng, 8, 32)
        cdf = stepfuns.integrate_weights(w)
        np.testing.assert_allclose(cdf[..., 0], 0.0)
        np.testing.assert_allclose(cdf[..., -1], 1.0)
        assert np.all(np.diff(np.asarray(cdf), axis=-1) >= -1e-6)

    def test_invert_uniform_weights_is_linear(self):
        t = jnp.linspace(0.0, 1.0, 9)[None]
        logits = jnp.zeros((1, 8))
        u = jnp.linspace(0.0, 1.0 - 1e-6, 17)[None]
        got = stepfuns.invert_cdf(u, t, logits)
        np.testing.assert_allclose(np.asarray(got)[0], np.asarray(u)[0], atol=1e-4)

    def test_gather_and_sorted_paths_agree(self):
        rng = np.random.default_rng(4)
        t, w = _rand_stepfun(rng, 8, 16)
        logits = jnp.log(w + 1e-8)
        u = jnp.asarray(
            np.sort(np.random.default_rng(5).uniform(0, 1 - 1e-6, (8, 33)), -1)
        )
        a = stepfuns.invert_cdf(u, t, logits, use_gather_interp=False)
        b = stepfuns.invert_cdf(u, t, logits, use_gather_interp=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestSample:
    def test_samples_in_domain_and_sorted(self):
        rng = np.random.default_rng(6)
        t, w = _rand_stepfun(rng, 16, 32)
        logits = jnp.log(w + 1e-8)
        s = stepfuns.sample(jax.random.PRNGKey(0), t, logits, 64)
        s = np.asarray(s)
        assert np.all(s >= np.asarray(t)[..., :1] - 1e-5)
        assert np.all(s <= np.asarray(t)[..., -1:] + 1e-5)
        assert np.all(np.diff(s, axis=-1) >= -1e-5)

    def test_sampling_distribution_matches_weights(self):
        # Sampling density per bin should approach the bin weights: the
        # unbiasedness property the reference checks by histogramming.
        t = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
        w = jnp.array([[0.1, 0.4, 0.2, 0.3]])
        s = stepfuns.sample(
            jax.random.PRNGKey(1), jnp.tile(t, (512, 1)),
            jnp.tile(jnp.log(w), (512, 1)), 128,
        )
        hist, _ = np.histogram(np.asarray(s).ravel(), bins=np.asarray(t)[0])
        frac = hist / hist.sum()
        np.testing.assert_allclose(frac, np.asarray(w)[0], atol=0.01)

    def test_deterministic_sampling_spans_cdf(self):
        t = jnp.linspace(0, 1, 9)[None]
        logits = jnp.zeros((1, 8))
        s = np.asarray(stepfuns.sample(None, t, logits, 16))[0]
        np.testing.assert_allclose(s[0], 0.0, atol=1e-5)
        np.testing.assert_allclose(s[-1], 1.0, atol=1e-4)


class TestSampleIntervals:
    def test_edges_sorted_in_domain(self):
        rng = np.random.default_rng(7)
        t, w = _rand_stepfun(rng, 16, 32)
        edges = stepfuns.sample_intervals(
            jax.random.PRNGKey(2), t, jnp.log(w + 1e-8), 32, domain=(0.0, 1.0)
        )
        edges = np.asarray(edges)
        assert edges.shape[-1] == 33
        assert np.all(np.diff(edges, axis=-1) >= -1e-6)
        assert edges.min() >= -1e-6 and edges.max() <= 1.0 + 1e-6

    def test_single_jitter_shifts_whole_ray(self):
        t = jnp.linspace(0, 1, 17)[None]
        logits = jnp.zeros((1, 16))
        a = stepfuns.sample_intervals(
            jax.random.PRNGKey(3), t, logits, 8, single_jitter=True, domain=(0, 1)
        )
        # All interior gaps equal under a single shared jitter + uniform CDF.
        gaps = np.diff(np.asarray(a)[0][1:-1])
        np.testing.assert_allclose(gaps, gaps[0], atol=1e-5)


class TestDistortion:
    def test_matches_monte_carlo(self):
        # E_{x,y~p}[|x-y|] by sampling, vs the closed form — the reference's
        # own validation strategy (stepfun_test.py:201-274).
        rng = np.random.default_rng(8)
        t = np.sort(rng.uniform(0, 1, 9))
        w = rng.uniform(0, 1, 8)
        w = w / w.sum()
        loss = float(stepfuns.distortion_loss(jnp.asarray(t)[None], jnp.asarray(w)[None])[0])

        n = 200_000
        bin_idx = rng.choice(8, size=n, p=w)
        x = rng.uniform(t[bin_idx], t[bin_idx + 1])
        bin_idx2 = rng.choice(8, size=n, p=w)
        y = rng.uniform(t[bin_idx2], t[bin_idx2 + 1])
        mc = np.abs(x - y).mean()
        np.testing.assert_allclose(loss, mc, rtol=0.05)

    def test_concentrated_mass_has_low_distortion(self):
        t = jnp.linspace(0, 1, 65)[None]
        w_spread = jnp.ones((1, 64)) / 64
        w_peak = jnp.zeros((1, 64)).at[0, 32].set(1.0)
        assert float(stepfuns.distortion_loss(t, w_peak)[0]) < float(
            stepfuns.distortion_loss(t, w_spread)[0]
        )

    def test_interval_distortion_consistency(self):
        # Disjoint intervals: distance of midpoints.
        d = stepfuns.interval_distortion(0.0, 1.0, 3.0, 5.0)
        np.testing.assert_allclose(float(d), 3.5, atol=1e-6)
        # Identical unit intervals: E|x-y| = 1/3.
        d = stepfuns.interval_distortion(0.0, 1.0, 0.0, 1.0)
        np.testing.assert_allclose(float(d), 1.0 / 3.0, atol=1e-6)


class TestDilate:
    def test_dilation_preserves_max_density(self):
        rng = np.random.default_rng(9)
        t, w = _rand_stepfun(rng, 4, 8)
        t_d, w_d = stepfuns.max_dilate(t, w, 0.05)
        assert np.asarray(w_d).max() <= np.asarray(w).max() + 1e-6
        # Dilated edges: original n+1 edges plus 2n shifted copies.
        assert t_d.shape[-1] == 3 * t.shape[-1] - 2

    def test_renormalized_weights_sum_to_one(self):
        rng = np.random.default_rng(10)
        t, w = _rand_stepfun(rng, 4, 8)
        _, w_d = stepfuns.max_dilate_weights(t, w, 0.02, domain=(0, 1), renormalize=True)
        np.testing.assert_allclose(np.asarray(w_d).sum(-1), 1.0, atol=1e-5)


class TestPercentileResampleQuery:
    def test_percentiles_match_numpy(self):
        rng = np.random.default_rng(11)
        t, w = _rand_stepfun(rng, 6, 32)
        got = np.asarray(stepfuns.weighted_percentile(t, w, [5, 50, 95]))
        cdf = np.asarray(stepfuns.integrate_weights(w))
        for b in range(6):
            want = np.interp([0.05, 0.5, 0.95], cdf[b], np.asarray(t)[b])
            np.testing.assert_allclose(got[b], want, atol=1e-5)

    def test_percentiles_ordered(self):
        rng = np.random.default_rng(12)
        t, w = _rand_stepfun(rng, 16, 16)
        p = np.asarray(stepfuns.weighted_percentile(t, w, [5, 50, 95]))
        assert np.all(np.diff(p, axis=-1) >= -1e-6)

    def test_resample_conserves_total_mass(self):
        rng = np.random.default_rng(13)
        tp, vp = _rand_stepfun(rng, 4, 16)
        # Resample onto a coarser grid covering the same span.
        t = jnp.concatenate([tp[..., :1], tp[..., 8:9], tp[..., -1:]], axis=-1)
        v = stepfuns.resample(t, tp, vp)
        np.testing.assert_allclose(
            np.asarray(v).sum(-1), np.asarray(vp).sum(-1), atol=1e-5
        )

    def test_query_inside_and_outside(self):
        t = jnp.array([[0.0, 1.0, 2.0]])
        y = jnp.array([[5.0, 7.0]])
        tq = jnp.array([[-0.5, 0.5, 1.5, 2.5]])
        got = stepfuns.query(tq, t, y, fill=-1.0)
        np.testing.assert_allclose(np.asarray(got)[0], [-1.0, 5.0, 7.0, -1.0])


class TestStratifiedEdges:
    def test_deterministic_edges_are_linspace(self):
        near = jnp.array([1.0, 2.0])
        far = jnp.array([5.0, 10.0])
        e = np.asarray(stepfuns.stratified_edges(None, near, far, 8))
        np.testing.assert_allclose(e[0], np.linspace(1, 5, 9), atol=1e-6)
        np.testing.assert_allclose(e[1], np.linspace(2, 10, 9), atol=1e-6)

    def test_jittered_edges_stay_sorted_in_range(self):
        near = jnp.zeros((32,))
        far = jnp.ones((32,))
        e = np.asarray(stepfuns.stratified_edges(jax.random.PRNGKey(0), near, far, 16))
        assert np.all(np.diff(e, axis=-1) > 0)
        np.testing.assert_allclose(e[:, 0], 0.0)
        np.testing.assert_allclose(e[:, -1], 1.0)
