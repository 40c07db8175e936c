"""Step-function (piecewise-constant 1D density) toolkit.

The whole sampling side of a NeRF — stratified sampling, hierarchical
resampling, proposal supervision, distortion regularization — reduces to
operations on step functions: `t` holds sorted bin *edges* ([..., n+1]) and
`w` holds per-bin weights ([..., n]).

Capability parity with the reference toolkit
(`/root/reference/nerf-methods/mipnerf360/internal/stepfun.py:30-342`) and the
NeRF++ hierarchical sampler (`nerfplusplus/ddp_train_nerf.py:81-130`), built
TPU-first: every resampling path routes through `mathx.sorted_interp`
(comparison+reduction, no gathers); percentiles reuse the same kernel instead
of a vmapped `jnp.interp`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from outdoor_nerf_depth_tpu.ops import mathx

_EPS = jnp.finfo(jnp.float32).eps


def query(tq: jax.Array, t: jax.Array, y: jax.Array, fill=0):
    """Evaluate the step function (t, y) at points tq (`fill` outside [t0, tn])."""
    idx_lo, idx_hi = mathx.searchsorted_pair(t, tq)
    inside = idx_lo != idx_hi
    return jnp.where(inside, jnp.take_along_axis(y, idx_lo, axis=-1), fill)


def inner_outer(t_query: jax.Array, t: jax.Array, w: jax.Array):
    """Inner/outer measures of (t, w) accumulated onto the bins of t_query.

    For each query bin, `outer` is the total weight of every source bin that
    *touches* it (an upper bound on the true overlap) and `inner` is the
    weight of source bins *strictly contained* in it (a lower bound).
    """
    cum = jnp.concatenate(
        [jnp.zeros_like(w[..., :1]), jnp.cumsum(w, axis=-1)], axis=-1
    )
    idx_lo, idx_hi = mathx.searchsorted_pair(t, t_query)
    cum_lo = jnp.take_along_axis(cum, idx_lo, axis=-1)
    cum_hi = jnp.take_along_axis(cum, idx_hi, axis=-1)

    outer = cum_hi[..., 1:] - cum_lo[..., :-1]
    inner = jnp.where(
        idx_hi[..., :-1] <= idx_lo[..., 1:], cum_lo[..., 1:] - cum_hi[..., :-1], 0.0
    )
    return inner, outer


def outer_envelope_loss(t, w, t_prop, w_prop, eps=_EPS):
    """Proposal-supervision loss: penalize proposal mass below the NeRF mass.

    Half-quadratic `max(0, w - w_outer)^2 / (w + eps)` per bin, where
    `w_outer` is the proposal histogram's outer measure on the NeRF bins, so
    the proposal is pushed to form an upper envelope (mip-NeRF 360 Eq. 13).
    """
    _, w_outer = inner_outer(t, t_prop, w_prop)
    return jnp.maximum(0.0, w - w_outer) ** 2 / (w + eps)


def weights_to_density(t: jax.Array, w: jax.Array, eps=_EPS**2) -> jax.Array:
    """Per-bin weight -> average density over the bin (integrates to sum(w))."""
    return w / jnp.maximum(eps, jnp.diff(t, axis=-1))


def density_to_weights(t: jax.Array, p: jax.Array) -> jax.Array:
    """Inverse of `weights_to_density`."""
    return p * jnp.diff(t, axis=-1)


def max_dilate(t, w, dilation, domain=(-jnp.inf, jnp.inf)):
    """Morphological max-dilation of a non-negative step function by `dilation`."""
    lo = t[..., :-1] - dilation
    hi = t[..., 1:] + dilation
    t_d = jnp.clip(jnp.sort(jnp.concatenate([t, lo, hi], axis=-1), axis=-1), *domain)
    # New bin b gets the max over source bins whose dilated support covers it.
    covered = (lo[..., None, :] <= t_d[..., None]) & (hi[..., None, :] > t_d[..., None])
    w_d = jnp.max(jnp.where(covered, w[..., None, :], 0.0), axis=-1)[..., :-1]
    return t_d, w_d


def max_dilate_weights(
    t, w, dilation, domain=(-jnp.inf, jnp.inf), renormalize=False, eps=_EPS**2
):
    """Dilate a *weight* histogram in density space, then convert back."""
    p = weights_to_density(t, w)
    t_d, p_d = max_dilate(t, p, dilation, domain=domain)
    w_d = density_to_weights(t_d, p_d)
    if renormalize:
        w_d /= jnp.maximum(eps, jnp.sum(w_d, axis=-1, keepdims=True))
    return t_d, w_d


def integrate_weights(w: jax.Array) -> jax.Array:
    """CDF at the bin edges of a weight vector assumed to sum to 1.

    Output is [..., n+1] with exact 0 / 1 endpoints (interior clipped to <=1
    so downstream inversion never sees a decreasing CDF from roundoff).
    """
    interior = jnp.minimum(1.0, jnp.cumsum(w[..., :-1], axis=-1))
    pad = jnp.zeros_like(w[..., :1])
    return jnp.concatenate([pad, interior, jnp.ones_like(pad)], axis=-1)


def invert_cdf(u, t, w_logits, use_gather_interp=False):
    """Map uniform variates u in [0,1) through the inverse CDF of (t, softmax(w))."""
    w = jax.nn.softmax(w_logits, axis=-1)
    cdf = integrate_weights(w)
    interp = mathx.gather_interp if use_gather_interp else mathx.sorted_interp
    return interp(u, cdf, t)


def sample(
    rng,
    t,
    w_logits,
    num_samples: int,
    single_jitter: bool = False,
    deterministic_center: bool = False,
    use_gather_interp: bool = False,
):
    """Draw point samples from the step-function PDF (t, softmax(w_logits)).

    With `rng=None` the samples linspace the CDF (centered in each of
    `num_samples` equal CDF slabs when `deterministic_center`); otherwise
    each sample is jittered inside its slab (one shared jitter per ray when
    `single_jitter`). Matches `jax.random.uniform`'s [0, 1) support.
    """
    if rng is None:
        if deterministic_center:
            pad = 1.0 / (2 * num_samples)
            u = jnp.linspace(pad, 1.0 - pad - _EPS, num_samples)
        else:
            u = jnp.linspace(0.0, 1.0 - _EPS, num_samples)
        u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
    else:
        u_ceil = _EPS + (1.0 - _EPS) / num_samples
        jitter_span = (1.0 - u_ceil) / (num_samples - 1) - _EPS
        n_jitters = 1 if single_jitter else num_samples
        base = jnp.linspace(0.0, 1.0 - u_ceil, num_samples)
        jitter = jax.random.uniform(
            rng, t.shape[:-1] + (n_jitters,), maxval=jitter_span
        )
        u = base + jitter
    return invert_cdf(u, t, w_logits, use_gather_interp=use_gather_interp)


def sample_intervals(
    rng,
    t,
    w_logits,
    num_samples: int,
    single_jitter: bool = False,
    domain=(-jnp.inf, jnp.inf),
    use_gather_interp: bool = False,
):
    """Sample `num_samples` *intervals* (n+1 edges) from a step-function PDF.

    Centers are drawn with `sample(..., deterministic_center=True)`; edges are
    the midpoints between adjacent centers with the two end edges mirrored
    around the first/last center and clamped to `domain`.
    """
    if num_samples <= 1:
        raise ValueError(f"need num_samples > 1, got {num_samples}")
    centers = sample(
        rng,
        t,
        w_logits,
        num_samples,
        single_jitter=single_jitter,
        deterministic_center=True,
        use_gather_interp=use_gather_interp,
    )
    mid = 0.5 * (centers[..., 1:] + centers[..., :-1])
    first = jnp.maximum(domain[0], 2 * centers[..., :1] - mid[..., :1])
    last = jnp.minimum(domain[1], 2 * centers[..., -1:] - mid[..., -1:])
    return jnp.concatenate([first, mid, last], axis=-1)


def distortion_loss(t: jax.Array, w: jax.Array) -> jax.Array:
    """mip-NeRF 360 distortion: E_{i,j}[w_i w_j |mid_i - mid_j|] + intra term.

    O(n^2) in samples-per-ray, which is tiny (<=2^7) and maps to one
    VPU-friendly batched outer product per ray.
    """
    mid = 0.5 * (t[..., 1:] + t[..., :-1])
    pair = jnp.abs(mid[..., :, None] - mid[..., None, :])
    inter = jnp.sum(w * jnp.sum(w[..., None, :] * pair, axis=-1), axis=-1)
    intra = jnp.sum(w**2 * jnp.diff(t, axis=-1), axis=-1) / 3.0
    return inter + intra


def interval_distortion(t0_lo, t0_hi, t1_lo, t1_hi):
    """Closed-form E|x - y| for x~U[t0_lo,t0_hi], y~U[t1_lo,t1_hi]."""
    disjoint_d = jnp.abs(0.5 * (t1_lo + t1_hi) - 0.5 * (t0_lo + t0_hi))
    numer = 2.0 * (
        jnp.minimum(t0_hi, t1_hi) ** 3 - jnp.maximum(t0_lo, t1_lo) ** 3
    ) + 3.0 * (
        t1_hi * t0_hi * jnp.abs(t1_hi - t0_hi)
        + t1_lo * t0_lo * jnp.abs(t1_lo - t0_lo)
        + t1_hi * t0_lo * (t0_lo - t1_hi)
        + t1_lo * t0_hi * (t1_lo - t0_hi)
    )
    overlap_d = numer / (6.0 * (t0_hi - t0_lo) * (t1_hi - t1_lo))
    disjoint = (t0_lo > t1_hi) | (t1_lo > t0_hi)
    return jnp.where(disjoint, disjoint_d, overlap_d)


def weighted_percentile(t: jax.Array, w: jax.Array, ps) -> jax.Array:
    """Percentiles of a step function whose weights sum to 1.

    TPU-native: both the CDF (ascending) and `t` (ascending) are sorted, so
    this is a single `sorted_interp` over the percentile queries — no vmapped
    gathers (contrast reference `stepfun.py:298-308`).
    """
    cdf = integrate_weights(w)
    q = jnp.broadcast_to(jnp.asarray(ps, cdf.dtype) / 100.0, t.shape[:-1] + (len(ps),))
    return mathx.sorted_interp(q, cdf, t)


def resample(t, tp, vp, use_avg=False, eps=_EPS):
    """Rebin the step function (tp, vp) onto the edges `t` (sum per new bin).

    With `use_avg`, returns the width-weighted average instead of the sum.
    Uses the antiderivative trick: interpolate cumsum(vp) at `t` and diff.
    """
    if use_avg:
        widths = jnp.diff(tp, axis=-1)
        return resample(t, tp, vp * widths) / jnp.maximum(eps, resample(t, tp, widths))
    acc = jnp.concatenate(
        [jnp.zeros_like(vp[..., :1]), jnp.cumsum(vp, axis=-1)], axis=-1
    )
    # t and tp are both sorted edge vectors -> the TPU interp kernel applies.
    return jnp.diff(mathx.sorted_interp(t, tp, acc), axis=-1)


def stratified_edges(rng, near, far, num_bins: int):
    """Uniform stratified bin edges in [near, far]: [..., num_bins+1].

    The classic NeRF "coarse" sampler (reference
    `nerfplusplus/ddp_train_nerf.py:438-449` draws jittered points; here we
    draw *edges* so downstream compositing gets exact interval widths).
    """
    frac = jnp.linspace(0.0, 1.0, num_bins + 1)
    edges = near[..., None] * (1.0 - frac) + far[..., None] * frac
    if rng is not None:
        # Jitter interior edges within their neighboring half-bins.
        width = (far - near)[..., None] / num_bins
        jitter = (jax.random.uniform(rng, edges[..., 1:-1].shape) - 0.5) * width
        edges = jnp.concatenate(
            [edges[..., :1], edges[..., 1:-1] + jitter, edges[..., -1:]], axis=-1
        )
    return edges
