"""Loss families: photometric, depth-supervision, and geometry regularizers.

Capability parity with the reference's loss layer across all three backends:
`/root/reference/nerf-methods/mipnerf360/internal/train_utils.py:72-181`,
`internal/depth_loss.py:5-103`, `nerfplusplus/depth_loss.py:4-75`, and
`ngp-depth/losses.py:40-65`. One implementation, parameterized where the
backends disagree:

* expected-depth mse/l1 support two reductions — `mean_all` (mip-style:
  masked residual averaged over every ray) and `mean_valid` (NeRF++/NGP:
  averaged over valid rays only);
* the DS-NeRF KL term takes an optional foreground-far mask (NeRF++ masks
  supervision beyond the unit-sphere exit, `depth_loss.py:38-40`).

Every function is pure jnp and differentiable end-to-end.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from outdoor_nerf_depth_tpu.ops import stepfuns

URF_SIGMA_SCALE = 3.0


# --------------------------------------------------------------------------
# Photometric.
# --------------------------------------------------------------------------


def rgb_loss(pred, target, lossmult=None, kind: str = "mse", charb_padding=0.001):
    """Per-level photometric loss, lossmult-weighted mean. Returns (loss, mse)."""
    resid_sq = (pred - target) ** 2
    if lossmult is None:
        lossmult = jnp.ones_like(resid_sq)
    else:
        lossmult = jnp.broadcast_to(lossmult, resid_sq.shape)
    denom = jnp.maximum(1e-8, lossmult.sum())
    mse = (lossmult * resid_sq).sum() / denom

    if kind == "mse":
        per_elem = resid_sq
    elif kind == "charb":
        per_elem = jnp.sqrt(resid_sq + charb_padding**2)
    elif kind == "rawnerf":
        clipped = jnp.minimum(1.0, pred)
        grad_scale = 1.0 / (1e-3 + jax.lax.stop_gradient(clipped))
        per_elem = (clipped - target) ** 2 * grad_scale**2
    else:
        raise ValueError(f"unknown rgb loss {kind!r}")
    return (lossmult * per_elem).sum() / denom, mse


# --------------------------------------------------------------------------
# Depth supervision. `depth_sup <= 0` marks invalid pixels everywhere.
# --------------------------------------------------------------------------


def expected_depth_loss(
    depth_pred, depth_sup, kind: str = "mse", reduce: str = "mean_all"
):
    """MSE/L1 between expected termination depth and the prior."""
    mask = (depth_sup > 0).astype(depth_pred.dtype)
    resid = mask * depth_pred - mask * depth_sup
    per_ray = resid**2 if kind == "mse" else jnp.abs(resid)
    if reduce == "mean_all":
        return per_ray.mean()
    if reduce == "mean_valid":
        return per_ray.sum() / jnp.maximum(1.0, mask.sum())
    raise ValueError(f"unknown reduce {reduce!r}")


def ds_nerf_kl_loss(
    weights,
    depth_sup,
    steps,
    lengths,
    sigma,
    fg_far: Optional[jax.Array] = None,
    eps: float = 1e-7,
):
    """DS-NeRF depth loss (Deng et al. 2022): push weight mass to the prior.

    -log(w) gaussian-windowed around the supervised depth, integrated over
    samples; rays with no (or out-of-range) supervision are masked out.

    Args:
      weights: [..., S] compositing weights.
      depth_sup: [...] supervised termination depth (<=0 invalid).
      steps: [..., S] sample positions (t-mid for interval models).
      lengths: [..., S] metric interval lengths.
      sigma: scalar variance parameter (already scene-scaled).
      fg_far: optional [...] mask bound — supervision beyond it is dropped
        (NeRF++ foreground-sphere rule).
    """
    mask = depth_sup > 0
    if fg_far is not None:
        mask &= depth_sup < fg_far
    window = jnp.exp(-((steps - depth_sup[..., None]) ** 2) / (2.0 * sigma))
    per_ray = jnp.sum(-jnp.log(weights + eps) * window * lengths, axis=-1)
    return jnp.mean(per_ray * mask)


def gaussian_nll_depth_loss(
    depth_pred,
    steps,
    weights,
    depth_sup,
    depth_sup_std,
    eps: float = 1e-3,
):
    """Gaussian NLL depth loss (reference `depth_loss.py:49-75`).

    The render's termination distribution is summarized as a Gaussian
    (mean = expected depth, var = weight-weighted second moment about it)
    and penalized by NLL against the measured (mean, std) — but only on
    rays where the prediction falls *outside* the measurement distribution
    (|Δmean| > std, or predicted variance exceeds measured variance).
    Masked-sum form (no boolean indexing) so it jits with static shapes;
    the reference's `n_applied/N · mean_over_applied` scaling is exactly
    `sum_over_applied / N`.

    Args:
      depth_pred: [...] expected termination depth.
      steps: [..., S] sample positions along the ray.
      weights: [..., S] compositing weights.
      depth_sup: [...] measured depth mean (<=0 invalid).
      depth_sup_std: [...] or scalar measured depth std.
    """
    valid = depth_sup > 0
    pred_var = (
        jnp.sum((steps - depth_pred[..., None]) ** 2 * weights, axis=-1) + 1e-5
    )
    std = jnp.broadcast_to(jnp.asarray(depth_sup_std), depth_sup.shape)
    outside = (jnp.abs(depth_pred - depth_sup) - std > 0.0) | (std**2 < pred_var)
    apply = valid & outside
    var = jnp.maximum(pred_var, eps)
    nll = 0.5 * (jnp.log(var) + (depth_pred - depth_sup) ** 2 / var)
    return jnp.sum(apply * nll) / depth_sup.size


def urban_rf_depth_loss(weights, depth_sup, depth_pred, steps, sigma):
    """Urban Radiance Fields LiDAR loss: L2 + near/empty line-of-sight terms."""
    mask = (depth_sup > 0).astype(weights.dtype)
    l2 = (depth_sup - depth_pred) ** 2

    scale = sigma / URF_SIGMA_SCALE
    d = depth_sup[..., None]
    log_prob = (
        -((steps - d) ** 2) / (2.0 * scale**2)
        - jnp.log(scale)
        - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    near_mask = (steps <= d + sigma) & (steps >= d - sigma)
    near = jnp.sum(near_mask * (weights - jnp.exp(log_prob)) ** 2, axis=-1)
    empty = jnp.sum((steps < d - sigma) * weights**2, axis=-1)
    return jnp.mean((l2 + near + empty) * mask)


def depth_loss_from_history(
    level_history: dict,
    depth_sup,
    depth_pred,
    dirs,
    sigma,
    kind: str,
    reduce: str = "mean_all",
    fg_far_mask: bool = False,
):
    """Dispatch a depth loss given one level's ray history.

    `level_history` provides either interval edges ('tdist') or point-sample
    form ('steps' + 'lengths'); sample-space losses (kl/urf) derive steps and
    metric lengths accordingly (the reference's dispatcher,
    `internal/depth_loss.py:66-103`).
    """
    if kind in ("mse", "l1"):
        return expected_depth_loss(depth_pred, depth_sup, kind=kind, reduce=reduce)

    weights = level_history["weights"]
    if "tdist" in level_history:
        tdist = level_history["tdist"]
        steps = 0.5 * (tdist[..., :-1] + tdist[..., 1:])
        lengths = jnp.diff(tdist, axis=-1) * jnp.linalg.norm(
            dirs[..., None, :], axis=-1
        )
    else:
        steps = level_history["steps"]
        lengths = level_history["lengths"]

    fg_far = level_history.get("fg_far") if fg_far_mask else None
    if kind == "kl":
        return ds_nerf_kl_loss(weights, depth_sup, steps, lengths, sigma, fg_far)
    if kind == "urf":
        return urban_rf_depth_loss(weights, depth_sup, depth_pred, steps, sigma)
    if kind == "nll":
        # Measurement std defaults to the scene-scaled sigma knob (the
        # reference reads a per-ray std channel; priors here ship mean only).
        return gaussian_nll_depth_loss(
            depth_pred, steps, weights, depth_sup, jnp.sqrt(sigma)
        )
    raise ValueError(f"unknown depth loss {kind!r}")


# --------------------------------------------------------------------------
# Geometry regularizers.
# --------------------------------------------------------------------------


def interlevel_loss(ray_history) -> jax.Array:
    """Proposal supervision: each prop histogram upper-bounds the nerf one.

    Gradients flow only into the proposal levels (nerf side stop-gradient).
    """
    t = jax.lax.stop_gradient(ray_history[-1]["sdist"])
    w = jax.lax.stop_gradient(ray_history[-1]["weights"])
    total = 0.0
    for level in ray_history[:-1]:
        total += jnp.mean(
            stepfuns.outer_envelope_loss(t, w, level["sdist"], level["weights"])
        )
    return total


def distortion_loss(ray_history) -> jax.Array:
    """Distortion regularizer on the final level.

    Interval models (with 'sdist' edges) use the mip-NeRF 360 form in
    normalized space; point-sampled models (steps/lengths) use the same
    functional in metric t (the DVGO-v2 form the NGP CUDA kernels compute,
    `csrc/losses.cu:112-150`).
    """
    last = ray_history[-1]
    if "sdist" in last:
        return jnp.mean(stepfuns.distortion_loss(last["sdist"], last["weights"]))
    w, t, dt = last["weights"], last["steps"], last["lengths"]
    inter = jnp.sum(
        w * jnp.sum(w[..., None, :] * jnp.abs(t[..., :, None] - t[..., None, :]), -1),
        axis=-1,
    )
    intra = jnp.sum(w**2 * dt, axis=-1) / 3.0
    return jnp.mean(inter + intra)


def orientation_loss(ray_history, viewdirs, coarse_mult, final_mult,
                     target="normals_pred") -> jax.Array:
    """Ref-NeRF orientation regularizer: penalize normals facing away from
    the camera, weighted by compositing weight (reference
    `train_utils.py:183-199`)."""
    total = 0.0
    v = -viewdirs
    for i, level in enumerate(ray_history):
        n = level.get(target)
        if n is None:
            raise ValueError(f"orientation loss needs {target!r} in history")
        n_dot_v = jnp.sum(n * v[..., None, :], axis=-1)
        per_ray = jnp.sum(
            level["weights"] * jnp.minimum(0.0, n_dot_v) ** 2, axis=-1
        )
        mult = final_mult if i == len(ray_history) - 1 else coarse_mult
        total += mult * jnp.mean(per_ray)
    return total


def predicted_normal_loss(ray_history, coarse_mult, final_mult) -> jax.Array:
    """Tie predicted normals to density-gradient normals (Ref-NeRF)."""
    total = 0.0
    for i, level in enumerate(ray_history):
        n, n_pred = level.get("normals"), level.get("normals_pred")
        if n is None or n_pred is None:
            raise ValueError("predicted-normal loss needs both normal fields")
        per_ray = jnp.sum(
            level["weights"] * (1.0 - jnp.sum(n * n_pred, axis=-1)), axis=-1
        )
        mult = final_mult if i == len(ray_history) - 1 else coarse_mult
        total += mult * jnp.mean(per_ray)
    return total


def opacity_entropy_loss(acc, eps: float = 1e-5) -> jax.Array:
    """NGP's opacity regularizer: -o log o pushes rays to commit (0 or 1)."""
    o = jnp.clip(acc, eps, 1.0 - eps)
    return jnp.mean(-o * jnp.log(o))


def autoexposure_reg(scale, shift) -> jax.Array:
    """Keep learned per-image exposure near identity (NeRF++
    `ddp_train_nerf.py` autoexpo regularizer: |scale-1| + |shift|)."""
    return jnp.mean(jnp.abs(scale - 1.0)) + jnp.mean(jnp.abs(shift))
