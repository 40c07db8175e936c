"""Image and depth quality metrics.

Capability parity with the metric surface the reference computes in four
places (`/root/reference/nerf-methods/nerfplusplus/ddp_test_nerf.py:87-116`,
`mipnerf360/train.py:328-355`, `mipnerf360/eval.py:120-140`,
`ngp-depth/losses.py:68-85`, `utils/eval.py:24-64`), implemented once:

* PSNR/MSE conversions,
* SSIM via dm_pix (jittable),
* the full KITTI depth-metric battery — AbsRel, SqRel, RMSE, RMSElog,
  delta<1.25^k — under the shared convention: predictions divided by the
  scene's `depth_scale` back to metres, clamped to [1e-3, 80 m], evaluated
  only where ground truth is valid.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

DEPTH_CAP_M = 80.0
DEPTH_FLOOR_M = 1e-3


def mse_to_psnr(mse):
    return -10.0 / jnp.log(10.0) * jnp.log(mse)


def psnr_to_mse(psnr):
    return jnp.exp(-0.1 * jnp.log(10.0) * psnr)


def psnr(pred, target):
    return mse_to_psnr(jnp.mean((pred - target) ** 2))


def ssim(
    pred,
    target,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Structural similarity on [H, W, C] images in [0, 1].

    Native jnp implementation (dm_pix is not in the image) of the standard
    Wang et al. SSIM: 11-tap Gaussian window, applied separably per channel,
    means over the valid (un-padded) region. Matches skimage's
    `structural_similarity(..., gaussian_weights=True, use_sample_covariance
    =False)` convention, which is what the reference's evaluators compute.
    """
    pred = jnp.clip(pred, 0.0, max_val)
    target = jnp.clip(target, 0.0, max_val)

    # Shrink the window for tiny images so VALID conv output is non-empty.
    filter_size = min(filter_size, pred.shape[0], pred.shape[1])
    hw = filter_size // 2
    offsets = jnp.arange(filter_size) - hw
    kernel = jnp.exp(-0.5 * (offsets / filter_sigma) ** 2)
    kernel = (kernel / kernel.sum()).astype(pred.dtype)

    def blur(img):
        # Separable Gaussian via depthwise 1D convolutions over H then W.
        def conv1d(x, axis):
            x = jnp.moveaxis(x, axis, -1)  # [..., L]
            shape = x.shape
            x = x.reshape(-1, 1, shape[-1])
            # HIGHEST precision: the TPU's default bf16-grade conv makes
            # var = E[x^2] - E[x]^2 cancel catastrophically on
            # near-constant windows (black sky), flipping denominator
            # signs — the r4 full-budget NGP eval measured ssim = -3.08
            # on TPU vs 0.974 for the same checkpoint on CPU.
            out = jax.lax.conv_general_dilated(
                x, kernel.reshape(1, 1, filter_size), (1,), "VALID",
                precision=jax.lax.Precision.HIGHEST,
            )
            out = out.reshape(shape[:-1] + (out.shape[-1],))
            return jnp.moveaxis(out, -1, axis)

        return conv1d(conv1d(img, 0), 1)

    mu_p, mu_t = blur(pred), blur(target)
    mu_pp, mu_tt, mu_pt = blur(pred**2), blur(target**2), blur(pred * target)
    # True variances are >= 0; the subtraction can go (slightly) negative
    # from roundoff on near-constant windows — clamp so the denominator
    # can never change sign.
    var_p = jnp.maximum(0.0, mu_pp - mu_p**2)
    var_t = jnp.maximum(0.0, mu_tt - mu_t**2)
    cov = mu_pt - mu_p * mu_t

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    )
    return jnp.mean(ssim_map)


def depth_metrics(
    pred,
    gt,
    depth_scale: float = 1.0,
    cap: float = DEPTH_CAP_M,
    valid_mask: Optional[jax.Array] = None,
):
    """KITTI depth-metric battery in metres.

    Args:
      pred: predicted termination depth in *scene* units.
      gt: ground-truth depth in scene units; <= 0 is invalid.
      depth_scale: scene-units-per-metre factor that was folded into both at
        load time; divided back out before capping.
      cap: eval ceiling in metres (80 m, the KITTI convention).
      valid_mask: optional extra mask (e.g. sky segmentation).

    Returns dict(abs_rel, sq_rel, rmse, rmse_log, delta_1..3, n_valid).
    """
    pred_m = jnp.clip(pred / depth_scale, DEPTH_FLOOR_M, cap)
    gt_m = gt / depth_scale
    mask = gt_m > 0
    if valid_mask is not None:
        mask &= valid_mask
    mask &= gt_m <= cap
    m = mask.astype(jnp.float32)
    n = jnp.maximum(1.0, m.sum())
    gt_safe = jnp.where(mask, gt_m, 1.0)
    pred_safe = jnp.where(mask, pred_m, 1.0)

    err = pred_safe - gt_safe
    ratio = jnp.maximum(pred_safe / gt_safe, gt_safe / pred_safe)
    mean = lambda x: (m * x).sum() / n
    return {
        "abs_rel": mean(jnp.abs(err) / gt_safe),
        "sq_rel": mean(err**2 / gt_safe),
        "rmse": jnp.sqrt(mean(err**2)),
        "rmse_log": jnp.sqrt(mean((jnp.log(pred_safe) - jnp.log(gt_safe)) ** 2)),
        "delta_1": mean((ratio < 1.25).astype(jnp.float32)),
        "delta_2": mean((ratio < 1.25**2).astype(jnp.float32)),
        "delta_3": mean((ratio < 1.25**3).astype(jnp.float32)),
        "n_valid": m.sum(),
    }


class MetricSuite:
    """Jitted PSNR/SSIM + depth metrics over full rendered images.

    `compute_lpips=True` builds the native-JAX LPIPS (train/lpips.py) and
    raises a loud ValueError at construction when the weights file is
    missing — a silent no-lpips fallback can't masquerade as a computed
    metric (the reference always reports LPIPS: `utils/eval.py:24-64`).
    """

    def __init__(
        self,
        compute_ssim: bool = True,
        compute_lpips: bool = False,
        lpips_weights: Optional[str] = None,
    ):
        self._psnr = jax.jit(psnr)
        self._ssim = jax.jit(ssim) if compute_ssim else None
        self._lpips = None
        if compute_lpips:
            from outdoor_nerf_depth_tpu.train import lpips as lpips_lib

            self._lpips = lpips_lib.make_lpips_fn(lpips_weights)

    def __call__(self, pred_rgb, gt_rgb, pred_depth=None, gt_depth=None, depth_scale=1.0):
        out = {"psnr": float(self._psnr(pred_rgb, gt_rgb))}
        if self._ssim is not None:
            out["ssim"] = float(self._ssim(pred_rgb, gt_rgb))
        if self._lpips is not None:
            out["lpips"] = float(self._lpips(pred_rgb, gt_rgb))
        if pred_depth is not None and gt_depth is not None:
            out.update(
                {
                    k: float(v)
                    for k, v in depth_metrics(
                        pred_depth, gt_depth, depth_scale
                    ).items()
                }
            )
        return out


