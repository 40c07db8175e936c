"""Cost-volume stereo matching (the CFNet / PCWNet prior generators).

Capability parity with the reference stereo stacks
(`/root/reference/depth-methods/stereo_matching/CFNet/models/cfnet.py:272-666`
and `PCWNet/models/pwcnet.py:310-515`): pyramid features, group-wise
correlation + concat cost volumes, 3D-hourglass aggregation, soft-argmin
disparity regression with multi-scale outputs, **uncertainty estimation**
(variance of the disparity distribution) driving both the confidence-filtered
`ste_conf` prior and a cascaded disparity-range refinement stage.

TPU shape discipline: cost volumes are dense [N, D, H, W, C] tensors built by
static shifts (no gathers); all convs NHWC/NDHWC. The two reference nets
differ mainly in how many pyramid volumes they fuse — `variant='cfnet'`
fuses two scales, `variant='pcwnet'` adds the 1/16 volume.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from outdoor_nerf_depth_tpu.depth_priors.blocks import (
    Conv3dBlock,
    ConvBlock,
    Hourglass3d,
    UNetFeatures,
    upsample2d,
)


def shift_right_features(right, disparity: int):
    """Shift the right image's features by `disparity` pixels (zero-fill)."""
    if disparity == 0:
        return right
    return jnp.pad(right, ((0, 0), (0, 0), (disparity, 0), (0, 0)))[
        :, :, : right.shape[2], :
    ]


def groupwise_correlation(left, right, num_groups: int):
    """Per-group mean dot product along channels: [N, H, W, G]."""
    n, h, w, c = left.shape
    lg = left.reshape(n, h, w, num_groups, c // num_groups)
    rg = right.reshape(n, h, w, num_groups, c // num_groups)
    return jnp.mean(lg * rg, axis=-1)


def build_cost_volume(
    left, right, max_disp: int, num_groups: int, concat_features: int
):
    """Dense [N, D, H, W, G + 2*Cc] gwc+concat cost volume by static shifts."""
    slices = []
    lc = left[..., :concat_features]
    for d in range(max_disp):
        rs = shift_right_features(right, d)
        gwc = groupwise_correlation(left, rs, num_groups)
        cat = jnp.concatenate([lc, rs[..., :concat_features]], axis=-1)
        vol = jnp.concatenate([gwc, cat], axis=-1)
        # Left-of-disparity columns see zero-filled right features; mask them
        # so the volume doesn't hallucinate matches off the image.
        if d > 0:
            mask = jnp.ones((left.shape[2],), vol.dtype).at[:d].set(0.0)
            vol = vol * mask[None, None, :, None]
        slices.append(vol)
    return jnp.stack(slices, axis=1)


def disparity_regression(logits, disp_values):
    """Soft-argmin: probability-weighted disparity + distribution variance.

    Returns (disparity [N, H, W], variance [N, H, W]) — the variance is
    CFNet's uncertainty, used for confidence filtering and range refinement.
    `disp_values` is either a global [D] vector or per-pixel hypotheses
    [N, D, H, W] (the uncertainty-driven variable-range stage, CFNet
    `models/submodule.py:121-350`).
    """
    prob = jax.nn.softmax(logits, axis=1)  # over D
    d = (
        disp_values
        if disp_values.ndim == 4
        else disp_values.reshape((1, -1, 1, 1))
    )
    mean = jnp.sum(prob * d, axis=1)
    var = jnp.sum(prob * (d - mean[:, None]) ** 2, axis=1)
    return mean, var


class CostVolumeStage(nn.Module):
    """One aggregation stage: 3D convs + hourglasses -> disparity logits."""

    features: int = 32
    num_hourglasses: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, volume):
        x = Conv3dBlock(self.features, dtype=self.dtype)(volume)
        x = Conv3dBlock(self.features, dtype=self.dtype)(x)
        for _ in range(self.num_hourglasses):
            x = Hourglass3d(self.features, dtype=self.dtype)(x)
        logits = nn.Conv(1, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)
        return logits[..., 0]  # [N, D, H, W]


class StereoNet(nn.Module):
    """Cascaded cost-volume stereo network.

    Stage 1 covers the full disparity range at 1/8 resolution; stage 2
    refines at 1/4 resolution with CFNet's uncertainty-driven *variable*
    disparity range (`CFNet/models/submodule.py:121-350`): per-pixel
    hypotheses sampled uniformly in mean +- gamma*std of the stage-1
    distribution (gamma learned). Shapes stay static — the hypothesis count
    is fixed, only the hypothesis *values* vary per pixel. The `pcwnet`
    variant additionally fuses a 1/16 pyramid volume and refines stage 1
    with a warping volume (`PCWNet/models/pwcnet.py:310-515`).
    """

    max_disparity: int = 192
    base_features: int = 32
    num_groups: int = 8
    concat_features: int = 12
    refine_offsets: int = 8  # stage 2 samples 2*k+1 per-pixel hypotheses
    variant: str = "cfnet"  # 'cfnet' | 'pcwnet'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left, right):
        """left/right: [N, H, W, 3] in [0, 1]. Returns dict of outputs.

        disparity: [N, H, W] full-res; confidence: [N, H, W] in [0, 1];
        aux multi-scale disparities for deep supervision.
        """
        feats = UNetFeatures(self.base_features, dtype=self.dtype)
        l4, l8, l16 = feats(left)
        r4, r8, r16 = feats(right)

        # ---- Stage 1: full range at 1/8.
        d8 = self.max_disparity // 8
        vol8 = build_cost_volume(l8, r8, d8, self.num_groups, self.concat_features)
        if self.variant == "pcwnet":
            # Fuse a 1/16-scale volume (PCWNet's pyramid combination).
            d16 = self.max_disparity // 16
            vol16 = build_cost_volume(
                l16, r16, d16, self.num_groups, self.concat_features
            )
            agg16 = Conv3dBlock(self.base_features, dtype=self.dtype)(vol16)
            n, dd, h, w, c = agg16.shape
            up = jax.image.resize(
                agg16, (n, d8, vol8.shape[2], vol8.shape[3], c), "trilinear"
            )
            vol8 = jnp.concatenate([vol8, up], axis=-1)

        logits8 = CostVolumeStage(self.base_features, dtype=self.dtype)(vol8)
        disp_values8 = jnp.arange(d8, dtype=jnp.float32)
        disp8, var8 = disparity_regression(logits8, disp_values8)

        if self.variant == "pcwnet":
            # PCWNet's warping volume (`pwcnet.py:310-515`): re-warp the
            # right features by the stage-1 disparity and aggregate a
            # residual volume at the same scale before cascading — the
            # "pyramid combination + warping" that distinguishes it from
            # CFNet's purely cascaded ranges.
            r8_warp = warp_by_disparity(r8, disp8)
            woff_list = list(range(-4, 5))
            woffs = jnp.asarray(woff_list, jnp.float32)
            wslices = [
                groupwise_correlation(
                    l8,
                    shift_right_features(r8_warp, o)
                    if o >= 0
                    else shift_left_features(r8_warp, -o),
                    self.num_groups,
                )
                for o in woff_list
            ]
            wvol = jnp.stack(wslices, axis=1)
            wlogits = CostVolumeStage(
                self.base_features // 2, num_hourglasses=1, dtype=self.dtype
            )(wvol)
            resid8, var8w = disparity_regression(wlogits, woffs)
            disp8 = nn.relu(disp8 + resid8)
            var8 = var8w

        # ---- Stage 2: uncertainty-driven variable disparity range at 1/4
        # (CFNet `models/submodule.py:121-350`): per-pixel hypotheses sampled
        # uniformly within mean +- gamma * std of the stage-1 distribution.
        # Static shapes: the hypothesis *count* is fixed; only their values
        # vary per pixel.
        std8 = jnp.sqrt(var8 + 1e-6)
        gamma = self.param(
            "range_gamma", nn.initializers.constant(1.5), (), jnp.float32
        )
        half8 = jnp.clip(jnp.abs(gamma) * std8, 1.0, float(d8))
        disp4_init = 2.0 * upsample2d(disp8[..., None])[..., 0]
        disp4_init = disp4_init[:, : l4.shape[1], : l4.shape[2]]
        half4 = 2.0 * upsample2d(half8[..., None])[..., 0]
        half4 = half4[:, : l4.shape[1], : l4.shape[2]]

        n_hyp = 2 * self.refine_offsets + 1
        fracs = jnp.linspace(-1.0, 1.0, n_hyp)
        hyps = (
            disp4_init[:, None] + fracs[None, :, None, None] * half4[:, None]
        )
        hyps = jnp.clip(hyps, 0.0, self.max_disparity / 4.0)
        slices = [
            groupwise_correlation(
                l4, warp_by_disparity(r4, hyps[:, i]), self.num_groups
            )
            for i in range(n_hyp)
        ]
        vol4 = jnp.stack(slices, axis=1)
        logits4 = CostVolumeStage(self.base_features // 2, num_hourglasses=1,
                                  dtype=self.dtype)(vol4)
        disp4, var4 = disparity_regression(logits4, hyps)

        # ---- Full-resolution output.
        disparity = 4.0 * upsample2d(disp4[..., None], 4)[..., 0]
        disparity = disparity[:, : left.shape[1], : left.shape[2]]
        # Confidence: low distribution variance -> high confidence (CFNet's
        # uncertainty-to-confidence mapping).
        conf4 = jnp.exp(-var4)
        confidence = upsample2d(conf4[..., None], 4)[..., 0]
        confidence = confidence[:, : left.shape[1], : left.shape[2]]

        return {
            "disparity": disparity,
            "confidence": confidence,
            "disparity_1_4": disp4,
            "disparity_1_8": disp8,
            "uncertainty_1_8": var8,
        }


def shift_left_features(right, disparity: int):
    """Shift features left by `disparity` pixels (zero-fill on the right)."""
    if disparity == 0:
        return right
    return jnp.pad(right, ((0, 0), (0, 0), (0, disparity), (0, 0)))[
        :, :, disparity:, :
    ]


def warp_by_disparity(feat, disp):
    """Sample features at x - disp (bilinear along width): [N,H,W,C]."""
    n, h, w, c = feat.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] - disp
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    t = jnp.clip(xs - x0, 0.0, 1.0)
    f0 = jnp.take_along_axis(feat, x0[..., None], axis=2)
    f1 = jnp.take_along_axis(feat, x1[..., None], axis=2)
    out = f0 * (1.0 - t[..., None]) + f1 * t[..., None]
    valid = (xs >= 0) & (xs <= w - 1)
    return out * valid[..., None]


def multi_scale_loss(outputs, disp_gt, max_disparity: float, weights=(0.5, 0.7, 1.0)):
    """Weighted smooth-L1 over the scale pyramid (reference
    `CFNet/models/loss.py:4-10`), masked to valid in-range ground truth."""
    mask = (disp_gt > 0) & (disp_gt < max_disparity)
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(1.0, m.sum())

    def masked_smooth_l1(pred):
        if pred.shape != disp_gt.shape:
            scale = disp_gt.shape[-1] // pred.shape[-1]
            pred = scale * upsample2d(pred[..., None], scale)[..., 0]
            pred = pred[:, : disp_gt.shape[1], : disp_gt.shape[2]]
        err = pred - disp_gt
        abs_err = jnp.abs(err)
        val = jnp.where(abs_err < 1.0, 0.5 * err**2, abs_err - 0.5)
        return (m * val).sum() / denom

    preds = [outputs["disparity_1_8"], outputs["disparity_1_4"], outputs["disparity"]]
    return sum(w * masked_smooth_l1(p) for w, p in zip(weights, preds))


def disparity_to_depth(disp, focal: float, baseline: float, min_disp: float = 0.1):
    """depth = f * B / disparity, invalid (tiny) disparities -> 0."""
    depth = focal * baseline / jnp.maximum(disp, min_disp)
    return jnp.where(disp > min_disp, depth, 0.0)
