"""Table-6-style ablation ON THE KITTI FIXTURE (VERDICT r4 #9).

The r4 ablation ran on the analytic sphere scene only; this driver sweeps
loss {mse,l1,kl} x prior {gt,stereo_crop,mono_crop} + an rgbonly baseline
on the KITTI-layout fixture (the same scene/layout the full-budget runs
use), at sparse views, and writes SWEEP_ABLATION_r05.json with the same
structure as r04 — points + programmatic qualitative_checks against
BASELINE.md Table 6's orderings.

The rgbonly leg trains with lambda_depth=0 but depth_sup_type=gt so the
DrivingSceneDataset still loads gt depth for EVAL metrics (with
depth_sup_type=rgbonly the loader skips depth entirely and the depth-RMSE
column would vanish).

    timeout <long> python tools/fixture_ablation.py \
        [out=SWEEP_ABLATION_r05.json] [fixture=/tmp/kitti_fixture_full] \
        [exp_root=/tmp/fixture_ablation] [steps=2000] [sample_every=4] \
        [backend=mip]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = {
    "mip": os.path.join(REPO, "configs", "kitti_mipnerf360.json"),
    "ngp": os.path.join(REPO, "configs", "kitti_ngp.json"),
    "nerfpp": os.path.join(REPO, "configs", "kitti_nerfpp.json"),
}

LOSSES = ("mse", "l1", "kl")
PRIORS = ("gt", "stereo_crop", "mono_crop")
KEEP = ("psnr", "ssim", "rmse", "abs_rel", "delta_1")


def run_point(config_path, scene, exp_root, name, steps, sample_every,
              extra):
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import evaluate, train

    config = load_config(
        config_path,
        [
            f"scene_dir={scene}",
            f"exp_dir={os.path.join(exp_root, name)}",
            f"max_steps={steps}",
            f"sample_every={sample_every}",
            "print_every=500",
            "train_render_every=0",
            "checkpoint_every=1000000",
            "compute_ssim=true",
            *extra,
        ],
    )
    state, _, occupancy = train(config)
    mean, _ = evaluate(config, state, occupancy=occupancy,
                       save_renders=False)
    return {k: round(float(mean[k]), 4) for k in KEEP if k in mean}


def qualitative_checks(points):
    def rmse(loss, prior):
        return points[f"depth_loss_type_{loss}-depth_sup_type_{prior}"]["rmse"]

    rgb = points["rgbonly"]
    checks = {}
    for loss in ("mse", "l1"):
        checks[f"{loss}_rmse_orders_gt<stereo<mono<rgbonly"] = bool(
            rmse(loss, "gt") < rmse(loss, "stereo_crop")
            < rmse(loss, "mono_crop") < rgb["rmse"]
        )
    checks["depth_sup_beats_rgbonly_on_abs_rel(all losses, gt prior)"] = all(
        points[f"depth_loss_type_{l}-depth_sup_type_gt"]["abs_rel"]
        < rgb["abs_rel"]
        for l in LOSSES
    )
    psnrs = [p["psnr"] for p in points.values()]
    checks["psnr_spread_small(<1.5dB)"] = bool(max(psnrs) - min(psnrs) < 1.5)
    return checks


def main(argv):
    kv = dict(a.split("=", 1) for a in argv)
    out = kv.pop("out", "SWEEP_ABLATION_r05.json")
    fixture = kv.pop("fixture", "/tmp/kitti_fixture_full")
    exp_root = kv.pop("exp_root", "/tmp/fixture_ablation")
    steps = int(kv.pop("steps", 2000))
    sample_every = int(kv.pop("sample_every", 4))
    backend = kv.pop("backend", "mip")
    extra = tuple(f"{k}={v}" for k, v in kv.items())
    scene = os.path.join(
        fixture, "nerfpp" if backend == "nerfpp" else "dtu_format"
    )
    config_path = CONFIGS[backend]

    result = {
        "description": (
            f"Table-6-style ablation on the KITTI fixture ({backend}, "
            f"{steps} steps, sparse views sample_every={sample_every}): "
            "loss {mse,l1,kl} x prior {gt,stereo_crop,mono_crop} + rgbonly "
            "baseline (lambda_depth=0). Deliverable is the qualitative "
            "ORDERING (BASELINE.md Table 6), not absolute numbers."
        ),
        "config": config_path,
        "points": {},
    }
    if os.path.isfile(out):
        with open(out) as f:
            prior_art = json.load(f)
        result["points"] = prior_art.get("points", {})

    grid = [
        (f"depth_loss_type_{l}-depth_sup_type_{p}",
         (f"depth_loss_type={l}", f"depth_sup_type={p}"))
        for l in LOSSES for p in PRIORS
    ] + [("rgbonly", ("lambda_depth=0.0", "depth_sup_type=gt"))]

    for name, overrides in grid:
        if name in result["points"]:
            print(f"=== {name}: cached ===", flush=True)
            continue
        print(f"=== ablation point {name} ===", flush=True)
        t0 = time.perf_counter()
        result["points"][name] = run_point(
            config_path, scene, exp_root, name, steps, sample_every,
            extra + overrides,
        )
        result["points"][name]["train_eval_seconds"] = round(
            time.perf_counter() - t0, 1
        )
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps({name: result["points"][name]}), flush=True)

    result["qualitative_checks"] = qualitative_checks(result["points"])
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["qualitative_checks"], indent=1), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
