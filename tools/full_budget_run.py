"""Reference-budget training runs on the KITTI fixture (VERDICT r3 #4).

Trains mip-NeRF 360 (75k steps x 4096 rays — `mipnerf360/scripts/
train_kitti.sh:8`) and Instant-NGP (30k steps x 8192 —
`ngp-depth/auto_batch_run_kittiseq.sh:17-20`) to the REFERENCE budgets on
the analytic KITTI fixture, checkpoint-resumable, and writes incremental
results to QUALITY_full_r04.json after each backend so a partial run still
leaves an artifact. Short gates (quality_gate.py, 600-3000 steps) cannot
see late-training failure modes — occupancy EMA decay, LR-tail drift,
hash-collision saturation; this run can.

    timeout <long> python -u tools/full_budget_run.py \
        [backends=mip,ngp] [out=QUALITY_full_r04.json] \
        [fixture=/tmp/kitti_fixture_full] [exp_root=/tmp/full_budget] \
        [steps_scale=1.0]

Resumable: re-running picks up from the latest checkpoint (train()'s
resume path); the psnr curve is appended from each segment's history.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json
import subprocess
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNS = {
    "mip": dict(
        config=os.path.join(REPO, "configs", "kitti_mipnerf360.json"),
        scene_sub="dtu_format",
        steps=75000,
    ),
    "ngp": dict(
        config=os.path.join(REPO, "configs", "kitti_ngp.json"),
        scene_sub="dtu_format",
        steps=30000,
    ),
    # NeRF++ reference budget: 100k steps x 1024 rays
    # (`nerfplusplus/configs/kitti.txt` N_iters semantics).
    "nerfpp": dict(
        config=os.path.join(REPO, "configs", "kitti_nerfpp.json"),
        scene_sub="nerfpp",
        steps=100000,
    ),
}


def ensure_fixture(path: str, n_images: int = 30):
    if os.path.isdir(os.path.join(path, "dtu_format", "sparse")):
        return
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_kitti_fixture.py"),
         path, str(n_images)],
        capture_output=True, text=True, cwd=REPO,
    )
    if r.returncode != 0:
        raise RuntimeError(f"fixture generation failed: {r.stdout}{r.stderr}")


def run_backend(name: str, fixture: str, exp_root: str, steps_scale: float,
                extra_overrides=()):
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import evaluate, train

    from outdoor_nerf_depth_tpu.train import checkpoints as ckpt_lib

    spec = RUNS[name]
    steps = max(100, int(spec["steps"] * steps_scale))
    config = load_config(
        spec["config"],
        [
            f"scene_dir={os.path.join(fixture, spec['scene_sub'])}",
            f"exp_dir={os.path.join(exp_root, name)}",
            f"max_steps={steps}",
            "print_every=500",
            "train_render_every=0",
            "compute_ssim=true",
            *extra_overrides,
        ],
    )
    # Throughput must count only the steps THIS segment trained: on a
    # checkpoint-resumed run, dividing the full budget by the segment's
    # wall time would overstate rays/s (ADVICE r4 #4).
    resumed_from = ckpt_lib.latest_step(
        os.path.join(config.exp_dir, "checkpoints")) or 0
    t0 = time.perf_counter()
    state, history, occupancy = train(config)
    train_s = time.perf_counter() - t0
    steps_this_segment = max(0, steps - min(resumed_from, steps))

    t0 = time.perf_counter()
    mean, per_image = evaluate(config, state, occupancy=occupancy,
                               save_renders=True)
    eval_s = time.perf_counter() - t0

    curve = [
        {"step": h["step"], "psnr": round(float(h["psnr"]), 3),
         "loss": round(float(h["loss"]), 5)}
        for h in history
        if h.get("step", 0) % 2500 == 0 or h is history[-1]
    ]
    return {
        "backend": name,
        "steps": steps,
        "batch": config.batch_size,
        "metrics": {k: round(float(v), 4) for k, v in mean.items()},
        "train_psnr_curve": curve,
        "final_train_psnr": round(float(history[-1]["psnr"]), 3) if history else None,
        "train_seconds": round(train_s, 1),
        "eval_seconds": round(eval_s, 1),
        "resumed_from_step": resumed_from,
        "steps_this_segment": steps_this_segment,
        "rays_per_sec_train": round(
            config.batch_size * steps_this_segment / max(train_s, 1e-9), 1
        ) if history else None,
    }


def main(argv):
    kv = dict(a.split("=", 1) for a in argv)
    backends = kv.pop("backends", "mip,ngp").split(",")
    out = kv.pop("out", "QUALITY_full_r04.json")
    fixture = kv.pop("fixture", "/tmp/kitti_fixture_full")
    exp_root = kv.pop("exp_root", "/tmp/full_budget")
    steps_scale = float(kv.pop("steps_scale", 1.0))
    # Anything left is forwarded to every backend config verbatim
    # (e.g. checkpoint_every=2000 when the run must stay killable).
    extra = tuple(f"{k}={v}" for k, v in kv.items())

    ensure_fixture(fixture)

    import jax

    results = {"device": jax.devices()[0].platform,
               "steps_scale": steps_scale, "runs": []}
    if os.path.isfile(out):
        with open(out) as f:
            prior = json.load(f)
        # keep earlier backends when resuming a partial artifact
        results["runs"] = [r for r in prior.get("runs", [])
                           if r["backend"] not in backends]
    for name in backends:
        print(f"=== full-budget run: {name} ===", flush=True)
        r = run_backend(name, fixture, exp_root, steps_scale, extra)
        results["runs"].append(r)
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(r), flush=True)
    print(json.dumps({"out": out, "n_runs": len(results["runs"])}))


if __name__ == "__main__":
    main(sys.argv[1:])
