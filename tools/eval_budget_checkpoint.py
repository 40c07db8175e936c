"""Eval-only QUALITY entry from a full-budget run's latest checkpoint.

When a reference-budget run (tools/full_budget_run.py) cannot finish inside
a round's chip window, its checkpoints still hold real trained state. This
driver restores the latest checkpoint for one backend, runs the SAME
`evaluate()` the full-budget driver would have run at completion, and
writes an entry into the QUALITY artifact marked `"partial": true` with
the checkpoint step — honest eval metrics for a partial run instead of no
entry at all.

    timeout <long> python tools/eval_budget_checkpoint.py backend=ngp \
        [out=QUALITY_full_r05.json] [fixture=/tmp/kitti_fixture_full] \
        [exp_root=/tmp/full_budget] [note="..."] [model_params={...}]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json

from tools.full_budget_run import RUNS


def main(argv):
    kv = dict(a.split("=", 1) for a in argv)
    backend = kv.pop("backend")
    out = kv.pop("out", "QUALITY_full_r05.json")
    fixture = kv.pop("fixture", "/tmp/kitti_fixture_full")
    exp_root = kv.pop("exp_root", "/tmp/full_budget")
    note = kv.pop("note", "")
    extra = tuple(f"{k}={v}" for k, v in kv.items())

    from outdoor_nerf_depth_tpu.train import checkpoints as ckpt_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import evaluate

    spec = RUNS[backend]
    config = load_config(
        spec["config"],
        [
            f"scene_dir={os.path.join(fixture, spec['scene_sub'])}",
            f"exp_dir={os.path.join(exp_root, backend)}",
            "compute_ssim=true",
            *extra,
        ],
    )
    step = ckpt_lib.latest_step(os.path.join(config.exp_dir, "checkpoints"))
    if not step:
        raise SystemExit(f"no checkpoint under {config.exp_dir}")
    _, state, occupancy, step = step_lib.load_checkpoint(config)
    mean, _ = evaluate(config, state, occupancy=occupancy,
                       save_renders=False)
    entry = {
        "backend": backend,
        "steps": int(step),
        "batch": config.batch_size,
        "partial": True,
        "budget_steps": spec["steps"],
        "note": note,
        "metrics": {k: round(float(v), 4) for k, v in mean.items()},
    }
    results = {"device": "tpu", "runs": []}
    if os.path.isfile(out):
        with open(out) as f:
            results = json.load(f)
    results["runs"] = [r for r in results.get("runs", [])
                       if r["backend"] != backend] + [entry]
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(entry))


if __name__ == "__main__":
    main(sys.argv[1:])
