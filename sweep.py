"""Sweep runner: loss-type x depth-prior x view-sparsity grids.

Replaces the reference's bash sweep loops
(`nerfplusplus/scripts/train.sh`, `mipnerf360/scripts/train_kitti.sh`,
`ngp-depth/auto_batch_run_kittiseq.sh`) with one declarative driver:

  python sweep.py --config configs/kitti_mipnerf360.json \
      --grid depth_loss_type=mse,l1,kl --grid depth_sup_type=gt,stereo_crop \
      --grid sample_every=1,4 [--dry-run] [base overrides...]

Each grid point trains into `exp_dir/<name>` and the summary table of all
eval means is written to `exp_dir/sweep_summary.json`.
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import itertools
import json
import os
import sys


def parse_args(argv):
    path, grids, overrides, dry = None, [], [], False
    it = iter(argv)
    for a in it:
        if a == "--config":
            path = next(it)
        elif a == "--grid":
            key, vals = next(it).split("=", 1)
            grids.append((key, vals.split(",")))
        elif a == "--dry-run":
            dry = True
        else:
            overrides.append(a)
    return path, grids, overrides, dry


def main(argv):
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import evaluate, train

    path, grids, base_overrides, dry = parse_args(argv)
    keys = [k for k, _ in grids]
    results = {}
    base = load_config(path, base_overrides)

    for combo in itertools.product(*(v for _, v in grids)):
        name = "-".join(f"{k}_{v}" for k, v in zip(keys, combo)) or "single"
        overrides = base_overrides + [f"{k}={v}" for k, v in zip(keys, combo)]
        config = load_config(path, overrides)
        config = config.replace(exp_dir=os.path.join(base.exp_dir, name))
        print(f"=== sweep point {name} -> {config.exp_dir}")
        if dry:
            continue
        state, _, occupancy = train(config)
        mean, _ = evaluate(config, state, occupancy=occupancy)
        results[name] = mean
        with open(os.path.join(base.exp_dir, "sweep_summary.json"), "w") as f:
            json.dump(results, f, indent=2)

    if not dry:
        print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
