"""CLI: evaluate a trained scene checkpoint, or compare renders offline.

  python eval.py [--config exp/config.json] key=value ...
  python eval.py --offline <gt_image_dir> <pred_dir> [out.txt] [--lpips]

Replaces `mipnerf360/eval.py`, `nerfplusplus/ddp_test_nerf.py`, and the
shared `utils/eval.py` of the reference.
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import os
import sys


def main(argv):
    if argv and argv[0] == "--offline":
        from outdoor_nerf_depth_tpu.train.offline_eval import evaluate_renders

        rest = [a for a in argv[1:] if a != "--lpips"]
        lpips = "--lpips" in argv
        gt_dir, pred_dir = rest[0], rest[1]
        out = rest[2] if len(rest) > 2 else None
        evaluate_renders(gt_dir, pred_dir, out_path=out, compute_lpips=lpips)
        return

    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import evaluate

    path = None
    overrides = []
    it = iter(argv)
    for arg in it:
        if arg == "--config":
            path = next(it)
        else:
            overrides.append(arg)
    config = load_config(path, overrides)

    _, state, occupancy, step = step_lib.load_checkpoint(config)
    print(f"restored step {step}")
    evaluate(config, state, occupancy=occupancy)


if __name__ == "__main__":
    main(sys.argv[1:])
