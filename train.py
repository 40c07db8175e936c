"""CLI: train a scene. `python train.py [--config file.json] key=value ...`

Replaces the reference's three training drivers
(`mipnerf360/train.py`, `nerfplusplus/ddp_train_nerf.py`,
`ngp-depth/train.py`) with one entry point over the unified config.
"""

import sys


def main(argv):
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import evaluate, train

    path = None
    overrides = []
    run_eval = True
    it = iter(argv)
    for arg in it:
        if arg == "--config":
            path = next(it)
        elif arg == "--no-eval":
            run_eval = False
        else:
            overrides.append(arg)
    config = load_config(path, overrides)
    state, _, occupancy = train(config)
    if run_eval:
        evaluate(config, state, occupancy=occupancy)


if __name__ == "__main__":
    main(sys.argv[1:])
