"""CLI: train a scene. `python train.py [--config file.json] key=value ...`

Replaces the reference's three training drivers
(`mipnerf360/train.py`, `nerfplusplus/ddp_train_nerf.py`,
`ngp-depth/train.py`) with one entry point over the unified config.
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import sys


def experiment_finished(config) -> bool:
    """Idempotent-run guard: True when the final checkpoint and eval
    renders already exist (the reference exits early in the same case,
    `mipnerf360/train.py:54-57`, `nerfplusplus/ddp_train_nerf.py:733-735`)."""
    import os

    final_ckpt = os.path.join(
        config.exp_dir, "checkpoints", str(config.max_steps)
    )
    renders = os.path.join(config.exp_dir, "renders")
    return os.path.isdir(final_ckpt) and os.path.isdir(renders) and bool(
        os.listdir(renders)
    )


def main(argv):
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import evaluate, train

    path = None
    overrides = []
    run_eval = True
    force = False
    it = iter(argv)
    for arg in it:
        if arg == "--config":
            path = next(it)
        elif arg == "--no-eval":
            run_eval = False
        elif arg == "--force":
            force = True
        else:
            overrides.append(arg)
    config = load_config(path, overrides)
    if not force and experiment_finished(config):
        print(
            f"experiment {config.exp_dir} already finished "
            f"(checkpoint {config.max_steps} + renders exist); "
            "pass --force to rerun"
        )
        return
    state, _, occupancy = train(config)
    if run_eval:
        evaluate(config, state, occupancy=occupancy)


if __name__ == "__main__":
    main(sys.argv[1:])
