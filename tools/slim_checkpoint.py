"""Export a params-only "slim" checkpoint from a trained experiment.

    python tools/slim_checkpoint.py <exp_dir> [out.msgpack] [--keep-occupancy]

The reference post-processes Lightning checkpoints the same way
(`ngp-depth/utils.py:29-39` slim_ckpt + `train.py:326-330`): strip the
optimizer state and training buffers so render/viewer/distribution
artifacts are ~3x smaller. Restore by pointing any CLI at it:

    python eval.py --config <exp_dir>/config.json slim_checkpoint=<out>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()


def main(argv):
    from outdoor_nerf_depth_tpu.train import checkpoints as ckpt_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import load_config

    args = [a for a in argv if not a.startswith("--")]
    keep_occ = "--keep-occupancy" in argv
    exp_dir = args[0]
    out = args[1] if len(args) > 1 else os.path.join(exp_dir, "slim.msgpack")

    config = load_config(os.path.join(exp_dir, "config.json"))
    config = config.replace(exp_dir=exp_dir, slim_checkpoint="")
    model, state, occupancy, step = step_lib.load_checkpoint(config)
    if step == 0:
        raise SystemExit(f"no checkpoint found under {exp_dir}/checkpoints")
    ckpt_lib.export_slim(
        out,
        state.params,
        occupancy=occupancy if keep_occ else None,
        meta=step_lib.checkpoint_meta(config, model),
        step=step,
    )
    size_mb = os.path.getsize(out) / 1e6
    print(f"wrote {out} (step {step}, {size_mb:.1f} MB, "
          f"occupancy={'kept' if keep_occ and occupancy is not None else 'dropped'})")


if __name__ == "__main__":
    main(sys.argv[1:])
