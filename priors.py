"""CLI: generate depth priors for a scene (stereo or completion).

  python priors.py stereo --left DIR --right DIR --out DIR \
      --focal 718.856 --baseline 0.54 [--variant cfnet|pcwnet] \
      [--conf-threshold 0.5] [--params ckpt.msgpack]
  python priors.py complete --images DIR --sparse DIR --out DIR \
      [--arch guided|resnet] [--params ckpt.msgpack]

Replaces the reference's per-net `save_disp.py` / `evaluate.py` drivers
(SURVEY.md section 3.6). Without `--params`, runs with fresh random weights
(shape smoke only — train or load weights for real priors).
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import argparse
import sys


def load_params(path, model, example_args):
    import jax

    variables = model.init(jax.random.PRNGKey(0), *example_args)
    if path is None:
        print("WARNING: no --params given; using random weights")
        return variables
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.from_bytes(variables, f.read())


def main(argv):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("stereo")
    s.add_argument("--left", required=True)
    s.add_argument("--right", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--focal", type=float, required=True)
    s.add_argument("--baseline", type=float, required=True)
    s.add_argument("--variant", default="cfnet", choices=["cfnet", "pcwnet"])
    s.add_argument("--max-disparity", type=int, default=192)
    s.add_argument("--conf-threshold", type=float, default=0.0)
    s.add_argument("--params", default=None)

    c = sub.add_parser("complete")
    c.add_argument("--images", required=True)
    c.add_argument("--sparse", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--arch", default="guided", choices=["guided", "resnet"])
    c.add_argument("--params", default=None)

    for sp in (s, c):
        sp.add_argument(
            "--cpu", action="store_true",
            help="force the CPU backend (conv3d compiles can stall on a "
            "tunneled TPU)",
        )
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from outdoor_nerf_depth_tpu.depth_priors import completion, generate, stereo

    if args.cmd == "stereo":
        model = stereo.StereoNet(
            variant=args.variant, max_disparity=args.max_disparity
        )
        dummy = jnp.zeros((1, 64, 128, 3))
        params = load_params(args.params, model, (dummy, dummy))
        generate.generate_stereo_priors(
            params, args.left, args.right, args.out,
            focal=args.focal, baseline=args.baseline, variant=args.variant,
            max_disparity=args.max_disparity,
            confidence_threshold=args.conf_threshold,
        )
    else:
        cls = (
            completion.GuidedCompletionNet
            if args.arch == "guided"
            else completion.DepthCompletionNet
        )
        model = cls()
        params = load_params(
            args.params, model, (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64)))
        )
        generate.generate_completion_priors(
            params, args.images, args.sparse, args.out, arch=args.arch
        )


if __name__ == "__main__":
    main(sys.argv[1:])
