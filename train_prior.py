"""CLI: train a depth-prior network (stereo or completion).

  python train_prior.py stereo --data ROOT [--variant cfnet] [--steps 20000]
      [--batch 2] [--lr 1e-3] [--out stereo_params.msgpack] [--cpu]
  python train_prior.py complete --data ROOT [--arch guided] ...

Replaces the reference's four training drivers (`CFNet/main.py`,
`PCWNet/main.py`, `std2019.../main.py`, `mffnet/train.py`) with one optax
loop over the folder-layout datasets in `depth_priors/datasets.py`.
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import argparse
import sys
import time


def main(argv):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("stereo", "complete"):
        q = sub.add_parser(name)
        q.add_argument("--data", required=True)
        q.add_argument("--steps", type=int, default=20000)
        q.add_argument("--batch", type=int, default=2)
        q.add_argument("--lr", type=float, default=1e-3)
        q.add_argument("--crop", type=int, nargs=2, default=(256, 512))
        q.add_argument("--out", default=None)
        q.add_argument("--print-every", type=int, default=50)
        q.add_argument("--cpu", action="store_true")
        if name == "stereo":
            q.add_argument("--variant", default="cfnet", choices=["cfnet", "pcwnet"])
            q.add_argument("--max-disparity", type=int, default=192)
            q.add_argument(
                "--list-file",
                default=None,
                help="reference-format filename list (`left right [disp]` "
                "rows, paths relative to --data); selects the benchmark "
                "ingestion path instead of the folder layout",
            )
            q.add_argument(
                "--benchmark",
                default=None,
                # keep in sync with benchmark_data.SCANNERS
                choices=["eth3d", "kitti2012", "kitti2015", "middlebury",
                         "sceneflow"],
                help="scan --data in this benchmark's directory layout "
                "instead of reading a list file",
            )
            q.add_argument("--split", default=None,
                           help="benchmark split for --benchmark scans "
                           "(e.g. training / TRAIN)")
            q.add_argument(
                "--eval-list",
                default=None,
                help="after training, report EPE/D1 over this filename list",
            )
        else:
            q.add_argument("--arch", default="guided", choices=["guided", "resnet"])
            q.add_argument(
                "--photo",
                action="store_true",
                help="add self-supervised photometric loss (PnP pose + "
                "inverse warp from the temporal neighbor)",
            )
            q.add_argument("--photo-weight", type=float, default=0.1)
            q.add_argument("--smooth-weight", type=float, default=0.01)
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from outdoor_nerf_depth_tpu.depth_priors import (
        completion, datasets as prior_data, stereo,
    )

    if args.cmd == "stereo":
        from outdoor_nerf_depth_tpu.depth_priors import benchmark_data

        if args.list_file:
            ds = benchmark_data.StereoBenchmarkDataset.from_list_file(
                args.data, args.list_file, crop=tuple(args.crop)
            )
        elif args.benchmark:
            kw = {"crop": tuple(args.crop)}
            if args.split:
                kw["split"] = args.split
            ds = benchmark_data.StereoBenchmarkDataset.from_scan(
                args.data, args.benchmark, **kw
            )
        else:
            ds = prior_data.StereoPairDataset(args.data, crop=tuple(args.crop))
        model = stereo.StereoNet(
            variant=args.variant, max_disparity=args.max_disparity
        )
        l, r, d = ds.sample_batch(args.batch)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(l), jnp.asarray(r))

        def loss_fn(v, l, r, d):
            out = model.apply(v, l, r)
            return stereo.multi_scale_loss(out, d, args.max_disparity)

    else:
        ds = prior_data.CompletionDataset(args.data, crop=tuple(args.crop))
        cls = (
            completion.GuidedCompletionNet
            if args.arch == "guided"
            else completion.DepthCompletionNet
        )
        model = cls()
        rgb, sp, gt = ds.sample_batch(args.batch)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(rgb), jnp.asarray(sp)
        )

        if args.photo:
            from outdoor_nerf_depth_tpu.depth_priors import pose as pose_lib

            def loss_fn(v, rgb, sp, gt, rgb_near, R, t, success, K):
                pred = model.apply(v, rgb, sp)
                loss = completion.masked_depth_mse(pred, gt)
                loss += args.smooth_weight * completion.edge_aware_smoothness(
                    pred, rgb
                )
                warped, valid = jax.vmap(
                    pose_lib.inverse_warp, in_axes=(0, 0, 0, 0, None)
                )(rgb_near, pred, R, t, K)
                # Mask out frames where host-side PnP failed.
                valid = valid & (success[:, None, None] > 0)
                loss += args.photo_weight * completion.photometric_loss(
                    warped, rgb, mask=valid
                )
                return loss

            def sample():
                return ds.sample_batch_with_near(args.batch)

        else:

            def loss_fn(v, rgb, sp, gt):
                pred = model.apply(v, rgb, sp)
                return (
                    completion.masked_depth_mse(pred, gt)
                    + args.smooth_weight
                    * completion.edge_aware_smoothness(pred, rgb)
                )

    tx = optax.adam(args.lr)
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(variables, *batch)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    sample_batch = (
        sample if args.cmd == "complete" and getattr(args, "photo", False)
        else lambda: ds.sample_batch(args.batch)
    )
    t0 = time.perf_counter()
    for step in range(args.steps):
        batch = tuple(jnp.asarray(a) for a in sample_batch())
        variables, opt_state, loss = train_step(variables, opt_state, *batch)
        if (step + 1) % args.print_every == 0:
            dt = time.perf_counter() - t0
            print(
                f"step {step + 1}: loss {float(loss):.4f} "
                f"({args.print_every / dt:.2f} it/s)",
                flush=True,
            )
            t0 = time.perf_counter()

    if args.out:
        import flax.serialization

        with open(args.out, "wb") as f:
            f.write(flax.serialization.to_bytes(variables))
        print(f"saved params to {args.out}")

    if args.cmd == "stereo" and getattr(args, "eval_list", None):
        # Benchmark-style evaluation (reference `CFNet/main.py` test loop):
        # full images shaped to the benchmark's canonical eval geometry,
        # EPE + D1 over valid GT pixels.
        import numpy as np

        eval_ds = benchmark_data.StereoBenchmarkDataset.from_list_file(
            args.data, args.eval_list, augment=False
        )
        apply = jax.jit(model.apply)
        totals, n_images = {"epe": 0.0, "d1": 0.0}, 0
        for i in range(len(eval_ds)):
            b = eval_ds.eval_batch(i)
            pred = apply(variables, jnp.asarray(b["left"]),
                         jnp.asarray(b["right"]))["disparity"]
            m = benchmark_data.disparity_metrics(
                np.asarray(pred)[0], b["disparity"][0], b["valid"][0],
                max_disp=args.max_disparity,
            )
            if m["n_valid"] == 0:
                continue
            totals = {k: totals[k] + m[k] for k in totals}
            n_images += 1
        mean = {k: round(v / max(n_images, 1), 4) for k, v in totals.items()}
        print(f"eval [{args.eval_list}]: n={n_images} "
              f"EPE {mean['epe']} D1 {mean['d1']}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
