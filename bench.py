"""Benchmark: training-step throughput in rays/sec/chip (NeRF++ KITTI shape).

Runs the full jitted+sharded train step (forward + backward + adam update)
of the NeRF++ plugin at the reference's KITTI budget shape — 1024 rays/step,
2-level cascade with 64 coarse + 64+128 fine fg samples and matching bg
samples, 8x256 MLPs (reference `nerfplusplus/configs/kitti.txt`,
`scripts/train.sh:24-34`) — plus depth supervision (mse) enabled.

Baseline: the reference trains this workload with torch DDP on GPUs; typical
published NeRF++ throughput is ~2-4 steps/s at 1024 rays on an RTX 2080 Ti
(~3.5k rays/s/GPU; the repo publishes no speed numbers — SURVEY.md section
6). `vs_baseline` is measured rays/sec/chip divided by that 3 500 figure.

Prints exactly one JSON line:
  {"metric": "rays_per_sec_per_chip", "value": N, "unit": "rays/s/chip",
   "vs_baseline": N}
"""

import json
import time

REF_RAYS_PER_SEC_GPU = 3500.0  # documented estimate; see module docstring
BATCH = 1024
# Production dispatch fusion (train loop `steps_per_dispatch`): K optimizer
# steps lax.scan'd into one XLA program. At this batch size it buys ~8% by
# amortizing host dispatch; the math is identical to K sequential steps.
STEPS_PER_DISPATCH = 8
WARMUP_DISPATCHES = 2
MEASURE_DISPATCHES = 8


def main():
    import jax

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import Config

    config = Config(
        model="nerfpp",
        model_params=dict(
            cascade_samples=(64, 128),
            net_depth=8,
            net_width=256,
            pos_degrees=10,
            view_degrees=4,
            compute_dtype="bfloat16",
        ),
        compute_dtype="bfloat16",
        batch_size=BATCH,
        lambda_depth=0.1,
        depth_loss_type="mse",
        depth_loss_reduce="mean_valid",
        interlevel_loss_mult=0.0,
        distortion_loss_mult=0.0,
        data_coarse_loss_mult=1.0,
        lr_delay_steps=0,
    )
    dataset = datasets_lib.SyntheticDataset(
        "train", global_batch_size=BATCH, n_images=8, height=94, width=310, seed=0
    )
    mesh = parallel.make_mesh()
    n_chips = len(mesh.devices.flat)
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
    # One compile only: commit the state to the mesh before the first call
    # (see parallel.put_replicated) so warmup fully covers compilation.
    state = parallel.put_replicated(state, mesh)
    import jax.numpy as jnp

    k = STEPS_PER_DISPATCH
    multi_step = step_lib.make_multi_train_step(
        config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
    )
    rng = jax.random.PRNGKey(1)
    stacked = parallel.shard_batch_stack(
        [dataset.sample_batch() for _ in range(k)], mesh
    )
    fracs = jnp.full((k,), 0.5, jnp.float32)

    def rngs_for(dispatch):
        return jnp.stack(
            [jax.random.fold_in(rng, dispatch * k + i) for i in range(k)]
        )

    for d in range(WARMUP_DISPATCHES):
        state, stats = multi_step(state, stacked, rngs_for(d), fracs)
    jax.block_until_ready(stats["loss"])

    t0 = time.perf_counter()
    for d in range(MEASURE_DISPATCHES):
        state, stats = multi_step(state, stacked, rngs_for(100 + d), fracs)
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = BATCH * k * MEASURE_DISPATCHES / dt
    per_chip = rays_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(per_chip / REF_RAYS_PER_SEC_GPU, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
