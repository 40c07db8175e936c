"""NGP train-step throughput (rays/s/chip) at the reference KITTI budget.

The reference trains ngp_pl at 8192 rays/step with hash-grid L=16, T=2^19,
occupancy-grid marching (`ngp-depth/auto_batch_run_kittiseq.sh:17-20`,
`opt.py`). This measures our full jitted step (marching + hash field +
composite + losses + adam) plus the periodic occupancy refresh, on
whatever devices are attached.

  python benchmarks/ngp_step.py [batch=8192] [max_samples=64]
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    overrides = dict(kv.split("=", 1) for kv in argv)
    batch = int(overrides.get("batch", 8192))
    max_samples = int(overrides.get("max_samples", 64))

    import jax

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import Config

    config = Config(
        model="ngp",
        model_params=dict(
            scale=0.5,
            max_samples=max_samples,
            n_candidates=4 * max_samples,
            compute_dtype="bfloat16",
        ),
        compute_dtype="bfloat16",
        batch_size=batch,
        lambda_depth=0.1,
        depth_loss_type="mse",
        interlevel_loss_mult=0.0,
        distortion_loss_mult=0.0,
        opacity_loss_mult=1e-3,
        lr_delay_steps=0,
    )
    dataset = datasets_lib.SyntheticDataset(
        "train", global_batch_size=batch, n_images=8, height=94, width=310,
        seed=0,
    )
    mesh = parallel.make_mesh()
    n_chips = len(mesh.devices.flat)
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(
        config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
    )
    occ_update = step_lib.make_occupancy_update_fn(config, model, mesh)
    grid = occ_lib.init_grid(model.scale, model.grid_resolution)
    rng = jax.random.PRNGKey(1)
    grid = occ_update(state.params, grid, rng, True)

    batches = [
        parallel.shard_batch(dataset.sample_batch(), mesh) for _ in range(4)
    ]
    for i in range(3):
        state, stats = train_step(
            state, batches[i % 4], jax.random.fold_in(rng, i), 0.5, grid
        )
    jax.block_until_ready(stats["loss"])

    n_meas = 20
    t0 = time.perf_counter()
    for i in range(n_meas):
        if i % 16 == 0:
            grid = occ_update(
                state.params, grid, jax.random.fold_in(rng, 50 + i), False
            )
        state, stats = train_step(
            state, batches[i % 4], jax.random.fold_in(rng, 100 + i), 0.5, grid
        )
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0

    per_chip = batch * n_meas / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "ngp_rays_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "rays/s/chip",
                "batch": batch,
                "max_samples": max_samples,
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
