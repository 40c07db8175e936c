"""Probe: single-step dispatch vs lax.scan-fused K-step dispatch (bench shape)."""

import time

import jax
import jax.numpy as jnp

from outdoor_nerf_depth_tpu import parallel
from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
from outdoor_nerf_depth_tpu.train import step as step_lib
from outdoor_nerf_depth_tpu.train.config import Config

BATCH = 1024


def make(batch):
    return Config(
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
        batch_size=batch,
        lambda_depth=0.1,
        depth_loss_type="mse",
        depth_loss_reduce="mean_valid",
        interlevel_loss_mult=0.0,
        distortion_loss_mult=0.0,
        data_coarse_loss_mult=1.0,
        lr_delay_steps=0,
    )


def main():
    config = make(BATCH)
    dataset = datasets_lib.SyntheticDataset(
        "train", global_batch_size=BATCH, n_images=8, height=94, width=310, seed=0
    )
    mesh = parallel.make_mesh()
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    # --- single-step baseline ---
    train_step = step_lib.make_train_step(
        config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
    )
    batches = [parallel.shard_batch(dataset.sample_batch(), mesh) for _ in range(4)]
    for i in range(3):
        state, stats = train_step(state, batches[i % 4], jax.random.fold_in(rng, i), 0.5)
    jax.block_until_ready(stats["loss"])
    t0 = time.perf_counter()
    N = 20
    for i in range(N):
        state, stats = train_step(state, batches[i % 4], jax.random.fold_in(rng, 100 + i), 0.5)
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0
    print(f"single: {BATCH * N / dt:.0f} rays/s ({dt / N * 1e3:.1f} ms/step)", flush=True)

    # --- K-fused ---
    for K in (8, 32):
        multi = step_lib.make_multi_train_step(
            config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
        )
        stacked = parallel.shard_batch_stack(
            [dataset.sample_batch() for _ in range(K)], mesh
        )
        rngs = jnp.stack([jax.random.fold_in(rng, i) for i in range(K)])
        fracs = jnp.full((K,), 0.5, jnp.float32)
        state2, stats = multi(state, stacked, rngs, fracs)
        jax.block_until_ready(stats["loss"])
        reps = max(1, 64 // K)
        t0 = time.perf_counter()
        for r in range(reps):
            state2, stats = multi(state2, stacked, rngs, fracs)
        jax.block_until_ready(stats["loss"])
        dt = time.perf_counter() - t0
        print(
            f"fused K={K}: {BATCH * K * reps / dt:.0f} rays/s "
            f"({dt / (K * reps) * 1e3:.2f} ms/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
