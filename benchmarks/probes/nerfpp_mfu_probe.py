"""NeRF++ shape-efficiency probe (VERDICT r2 #5): where is the 1024-ray
MFU floor — dispatch latency or small-GEMM tiling?

Sweeps dispatch fusion K in {8, 32, 128} at the reference batch (1024
rays) and a 4096-ray variant (the reference's LR/iters rescale for bigger
batches is linear-scaling — `configs/kitti.txt` N_rand=1024, lrate decay —
documented in STATUS.md). Reports per-config rays/s/chip, steps/s, MFU.

If MFU stays flat in K at 1024 but jumps at 4096, the floor is small-GEMM
tiling (the 1024x... matmuls under-fill the MXU); if MFU grows with K, it
was dispatch latency.

Run from the repo root on the TPU: timeout 3000 python benchmarks/probes/nerfpp_mfu_probe.py
"""

import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json
import time

import jax
import jax.numpy as jnp

ROOFLINE_TFLOPS = 115.0


def measure(batch: int, k: int, n_meas: int = 6):
    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import Config

    config = Config(
        model="nerfpp",
        model_params=dict(
            cascade_samples=(64, 128), net_depth=8, net_width=256,
            pos_degrees=10, view_degrees=4, compute_dtype="bfloat16",
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
    dataset = datasets_lib.SyntheticDataset(
        "train", global_batch_size=batch, n_images=8, height=94, width=310,
        seed=0,
    )
    mesh = parallel.make_mesh()
    n_chips = len(mesh.devices.flat)
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
    state = parallel.put_replicated(state, mesh)
    multi_step = step_lib.make_multi_train_step(
        config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
    )
    rng = jax.random.PRNGKey(1)
    stacked = parallel.shard_batch_stack(
        [dataset.sample_batch() for _ in range(k)], mesh
    )
    fracs = jnp.full((k,), 0.5, jnp.float32)
    rngs_for = lambda d: jnp.stack(
        [jax.random.fold_in(rng, d * k + i) for i in range(k)]
    )
    for d in range(2):
        state, stats = multi_step(state, stacked, rngs_for(d), fracs)
    jax.block_until_ready(stats["loss"])
    try:
        c = multi_step.jitted.lower(
            state, stacked, rngs_for(0), fracs, None
        ).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", 0.0))
    except Exception:
        flops = 0.0

    t0 = time.perf_counter()
    for d in range(n_meas):
        state, stats = multi_step(state, stacked, rngs_for(100 + d), fracs)
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0
    # XLA cost analysis counts the K-step lax.scan body ONCE: scale by k.
    # (The raw numbers made this unmistakable: mfu*k was invariant at ~59
    # across k in {8, 32, 128}.)
    tflops = flops * k * n_meas / dt / 1e12 / n_chips
    return {
        "batch": batch,
        "k": k,
        "rays_per_sec_per_chip": round(batch * k * n_meas / dt / n_chips, 1),
        "steps_per_sec": round(k * n_meas / dt, 2),
        "step_ms": round(1000 * dt / (k * n_meas), 3),
        "mfu_pct": round(100 * tflops / ROOFLINE_TFLOPS, 2),
    }


def main():
    results = []
    for batch, k in [(1024, 8), (1024, 32), (1024, 128),
                     (4096, 8), (4096, 32)]:
        r = measure(batch, k)
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
