"""Worker for the 2-process distributed smoke test (run via subprocess).

Validates the multi-host story end to end on CPU: per-process input
sharding (the data layer slices the global batch by `jax.process_index()`),
global-array assembly in `parallel.shard_batch`, and the XLA gradient
all-reduce across processes — the path a real multi-host TPU slice takes
(SURVEY.md §2.6), which the reference never tests.

Usage: python tests/multihost_worker.py <proc_id> <n_proc> <port> [mode]
mode=train (default) prints: MHOK <proc_id> <loss> <grad_norm>
mode=render exercises the multi-process `render_image` gather (per-process
chunk slicing + replicated readback, SURVEY.md section 3.4) and prints:
MHRENDER <proc_id> <rgb_sum> <rgb_001> <depth_sum>
"""

import os
import sys


def worker_config():
    from outdoor_nerf_depth_tpu.train.config import Config

    return Config(
        model="mipnerf360",
        model_params=dict(
            num_prop_samples=8,
            num_nerf_samples=4,
            num_levels=2,
            nerf_mlp_params=dict(
                net_depth=2, net_width=16, bottleneck_width=8,
                net_width_viewdirs=8, max_deg_point=4,
            ),
            prop_mlp_params=dict(net_depth=2, net_width=16, max_deg_point=4),
        ),
        batch_size=64,  # global; each process contributes 32
        lambda_depth=0.1,
        depth_loss_type="mse",
        lr_delay_steps=0,
    )


def main():
    proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "train"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=n_proc, process_id=proc_id
    )

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib

    config = worker_config()
    dataset = datasets_lib.SyntheticDataset(
        "train", global_batch_size=config.batch_size, seed=3
    )
    assert dataset.batch_size == config.batch_size // n_proc

    mesh = parallel.make_mesh()
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))

    if mode == "render":
        # Deterministic init params (identical on every process count), so
        # the test driver can compare against a single-process render.
        test_ds = datasets_lib.SyntheticDataset(
            "test", global_batch_size=config.batch_size, seed=3
        )
        render_chunk = step_lib.make_render_fn(config, model, mesh)
        image = step_lib.render_image(
            render_chunk, state.params, test_ds.image_batch(0), mesh,
            chunk_size=40,  # force multiple chunks + padding
        )
        rgb = jax.device_get(image["rgb"])
        depth = jax.device_get(image["distance_mean"])
        print(
            f"MHRENDER {proc_id} {float(rgb.sum()):.6f} "
            f"{float(rgb[0, 1, 0]):.6f} {float(depth.sum()):.6f}",
            flush=True,
        )
        return

    train_step = step_lib.make_train_step(
        config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
    )
    for i in range(2):
        batch = parallel.shard_batch(dataset.sample_batch(), mesh)
        state, stats = train_step(state, batch, jax.random.PRNGKey(1 + i), 0.5)
    loss = float(jax.device_get(stats["loss"]))
    gn = float(jax.device_get(stats["grad_norm"]))
    print(f"MHOK {proc_id} {loss:.6f} {gn:.6f}", flush=True)


if __name__ == "__main__":
    main()
