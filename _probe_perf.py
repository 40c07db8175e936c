"""Perf probe: NeRF++ step time vs batch size, fwd-only vs train step."""
import time, json
import jax

from outdoor_nerf_depth_tpu import parallel
from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
from outdoor_nerf_depth_tpu.train import step as step_lib
from outdoor_nerf_depth_tpu.train.config import Config


def make(batch):
    config = Config(
        model="nerfpp",
        model_params=dict(cascade_samples=(64, 128), net_depth=8, net_width=256,
                          pos_degrees=10, view_degrees=4, compute_dtype="bfloat16"),
        compute_dtype="bfloat16",
        batch_size=batch,
        lambda_depth=0.1, depth_loss_type="mse", depth_loss_reduce="mean_valid",
        interlevel_loss_mult=0.0, distortion_loss_mult=0.0,
        data_coarse_loss_mult=1.0, lr_delay_steps=0,
    )
    ds = datasets_lib.SyntheticDataset("train", global_batch_size=batch,
                                       n_images=8, height=94, width=310, seed=0)
    mesh = parallel.make_mesh()
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
    ts = step_lib.make_train_step(config, model, mesh, cameras=ds.cameras,
                                  camtype=ds.camtype)
    return config, ds, mesh, model, state, ts


def timeit_step(ts, state, b, rng, n=15):
    # state is donated: thread it through every call.
    state, stats = ts(state, b, rng, 0.5)
    jax.block_until_ready(stats["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, stats = ts(state, b, rng, 0.5)
    jax.block_until_ready(stats["loss"])
    return (time.perf_counter() - t0) / n


def timeit(fn, n=15):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


for batch in (1024, 4096, 16384):
    config, ds, mesh, model, state, ts = make(batch)
    b = parallel.shard_batch(ds.sample_batch(), mesh)
    rng = jax.random.PRNGKey(1)

    import copy
    dt_step = timeit_step(ts, state, b, rng)
    # Rebuild state for the forward-only path (original was donated).
    _, _, _, _, state, _ = make(batch)[ :6]

    # Forward only (render fn path, deterministic)
    rf = step_lib.make_render_fn(config, model, mesh)
    from outdoor_nerf_depth_tpu.data import cameras as cameras_lib
    rays = cameras_lib.cast_pixels(b.rays, ds.cameras, ds.camtype)
    import jax.numpy as jnp
    rays = jax.tree_util.tree_map(jnp.asarray, rays)
    dt_fwd = timeit(lambda: rf(state.params, rays, None)["rgb"])

    print(json.dumps({
        "batch": batch,
        "step_ms": round(dt_step * 1e3, 2),
        "fwd_ms": round(dt_fwd * 1e3, 2),
        "rays_per_sec_step": round(batch / dt_step),
    }), flush=True)
