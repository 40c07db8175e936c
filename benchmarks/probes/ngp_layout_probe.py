"""NGP hash-encode layout breakdown at the KITTI training shape.

Measures, per layout (corner / quad / oct), on the attached device:
  * encode forward (the gather bill): 8192 rays x 64 samples x 16 levels
  * encode forward+backward (table gradient reduction)
  * the full NGP train step

Timing fetches a scalar per iteration — the tunneled backend defers
execution of unfetched outputs (CLAUDE.md), so unchained loops without a
fetch measure ~nothing.

Run from the repo root: `timeout 550 python benchmarks/probes/ngp_layout_probe.py [layouts]`
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

from outdoor_nerf_depth_tpu.ops import hashgrid

N_SAMPLES = 8192 * 64  # rays x samples at the KITTI NGP shape
L, F, LOG2T = 16, 2, 19
N_MIN, N_MAX = 16, 2048


def bench_layout(layout: str, n_iters: int = 8):
    t_size = 2**LOG2T
    res = hashgrid.level_resolutions(L, N_MIN, N_MAX)
    res_key = tuple(int(r) for r in res)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (N_SAMPLES, 3))
    table = jax.random.normal(jax.random.fold_in(rng, 1), (L, t_size, F)) * 1e-2

    if layout == "corner":
        fwd_fn = lambda x, t: hashgrid.encode(x, t, res, t_size)
        vjp_fn = hashgrid._sorted_grad_encode(res_key, t_size)
    elif layout == "quad":
        fwd_fn = lambda x, t: hashgrid.encode_quad(x, t, res, t_size)
        vjp_fn = hashgrid._quad_grad_encode(res_key, t_size)
    elif layout == "oct":
        fwd_fn = lambda x, t: hashgrid.encode_oct(x, t, res, t_size)
        vjp_fn = hashgrid._oct_grad_encode(res_key, t_size)
    elif layout == "osplit":
        fwd_fn = lambda x, t: hashgrid.encode_oct_split(x, t, res, t_size)
        vjp_fn = hashgrid._oct_split_grad_encode(res_key, t_size)
    else:
        raise ValueError(layout)

    out = {}
    fwd = jax.jit(lambda x, t: jnp.sum(fwd_fn(x, t)))
    float(fwd(x, table))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        float(fwd(x, table))
    out["fwd_s"] = round((time.perf_counter() - t0) / n_iters, 4)

    grad = jax.jit(jax.grad(lambda t: jnp.sum(jnp.sin(vjp_fn(x, t)))))
    float(jnp.sum(grad(table)))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        float(jnp.sum(grad(table)))
    out["fwd_bwd_s"] = round((time.perf_counter() - t0) / n_iters, 4)
    return out


def bench_full_step(layout: str, n_iters: int = 10):
    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import Config

    batch = 8192
    config = Config(
        model="ngp",
        model_params=dict(
            scale=0.5, max_samples=64, n_candidates=256,
            hash_layout=layout, compute_dtype="bfloat16",
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
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
    state = parallel.put_replicated(state, mesh)
    train_step = step_lib.make_train_step(
        config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
    )
    occ_update = step_lib.make_occupancy_update_fn(config, model, mesh)
    rng = jax.random.PRNGKey(1)
    grid = occ_update(
        state.params,
        occ_lib.init_grid(model.scale, model.grid_resolution),
        rng,
        True,
    )
    grid = parallel.put_replicated(grid, mesh)
    batches = [
        parallel.shard_batch(dataset.sample_batch(), mesh) for _ in range(4)
    ]
    for i in range(3):
        state, stats = train_step(
            state, batches[i % 4], jax.random.fold_in(rng, i), 0.5, grid
        )
    jax.block_until_ready(stats["loss"])
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, stats = train_step(
            state, batches[i % 4], jax.random.fold_in(rng, 100 + i), 0.5, grid
        )
    jax.block_until_ready(stats["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    return {"step_s": round(dt, 4), "rays_per_sec": round(batch / dt, 1)}


def main():
    layouts = (sys.argv[1].split(",") if len(sys.argv) > 1
               else ["oct", "quad", "corner"])
    results = {"backend": jax.default_backend()}
    for layout in layouts:
        results[layout] = bench_layout(layout)
        print(json.dumps({layout: results[layout]}), flush=True)
    for layout in layouts:
        results[layout]["full"] = bench_full_step(layout)
        print(json.dumps({f"{layout}_full": results[layout]["full"]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
