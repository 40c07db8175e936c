"""Benchmark: train-step throughput + MFU across the three backend shapes.

Workloads (the paper's actual training budgets, BASELINE.md "Training
budgets"):
  * nerfpp_1024 — NeRF++ KITTI shape: 1024 rays/step, 2-level cascade
    64+128 fg samples, 8x256 MLPs (`nerfplusplus/configs/kitti.txt`),
    depth mse. THE primary metric (continuity with BENCH_r01).
  * mip_4096 — MipNeRF-360 KITTI shape: 4096 rays/step, 2 prop levels x 64
    + 32 nerf samples, PropMLP 4x256, NerfMLP 8x1024
    (`mipnerf360/configs/360.gin`, `scripts/train_kitti.sh:8`).
  * ngp_8192 — Instant-NGP KITTI shape: 8192 rays/step, hash grid L=16
    T=2^19, occupancy marching (`ngp-depth/auto_batch_run_kittiseq.sh:17-20`).
  * ngp_eval — occupancy-aware iterative eval renderer vs the dense train
    path on the same rays/grid (the reference test-path speedup,
    `rendering.py:46-118`).

Each workload reports rays/s/chip, steps/s, sustained TFLOP/s (XLA
cost-analysis flops / wall time) and MFU vs the 115 TFLOP/s bf16 roofline
measured on this chip (STATUS r1). Prints exactly ONE JSON line; the
primary value stays rays/s/chip on nerfpp_1024.

Baseline: the reference publishes no speed numbers; vs_baseline divides by
a documented ~3.5k rays/s/GPU NeRF++ estimate (RTX 2080 Ti class).
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json
import os
import signal
import time

ROOFLINE_TFLOPS = 115.0  # measured sustained bf16 matmul, this chip
REF_RAYS_PER_SEC_GPU = 3500.0  # documented estimate; see module docstring
WORKLOAD_TIMEOUT_S = int(os.environ.get("ONDT_BENCH_WORKLOAD_TIMEOUT", 480))


class _WorkloadTimeout(Exception):
    pass


def _with_timeout(fn):
    def handler(signum, frame):
        raise _WorkloadTimeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(WORKLOAD_TIMEOUT_S)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _flops_of(jitted, args):
    """Per-dispatch flops from XLA cost analysis (0.0 when unavailable)."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def _summarize(rays_per_dispatch, n_meas, dt, n_chips, flops_per_dispatch,
               steps_per_dispatch=1):
    tflops = flops_per_dispatch * n_meas / dt / 1e12 / n_chips
    return {
        "rays_per_sec_per_chip": round(rays_per_dispatch * n_meas / dt / n_chips, 1),
        "steps_per_sec": round(steps_per_dispatch * n_meas / dt, 2),
        "tflops_per_sec_per_chip": round(tflops, 2),
        "mfu_pct": round(100.0 * tflops / ROOFLINE_TFLOPS, 2),
    }


def bench_nerfpp():
    import jax
    import jax.numpy as jnp

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import Config

    batch, k = 1024, 8  # dispatch fusion amortizes host latency at 1k rays
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
    flops = _flops_of(multi_step.jitted, (state, stacked, rngs_for(0), fracs, None))

    n_meas = 8
    t0 = time.perf_counter()
    for d in range(n_meas):
        state, stats = multi_step(state, stacked, rngs_for(100 + d), fracs)
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0
    return {"batch": batch, "steps_per_dispatch": k,
            **_summarize(batch * k, n_meas, dt, n_chips, flops, k)}


def bench_mip():
    import jax

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import Config

    batch = 4096
    config = Config(
        model="mipnerf360",
        model_params=dict(
            num_prop_samples=64, num_nerf_samples=32, num_levels=3,
            nerf_mlp_params=dict(net_depth=8, net_width=1024,
                                 bottleneck_width=256),
            prop_mlp_params=dict(net_depth=4, net_width=256),
            compute_dtype="bfloat16",
        ),
        compute_dtype="bfloat16",
        batch_size=batch,
        lambda_depth=0.1,
        depth_loss_type="kl",
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
    train_step = step_lib.make_train_step(
        config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
    )
    rng = jax.random.PRNGKey(1)
    batches = [
        parallel.shard_batch(dataset.sample_batch(), mesh) for _ in range(4)
    ]
    for i in range(2):
        state, stats = train_step(
            state, batches[i % 4], jax.random.fold_in(rng, i), 0.5
        )
    jax.block_until_ready(stats["loss"])
    flops = _flops_of(
        train_step.jitted, (state, batches[0], rng, 0.5, None)
    )

    n_meas = 10
    t0 = time.perf_counter()
    for i in range(n_meas):
        state, stats = train_step(
            state, batches[i % 4], jax.random.fold_in(rng, 100 + i), 0.5
        )
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0
    return {"batch": batch, **_summarize(batch, n_meas, dt, n_chips, flops)}


def _ngp_setup(batch, max_samples=64):
    import jax

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import Config

    config = Config(
        model="ngp",
        model_params=dict(
            scale=0.5, max_samples=max_samples,
            n_candidates=4 * max_samples, compute_dtype="bfloat16",
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
    return config, dataset, mesh, model, state, occ_lib, step_lib


def bench_ngp_train():
    import jax

    from outdoor_nerf_depth_tpu import parallel

    batch = 8192
    config, dataset, mesh, model, state, occ_lib, step_lib = _ngp_setup(batch)
    n_chips = len(mesh.devices.flat)
    train_step = step_lib.make_train_step(
        config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
    )
    occ_update = step_lib.make_occupancy_update_fn(config, model, mesh)
    rng = jax.random.PRNGKey(1)
    grid = occ_lib.init_grid(model.scale, model.grid_resolution)
    grid = occ_update(state.params, grid, rng, True)
    grid = parallel.put_replicated(grid, mesh)

    batches = [
        parallel.shard_batch(dataset.sample_batch(), mesh) for _ in range(4)
    ]
    for i in range(3):
        state, stats = train_step(
            state, batches[i % 4], jax.random.fold_in(rng, i), 0.5, grid
        )
    jax.block_until_ready(stats["loss"])
    flops = _flops_of(
        train_step.jitted, (state, batches[0], rng, 0.5, grid)
    )

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
    return {"batch": batch, **_summarize(batch, n_meas, dt, n_chips, flops)}


def bench_ngp_eval():
    """Iterative occupancy-aware eval renderer vs the dense train path.

    Grid: an occupied spherical shell (a surface-like occupancy, ~6% of
    cells) so empty-space skipping and sample truncation both engage — the
    geometry a converged outdoor grid exhibits. The field's sigma output is
    biased up (sigma ~ e^5) to emulate a *converged opaque surface*: the
    regime the reference's test-path FPS headline measures, where early
    ray termination carries the speedup.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import rays as rays_lib

    batch = 8192
    config, dataset, mesh, model, state, occ_lib, step_lib = _ngp_setup(
        batch, max_samples=64
    )
    n_chips = len(mesh.devices.flat)
    params = jax.device_get(state.params)
    bias = np.array(params["params"]["field"]["sigma_out"]["bias"])
    bias[0] += 5.0
    params["params"]["field"]["sigma_out"]["bias"] = bias
    params = parallel.put_replicated(params, mesh)

    res = model.grid_resolution
    cells = np.arange(res**3)
    coords = np.stack(
        [cells // (res * res), (cells // res) % res, cells % res], -1
    ).astype(np.float32)
    centers = ((coords + 0.5) / res - 0.5)  # cascade-0 cube [-0.5, 0.5)
    radius = np.linalg.norm(centers, axis=-1)
    shell = (radius > 0.25) & (radius < 0.32)
    grid = occ_lib.init_grid(model.scale, res)
    grid = grid.at[0].set(jnp.where(jnp.asarray(shell), 1.0, 0.0))
    grid = parallel.put_replicated(grid, mesh)

    # Rays from the synthetic camera, flattened to one sharded chunk.
    batch_img = dataset.image_batch(0)
    h, w = batch_img.rays.origins.shape[:2]
    flat = jax.tree_util.tree_map(
        lambda r: r.reshape((h * w,) + r.shape[2:]), batch_img.rays
    )
    chunk = jax.tree_util.tree_map(lambda r: r[: batch], flat)
    chunk, _ = rays_lib.pad_to_multiple(chunk, n_chips)
    chunk = parallel.shard_batch(chunk, mesh)

    out = {}
    for mode in ("iterative", "train"):
        render = step_lib.make_render_fn(
            config.replace(ngp_eval_renderer=mode), model, mesh
        )
        r = render(params, chunk, grid)
        # Fetch (not just block) each iteration: the tunneled backend can
        # defer unconsumed outputs, which fakes unchained timing loops.
        float(jnp.sum(r["rgb"]))
        n_meas = 10
        t0 = time.perf_counter()
        for _ in range(n_meas):
            r = render(params, chunk, grid)
            float(jnp.sum(r["rgb"]))
        dt = time.perf_counter() - t0
        out[f"{mode}_rays_per_sec_per_chip"] = round(
            batch * n_meas / dt / n_chips, 1
        )
    out["speedup"] = round(
        out["iterative_rays_per_sec_per_chip"]
        / out["train_rays_per_sec_per_chip"], 2,
    )
    out["batch"] = batch
    return out


def main():
    import jax

    wanted = os.environ.get(
        "ONDT_BENCH_WORKLOADS", "nerfpp,mip,ngp,ngp_eval"
    ).split(",")
    benches = {
        "nerfpp_1024": ("nerfpp", bench_nerfpp),
        "mip_4096": ("mip", bench_mip),
        "ngp_8192": ("ngp", bench_ngp_train),
        "ngp_eval": ("ngp_eval", bench_ngp_eval),
    }
    results = {}
    for name, (key, fn) in benches.items():
        if key not in wanted:
            continue
        try:
            results[name] = _with_timeout(fn)
        except _WorkloadTimeout:
            results[name] = {"error": f"timeout after {WORKLOAD_TIMEOUT_S}s"}
        except Exception as e:  # keep the primary line printable
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}

    primary = results.get("nerfpp_1024", {})
    value = primary.get("rays_per_sec_per_chip", 0.0)
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_per_chip",
                "value": value,
                "unit": "rays/s/chip",
                "vs_baseline": round(value / REF_RAYS_PER_SEC_GPU, 3),
                "roofline_tflops": ROOFLINE_TFLOPS,
                "n_chips": jax.device_count(),
                "workloads": results,
            }
        )
    )


if __name__ == "__main__":
    main()
