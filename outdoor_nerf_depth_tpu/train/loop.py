"""The training loop driver: data -> sharded step -> metrics -> checkpoints.

Capability parity with the reference drivers
(`/root/reference/nerf-methods/mipnerf360/train.py:46-399`,
`nerfplusplus/ddp_train_nerf.py:357-655`), with rays/sec/chip as the
north-star counter. Single-controller: the same script runs 1 chip or a
multi-host slice (per-host input sharding lives in the data layer).
"""

from __future__ import annotations

import gc
import json
import os
import time
from typing import Optional

import jax
import numpy as np

from outdoor_nerf_depth_tpu import parallel
from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
from outdoor_nerf_depth_tpu.train import checkpoints as ckpt_lib
from outdoor_nerf_depth_tpu.train import metrics as metrics_lib
from outdoor_nerf_depth_tpu.train import step as step_lib
from outdoor_nerf_depth_tpu.train.config import Config, save_config


def build_dataset(config: Config, split: str):
    if config.dataset == "synthetic":
        return datasets_lib.SyntheticDataset(
            split,
            global_batch_size=config.batch_size,
            cast_on_device=config.cast_rays_in_train_step,
        )
    if config.dataset == "spheres":
        return datasets_lib.SphereSceneDataset(
            split,
            global_batch_size=config.batch_size,
            cast_on_device=config.cast_rays_in_train_step,
            sample_every=config.sample_every if split == "train" else 1,
            depth_sup_type=config.depth_sup_type,
        )
    if config.dataset == "driving":
        ds = datasets_lib.DrivingSceneDataset(
            config.scene_dir,
            split,
            global_batch_size=config.batch_size,
            near=config.near,
            far=config.far,
            factor=config.factor,
            depth_sup_type=config.depth_sup_type,
            sample_every=config.sample_every if split == "train" else 1,
            depth_crop_range=config.depth_crop_range,
            depth_keep_ratio=config.depth_keep_ratio,
            auto_adjust_near_far=config.auto_adjust_near_far,
            load_depth=config.depth_sup_type != "rgbonly",
            cast_on_device=config.cast_rays_in_train_step,
        )
        return ds
    if config.dataset in ("nerfpp", "tnt"):
        cls = (
            datasets_lib.TanksAndTemplesDataset
            if config.dataset == "tnt"
            else datasets_lib.NerfppSceneDataset
        )
        return cls(
            config.scene_dir,
            split,
            global_batch_size=config.batch_size,
            skip=config.sample_every if split == "train" else 1,
            depth_sup_type=config.depth_sup_type,
            cast_on_device=config.cast_rays_in_train_step,
        )
    if config.dataset == "blender":
        return datasets_lib.BlenderDataset(
            config.scene_dir,
            split,
            global_batch_size=config.batch_size,
            near=config.near,
            far=config.far,
            cast_on_device=config.cast_rays_in_train_step,
        )
    if config.dataset == "tnt_fvs":
        return datasets_lib.TanksAndTemplesFVSDataset(
            config.scene_dir,
            split,
            global_batch_size=config.batch_size,
            factor=config.factor,
            cast_on_device=config.cast_rays_in_train_step,
        )
    if config.dataset == "dtu":
        return datasets_lib.DTUDataset(
            config.scene_dir,
            split,
            global_batch_size=config.batch_size,
            near=config.near,
            far=config.far,
            cast_on_device=config.cast_rays_in_train_step,
        )
    if config.dataset == "nsvf":
        return datasets_lib.NSVFDataset(
            config.scene_dir,
            split,
            global_batch_size=config.batch_size,
            near=config.near,
            far=config.far,
            cast_on_device=config.cast_rays_in_train_step,
        )
    if config.dataset == "rtmv":
        return datasets_lib.RTMVDataset(
            config.scene_dir,
            split,
            global_batch_size=config.batch_size,
            near=config.near,
            far=config.far,
            cast_on_device=config.cast_rays_in_train_step,
        )
    raise ValueError(f"unknown dataset {config.dataset!r}")


def train(config: Config, max_steps: Optional[int] = None, log_fn=print):
    """Run training; returns the final state and a history of logged stats."""
    max_steps = max_steps or config.max_steps
    os.makedirs(config.exp_dir, exist_ok=True)
    if jax.process_index() == 0:
        save_config(config, os.path.join(config.exp_dir, "config.json"))

    # Idempotent-run guard (reference `mipnerf360/train.py:54-57` /
    # `ddp_train_nerf.py:733-735`: exit when the run's final artifact already
    # exists): a checkpoint at >= max_steps means this run finished — skip
    # dataset/model setup entirely and hand back the restored state.
    latest = ckpt_lib.latest_step(os.path.join(config.exp_dir, "checkpoints"))
    if latest is not None and latest >= max_steps:
        log_fn(json.dumps({"step": latest, "already_complete": True}))
        rng = jax.random.PRNGKey(config.seed)
        model, state = step_lib.init_state(config, rng)
        occupancy = None
        if config.model == "ngp":
            from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib

            occupancy = occ_lib.init_grid(model.scale, model.grid_resolution)
        ckpt = ckpt_lib.CheckpointManager(
            os.path.join(config.exp_dir, "checkpoints"),
            keep=config.keep_checkpoints,
        )
        restored, _ = ckpt.restore({"state": state, "occupancy": occupancy})
        ckpt.close()
        return restored["state"], [], restored["occupancy"]

    dataset = build_dataset(config, "train")
    if hasattr(dataset, "scene_scale"):
        config = config.replace(depth_scale=float(dataset.scene_scale))

    mesh = parallel.make_mesh()
    rng = jax.random.PRNGKey(config.seed)
    model, state = step_lib.init_state(config, rng)

    train_step = step_lib.make_train_step(
        config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
    )
    occ_update = step_lib.make_occupancy_update_fn(config, model, mesh)
    occupancy = None
    if occ_update is not None:
        from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib

        occupancy = occ_lib.init_grid(model.scale, model.grid_resolution)

    # The checkpoint covers params/opt state AND sampler state (the NGP
    # occupancy grid), so resume and eval see the same acceleration
    # structure that training built. The model-identity sidecar makes
    # resume-under-a-different-hash-layout a loud error instead of silent
    # garbage.
    ckpt_dir = os.path.join(config.exp_dir, "checkpoints")
    meta = step_lib.checkpoint_meta(config, model)
    ckpt_lib.check_model_meta(ckpt_dir, meta)
    if jax.process_index() == 0:
        ckpt_lib.write_model_meta(ckpt_dir, meta)
    ckpt = ckpt_lib.CheckpointManager(
        ckpt_dir, keep=config.keep_checkpoints
    )
    template = {"state": state, "occupancy": occupancy}
    restored, start_step = ckpt.restore(template)
    state, occupancy = restored["state"], restored["occupancy"]
    # Commit to the mesh BEFORE the first step: otherwise call #2's avals
    # (now carrying the mesh context) miss the jit cache and recompile the
    # whole train program a second time (~14 s at production sizes).
    state = parallel.put_replicated(state, mesh)
    occupancy = parallel.put_replicated(occupancy, mesh)

    sample_fn = dataset.sample_batch
    if config.use_native_batcher and getattr(dataset, "pixtocams", None) is not None:
        try:
            from outdoor_nerf_depth_tpu.data import native_batcher

            if native_batcher.is_available() and dataset.pixtocams.ndim == 2:
                sample_fn = native_batcher.NativeRayBatcher(
                    dataset, seed=config.seed
                ).sample_batch
                log_fn("using native C++ dataplane for batch assembly")
        except Exception as e:  # pragma: no cover - toolchain-dependent
            log_fn(f"native dataplane disabled: {e}")
    batches = datasets_lib.PrefetchIterator(sample_fn)

    from outdoor_nerf_depth_tpu.utils.logging import MetricWriter

    writer = MetricWriter(os.path.join(config.exp_dir, "logs"))

    # In-loop test rendering (reference `mipnerf360/train.py:245-301`,
    # `ddp_train_nerf.py:539-640`): every `train_render_every` steps render
    # one held-out view, log PSNR/depth metrics and a summary image.
    test_dataset = render_chunk = None
    if config.train_render_every > 0:
        test_dataset = build_dataset(config, "test")
        render_chunk = step_lib.make_render_fn(config, model, mesh)

    def render_test_view(step, state, occupancy):
        idx = (step // config.train_render_every) % test_dataset.n_images
        batch = test_dataset.image_batch(idx)
        rendering = step_lib.render_image(
            render_chunk, state.params, batch, mesh,
            config.render_chunk_size, aux=occupancy,
        )
        m = metrics_lib.MetricSuite(compute_ssim=False)(
            np.asarray(rendering["rgb"]),
            np.asarray(batch.rgb),
            pred_depth=np.asarray(rendering["distance_mean"]),
            gt_depth=None if batch.depth_gt is None else np.asarray(batch.depth_gt),
            depth_scale=config.depth_scale,
        )
        m = {k: v for k, v in m.items() if v is not None}
        writer.scalars(step, m, prefix="train_render")
        from outdoor_nerf_depth_tpu.utils import vis as vis_lib

        panel = vis_lib.side_by_side(
            np.asarray(rendering["rgb"]),
            np.asarray(batch.rgb),
            vis_lib.visualize_depth(
                np.asarray(rendering["distance_mean"]) / config.depth_scale
            ),
        )
        writer.image(step, "train_render/view", panel)
        log_fn(json.dumps({"step": step, "test_view": idx,
                           **{k: round(v, 4) for k, v in m.items()
                              if v is not None}}))
    # Dispatch fusion: K steps per jitted call (lax.scan) — amortizes host
    # dispatch latency at small batch sizes. Cadenced side effects (print,
    # render, ckpt, occupancy updates) fire on boundary *crossings*, so any
    # cadence works, at superstep granularity.
    n_fuse = max(1, config.steps_per_dispatch)
    multi_step = None
    if n_fuse > 1:
        multi_step = step_lib.make_multi_train_step(
            config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype
        )

    def crossed(before, after, every):
        return every > 0 and (after // every) > (before // every)

    history = []
    gc.disable()
    t_last = time.perf_counter()
    rays_since = 0
    step = start_step
    # Occupancy refresh fires whenever the trained-step count reaches the
    # next multiple of the cadence — robust to K-step dispatch fusion, where
    # `step % every == 0` can be skipped forever (e.g. K=8, every=16 lands,
    # but K=8, every=12 never hits step%12==0 after step 24).
    occ_every = config.occupancy_update_every
    next_occ = (step // occ_every) * occ_every if occ_update is not None else None
    # Profiler window: start fires once when the loop reaches
    # profile_start_step; stop fires once the trained-step count passes
    # start + profile_num_steps, checked AFTER each dispatch so a window
    # narrower than steps_per_dispatch still closes (the old
    # crossing-based stop could never fire in the start's own window and
    # left the trace running to process exit).
    prof_started = prof_stopped = False
    prof_stop_at = config.profile_start_step + config.profile_num_steps
    while step < max_steps:
        if (
            config.profile_start_step
            and not prof_started
            and step + n_fuse > config.profile_start_step
        ):
            jax.profiler.start_trace(os.path.join(config.exp_dir, "trace"))
            prof_started = True
        step_rng = jax.random.fold_in(rng, step)
        if occ_update is not None and step >= next_occ:
            occupancy = occ_update(
                state.params,
                occupancy,
                jax.random.fold_in(step_rng, 7),
                step < config.occupancy_warmup_steps,
            )
            next_occ = (step // occ_every + 1) * occ_every
        k = min(n_fuse, max_steps - step)
        if k == 1 or multi_step is None:
            batch = parallel.shard_batch(next(batches), mesh)
            state, stats = train_step(
                state, batch, step_rng, step / max_steps, occupancy
            )
            k = 1
        else:
            import jax.numpy as jnp

            stacked = parallel.shard_batch_stack(
                [next(batches) for _ in range(k)], mesh
            )
            rngs = jnp.stack(
                [jax.random.fold_in(rng, step + i) for i in range(k)]
            )
            fracs = jnp.asarray(
                [(step + i) / max_steps for i in range(k)], jnp.float32
            )
            state, stats = multi_step(state, stacked, rngs, fracs, occupancy)
        prev_step, step = step, step + k
        rays_since += config.batch_size * k

        if prof_started and not prof_stopped and step >= prof_stop_at:
            jax.profiler.stop_trace()
            prof_stopped = True

        if crossed(prev_step, step, config.print_every) or step == max_steps:
            stats = jax.device_get(stats)
            now = time.perf_counter()
            n_chips = jax.device_count()
            entry = {
                "step": step,
                "loss": float(stats["loss"]),
                "psnr": float(stats["psnr"]),
                "rays_per_sec": rays_since / (now - t_last),
                "rays_per_sec_per_chip": rays_since / (now - t_last) / n_chips,
                "grad_norm": float(stats["grad_norm"]),
                **{
                    f"loss_{k}": float(v)
                    for k, v in stats.get("loss_terms", {}).items()
                },
                # NGP marching parity counters when present (rm_s/vr_s).
                **{
                    k: float(stats[k])
                    for k in ("rm_s", "vr_s")
                    if k in stats
                },
            }
            history.append(entry)
            log_fn(json.dumps({k: round(v, 5) if isinstance(v, float) else v
                               for k, v in entry.items()}))
            writer.scalars(step, entry, prefix="train")
            t_last, rays_since = now, 0
            gc.collect()

        if crossed(prev_step, step, config.train_render_every):
            render_test_view(step, state, occupancy)

        # The checkpoint labeled N contains exactly N trained steps (resume
        # restores start_step=N and continues at step N). `crossed` makes any
        # cadence fire under K-step dispatch fusion; the final save triggers
        # on the loop's exit value, which is always exactly max_steps.
        if crossed(prev_step, step, config.checkpoint_every) or step == max_steps:
            # Orbax coordinates multi-host saves itself; every process calls.
            ckpt.save(
                step,
                jax.device_get({"state": state, "occupancy": occupancy}),
            )

    if prof_started and not prof_stopped:
        jax.profiler.stop_trace()  # window ran past max_steps
    gc.enable()
    writer.close()
    ckpt.wait()
    ckpt.close()
    return state, history, occupancy


def evaluate(
    config: Config,
    state,
    split: str = "test",
    max_images=None,
    log_fn=print,
    save_renders: bool = True,
    occupancy=None,
):
    """Render the split and compute PSNR/SSIM(/LPIPS) + depth metrics.

    With `save_renders`, writes `color_###.png`, `depth_###.png` (uint16
    metres*256, the dataset contract) and a color/depth/error side-by-side
    into `exp_dir/renders/` — the reference's test-pred dump
    (`mipnerf360/train.py:303-388`).
    """
    dataset = build_dataset(config, split)
    if hasattr(dataset, "scene_scale"):
        config = config.replace(depth_scale=float(dataset.scene_scale))
    mesh = parallel.make_mesh()
    model = step_lib.build_model(config)
    render_chunk = step_lib.make_render_fn(config, model, mesh)
    suite = metrics_lib.MetricSuite(
        compute_ssim=config.compute_ssim, compute_lpips=config.compute_lpips
    )

    render_dir = os.path.join(config.exp_dir, "renders")
    if save_renders:
        os.makedirs(render_dir, exist_ok=True)

    n = dataset.n_images if max_images is None else min(max_images, dataset.n_images)
    per_image = []
    eval_t0, eval_rays = time.perf_counter(), 0
    for i in range(n):
        batch = dataset.image_batch(i)
        eval_rays += dataset.height * dataset.width
        rendering = step_lib.render_image(
            render_chunk, state.params, batch, mesh, config.render_chunk_size,
            aux=occupancy,
        )
        m = suite(
            np.asarray(rendering["rgb"]),
            np.asarray(batch.rgb),
            pred_depth=np.asarray(rendering["distance_mean"]),
            gt_depth=None if batch.depth_gt is None else np.asarray(batch.depth_gt),
            depth_scale=config.depth_scale,
        )
        per_image.append(m)
        log_fn(json.dumps({"image": i, **{k: round(v, 4) for k, v in m.items()}}))

        if save_renders:
            from outdoor_nerf_depth_tpu.utils import image as image_lib
            from outdoor_nerf_depth_tpu.utils import vis as vis_lib

            rgb = np.asarray(rendering["rgb"])
            depth = np.asarray(rendering["distance_mean"]) / config.depth_scale
            image_lib.save_img_u8(rgb, os.path.join(render_dir, f"color_{i:03d}.png"))
            image_lib.save_depth_u16(
                depth, os.path.join(render_dir, f"depth_{i:03d}.png")
            )
            panels = [rgb, np.asarray(batch.rgb), vis_lib.visualize_depth(depth)]
            if batch.depth_gt is not None:
                panels.append(
                    vis_lib.depth_error_map(
                        depth, np.asarray(batch.depth_gt) / config.depth_scale
                    )
                )
            image_lib.save_img_u8(
                vis_lib.side_by_side(*panels),
                os.path.join(render_dir, f"summary_{i:03d}.png"),
            )

    mean = {
        k: float(np.mean([m[k] for m in per_image]))
        for k in per_image[0]
        if per_image[0][k] is not None
    }
    # test_rays_per_sec: the eval-side throughput counter the reference
    # tracks (`mipnerf360/train.py:258-262`). Includes compile time for the
    # first chunk shape; steady-state is higher.
    mean["test_rays_per_sec"] = eval_rays / (time.perf_counter() - eval_t0)
    log_fn(json.dumps({"split": split, "mean": {k: round(v, 4) for k, v in mean.items()}}))
    return mean, per_image
