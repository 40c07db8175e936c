"""Train-step / render-step factories: jit + NamedSharding over a data mesh.

Capability parity with the reference's pmap machinery
(`/root/reference/nerf-methods/mipnerf360/internal/train_utils.py:242-439`),
re-designed for the jax.Array era: instead of `pmap` + explicit `lax.pmean`,
the step is `jit`-compiled over a `Mesh` with the batch sharded on the
`data` axis and params replicated — XLA inserts the gradient all-reduce
(psum over ICI/DCN) and overlaps it with the backward pass. Buffers are
donated, so optimizer state updates in place in HBM.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from outdoor_nerf_depth_tpu import models as models_lib
from outdoor_nerf_depth_tpu import parallel
from outdoor_nerf_depth_tpu.data import cameras as cameras_lib
from outdoor_nerf_depth_tpu.data import rays as rays_lib
from outdoor_nerf_depth_tpu.ops import mathx
from outdoor_nerf_depth_tpu.train import losses as losses_lib
from outdoor_nerf_depth_tpu.train import metrics as metrics_lib
from outdoor_nerf_depth_tpu.train.config import Config


def tree_norm(tree):
    return jnp.sqrt(
        sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(tree))
    )


def build_model(config: Config):
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    params = dict(config.model_params or {})
    params.setdefault("compute_dtype", dtype)
    if isinstance(params["compute_dtype"], str):
        params["compute_dtype"] = (
            jnp.bfloat16 if params["compute_dtype"] == "bfloat16" else jnp.float32
        )
    if config.model == "mipnerf360":
        params.setdefault("nerf_mlp_params", config.nerf_mlp_params or None)
        params.setdefault("prop_mlp_params", config.prop_mlp_params or None)
        params.setdefault("vis_num_rays", config.vis_num_rays)
    return models_lib.build(config.model, **params)


def checkpoint_meta(config: Config, model) -> dict:
    """Model-identity facts a checkpoint restore must agree on.

    Restoring a hash-grid table trained under one layout into a model using
    the other layout deserializes fine (same [L, T, F] shape) but renders
    garbage — the layouts hash differently. The train loop stores this dict
    as a sidecar and `load_checkpoint`/resume verify it (ADVICE r2, high).
    """
    meta = {"model": config.model}
    layout = getattr(
        model, "effective_hash_layout", getattr(model, "hash_layout", None)
    )
    if layout is not None:
        # oct and quad pack the same fully-linear hash differently, so
        # their trained tables are interchangeable; corner's XOR hash is
        # not. The sidecar records the hash FUNCTION, the actual invariant.
        meta["hash_function"] = "corner" if layout == "corner" else "linear"
    return meta


def make_optimizer(config: Config) -> Tuple[optax.GradientTransformation, Callable]:
    lr_fn = functools.partial(
        mathx.lr_schedule,
        lr_init=config.lr_init,
        lr_final=config.lr_final,
        max_steps=config.max_steps,
        warmup_steps=config.lr_delay_steps,
        warmup_mult=config.lr_delay_mult,
    )
    tx = optax.adam(
        learning_rate=lr_fn,
        b1=config.adam_beta1,
        b2=config.adam_beta2,
        eps=config.adam_eps,
    )
    return tx, lr_fn


def init_state(config: Config, rng) -> Tuple[Any, TrainState]:
    """Build the model and a TrainState initialized on a tiny dummy batch."""
    model = build_model(config)
    variables = model.init(
        rng,
        rng=None,
        rays=rays_lib.dummy_rays((8,)),
        train_frac=1.0,
        compute_extras=False,
    )
    tx, _ = make_optimizer(config)
    state = TrainState.create(apply_fn=model.apply, params=variables, tx=tx)
    return model, state


def clip_gradients(grad, config: Config):
    """Per-top-level-module value+norm clipping (reference
    `train_utils.py:221-239` semantics)."""
    if config.grad_max_val <= 0 and config.grad_max_norm <= 0:
        return grad
    clipped = {}
    for name, g in grad["params"].items():
        if config.grad_max_val > 0:
            g = jax.tree_util.tree_map(
                lambda z: jnp.clip(z, -config.grad_max_val, config.grad_max_val), g
            )
        if config.grad_max_norm > 0:
            mult = jnp.minimum(
                1.0, config.grad_max_norm / (1e-12 + tree_norm(g))
            )
            g = jax.tree_util.tree_map(lambda z, m=mult: m * z, g)
        clipped[name] = g
    out = dict(grad)
    out["params"] = clipped
    return out


def _total_loss(config: Config, model, batch, renderings, ray_history, rays):
    """Assemble the loss dict + stats for one forward pass."""
    stats = {}
    loss_terms = {}

    rgb_losses, mses, depth_losses = [], [], []
    use_depth = config.lambda_depth > 0 and batch.depth_sup is not None
    for i, rendering in enumerate(renderings):
        rgb_pred = rendering["rgb"]
        if "autoexpo_scale" in rendering:
            # Learned per-image exposure: normalize the prediction back to
            # the canonical exposure before comparing (reference
            # `ddp_train_nerf.py:472-479`).
            rgb_pred = (rgb_pred - rendering["autoexpo_shift"]) / rendering[
                "autoexpo_scale"
            ]
        rl, mse = losses_lib.rgb_loss(
            rgb_pred,
            batch.rgb[..., :3],
            lossmult=rays.lossmult,
            kind=config.data_loss_type,
            charb_padding=config.charb_padding,
        )
        rgb_losses.append(rl)
        mses.append(mse)
        if use_depth:
            depth_losses.append(
                losses_lib.depth_loss_from_history(
                    ray_history[i],
                    batch.depth_sup,
                    rendering.get("distance_mean", rendering.get("depth")),
                    rays.directions,
                    sigma=config.depth_sigma * config.depth_scale,
                    kind=config.depth_loss_type,
                    reduce=config.depth_loss_reduce,
                    fg_far_mask=config.depth_fg_far_mask,
                )
            )

    rgb_losses = jnp.array(rgb_losses)
    loss_terms["data"] = (
        config.data_coarse_loss_mult * jnp.sum(rgb_losses[:-1])
        + config.data_loss_mult * rgb_losses[-1]
    )
    if use_depth:
        dl = jnp.array(depth_losses)
        loss_terms["depth"] = config.lambda_depth * (
            config.data_coarse_loss_mult * jnp.sum(dl[:-1])
            + config.data_loss_mult * dl[-1]
        )

    has_sdist = "sdist" in ray_history[0]
    if config.interlevel_loss_mult > 0 and len(ray_history) > 1 and has_sdist:
        loss_terms["interlevel"] = (
            config.interlevel_loss_mult * losses_lib.interlevel_loss(ray_history)
        )
    if config.distortion_loss_mult > 0 and (
        has_sdist or "steps" in ray_history[-1]
    ):
        loss_terms["distortion"] = (
            config.distortion_loss_mult * losses_lib.distortion_loss(ray_history)
        )
    if config.orientation_loss_mult > 0 or config.orientation_coarse_loss_mult > 0:
        loss_terms["orientation"] = losses_lib.orientation_loss(
            ray_history,
            rays.viewdirs,
            config.orientation_coarse_loss_mult,
            config.orientation_loss_mult,
            target=config.orientation_loss_target,
        )
    if (
        config.predicted_normal_loss_mult > 0
        or config.predicted_normal_coarse_loss_mult > 0
    ):
        loss_terms["predicted_normals"] = losses_lib.predicted_normal_loss(
            ray_history,
            config.predicted_normal_coarse_loss_mult,
            config.predicted_normal_loss_mult,
        )
    if config.opacity_loss_mult > 0 and "acc" in renderings[-1]:
        loss_terms["opacity"] = (
            config.opacity_loss_mult
            * losses_lib.opacity_entropy_loss(renderings[-1]["acc"])
        )
    if config.autoexpo_loss_mult > 0 and "autoexpo_scale" in renderings[-1]:
        loss_terms["autoexpo"] = config.autoexpo_loss_mult * losses_lib.autoexposure_reg(
            renderings[-1]["autoexpo_scale"], renderings[-1]["autoexpo_shift"]
        )

    stats["mses"] = jnp.array(mses)
    stats["psnrs"] = metrics_lib.mse_to_psnr(stats["mses"])
    stats["psnr"] = stats["psnrs"][-1]
    # NGP marching-efficiency counters (reference rm_s/vr_s,
    # `ngp-depth/train.py:186-189`): mean occupied candidates and mean valid
    # rendered samples per ray this step.
    if "rm_per_ray" in renderings[-1]:
        stats["rm_s"] = jnp.mean(renderings[-1]["rm_per_ray"].astype(jnp.float32))
        stats["vr_s"] = jnp.mean(renderings[-1]["vr_per_ray"].astype(jnp.float32))
    return loss_terms, stats


def _build_step_fn(config: Config, model, cameras=None, camtype="perspective"):
    """The un-jitted train step: (state, batch, rng, train_frac, aux) ->
    (state, stats). Shared by `make_train_step` (one step per dispatch) and
    `make_multi_train_step` (lax.scan over K steps per dispatch)."""
    cams_dev = None
    if cameras is not None:
        cams_dev = tuple(
            jnp.asarray(c) if c is not None and not isinstance(c, dict) else c
            for c in cameras
        )
    # Models with functional sampler state (the NGP occupancy grid) receive
    # it as a kwarg; `aux=None` is a no-op for the others.
    from outdoor_nerf_depth_tpu.models.ngp import HashGridModel

    takes_occupancy = isinstance(model, HashGridModel)

    def step(state, batch, rng, train_frac, aux=None):
        rays = batch.rays
        if isinstance(rays, rays_lib.Pixels):
            rays = cameras_lib.cast_pixels(rays, cams_dev, camtype, xnp=jnp)
        model_kwargs = {"occupancy": aux} if takes_occupancy else {}

        compute_extras = config.lambda_depth > 0 and config.depth_loss_type in (
            "mse",
            "l1",
            "urf",
            "nll",
        )

        def forward(params, step_rng, fwd_rays, frac):
            return model.apply(
                params,
                step_rng,
                fwd_rays,
                train_frac=frac,
                compute_extras=compute_extras,
                zero_glo=False,
                **model_kwargs,
            )

        if config.remat != "none":
            # Recompute the forward during backward instead of holding its
            # activations in HBM (jax.checkpoint). "dots" keeps matmul
            # outputs (recompute is elementwise-only); "full" keeps nothing.
            policy = (
                jax.checkpoint_policies.checkpoint_dots
                if config.remat == "dots"
                else None
            )
            forward = jax.checkpoint(forward, policy=policy)

        def loss_fn(params, c_batch, c_rays, c_rng):
            renderings, ray_history = forward(
                params,
                c_rng if config.randomized else None,
                c_rays,
                train_frac,
            )
            loss_terms, stats = _total_loss(
                config, model, c_batch, renderings, ray_history, c_rays
            )
            if config.weight_decay_mults:
                wd = 0.0
                for k, mult in config.weight_decay_mults.items():
                    sub = params["params"].get(k)
                    if sub is not None:
                        wd += mult * sum(
                            jnp.sum(x**2) for x in jax.tree_util.tree_leaves(sub)
                        )
                loss_terms["weight"] = wd
            total = sum(loss_terms.values())
            stats["loss_terms"] = {k: v for k, v in loss_terms.items()}
            stats["loss"] = total
            return total, stats

        n_accum = max(1, config.grad_accum_steps)
        if n_accum == 1:
            (_, stats), grad = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rays, rng
            )
        else:
            # Microbatching: scan K sequential chunks, summing gradients.
            # Peak activation memory is one chunk's; XLA keeps only the
            # accumulator (same dtype/shape as params) live across chunks.
            def chunked(x):
                return x.reshape((n_accum, x.shape[0] // n_accum) + x.shape[1:])

            chunks = jax.tree_util.tree_map(chunked, (batch, rays))
            keys = (
                jax.random.split(rng, n_accum)
                if rng is not None
                else jnp.zeros((n_accum, 2), jnp.uint32)
            )

            def body(grad_acc, inp):
                (c_batch, c_rays), key = inp
                (_, s), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, c_batch, c_rays, key
                )
                return jax.tree_util.tree_map(jnp.add, grad_acc, g), s

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            grad, stats_stack = jax.lax.scan(body, zeros, (chunks, keys))
            grad = jax.tree_util.tree_map(lambda g: g / n_accum, grad)
            # Chunk-mean every stacked stat (losses are per-chunk means of
            # equal-size chunks, so this equals the full-batch value for
            # mean_all reductions).
            stats = jax.tree_util.tree_map(
                lambda s: jnp.mean(s, axis=0), stats_stack
            )

        # No explicit pmean: the loss averages over the *global* sharded
        # batch, so reverse-mode AD emits the cross-device reduction and XLA
        # schedules it as an all-reduce overlapped with backward.
        stats["grad_norm"] = tree_norm(grad["params"])
        grad = clip_gradients(grad, config)
        grad = jax.tree_util.tree_map(jnp.nan_to_num, grad)
        new_state = state.apply_gradients(grads=grad)
        return new_state, stats

    return step


def _configure_pallas_scan(mesh):
    # The hash-grid backward's Pallas prefix scan cannot be auto-partitioned
    # by SPMD (the scan carry crosses shard boundaries): enable the direct
    # path only for single-device meshes. Multi-device meshes instead route
    # the table-gradient reduction through a shard_map (per-device segment
    # sums + psum, `hashgrid._row_sums_for_grad`), where the Pallas kernel
    # is legal per device; `set_grad_mesh` binds the mesh for that. Both
    # globals are re-bound by the step wrappers right before dispatch, so
    # the values are correct when jit traces (first call).
    from outdoor_nerf_depth_tpu.ops import hashgrid, pallas_scan

    pallas_scan.set_enabled(len(mesh.devices.flat) == 1)
    hashgrid.set_grad_mesh(mesh)


def make_train_step(config: Config, model, mesh, cameras=None, camtype="perspective"):
    """Compile the sharded train step.

    Returns step(state, batch, rng, train_frac) -> (state, stats). `state` is
    replicated and donated; `batch` leaves are sharded on the data axis. When
    `cameras` is given, batches may carry `Pixels` and rays are cast on
    device inside the step (the reference's `cast_rays_in_train_step` fast
    path, now inside the jit so it fuses with the model).
    """
    _configure_pallas_scan(mesh)
    step = _build_step_fn(config, model, cameras, camtype)
    repl = parallel.replicated(mesh)
    data = parallel.batch_sharding(mesh)
    # `data` acts as a pytree prefix: every leaf of the batch shards its
    # leading (ray) axis across the mesh.
    jitted = jax.jit(
        step,
        in_shardings=(repl, data, repl, None, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    def call(state, batch, rng, train_frac, aux=None):
        # Re-bind right before dispatch: jit traces on the FIRST call, and
        # another factory (different mesh) may have re-bound the globals
        # since this factory ran.
        _configure_pallas_scan(mesh)
        return jitted(state, batch, rng, train_frac, aux)

    call.jitted = jitted  # exposes .lower() for AOT cost analysis (bench.py)
    return call


def make_multi_train_step(
    config: Config, model, mesh, cameras=None, camtype="perspective"
):
    """Compile K optimizer steps fused into ONE dispatch (lax.scan).

    At the reference's KITTI budget (1024 rays/step) a single step is
    host-dispatch-latency bound on TPU; scanning K steps inside one XLA
    program amortizes that latency while keeping the math bit-identical to K
    sequential `make_train_step` calls (same per-step rngs, batches, fracs).

    Returns multi(state, batches, rngs, train_fracs, aux=None) where every
    leaf of `batches` is stacked on a leading K axis (ray axis = axis 1,
    sharded over the mesh), `rngs` is [K] PRNG keys, `train_fracs` is a [K]
    float array. Stats returned are the final step's.
    """
    _configure_pallas_scan(mesh)
    step = _build_step_fn(config, model, cameras, camtype)

    def multi(state, batches, rngs, train_fracs, aux=None):
        def body(carry, inp):
            b, key, frac = inp
            new_carry, stats = step(carry, b, key, frac, aux)
            return new_carry, stats

        state, stats_stack = jax.lax.scan(body, state, (batches, rngs, train_fracs))
        stats = jax.tree_util.tree_map(lambda s: s[-1], stats_stack)
        return state, stats

    repl = parallel.replicated(mesh)
    data_stack = parallel.stacked_batch_sharding(mesh)
    jitted = jax.jit(
        multi,
        in_shardings=(repl, data_stack, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    def call(state, batches, rngs, train_fracs, aux=None):
        _configure_pallas_scan(mesh)  # see make_train_step.call
        return jitted(state, batches, rngs, train_fracs, aux)

    call.jitted = jitted  # exposes .lower() for AOT cost analysis (bench.py)
    return call


def load_checkpoint(config: Config, rng=None):
    """Restore (model, state, occupancy, step) from config.exp_dir.

    The single restore entry point for eval/render/viewer CLIs — builds the
    template (including the NGP occupancy grid when applicable) and loads
    the latest bundle saved by the training loop.
    """
    import os

    from outdoor_nerf_depth_tpu.models.ngp import HashGridModel
    from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib
    from outdoor_nerf_depth_tpu.train import checkpoints as ckpt_lib

    if rng is None:
        rng = jax.random.PRNGKey(config.seed)
    model, state = init_state(config, rng)
    occupancy = (
        occ_lib.init_grid(model.scale, model.grid_resolution)
        if isinstance(model, HashGridModel)
        else None
    )
    if config.slim_checkpoint:
        payload = ckpt_lib.load_slim(config.slim_checkpoint)
        expected = checkpoint_meta(config, model)
        stored = payload.get("meta", {})
        mismatches = {
            k: (stored[k], expected[k])
            for k in expected
            if k in stored and stored[k] != expected[k]
        }
        if mismatches:
            raise ValueError(
                f"slim checkpoint {config.slim_checkpoint!r} was written "
                f"by an incompatible model configuration: {mismatches}"
            )
        if "occupancy" in payload:
            occupancy = jnp.asarray(payload["occupancy"])
        return (
            model,
            state.replace(params=payload["params"]),
            occupancy,
            int(payload.get("step", 0)),
        )
    ckpt_dir = os.path.join(config.exp_dir, "checkpoints")
    ckpt_lib.check_model_meta(ckpt_dir, checkpoint_meta(config, model))
    ckpt = ckpt_lib.CheckpointManager(
        ckpt_dir, keep=config.keep_checkpoints
    )
    restored, step = ckpt.restore({"state": state, "occupancy": occupancy})
    ckpt.close()
    return model, restored["state"], restored["occupancy"], step


def make_occupancy_update_fn(config: Config, model, mesh):
    """Compile the NGP occupancy-grid refresh; None for gridless models.

    Returns update(params, grid, rng, warmup: bool) -> grid. Warmup sweeps
    every cell; steady state refreshes a sampled subset (reference
    `networks.py:240-269` cadence, here one jitted scatter-max).
    """
    from outdoor_nerf_depth_tpu.models.ngp import HashGridModel
    from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib

    if not isinstance(model, HashGridModel):
        return None
    repl = parallel.replicated(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl),
        out_shardings=repl,
        static_argnums=(3,),
    )
    def update(params, grid, rng, warmup):
        # Pack the hash table once per refresh: the chunked lax.map sweep
        # would otherwise rebuild it (~0.5 GB HBM traffic) per chunk.
        prepared = model.apply(params, method=HashGridModel.prepare_tables)
        density_fn = lambda pts: model.apply(
            params, pts, prepared, method=HashGridModel.density
        )
        return occ_lib.update_grid(
            rng,
            grid,
            density_fn,
            model.scale,
            decay=config.occupancy_decay,
            n_per_cascade=0 if warmup else config.occupancy_cells_per_update,
            threshold=model.density_threshold,
        )

    return update


def make_render_fn(config: Config, model, mesh):
    """Compile the chunked eval renderer (deterministic, full extras).

    For the NGP model with a trained occupancy grid, dispatches to the
    iterative alive-ray renderer (`HashGridModel.render_eval`, the analog of
    the reference's test path `ngp-depth/models/rendering.py:46-118`) unless
    `config.ngp_eval_renderer == "train"`; gridless calls (occupancy None)
    fall back to the dense train-path renderer, which is always correct.
    """
    repl = parallel.replicated(mesh)
    data = parallel.batch_sharding(mesh)
    from outdoor_nerf_depth_tpu.models.ngp import HashGridModel

    takes_occupancy = isinstance(model, HashGridModel)
    iterative = takes_occupancy and config.ngp_eval_renderer == "iterative"

    @functools.partial(
        jax.jit, in_shardings=(repl, data, repl), out_shardings=repl
    )
    def render_chunk(params, rays, aux=None):
        if iterative and aux is not None:
            return model.apply(
                params, rays, aux, method=HashGridModel.render_eval
            )
        kwargs = {"occupancy": aux} if takes_occupancy else {}
        renderings, _ = model.apply(
            params, None, rays, train_frac=1.0, compute_extras=True, **kwargs
        )
        final = renderings[-1]
        return {k: v for k, v in final.items() if not k.startswith("ray_")}

    return render_chunk


def render_image(render_chunk, params, batch, mesh, chunk_size: int = 16384,
                 aux=None):
    """Render a full image by chunking rays through the jitted renderer.

    Chunks are padded to the device count, sharded, rendered, gathered, and
    reassembled to [H, W, ...] (reference `models.py:626-707`, without the
    host-0-only gather: jax.Array addressability handles it). Multi-process:
    every process holds the full (host-cast) chunk, slices out its own
    1/process_count (the contract of `parallel.shard_batch`), and reads the
    replicated output back — the reference's per-host ray slicing
    (`models.py:670-672`) without an explicit gather.
    """
    rays = batch.rays
    h, w = rays.origins.shape[:2]
    flat = jax.tree_util.tree_map(
        lambda r: r.reshape((h * w,) + r.shape[2:]), rays
    )
    n_dev = len(mesh.devices.flat)
    n_proc = jax.process_count()
    pi = jax.process_index()
    outs = []
    for start in range(0, h * w, chunk_size):
        chunk = jax.tree_util.tree_map(
            lambda r: r[start : start + chunk_size], flat
        )
        chunk, pad = rays_lib.pad_to_multiple(chunk, n_dev)
        if n_proc > 1:
            def local_slice(r):
                per = r.shape[0] // n_proc
                return r[pi * per : (pi + 1) * per]

            chunk = jax.tree_util.tree_map(local_slice, chunk)
        chunk = parallel.shard_batch(chunk, mesh)
        out = render_chunk(params, chunk, aux)
        out = jax.device_get(out)
        if pad:
            out = jax.tree_util.tree_map(lambda x: x[: len(x) - pad], out)
        outs.append(out)
    merged = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *outs
    )
    return jax.tree_util.tree_map(
        lambda x: x.reshape((h, w) + x.shape[1:]), merged
    )
