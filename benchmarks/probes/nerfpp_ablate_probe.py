"""NeRF++ 1024-ray step cost attribution by ablation (VERDICT r2 #5).

The K x batch sweep (nerfpp_mfu_probe) showed throughput flat in dispatch
fusion (K=8..128: ~38k rays/s) and flat-to-worse at 4096 rays — the floor
is neither dispatch latency nor small-GEMM tiling. This probe attributes
the ~26 us/ray by ablating one component at a time from the bench config
and timing the fused step:

  base      : the exact bench.py nerfpp_1024 shape
  width128  : net_width 256 -> 128     (MXU share: ~4x fewer matmul FLOPs)
  depth4    : net_depth 8 -> 4         (MXU + transcendental share)
  pe4       : pos_degrees 10 -> 4      (positional-encoding VPU share)
  coarse0   : cascade (64,) only       (hierarchical resampling share)
  samples32 : cascade (32,64)          (per-sample cost linearity)
  nodepth   : lambda_depth 0           (loss/metrics share)

Each config is a fresh tunnel compile (45s-10min); run with a generous
timeout: timeout 3600 python benchmarks/probes/nerfpp_ablate_probe.py
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


def measure(tag, model_overrides=None, config_overrides=None,
            batch=1024, k=8, n_meas=6):
    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import Config

    model_params = dict(
        cascade_samples=(64, 128), net_depth=8, net_width=256,
        pos_degrees=10, view_degrees=4, compute_dtype="bfloat16",
    )
    model_params.update(model_overrides or {})
    kwargs = dict(
        model="nerfpp",
        model_params=model_params,
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
    kwargs.update(config_overrides or {})
    config = Config(**kwargs)
    dataset = datasets_lib.SyntheticDataset(
        "train", global_batch_size=batch, n_images=8, height=94, width=310,
        seed=0,
    )
    mesh = parallel.make_mesh()
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
    t0 = time.perf_counter()
    for d in range(n_meas):
        state, stats = multi_step(state, stacked, rngs_for(100 + d), fracs)
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0
    return {
        "tag": tag,
        "step_ms": round(1000 * dt / (k * n_meas), 3),
        "rays_per_sec": round(batch * k * n_meas / dt, 1),
    }


ABLATIONS = [
    ("base", {}, {}),
    ("width128", {"net_width": 128}, {}),
    ("depth4", {"net_depth": 4}, {}),
    ("pe4", {"pos_degrees": 4}, {}),
    ("coarse0", {"cascade_samples": (64,)}, {}),
    ("samples32", {"cascade_samples": (32, 64)}, {}),
    ("nodepth", {}, {"lambda_depth": 0.0}),
]


def main():
    tags = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    results = []
    for tag, m_ov, c_ov in ABLATIONS:
        if tags and tag not in tags:
            continue
        r = measure(tag, m_ov, c_ov)
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"ablations": results}))


if __name__ == "__main__":
    main()
