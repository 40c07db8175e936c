"""Profile the NeRF++ bench step: jax.profiler trace -> top ops by self time.

Runs the exact bench.py workload (1024 rays, k=8 multi-step), captures a
device trace around two measured dispatches, then parses the perfetto
trace.json.gz and prints the top op categories. Usage:

  timeout 550 python -u benchmarks/probes/profile_step.py
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

TRACE_DIR = "/tmp/nerfpp_trace"


def main():
    import jax
    import jax.numpy as jnp

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import Config

    batch, k = 1024, 8
    config = Config(
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
    dataset = datasets_lib.SyntheticDataset(
        "train", global_batch_size=batch, n_images=8, height=94, width=310, seed=0
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

    def rngs_for(d):
        return jnp.stack([jax.random.fold_in(rng, d * k + i) for i in range(k)])

    for d in range(2):
        state, stats = multi_step(state, stacked, rngs_for(d), fracs)
    jax.block_until_ready(stats["loss"])

    t0 = time.perf_counter()
    for d in range(4):
        state, stats = multi_step(state, stacked, rngs_for(10 + d), fracs)
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0
    print(f"steady: {batch * k * 4 / dt:.0f} rays/s ({dt / (k * 4) * 1e3:.2f} ms/step)")

    jax.profiler.start_trace(TRACE_DIR)
    for d in range(2):
        state, stats = multi_step(state, stacked, rngs_for(20 + d), fracs)
    jax.block_until_ready(stats["loss"])
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no trace.json.gz produced; files:", glob.glob(TRACE_DIR + "/**/*", recursive=True))
        return
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # Aggregate complete events ('X') by pid-track; report device tracks.
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    by_track = collections.defaultdict(lambda: collections.Counter())
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        track = pid_names.get(ev.get("pid"), str(ev.get("pid")))
        by_track[track][ev.get("name", "?")] += ev.get("dur", 0)
    for track, ops in sorted(by_track.items()):
        total = sum(ops.values())
        if total == 0:
            continue
        print(f"\n== track: {track} (total {total/1e3:.1f} ms over 2 dispatches)")
        for name, dur in ops.most_common(25):
            print(f"  {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
