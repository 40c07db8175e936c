"""Benchmark: train-step throughput + MFU across the three backend shapes.

Workloads (the paper's actual training budgets, BASELINE.md "Training
budgets"):
  * nerfpp_1024 — NeRF++ KITTI shape: 1024 rays/step, 2-level cascade
    64+128 fg samples, 8x256 MLPs (`nerfplusplus/configs/kitti.txt`),
    depth mse. THE primary metric (continuity with BENCH_r01/r02).
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
measured on this chip (STATUS r1). The cumulative headline JSON line is
printed after EVERY completed workload (the last line on stdout is always
the most complete one, even if the run is killed mid-way); the primary
value is rays/s/chip on nerfpp_1024, falling back to the best surviving
workload when nerfpp itself errors.

Harness design (VERDICT r2 #1, r4 weak #1 — the r2 artifact was 0.0
because one cold tunnel compile ate the whole alarm; the r4 artifact was
1-of-4 because the separate measure subprocess re-paid compiles the warm
subprocess had already done and the budget drained before NGP's turn):
  * every workload runs in its OWN subprocess — a wedged/poisoned tunnel
    connection dies with the child instead of the whole bench;
  * compile + warm dispatches + the timed window all happen in that ONE
    subprocess (single pass): nothing depends on a second process
    replaying the persistent .xla_cache, which programs containing
    while_loops demonstrably do not (r4: mip warm ok, measure rc=124);
  * workloads run NGP before mip, and each workload's timeout reserves a
    floor for the ones still queued, so the budget cannot drain before
    the later workloads get a turn;
  * transient failures (remote-compile HTTP 5xx, tunnel resets, timeouts)
    are retried with backoff — a retry after a mid-measure timeout DOES
    hit the persistent cache, same process lineage;
  * a global deadline bounds the worst case; whatever survives is
    reported, with the headline taken from the best surviving workload.

Baseline: the reference publishes no speed numbers; vs_baseline divides by
a documented ~3.5k rays/s/GPU NeRF++ estimate (RTX 2080 Ti class).
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json
import os
import signal
import subprocess
import sys
import time

ROOFLINE_TFLOPS = 115.0  # measured sustained bf16 matmul, this chip
REF_RAYS_PER_SEC_GPU = 3500.0  # documented estimate; see module docstring

# Per-workload timeout: one subprocess does compile + warm + measure, so
# this must cover a cold tunnel compile (45 s - 10+ min observed; cached
# reruns are ~1-2 min).
WORKLOAD_TIMEOUT_S = int(os.environ.get("ONDT_BENCH_WORKLOAD_TIMEOUT", 480))
# Floor reserved for each workload still queued after the current one, so
# an early slow workload cannot drain the whole budget (r4: nothing was
# left by the time ngp_8192 ran).
RESERVE_PER_QUEUED_S = int(os.environ.get("ONDT_BENCH_RESERVE", 120))
RETRIES = int(os.environ.get("ONDT_BENCH_RETRIES", 1))
# Total budget sized to the driver window the r1 capture demonstrably fit
# (~15-20 min), NOT the r3 value of 3300 s (which the driver killed at
# rc=124 before a single JSON line printed — VERDICT r3 #1). The headline
# JSON is now ALSO printed cumulatively after every completed workload, so
# even a kill mid-run leaves the latest parseable line.
TOTAL_BUDGET_S = int(os.environ.get("ONDT_BENCH_TOTAL_BUDGET", 1020))
RETRY_BACKOFF_S = 15

# Ordered fallback for the headline metric (nerfpp first: continuity with
# BENCH_r01/r02).
HEADLINE_ORDER = ("nerfpp_1024", "mip_4096", "ngp_8192", "ngp_eval")


def _check_no_accum(config):
    # cost_analysis counts the grad-accumulation inner lax.scan body once,
    # so an accumulating config would silently undercount MFU by n_accum
    # (same class of bug as the r2 K-step undercount). Keep bench configs
    # accumulation-free rather than guessing a correction.
    if max(1, config.grad_accum_steps) != 1:
        raise ValueError("bench configs must not enable grad accumulation")


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
    # XLA cost analysis counts a lax.scan/while BODY once, not x trip
    # count: a K-step fused dispatch reports 1-step flops. Scale by
    # steps_per_dispatch (the r2 "nerfpp 7.6% MFU" was this 8x undercount
    # — the r3 K-sweep probe shows mfu*K invariant at ~59%).
    tflops = (flops_per_dispatch * steps_per_dispatch * n_meas
              / dt / 1e12 / n_chips)
    return {
        "rays_per_sec_per_chip": round(rays_per_dispatch * n_meas / dt / n_chips, 1),
        "steps_per_sec": round(steps_per_dispatch * n_meas / dt, 2),
        "tflops_per_sec_per_chip": round(tflops, 2),
        "mfu_pct": round(100.0 * tflops / ROOFLINE_TFLOPS, 2),
    }


def bench_nerfpp(measure=True):
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
    _check_no_accum(config)
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
    for d in range(2 if measure else 1):
        state, stats = multi_step(state, stacked, rngs_for(d), fracs)
    jax.block_until_ready(stats["loss"])
    if not measure:
        return {"warmed": True}
    flops = _flops_of(multi_step.jitted, (state, stacked, rngs_for(0), fracs, None))

    n_meas = 8
    t0 = time.perf_counter()
    for d in range(n_meas):
        state, stats = multi_step(state, stacked, rngs_for(100 + d), fracs)
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0
    return {"batch": batch, "steps_per_dispatch": k,
            **_summarize(batch * k, n_meas, dt, n_chips, flops, k)}


def bench_mip(measure=True):
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
    _check_no_accum(config)
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
    for i in range(2 if measure else 1):
        state, stats = train_step(
            state, batches[i % 4], jax.random.fold_in(rng, i), 0.5
        )
    jax.block_until_ready(stats["loss"])
    if not measure:
        return {"warmed": True}
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
    _check_no_accum(config)
    dataset = datasets_lib.SyntheticDataset(
        "train", global_batch_size=batch, n_images=8, height=94, width=310,
        seed=0,
    )
    mesh = parallel.make_mesh()
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
    state = parallel.put_replicated(state, mesh)
    return config, dataset, mesh, model, state, occ_lib, step_lib


def bench_ngp_train(measure=True):
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
    for i in range(3 if measure else 1):
        state, stats = train_step(
            state, batches[i % 4], jax.random.fold_in(rng, i), 0.5, grid
        )
    jax.block_until_ready(stats["loss"])
    # Warm the steady-state occupancy refresh OUTSIDE the timed loop in
    # both passes: the measure subprocess replays it from the persistent
    # cache, but its first dispatch still pays program load — ~2 s inside
    # the timed window read as a 12% throughput loss (r3: 9.6k vs the
    # probe's 10.9k rays/s).
    grid = occ_update(state.params, grid, jax.random.fold_in(rng, 9), False)
    jax.block_until_ready(grid)
    if not measure:
        return {"warmed": True}
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


def bench_ngp_eval(measure=True):
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
        if not measure:
            continue
        n_meas = 10
        t0 = time.perf_counter()
        for _ in range(n_meas):
            r = render(params, chunk, grid)
            float(jnp.sum(r["rgb"]))
        dt = time.perf_counter() - t0
        out[f"{mode}_rays_per_sec_per_chip"] = round(
            batch * n_meas / dt / n_chips, 1
        )
    if not measure:
        return {"warmed": True}
    out["speedup"] = round(
        out["iterative_rays_per_sec_per_chip"]
        / out["train_rays_per_sec_per_chip"], 2,
    )
    out["batch"] = batch
    # Headline compatibility: the faster of the two render paths.
    out["rays_per_sec_per_chip"] = max(
        out["iterative_rays_per_sec_per_chip"],
        out["train_rays_per_sec_per_chip"],
    )
    return out


def bench_selftest(measure=True):
    """Instant fake workload for testing the subprocess harness itself.

    Behavior keyed by ONDT_BENCH_SELFTEST_MODE: "ok" (default) returns a
    tiny result; "flaky" fails with a retryable error until the attempt
    counter file says otherwise; "hang" sleeps forever (timeout path);
    "fatal" raises a non-retryable error.
    """
    mode = os.environ.get("ONDT_BENCH_SELFTEST_MODE", "ok")
    if mode == "hang":
        time.sleep(3600)
    if mode == "fatal":
        raise ValueError("deterministic config error")
    if mode == "flaky":
        counter = os.environ["ONDT_BENCH_SELFTEST_COUNTER"]
        n = int(open(counter).read()) if os.path.exists(counter) else 0
        with open(counter, "w") as f:
            f.write(str(n + 1))
        if n == 0:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:1/remote_compile: HTTP 500"
            )
    if not measure:
        return {"warmed": True}
    return {"batch": 1, "rays_per_sec_per_chip": 123.0, "steps_per_sec": 1.0,
            "tflops_per_sec_per_chip": 0.0, "mfu_pct": 0.0}


# Execution order: nerfpp first (headline continuity with BENCH_r01/r02),
# then the NGP pair BEFORE mip — the r4 budget drained on mip retries with
# the NGP numbers still unmeasured (VERDICT r4 #1).
BENCHES = {
    "nerfpp_1024": ("nerfpp", bench_nerfpp),
    "ngp_8192": ("ngp", bench_ngp_train),
    "ngp_eval": ("ngp_eval", bench_ngp_eval),
    "mip_4096": ("mip", bench_mip),
    # Harness self-test; excluded from the default workload list.
    "_selftest": ("_selftest", bench_selftest),
}

# Error-text markers of transient tunnel/compile-service failures worth
# retrying (BENCH_r02 recorded exactly these as final results).
_RETRYABLE_MARKERS = (
    "remote_compile", "HTTP 5", "INTERNAL", "UNAVAILABLE", "DEADLINE",
    "Connection", "timeout", "Timeout", "Socket", "RESOURCE_EXHAUSTED",
)


def _is_retryable(err_text: str) -> bool:
    return any(m in err_text for m in _RETRYABLE_MARKERS)


def run_child(name: str, warm: bool) -> int:
    """Child mode: run one workload, print one JSON result line."""
    fn = BENCHES[name][1]
    try:
        result = fn(measure=not warm)
        print(json.dumps({"ok": True, "result": result}), flush=True)
        return 0
    except Exception as e:
        text = f"{type(e).__name__}: {e}"[:400]
        print(
            json.dumps(
                {"ok": False, "error": text, "retryable": _is_retryable(text)}
            ),
            flush=True,
        )
        return 1


def _spawn(name: str, warm: bool, timeout_s: int):
    """Run one workload in a fresh subprocess; parse its JSON line.

    Returns a dict: {"ok": ..., ...} or {"ok": False, "error": ...,
    "retryable": ...}. Kills the exact child process group on timeout —
    never pattern-based kills.
    """
    cmd = [sys.executable, os.path.abspath(__file__), "--workload", name]
    if warm:
        cmd.append("--warm")
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        start_new_session=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    try:
        out, err = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        proc.wait()
        return {
            "ok": False,
            "error": f"timeout after {timeout_s}s ({'warm' if warm else 'measure'})",
            "retryable": True,
        }
    dt = time.perf_counter() - t0
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
                parsed["elapsed_s"] = round(dt, 1)
                return parsed
            except json.JSONDecodeError:
                continue
    tail = (err or out or "").strip().splitlines()[-3:]
    text = f"child exited rc={proc.returncode} with no JSON: " + " | ".join(tail)
    return {"ok": False, "error": text[:400], "retryable": _is_retryable(text)}


def _run_workload(name: str, deadline: float, n_queued: int = 0):
    """Run one workload single-pass (compile + warm + measure in one child).

    `n_queued` is the number of workloads still waiting after this one:
    their reserve is subtracted from this workload's timeout so the global
    budget cannot drain before they get a turn.
    """
    last = None
    for i in range(1 + RETRIES):
        remaining = deadline - time.monotonic()
        usable = remaining - RESERVE_PER_QUEUED_S * n_queued
        if usable < 45:
            return last and {"error": last.get("error", "unknown")} or {
                "error": "global bench budget exhausted"
            }
        budget = int(min(WORKLOAD_TIMEOUT_S, usable))
        print(
            f"[bench] {name} attempt {i + 1} (timeout {budget}s)",
            file=sys.stderr,
            flush=True,
        )
        last = _spawn(name, warm=False, timeout_s=budget)
        if last.get("ok"):
            return last["result"]
        if not last.get("retryable"):
            return {"error": last.get("error", "unknown")}
        time.sleep(min(RETRY_BACKOFF_S, max(0, deadline - time.monotonic())))
    return {"error": last.get("error", "unknown")}


def _headline_json(results, n_chips):
    """Cumulative headline line from whatever has been measured so far."""
    headline_workload, value = None, 0.0
    for name in HEADLINE_ORDER:
        r = results.get(name, {})
        v = r.get("rays_per_sec_per_chip", 0.0)
        if v > 0:
            headline_workload, value = name, v
            break
    return json.dumps(
        {
            "metric": "rays_per_sec_per_chip",
            "value": value,
            "unit": "rays/s/chip",
            # The reference publishes no speed numbers; this divides by a
            # documented ~3.5k rays/s/GPU NeRF++ estimate, NOT a measured
            # baseline (VERDICT r3 #8).
            "vs_baseline": round(value / REF_RAYS_PER_SEC_GPU, 3),
            "baseline_kind": "estimate",
            "headline_workload": headline_workload,
            "roofline_tflops": ROOFLINE_TFLOPS,
            "n_chips": n_chips,
            "workloads": results,
        }
    )


def main():
    import jax

    wanted = os.environ.get(
        "ONDT_BENCH_WORKLOADS", "nerfpp,mip,ngp,ngp_eval"
    ).split(",")
    n_chips = jax.device_count()
    deadline = time.monotonic() + TOTAL_BUDGET_S
    results = {}
    queue = [
        name for name, (key, _) in BENCHES.items() if key in wanted
    ]
    # The headline JSON is (re)printed cumulatively after EVERY completed
    # workload: if the driver kills the bench mid-run, the last parseable
    # line still carries everything measured so far (VERDICT r3 #1a).
    for pos, name in enumerate(queue):
        results[name] = _run_workload(
            name, deadline, n_queued=len(queue) - pos - 1
        )
        print(_headline_json(results, n_chips), flush=True)
    if not queue:
        # Always-one-line contract (ADVICE r4 #3): an empty workload
        # filter still prints a parseable (zero-valued) headline.
        print(_headline_json(results, n_chips), flush=True)


if __name__ == "__main__":
    if "--workload" in sys.argv:
        idx = sys.argv.index("--workload")
        sys.exit(run_child(sys.argv[idx + 1], warm="--warm" in sys.argv))
    main()
