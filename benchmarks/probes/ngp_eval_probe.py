"""NGP eval renderer: dense train-path vs iterative, across chunk sizes.

VERDICT r4 weak #3 / next #8: with osplit tables the iterative renderer's
early termination no longer beats the dense path (0.97x) at chunk 8192.
This probe measures both paths at several chunk sizes (eval has no
backward, so much larger chunks fit HBM and amortize fixed per-dispatch
cost), on the converged-opaque-shell scenario the reference's test-path
headline measures. The outcome decides config.ngp_eval_renderer's
default.

    timeout 2400 python benchmarks/probes/ngp_eval_probe.py
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
import numpy as np

CHUNKS = tuple(
    int(c) for c in os.environ.get(
        "ONDT_PROBE_CHUNKS", "8192,16384,32768"
    ).split(",")
)


def main():
    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import rays as rays_lib
    import bench

    results = {}
    for chunk_size in CHUNKS:
        config, dataset, mesh, model, state, occ_lib, step_lib = (
            bench._ngp_setup(chunk_size, max_samples=64)
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
        centers = (coords + 0.5) / res - 0.5
        radius = np.linalg.norm(centers, axis=-1)
        shell = (radius > 0.25) & (radius < 0.32)
        grid = occ_lib.init_grid(model.scale, res)
        grid = grid.at[0].set(jnp.where(jnp.asarray(shell), 1.0, 0.0))
        grid = parallel.put_replicated(grid, mesh)

        batch_img = dataset.image_batch(0)
        h, w = batch_img.rays.origins.shape[:2]
        flat = jax.tree_util.tree_map(
            lambda r: r.reshape((h * w,) + r.shape[2:]), batch_img.rays
        )
        reps = -(-chunk_size // (h * w))
        flat = jax.tree_util.tree_map(
            lambda r: jnp.concatenate([r] * reps)[:chunk_size], flat
        )
        chunk, _ = rays_lib.pad_to_multiple(flat, n_chips)
        chunk = parallel.shard_batch(chunk, mesh)

        entry = {}
        for mode in ("iterative", "train"):
            render = step_lib.make_render_fn(
                config.replace(ngp_eval_renderer=mode), model, mesh
            )
            r = render(params, chunk, grid)
            float(jnp.sum(r["rgb"]))
            n_meas = 10
            t0 = time.perf_counter()
            for _ in range(n_meas):
                r = render(params, chunk, grid)
                float(jnp.sum(r["rgb"]))
            dt = time.perf_counter() - t0
            entry[mode] = round(chunk_size * n_meas / dt / n_chips, 1)
        entry["speedup_iter_vs_dense"] = round(
            entry["iterative"] / entry["train"], 3
        )
        results[f"chunk_{chunk_size}"] = entry
        print(json.dumps({f"chunk_{chunk_size}": entry}), flush=True)

    print(json.dumps(results, indent=1), flush=True)
    out_path = os.environ.get("ONDT_PROBE_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
