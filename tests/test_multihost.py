"""Real 2-process distributed smoke test (gloo over localhost, CPU devices).

Spawns two python processes, each owning 4 virtual CPU devices, and runs
the full sharded train step over the resulting 8-device global mesh — the
multi-host configuration of SURVEY.md §2.6, exercised for real rather than
only via a faked single-process mesh.
"""

import os
import subprocess
import sys

import numpy as np
import pytest


def _run_workers(port: str, mode: str, marker: str):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    env = {
        k: v for k, v in os.environ.items() if not k.startswith("JAX_")
    }
    env["PYTHONPATH"] = root
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", port, mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=root,
            env=env,
        )
        for i in range(2)
    ]
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith(marker)][-1]
        fields = line.split()
        results[int(fields[1])] = tuple(float(v) for v in fields[2:])
    assert set(results) == {0, 1}
    return results


def test_two_process_train_step():
    results = _run_workers("9411", "train", "MHOK")
    # Replicated outputs: every process must see the same global loss/grads.
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    assert np.isfinite(results[0]).all()


def test_two_process_render_image_matches_single_process():
    """Multi-process `render_image` (per-process chunk slicing + replicated
    readback) must reproduce the single-process render exactly — the eval
    gather of SURVEY.md section 3.4 (VERDICT r1 next-step #9)."""
    results = _run_workers("9413", "render", "MHRENDER")
    # Both processes read back the same assembled image.
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # Single-process ground truth on this process's faked 8-device mesh
    # (same deterministic init, no training).
    import jax

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from tests.multihost_worker import worker_config

    config = worker_config()
    mesh = parallel.make_mesh()
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
    test_ds = datasets_lib.SyntheticDataset(
        "test", global_batch_size=config.batch_size, seed=3
    )
    render_chunk = step_lib.make_render_fn(config, model, mesh)
    image = step_lib.render_image(
        render_chunk, state.params, test_ds.image_batch(0), mesh,
        chunk_size=40,
    )
    rgb = np.asarray(image["rgb"])
    depth = np.asarray(image["distance_mean"])
    expected = (
        float(rgb.sum()), float(rgb[0, 1, 0]), float(depth.sum()),
    )
    np.testing.assert_allclose(results[0], expected, rtol=1e-4)
