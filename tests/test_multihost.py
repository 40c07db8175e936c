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


def test_two_process_train_step():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    port = "9411"
    env = {
        k: v for k, v in os.environ.items() if not k.startswith("JAX_")
    }
    env["PYTHONPATH"] = root
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=root,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MHOK")][-1]
        _, pid, loss, gn = line.split()
        results[int(pid)] = (float(loss), float(gn))
    assert set(results) == {0, 1}
    # Replicated outputs: every process must see the same global loss/grads.
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    assert np.isfinite(results[0]).all()
