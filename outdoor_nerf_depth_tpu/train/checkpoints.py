"""Checkpoint/resume via orbax: async-capable, keep-N, step-indexed.

Capability parity with the reference's three checkpoint stacks (flax
`save_checkpoint(keep=100)` in mipnerf360 `train.py:238-242`, torch.save
state dicts in `ddp_train_nerf.py:642-652`, Lightning ModelCheckpoint) —
unified on orbax, which is the TPU-native choice (per-shard async writes,
no host-0 serialization bottleneck).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

# Sidecar recording non-restorable model identity next to the step dirs.
# Checkpoints whose hash layout (or model family) disagrees with the code
# restoring them would deserialize without error and silently render
# garbage (ADVICE r2, high) — the meta file makes that a loud failure.
META_FILENAME = "model_meta.json"


def latest_step(directory: str) -> Optional[int]:
    """Latest checkpointed step under `directory`, or None when no
    checkpoint exists — a cheap directory probe (no orbax manager spin-up)
    for the idempotent-run guard (reference `mipnerf360/train.py:54-57`)."""
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name)
        for name in os.listdir(directory)
        if name.isdigit() and os.path.isdir(os.path.join(directory, name))
    ]
    return max(steps) if steps else None


def write_model_meta(directory: str, meta: Dict[str, Any]):
    """Write the model-identity sidecar (idempotent; host 0 only callers)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, META_FILENAME)
    with open(path, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


def read_model_meta(directory: str) -> Optional[Dict[str, Any]]:
    """Read the sidecar; None when absent (pre-meta checkpoints)."""
    path = os.path.join(directory, META_FILENAME)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def check_model_meta(directory: str, expected: Dict[str, Any]):
    """Raise ValueError when a stored sidecar disagrees with `expected`.

    Keys present in only one side are ignored (forward compatibility);
    a missing sidecar passes (nothing to check against).
    """
    stored = read_model_meta(directory)
    if stored is None:
        return
    mismatches = {
        k: (stored[k], expected[k])
        for k in expected
        if k in stored and stored[k] != expected[k]
    }
    if mismatches:
        detail = ", ".join(
            f"{k}: checkpoint={s!r} vs current={e!r}"
            for k, (s, e) in sorted(mismatches.items())
        )
        raise ValueError(
            f"checkpoint at {directory!r} was written by an incompatible "
            f"model configuration ({detail}). Restoring it would silently "
            "produce garbage — match the stored configuration (e.g. "
            "model_params={\"hash_layout\": ...}) or start a fresh exp_dir."
        )


def export_slim(path: str, params: Any, occupancy: Any = None,
                meta: Optional[Dict[str, Any]] = None, step: int = 0):
    """Params-only checkpoint export (the reference's "slim ckpt",
    `ngp-depth/utils.py:29-39`): drops the optimizer state — typically a
    3x size cut — for render/viewer/distribution use. The occupancy grid
    is embedded optionally (the eval renderer wants it; the reference
    drops its density grid and re-derives). Single msgpack file.
    """
    import flax.serialization as ser
    import jax
    import numpy as np

    payload = {
        "params": jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
        "meta": dict(meta or {}),
        "step": int(step),
    }
    if occupancy is not None:
        payload["occupancy"] = np.asarray(jax.device_get(occupancy))
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(ser.msgpack_serialize(payload))


def load_slim(path: str) -> Dict[str, Any]:
    """Load a slim checkpoint written by `export_slim`.

    Returns {"params", "meta", "step"[, "occupancy"]}."""
    import flax.serialization as ser

    with open(path, "rb") as f:
        return ser.msgpack_restore(f.read())


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore latest (or given) step into the template's structure.

        Returns (state, step) — (template, 0) when no checkpoint exists.
        """
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return state_template, 0
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, int(step)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
