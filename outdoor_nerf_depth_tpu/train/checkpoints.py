"""Checkpoint/resume via orbax: async-capable, keep-N, step-indexed.

Capability parity with the reference's three checkpoint stacks (flax
`save_checkpoint(keep=100)` in mipnerf360 `train.py:238-242`, torch.save
state dicts in `ddp_train_nerf.py:642-652`, Lightning ModelCheckpoint) —
unified on orbax, which is the TPU-native choice (per-shard async writes,
no host-0 serialization bottleneck).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


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
