"""Orbax checkpoint save/restore with step-indexed resume.

Replaces save_model / resume (reference: utils/train_utils.py:251-283,
train.py:226-245): sharded orbax checkpoints hold params + opt_state +
step; the LR position restores for free because optax schedules are
pure functions of the step (the reference needs
ResumableSequentialLR.set_step for this).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state, extra: Optional[dict] = None):
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": np.asarray(step)}
        self.mngr.save(step, args=ocp.args.StandardSave(payload))
        if extra:
            info = self.directory / f"info_{step}.json"
            info.write_text(json.dumps(extra, indent=1))

    def restore(self, state, step: Optional[int] = None):
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return state, 0
        template = {"params": state.params, "opt_state": state.opt_state,
                    "step": np.asarray(0)}
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(template))
        state = state.replace(params=restored["params"],
                              opt_state=restored["opt_state"],
                              step=jax.numpy.asarray(restored["step"]))
        return state, int(restored["step"])

    def wait(self):
        self.mngr.wait_until_finished()
