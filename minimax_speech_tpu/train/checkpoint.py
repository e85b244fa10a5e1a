"""Orbax checkpoint save/restore with step-indexed resume.

Replaces save_model / resume (reference: utils/train_utils.py:251-283,
train.py:226-245): sharded orbax checkpoints hold params + opt_state +
step; the LR position restores for free because optax schedules are
pure functions of the step (the reference needs
ResumableSequentialLR.set_step for this).

Periodic-save failures are non-fatal: orbax's async machinery can time
out under IO/CPU contention (observed: a signaling-thread
'step_directory_creation' timeout killing a long run), and a missed
snapshot must cost one snapshot, not the training job. Restore walks
backward past partially-written steps for the same reason.
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        self.mngr = self._make()

    def _make(self):
        return ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.max_to_keep))

    def _reset(self):
        try:
            self.mngr.close()
        except Exception:
            pass
        self.mngr = self._make()

    def save(self, step: int, state, extra: Optional[dict] = None):
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": np.asarray(step)}
        if jax.process_count() > 1:
            # all hosts enter the (collective) orbax save together — the
            # dist.barrier the reference wraps around saving
            # (reference: utils/executor.py:116-126)
            from minimax_speech_tpu.utils.distributed import sync_hosts
            sync_hosts(f"ckpt_save_{step}")
        try:
            self.mngr.save(step, args=ocp.args.StandardSave(payload))
        except Exception as e:
            logging.warning(
                "checkpoint save at step %d failed (%s: %s); recreating "
                "the manager and continuing — next periodic save retries",
                step, type(e).__name__, e)
            self._reset()
            return
        if extra:
            info = self.directory / f"info_{step}.json"
            info.write_text(json.dumps(extra, indent=1))

    def restore(self, state, step: Optional[int] = None):
        if step is not None:
            steps = [step]
        else:
            steps = sorted(self.mngr.all_steps(), reverse=True)
        template = {"params": state.params, "opt_state": state.opt_state,
                    "step": np.asarray(0)}
        for s in steps:
            try:
                restored = self.mngr.restore(
                    s, args=ocp.args.StandardRestore(template))
            except Exception as e:
                if step is not None:
                    raise  # an explicitly requested step must exist
                logging.warning(
                    "restore of step %d failed (%s: %s); trying the "
                    "previous snapshot", s, type(e).__name__, e)
                continue
            state = state.replace(params=restored["params"],
                                  opt_state=restored["opt_state"],
                                  step=jax.numpy.asarray(restored["step"]))
            return state, int(restored["step"])
        return state, 0

    def wait(self):
        try:
            self.mngr.wait_until_finished()
        except Exception as e:
            logging.warning("checkpoint finalize failed (%s: %s)",
                            type(e).__name__, e)
            self._reset()
