"""Training executor: epoch loop with periodic save + cv.

Replaces Executor (reference: speech/cosyvoice/utils/executor.py:47-161).
The reference's uneven-rank handling (cosyvoice_join monitored barrier,
train_utils.py:285-304) is unnecessary here: every process feeds the
same jitted SPMD step, so an epoch ends after a host-side agreed number
of steps (min over processes of available batches), which we compute by
letting each process iterate its own shard and stopping on exhaustion —
single-host — or via max_steps_per_epoch in multi-host launches.
"""
from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from minimax_speech_tpu.train.checkpoint import CheckpointManager
from minimax_speech_tpu.utils.logging import MetricsLogger, Timer


class Executor:
    def __init__(self, step_fn: Callable, state, logger: MetricsLogger,
                 ckpt: Optional[CheckpointManager] = None,
                 save_per_step: int = 2000, needs_key: bool = False,
                 seed: int = 1986, put_batch: Optional[Callable] = None):
        self.step_fn = step_fn
        self.state = state
        self.logger = logger
        self.ckpt = ckpt
        self.save_per_step = save_per_step
        self.needs_key = needs_key
        self.seed = seed
        self.put_batch = put_batch or (lambda b: b)
        self.timer = Timer()
        # host-side mirror of state.step: reading the device scalar every
        # step would force a sync + a device->host round trip per step
        # (~28 ms each over a tunneled TPU) and serialize async dispatch
        self._host_step = int(jax.device_get(state.step))

    @property
    def step(self) -> int:
        return self._host_step

    def _step_key(self, step: int) -> np.ndarray:
        """Per-step PRNG key built on HOST (raw threefry uint32[2], the
        layout jax.random.PRNGKey produces): no eager device dispatch per
        step, and — unlike a split chain — deterministic across
        checkpoint resume because it derives from the global step."""
        return np.array([self.seed & 0xFFFFFFFF, step & 0xFFFFFFFF],
                        dtype=np.uint32)

    def train_one_epoch(self, batches: Iterable[dict],
                        max_steps: Optional[int] = None):
        for i, batch in enumerate(batches):
            if max_steps is not None and i >= max_steps:
                break
            with self.timer("data"):
                batch = self.put_batch(batch)
            if batch is None:  # dropped remainder batch
                continue
            with self.timer("step"):
                if self.needs_key:
                    sub = self._step_key(self._host_step)
                    self.state, metrics = self.step_fn(self.state, batch, sub)
                else:
                    self.state, metrics = self.step_fn(self.state, batch)
            self._host_step += 1
            step = self._host_step
            if step % self.logger.log_interval == 0:
                jax.block_until_ready(metrics)
                metrics = {**metrics, **self.timer.snapshot_and_reset()}
                self.logger.log(step, metrics)
            if self.ckpt is not None and step and step % self.save_per_step == 0:
                self.ckpt.save(step, self.state)
        return self.state

    def cv(self, batches: Iterable[dict], loss_fn: Callable,
           max_batches: int = 50) -> dict:
        """Validation loop (reference: executor.py:128-161)."""
        totals, n = {}, 0
        for i, batch in enumerate(batches):
            if i >= max_batches:
                break
            batch = self.put_batch(batch)
            if batch is None:
                continue
            if self.needs_key:
                m = loss_fn(self.state, batch, jax.random.PRNGKey(i))
            else:
                m = loss_fn(self.state, batch)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        out = {f"cv/{k}": v / max(n, 1) for k, v in totals.items()}
        self.logger.log(self.step, out, force=True)
        return out
