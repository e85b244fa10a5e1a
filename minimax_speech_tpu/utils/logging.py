"""Metrics logging: console + JSONL (+ per-phase host timers).

Replaces the reference's Comet/loguru logging surface
(reference: utils/train_utils.py:451-517; dac-vae timing_logs
train.py:608-790): rank-0-style gating by jax.process_index(), JSONL
metric stream any dashboard can tail, and a Timer for phase wall-clocks.
jax.profiler trace capture is one call away via `profile()`.
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax


class MetricsLogger:
    def __init__(self, directory: str, name: str = "train",
                 log_interval: int = 5):
        self.enabled = jax.process_index() == 0
        self.log_interval = log_interval
        if self.enabled:
            d = Path(directory)
            d.mkdir(parents=True, exist_ok=True)
            self.fh = open(d / f"{name}_metrics.jsonl", "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: dict, force: bool = False):
        if not self.enabled or (step % self.log_interval and not force):
            return
        row = {"step": step, "time": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            row[k] = float(v) if hasattr(v, "item") or isinstance(
                v, (int, float)) else v
        self.fh.write(json.dumps(row) + "\n")
        self.fh.flush()
        head = " ".join(f"{k}={row[k]:.4g}" for k in list(row)[2:8]
                        if isinstance(row[k], float))
        print(f"[step {step}] {head}", flush=True)


class Timer:
    """Accumulating per-phase wall-clock timer (reference: dac-vae
    timing_logs + audiotools @timer)."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        yield
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def snapshot_and_reset(self):
        out = {f"time/{k}": v for k, v in self.totals.items()}
        self.totals = {}
        return out


@contextlib.contextmanager
def profile(log_dir: str):
    """jax.profiler trace around a code region (TPU timeline in
    TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
