"""Elastic launch: the gang supervisor must survive a preempted rank.

The torchrun-elastic behaviour the reference relies on
(reference: speech/train.py:28,165 — torchrun restarts the gang and
training resumes from the latest checkpoint): here a REAL 2-rank
jax.distributed CPU training gang is launched through cli/launch,
rank 1 is SIGKILLed mid-epoch (simulated preemption), and the launcher
must detect the broken gang, kill the survivor, relaunch on a fresh
coordinator port, and finish — with the relaunched workers resuming
from the orbax checkpoint instead of restarting at step 0.
"""
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

from tests.test_train_cli import make_corpus

REPO = Path(__file__).resolve().parent.parent


def _wait_for(cond, timeout, what, poll=0.5):
    t0 = time.time()
    while time.time() - t0 < timeout:
        v = cond()
        if v:
            return v
        time.sleep(poll)
    raise AssertionError(f"timed out waiting for {what}")


@pytest.mark.slow
def test_launch_restarts_preempted_gang(tmp_path, rng):
    lst = make_corpus(tmp_path, rng, n=6)
    model_dir = tmp_path / "elastic_llm"
    state_file = tmp_path / "gang.json"
    log_dir = tmp_path / "logs"

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(REPO)
    launcher = subprocess.Popen(
        [sys.executable, "-m", "minimax_speech_tpu.cli.launch",
         "--nproc", "2", "--max_restarts", "2", "--platform", "cpu",
         "--log_dir", str(log_dir), "--state_file", str(state_file),
         "--",
         "--model", "llm", "--config", str(REPO / "configs/tiny.yaml"),
         "--train_data", str(lst), "--model_dir", str(model_dir),
         "--max_epoch", "2", "--tp", "2",
         "--override", "train.batch_size=2",
         "--override", "train.pad_seq=128",
         "--override", "train.pad_tokens=64",
         "--override", "train.pad_ref=224",
         "--override", "train.save_per_step=1",
         "--override", "train.log_interval=1",
         "--override", "train.lr=0.0001"],
        env=env, cwd=str(REPO), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)

    try:
        metrics = model_dir / "llm_metrics.jsonl"

        # preempt rank 1 only after a checkpoint exists (save_per_step=1
        # -> first save lands with the first logged step)
        def first_progress():
            # only a COMMITTED orbax checkpoint counts (the tmp dir is
            # renamed to the bare step number on commit)
            ckpts = [d for d in (model_dir / "ckpt").glob("*")
                     if d.name.isdigit()] \
                if (model_dir / "ckpt").exists() else []
            if not (state_file.exists() and metrics.exists() and ckpts):
                return None
            st = json.loads(state_file.read_text())
            return st if st["attempt"] == 0 and metrics.stat().st_size \
                else None

        st = _wait_for(first_progress, 600, "attempt-0 first step")
        os.kill(st["pids"][1], signal.SIGKILL)

        # the launcher must relaunch (attempt 1) and the gang must finish
        _wait_for(lambda: state_file.exists()
                  and json.loads(state_file.read_text())["attempt"] >= 1,
                  300, "gang restart")
        out, _ = launcher.communicate(timeout=900)
        assert launcher.returncode == 0, out[-4000:]
        assert "restarting gang" in out

        rows = [json.loads(l) for l in metrics.read_text().splitlines()]
        steps = [r["step"] for r in rows if "loss" in r]
        assert steps, rows
        # resume, not restart: attempt 1 must NOT begin again at the
        # first step (orbax restore happened), so the logged step
        # sequence never goes backwards to the start
        assert steps.count(min(steps)) == 1, steps
    finally:
        if launcher.poll() is None:
            launcher.kill()
            launcher.wait()


def _launcher(tmp_path, extra, worker):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    return subprocess.Popen(
        [sys.executable, "-m", "minimax_speech_tpu.cli.launch",
         "--nproc", "2", "--module", "tests.elastic_stub",
         "--log_dir", str(tmp_path / "logs"),
         "--state_file", str(tmp_path / "gang.json"), *extra,
         "--", *worker],
        env=env, cwd=str(REPO), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def test_launch_restart_counter_reaches_worker(tmp_path):
    """Rank crashes until attempt 2 (via MSTPU_RESTART_COUNT): the
    launcher must restart exactly twice and then succeed."""
    lp = _launcher(tmp_path, ["--max_restarts", "3"],
                   ["--crash_until_attempt", "2", "--run_seconds", "0.5"])
    out, _ = lp.communicate(timeout=120)
    assert lp.returncode == 0, out
    assert out.count("restarting gang") == 2, out
    assert json.loads((tmp_path / "gang.json").read_text())["attempt"] == 2


def test_launch_gives_up_after_max_restarts(tmp_path):
    lp = _launcher(tmp_path, ["--max_restarts", "1"],
                   ["--crash_until_attempt", "99", "--run_seconds", "0.5"])
    out, _ = lp.communicate(timeout=120)
    assert lp.returncode == 1
    assert "giving up" in out


def test_launch_sigterm_shuts_down_without_restart(tmp_path):
    """Preemption: SIGTERM to the launcher forwards to workers; their
    nonzero exits must NOT be treated as failures to restart."""
    lp = _launcher(tmp_path, ["--max_restarts", "3"], ["--run_seconds", "60"])
    state = tmp_path / "gang.json"
    _wait_for(lambda: state.exists(), 60, "gang start")
    time.sleep(1.0)
    lp.send_signal(signal.SIGTERM)
    out, _ = lp.communicate(timeout=60)
    assert lp.returncode == 0, out
    assert "shutdown requested" in out
    assert "restarting gang" not in out
    assert json.loads(state.read_text())["attempt"] == 0
