"""Elastic multi-process launcher (the torchrun-elastic equivalent).

The reference launches training via `torchrun --max-restarts` with NCCL
rendezvous (reference: speech/train.py:28,165 and TRAINING_GUIDE's
torchrun invocations); this is the jax.distributed analogue: spawn one
worker process per rank with an injected coordinator address and rank
flags, watch the gang, and — because a synchronous SPMD gang cannot
survive losing a member — on any rank's failure kill the survivors and
relaunch the WHOLE gang with a fresh coordinator port. Workers are
expected to resume from their latest checkpoint (the train CLIs
auto-resume from --model_dir), so a restart loses at most the steps
since the last save, exactly torchrun's elastic-restart semantics.

  python -m minimax_speech_tpu.cli.launch --nproc 2 --max_restarts 3 \
      [--module minimax_speech_tpu.cli.train] [--platform cpu] \
      -- --model llm --config configs/tiny.yaml ...

SIGTERM/SIGINT (preemption notice) forwards to the gang so workers can
finish their checkpoint writes before dying.
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def spawn_gang(module: str, worker_args: list[str], nproc: int, port: int,
               attempt: int, platform: str | None, log_dir: Path,
               coordinator_host: str) -> list[subprocess.Popen]:
    procs = []
    for rank in range(nproc):
        argv = [sys.executable, "-m", module, *worker_args,
                "--distributed",
                "--coordinator", f"{coordinator_host}:{port}",
                "--num_processes", str(nproc),
                "--process_id", str(rank)]
        if platform:
            argv += ["--platform", platform]
        env = dict(os.environ)
        env["MSTPU_RESTART_COUNT"] = str(attempt)
        log = log_dir / f"rank{rank}.attempt{attempt}.log"
        f = open(log, "w")
        p = subprocess.Popen(argv, env=env, stdout=f, stderr=f)
        p._log_file = f  # closed in reap()
        p._log_path = log
        procs.append(p)
    return procs


def reap(procs: list[subprocess.Popen], grace: float = 10.0):
    """Terminate every still-running member of a broken gang."""
    for p in procs:
        if p.poll() is None:
            p.terminate()
    deadline = time.time() + grace
    for p in procs:
        while p.poll() is None and time.time() < deadline:
            time.sleep(0.2)
        if p.poll() is None:
            p.kill()
            p.wait()
    for p in procs:
        f = getattr(p, "_log_file", None)
        if f and not f.closed:
            f.close()


def run_elastic(module: str, worker_args: list[str], nproc: int,
                max_restarts: int = 3, platform: str | None = None,
                log_dir: str = "launch_logs", poll_s: float = 0.5,
                coordinator_host: str = "127.0.0.1",
                state_file: str | None = None) -> int:
    """Supervise a gang; returns the final exit code (0 on success)."""
    logd = Path(log_dir)
    logd.mkdir(parents=True, exist_ok=True)
    procs: list[subprocess.Popen] = []
    stopping = False

    def forward(signum, _frame):
        # a preemption notice / Ctrl-C means SHUT DOWN, not "restart the
        # gang": workers checkpoint and exit nonzero, which must not be
        # classified as a rank failure
        nonlocal stopping
        stopping = True
        for p in procs:
            if p.poll() is None:
                p.send_signal(signum)

    old_term = signal.signal(signal.SIGTERM, forward)
    old_int = signal.signal(signal.SIGINT, forward)
    try:
        for attempt in range(max_restarts + 1):
            port = free_port()
            procs = spawn_gang(module, worker_args, nproc, port, attempt,
                               platform, logd, coordinator_host)
            if state_file:
                # tmp+rename so concurrent pollers never observe a
                # partially-written file (rename is atomic on POSIX)
                tmp = Path(state_file).with_suffix(".tmp")
                tmp.write_text(json.dumps(
                    {"attempt": attempt, "port": port,
                     "pids": [p.pid for p in procs]}))
                tmp.replace(state_file)
            print(f"[launch] attempt {attempt}: {nproc} ranks on "
                  f"port {port} (logs: {logd})", flush=True)
            failed = None
            while True:
                codes = [p.poll() for p in procs]
                if any(c not in (None, 0) for c in codes):
                    failed = [i for i, c in enumerate(codes)
                              if c not in (None, 0)]
                    break
                if all(c == 0 for c in codes):
                    return 0
                time.sleep(poll_s)
            if stopping:
                reap(procs)
                print("[launch] shutdown requested; not restarting",
                      file=sys.stderr)
                return 0
            reap(procs)
            for i in failed:
                tail = Path(procs[i]._log_path).read_text()[-2000:]
                print(f"[launch] rank {i} exited "
                      f"{procs[i].returncode}; log tail:\n{tail}",
                      file=sys.stderr, flush=True)
            if attempt == max_restarts:
                print(f"[launch] giving up after {attempt + 1} attempts",
                      file=sys.stderr)
                return 1
            print(f"[launch] restarting gang (workers resume from their "
                  f"latest checkpoint)", flush=True)
        return 1
    finally:
        reap(procs)
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--max_restarts", type=int, default=3)
    p.add_argument("--module", default="minimax_speech_tpu.cli.train")
    p.add_argument("--platform", default=None,
                   help="forwarded to workers as --platform")
    p.add_argument("--log_dir", default="launch_logs")
    p.add_argument("--coordinator_host", default="127.0.0.1")
    p.add_argument("--state_file", default=None,
                   help="json file updated with {attempt, port, pids} "
                        "each launch (for external monitors/tests)")
    p.add_argument("worker_args", nargs=argparse.REMAINDER,
                   help="args after -- go to the worker module")
    args = p.parse_args(argv)
    wargs = args.worker_args
    if wargs and wargs[0] == "--":
        wargs = wargs[1:]
    raise SystemExit(run_elastic(
        args.module, wargs, args.nproc, args.max_restarts, args.platform,
        args.log_dir, coordinator_host=args.coordinator_host,
        state_file=args.state_file))


if __name__ == "__main__":
    main()
