"""Tiny worker stub for launcher-logic tests (no jax): accepts the
flags cli/launch injects, optionally crashes on early attempts, exits
nonzero on SIGTERM like a preempted trainer that stopped mid-epoch."""
import argparse
import os
import signal
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--coordinator")
    p.add_argument("--num_processes", type=int)
    p.add_argument("--process_id", type=int)
    p.add_argument("--platform")
    p.add_argument("--crash_until_attempt", type=int, default=0)
    p.add_argument("--run_seconds", type=float, default=30.0)
    args = p.parse_args()

    signal.signal(signal.SIGTERM, lambda *_: sys.exit(17))
    attempt = int(os.environ.get("MSTPU_RESTART_COUNT", "0"))
    if attempt < args.crash_until_attempt and args.process_id == 1:
        time.sleep(0.5)
        sys.exit(3)
    time.sleep(args.run_seconds)
    sys.exit(0)


if __name__ == "__main__":
    main()
