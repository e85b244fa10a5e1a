#!/bin/bash
# Run the overfit proof on the TPU, surviving axon-tunnel hangs: each
# attempt is bounded; stage+checkpoint resume means a relaunch continues
# where the hang cut it off.
# Usage: overfit_supervised.sh <workdir> [attempt_timeout_s] [extra args...]
set -u
WD=${1:?workdir}
TO=${2:-1500}
shift; [ $# -gt 0 ] && shift
EXTRA=("$@")
tunnel_up() { timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8083' 2>/dev/null; }
for attempt in $(seq 1 12); do
  # don't burn an attempt while the axon relay is down; an attempt
  # launched against a dead tunnel hangs for its whole timeout
  until tunnel_up; do
    echo "[supervise] tunnel down; waiting 60s" >&2
    sleep 60
  done
  echo "[supervise] attempt $attempt" >&2
  out=$(timeout "$TO" bash "$(dirname "$0")/tpu_run.sh" "$(dirname "$0")/overfit_pipeline.py" --workdir "$WD" ${EXTRA[@]+"${EXTRA[@]}"})
  code=$?
  line=$(grep -o '{.*"token_match".*}' <<<"$out" | tail -1)
  if [ -n "$line" ]; then
    echo "$line"
    exit 0
  fi
  echo "[supervise] attempt $attempt ended (code $code) without metrics; resuming in 30s" >&2
  sleep 30
done
echo "[supervise] giving up" >&2
exit 1
