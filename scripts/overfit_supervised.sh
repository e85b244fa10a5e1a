#!/bin/bash
# Run the overfit proof on the TPU, surviving axon-tunnel hangs: each
# attempt is bounded; stage+checkpoint resume means a relaunch continues
# where the hang cut it off. Usage: overfit_supervised.sh <workdir> [attempt_timeout_s]
set -u
WD=${1:?workdir}
TO=${2:-1500}
for attempt in $(seq 1 12); do
  echo "[supervise] attempt $attempt" >&2
  out=$(timeout "$TO" bash "$(dirname "$0")/tpu_run.sh" "$(dirname "$0")/overfit_pipeline.py" --workdir "$WD")
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
