#!/bin/bash
# Run a python script on the TPU with retry: the axon tunnel admits one
# process at a time and needs a short cooldown between claims, so a fresh
# interpreter can transiently fail to register the backend.
# Usage: scripts/tpu_run.sh <script.py> [args...]
set -u
export PYTHONPATH="${PYTHONPATH:-}:/root/repo"
for attempt in 1 2 3 4 5 6; do
  out=$(python "$@" 2>&1)
  code=$?
  if [ $code -eq 0 ] && ! grep -q "Unable to initialize backend 'axon'" <<<"$out"; then
    grep -vi "warning" <<<"$out"
    exit 0
  fi
  if grep -q "Unable to initialize backend 'axon'" <<<"$out"; then
    echo "[tpu_run] axon busy (attempt $attempt), retrying in 20s..." >&2
    sleep 20
  else
    grep -vi "warning" <<<"$out"
    exit $code
  fi
done
echo "[tpu_run] giving up after 6 attempts" >&2
grep -vi "warning" <<<"$out"
exit 1
