#!/bin/bash
# Round-5 TPU work queue: wait for a healthy tunnel, then run (in order)
#   1. the true zero-shot proof   (overfit_supervised.sh, stage-resumable)
#   2. the perf A/B session       (perf_session.sh)
#   3. final bench.py capture
# Each phase leaves a done-marker so a relaunch resumes. Every phase is
# gated on a fresh probe; a degraded tunnel (trivial fetch > 15 s) just
# waits instead of burning a bounded attempt against a hung relay.
# Usage: round5_supervisor.sh [state_dir]
set -u
cd "$(dirname "$0")/.."
STATE=${1:-/root/r5_state}
mkdir -p "$STATE"
log() { echo "[r5 $(date -u +%H:%M:%S)] $*" | tee -a "$STATE/supervisor.log" >&2; }

probe_ok() {  # $1 = mode: "perf" (first fetch < 15 s, trustworthy
              # timings) or "usable" (steady-state RTT < 5 s — the
              # measured tunnel pattern is a one-off first-fetch penalty
              # of minutes followed by sub-second dispatches, which a
              # long stage-resumable run amortizes)
  local mode=${1:-perf}
  rm -f /tmp/probe_log.txt
  timeout 280 python scripts/probe_tpu.py >/dev/null 2>&1
  if [ "$mode" = usable ]; then
    local st
    st=$(sed -n 's/steady \([0-9.]*\)s.*/\1/p' /tmp/probe_log.txt 2>/dev/null)
    [ -n "$st" ] || return 1
    awk -v s="$st" 'BEGIN { exit !(s < 5) }'
  else
    grep -q "fetch" /tmp/probe_log.txt 2>/dev/null || return 1
    local s
    s=$(sed -n 's/fetch \([0-9.]*\)s.*/\1/p' /tmp/probe_log.txt)
    awk -v s="$s" 'BEGIN { exit !(s < 15) }'
  fi
}

wait_healthy() {  # $1 = probe mode (perf | usable)
  until probe_ok "${1:-perf}"; do
    log "tunnel fails '${1:-perf}' gate ($(tail -1 /tmp/probe_log.txt 2>/dev/null || echo 'no probe output')); sleeping 180s"
    sleep 180
  done
  log "tunnel ok (${1:-perf}): $(tr '\n' ' ' < /tmp/probe_log.txt)"
}

# ---- phase 1: true zero-shot proof -------------------------------------
if [ ! -f "$STATE/zs_done" ]; then
  wait_healthy usable
  log "phase 1: zero-shot proof -> /root/zs_tpu"
  if bash scripts/overfit_supervised.sh /root/zs_tpu 3600 \
      --n_utts 64 --n_speakers 8 --holdout_per_speaker 1 \
      > "$STATE/zs_metrics.json" 2> "$STATE/zs.log"; then
    cp "$STATE/zs_metrics.json" "$STATE/zs_done"
    log "phase 1 PASSED: $(cat "$STATE/zs_metrics.json")"
  else
    log "phase 1 attempt batch exhausted; will retry after health gate"
    exit 1   # relauncher decides; state is resumable
  fi
fi

# ---- phase 2: perf A/B session -----------------------------------------
if [ ! -f "$STATE/perf_done" ]; then
  wait_healthy
  log "phase 2: perf session -> /root/perf_session"
  ZS_WD=/root/zs_tpu bash scripts/perf_session.sh /root/perf_session \
    >> "$STATE/supervisor.log" 2>&1 && touch "$STATE/perf_done"
fi

# ---- phase 3: final bench capture --------------------------------------
if [ ! -f "$STATE/bench_done" ]; then
  wait_healthy
  log "phase 3: bench.py final"
  timeout 2400 bash scripts/tpu_run.sh bench.py \
    > "$STATE/bench_final.json" 2>> "$STATE/supervisor.log" \
    && cp "$STATE/bench_final.json" "$STATE/bench_done"
  log "bench: $(tail -1 "$STATE/bench_final.json" 2>/dev/null)"
fi
log "round-5 TPU queue complete"
