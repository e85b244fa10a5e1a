#!/bin/bash
# One healthy-tunnel perf session that DECIDES the queued A/Bs
# (VERDICT r4 next-2): bench RTF baseline + MSTPU_PREGEN + bf16_flow,
# decode-variant ablation, remat-policy training A/B, MFU for all three
# stages, continuous-batching throughput. Each step bounded; results
# land in $OUT. Aborts early if the tunnel probe is degraded.
# Usage: perf_session.sh [out_dir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/root/perf_session}
mkdir -p "$OUT"
log() { echo "[perf $(date -u +%H:%M:%S)] $*" | tee -a "$OUT/session.log" >&2; }

probe() {
  rm -f /tmp/probe_log.txt
  timeout 150 python scripts/probe_tpu.py >/dev/null 2>&1
  grep -q "fetch" /tmp/probe_log.txt 2>/dev/null || return 1
  # degraded if the trivial fetch took >15 s
  local s
  s=$(sed -n 's/fetch \([0-9.]*\)s.*/\1/p' /tmp/probe_log.txt)
  awk -v s="$s" 'BEGIN { exit !(s < 15) }'
}

run_step() {  # name timeout cmd...
  local name=$1 to=$2
  shift 2
  log "step $name: $*"
  timeout "$to" bash scripts/tpu_run.sh "$@" > "$OUT/$name.log" 2>&1
  local code=$?
  log "step $name done (code $code)"
  tail -3 "$OUT/$name.log" >&2
}

if ! probe; then
  log "tunnel degraded or down; aborting perf session"
  exit 2
fi
log "tunnel healthy: $(cat /tmp/probe_log.txt | tr '\n' ' ')"

# 1. bench RTF baseline (also investigates the r04 0.0372 vs r03 0.0323)
run_step bench_baseline 2400 bench.py
# 2. pregen-noise decode flip candidate
MSTPU_PREGEN=1 run_step bench_pregen 2400 bench.py
# 3. bf16 flow flip candidate
MSTPU_BF16_FLOW=1 run_step bench_bf16flow 2400 bench.py
# 4. decode-overhead ablation
run_step decode_variants 3000 scripts/bench_decode_variants.py
# 5. training throughput: remat none vs full vs dots + flow/dac MFU
run_step train_base 2400 scripts/bench_train.py --stage llm --bf16
run_step train_remat 2400 scripts/bench_train.py --stage llm --bf16 --remat
run_step train_dots 2400 scripts/bench_train.py --stage llm --bf16 --remat \
  --remat_policy dots
run_step train_flow_dac 3600 scripts/bench_train.py --stage flow
run_step train_dac 3600 scripts/bench_train.py --stage dac
# 5b. bf16-flow QUALITY gate on trained weights (needs a completed
# overfit/zero-shot workdir; skipped when none exists)
ZS_WD=${ZS_WD:-/root/zs_tpu}
if [ -f "$ZS_WD/model/flow.npz" ]; then
  run_step eval_bf16_flow 2400 scripts/eval_bf16_flow.py --workdir "$ZS_WD"
else
  log "eval_bf16_flow skipped: no trained weights at $ZS_WD"
fi
# 6. continuous batching: batch scaling + staggered-arrival comparison
run_step throughput 3600 scripts/bench_throughput.py --batches 1,4,8
run_step throughput_staggered 3600 scripts/bench_throughput.py \
  --staggered 8 --interval 0.5 --slots 4
log "perf session complete: $OUT"
