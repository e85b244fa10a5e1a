#!/bin/bash
# Sequential LLM then Flow training (reference: scripts/train_full_pipeline.sh).
set -euo pipefail
DATA_LIST=${1:?usage: train_full_pipeline.sh DATA_LIST EXP_DIR [TOKENIZER]}
EXP_DIR=${2:?}
TOKENIZER=${3:-}
export PYTHONPATH="$(dirname "$0")/..:${PYTHONPATH:-}"
TOK_ARG=""
[ -n "$TOKENIZER" ] && TOK_ARG="--tokenizer_path $TOKENIZER"

python -m minimax_speech_tpu.cli.train --model llm \
    --train_data "$DATA_LIST" --model_dir "$EXP_DIR/llm" $TOK_ARG

# LATENT_STATS: latent_stats.json written by extract_dac_latents (next
# to the DAC ckpt) — standardizes latents inside the flow; required when
# the codec was trained from scratch (no KL pressure toward unit scale)
python -m minimax_speech_tpu.cli.train --model flow \
    --train_data "$DATA_LIST" --model_dir "$EXP_DIR/flow" $TOK_ARG \
    ${LATENT_STATS:+--latent_stats "$LATENT_STATS"}
