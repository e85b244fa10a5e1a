#!/bin/bash
# Data prep: FSQ tokens -> DAC latents -> data list (+ audit).
# Equivalent of the reference scripts/prepare_data.sh recipe.
set -euo pipefail
DATA_DIR=${1:?usage: prepare_data.sh DATA_DIR S3_CKPT DAC_CKPT}
S3_CKPT=${2:?}
DAC_CKPT=${3:?}
export PYTHONPATH="$(dirname "$0")/..:${PYTHONPATH:-}"

python -m minimax_speech_tpu.cli.extract_fsq \
    --dir "$DATA_DIR" --ckpt "$S3_CKPT" --skip_existing

python -m minimax_speech_tpu.cli.extract_dac_latents \
    --dir "$DATA_DIR" --ckpt "$DAC_CKPT" --skip_existing

python -m minimax_speech_tpu.cli.data_tools create_list \
    --dir "$DATA_DIR" --out "$DATA_DIR/data.list"
python -m minimax_speech_tpu.cli.data_tools validate \
    --list "$DATA_DIR/data.list"
