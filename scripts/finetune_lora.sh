#!/usr/bin/env bash
# LoRA fine-tune recipe (reference: scripts/spatialvla_4b_finetune/
# finetune_lora.sh — r=32 alpha=32, lr 5e-4, uiuc_d3field default mixture).
set -euo pipefail

PRETRAINED=${PRETRAINED:-out/pretrain_4b}
DATA_ROOT=${DATA_ROOT:-/data/oxe}
OUTPUT=${OUTPUT:-out/finetune_lora}
MIXTURE=${MIXTURE:-uiuc_d3field}

python -m spatialvla_tpu.train.finetune \
  --pretrained_dir "$PRETRAINED" \
  --data_root_dir "$DATA_ROOT" \
  --mixture "$MIXTURE" \
  --output_dir "$OUTPUT" \
  --use_lora --lora_rank 32 --lora_alpha 32 --lora_target linear \
  --learning_rate 5e-4 \
  --max_steps 10000 \
  --save_steps 10000 \
  --attn_backend flash \
  "$@"
