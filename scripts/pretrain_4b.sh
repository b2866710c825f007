#!/usr/bin/env bash
# Flagship pretrain recipe (reference: scripts/spatialvla_4b_pretrain/
# torchrun_pretrain.sh — global batch 2048, lr 2e-5 linear w/ 0.005 warmup,
# bf16, grad ckpt, seq 2048 budget, shuffle buffer 65536, ZeRO-1).
# TPU mapping: fsdp-sharded params/opt state over the full slice; grad
# accumulation chosen so per_device * n_chips * accum == 2048.
#
# DEBUG=true shrinks to a single-chip smoke run (the reference's DEBUG
# profile: buffer 2, tiny batch).
#
# Multi-host pod launch (replaces the reference's torchrun/srun rendezvous):
# run this same script on EVERY host of the slice —
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#     --command="cd spatialvla-tpu && DATA_ROOT=... bash scripts/pretrain_4b.sh"
#
# On TPU pods `jax.distributed.initialize()` auto-discovers the coordinator
# from the TPU metadata (no MASTER_ADDR equivalent needed); the training
# CLIs call it automatically when they detect a multi-host environment, and
# per-host data sharding follows jax.process_index(). For manual/CPU
# rendezvous (e.g. tests), pass --coordinator_address host:port
# --num_processes N --process_id i explicitly (see
# tests/test_distributed.py for a working 2-process example).
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-/data/oxe}
OUTPUT=${OUTPUT:-out/pretrain_4b}
DEBUG=${DEBUG:-false}

if [ "$DEBUG" = "true" ]; then
  BATCH=2; ACCUM=1; BUFFER=2; STEPS=20; MIXTURE=${MIXTURE:-bridge}
else
  BATCH=8; ACCUM=${ACCUM:-8}; BUFFER=65536; STEPS=200000
  MIXTURE=${MIXTURE:-oxe_spatial_vla_plus}
fi

python -m spatialvla_tpu.train.pretrain \
  --data_root_dir "$DATA_ROOT" \
  --mixture "$MIXTURE" \
  --output_dir "$OUTPUT" \
  --model_preset spatialvla_4b \
  --per_device_batch_size "$BATCH" \
  --grad_accum "$ACCUM" \
  --learning_rate 2e-5 \
  --warmup_ratio 0.005 \
  --max_steps "$STEPS" \
  --shuffle_buffer_size "$BUFFER" \
  --action_forward_steps 3 \
  --seq_len 320 \
  --mesh_fsdp -1 \
  --attn_backend flash \
  --save_steps 20000 \
  --logging_steps 500 \
  "$@"
