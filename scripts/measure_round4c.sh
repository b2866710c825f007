#!/bin/bash
# Session-3 sweep for round-4 directive 1, after the host-side serving fixes
# (u8 pixels straight from the processor, quiet-gap idle-burst gather,
# batched completion decode_actions) and the Mosaic kv8 scale-layout fix
# (ops/decode_step.py: pre-flattened (L, Nkv, 1, M*S) scale rows — the
# in-kernel (M, S) -> (1, M*S) f32 collapse was an unsupported shape cast
# that killed every kv8 fused-decode compile since the batched-attention
# rewrite).
#
# Operating point per the block11_sync analysis: one-dispatch retirement
# (decode_block=11), full-batch hysteresis (min_free=16), and an adaptive
# gather window (quiet 15 ms, cap 250 ms) that tracks the closed-loop
# clients' actual resubmission burst instead of truncating it at 60 ms.
#
#   PYTHONPATH=/root/.axon_site:/root/repo bash scripts/measure_round4c.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/.axon_site:$PWD"
OUT=MEASURE_ROUND4.jsonl

run() {  # run <tag> <env...> -- <cmd...>
    local tag="$1"; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    echo "=== $tag ==="
    if timeout 1800 env "${envs[@]}" "$@" > /tmp/measure_out.txt 2>&1; then
        local line
        line=$(grep -E '^\{' /tmp/measure_out.txt | tail -1)
        echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" >> "$OUT"
        echo "$line"
    else
        echo "{\"tag\": \"$tag\", \"result\": null, \"error\": \"rc=$? or timeout\"}" >> "$OUT"
        tail -5 /tmp/measure_out.txt
    fi
}

python scripts/tpu_health.py --timeout 420 || { echo "tunnel not healthy — aborting"; exit 2; }

# the tuned sync operating point with the adaptive gather
run serve_16c_split_sync_quiet _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --split --pad_multiple 16 \
    --decode_block 11 --prefill_min_free 16 \
    --prefill_wait_ms 250 --prefill_quiet_ms 15

# longer run (edge effects amortized) — the headline candidate
run serve_16c_split_sync_quiet_long _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 --bits 8 --split --pad_multiple 16 \
    --decode_block 11 --prefill_min_free 16 \
    --prefill_wait_ms 250 --prefill_quiet_ms 15

# mixed (kv8 + mlp4) at the same operating point — first measured run of
# the config the Mosaic bug blocked
run serve_16c_split_mixed_quiet _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 --bits 8 --kv_bits 8 --mlp_bits 4 --split \
    --pad_multiple 16 --decode_block 11 --prefill_min_free 16 \
    --prefill_wait_ms 250 --prefill_quiet_ms 15

# kv8-only split (isolates the int8-cache DMA saving at full occupancy)
run serve_16c_split_kv8_quiet _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 --bits 8 --kv_bits 8 --split \
    --pad_multiple 16 --decode_block 11 --prefill_min_free 16 \
    --prefill_wait_ms 250 --prefill_quiet_ms 15

# monolithic kv8 regression check (bench.py variant broken since the
# batched-attention rewrite; now fixed)
run int8_kv8_fixed SPATIALVLA_BENCH_BITS=8 SPATIALVLA_BENCH_KV_BITS=8 -- python bench.py

# headline guard: the scale-layout change must not move the default config
run headline_int8_s3 _X=1 -- python bench.py

echo "sweep complete -> $OUT"
