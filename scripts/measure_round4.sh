#!/bin/bash
# One-command TPU measurement sweep for the round-4 additions (VERDICT
# directives 1 and 5): split-phase continuous batching and the grouped-int4
# fold kernel.
#
# Run the moment the axon tunnel is healthy (scripts/tpu_health.py) — the
# window may be narrow, so the sweep is ordered directive-critical-first.
# Serializes every TPU job (ONE at a time per CLAUDE.md) and appends each
# JSON line to MEASURE_ROUND4.jsonl with its config tag, so a partial sweep
# still leaves usable numbers.
#
#   PYTHONPATH=/root/.axon_site:/root/repo bash scripts/measure_round4.sh
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
        tail -3 /tmp/measure_out.txt
    fi
}

python scripts/tpu_health.py --timeout 420 || { echo "tunnel not healthy — aborting"; exit 2; }

# directive 1: split-phase serving, 16 closed-loop clients (target >=160
# actions/sec). First run pins on-chip token parity vs the monolithic path
# before the measured window.
run serve_16c_split_int8_parity _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --split --pad_multiple 16 --parity_check
run serve_16c_split_int8        _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --split --pad_multiple 16

# directive 5: grouped-int4 fold kernel (target: >= per-channel int8's 76.6
# actions/sec, else demote the docstring/README recommendation)
run int4_g128_fold SPATIALVLA_BENCH_BITS=4 SPATIALVLA_BENCH_GROUP=128 -- python bench.py

# headline regression check after the batched-decode-attention + P-width
# prefill changes (bench.py asserts fused-vs-XLA parity on-chip every run)
run headline_int8 _X=1 -- python bench.py

# split-engine knob sweep around the directive-1 operating point
run serve_16c_split_int8_pad64   _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --split
run serve_16c_split_int8_minfree4 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --split --pad_multiple 16 --prefill_min_free 4
run serve_16c_split_int8_block8  _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --split --pad_multiple 16 --decode_block 8
run serve_16c_split_mixed        _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --kv_bits 8 --mlp_bits 4 --split --pad_multiple 16

# monolithic baseline on today's host (the 126.07 r3 comparison point)
run serve_16c_int8_monolithic _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8

# quant variants after the fold-kernel change (int4 per-channel should be
# unchanged; g16 exercises the small-group path)
run int4_perchannel SPATIALVLA_BENCH_BITS=4 -- python bench.py

echo "sweep complete -> $OUT"
