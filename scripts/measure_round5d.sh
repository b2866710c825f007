#!/bin/bash
# Round-5 sweep D: the 16-client directive configs under the idle
# run-ahead drain (5c2d7c2), plus a fresh headline bench to put the
# kernel-config smoke matrix's per-config drift values on-chip on record.
#
#   PYTHONPATH=/root/.axon_site:/root/repo bash scripts/measure_round5d.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/.axon_site:$PWD"
OUT=MEASURE_ROUND5.jsonl
CONSECUTIVE_FAILS=0

already_done() {
    grep -q "\"tag\": \"$1\", \"result\": {" "$OUT" 2>/dev/null
}

run() {  # run <tag> <env...> -- <cmd...>
    local tag="$1"; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    if already_done "$tag"; then echo "=== $tag (cached) ==="; return 0; fi
    echo "=== $tag ==="
    if timeout 1800 env "${envs[@]}" "$@" > /tmp/measure_out.txt 2>&1; then
        local line
        line=$(grep -E '^\{' /tmp/measure_out.txt | tail -1)
        echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" >> "$OUT"
        echo "$line"
        CONSECUTIVE_FAILS=0
    else
        echo "{\"tag\": \"$tag\", \"result\": null, \"error\": \"rc=$? or timeout\"}" >> "$OUT"
        tail -5 /tmp/measure_out.txt
        CONSECUTIVE_FAILS=$((CONSECUTIVE_FAILS + 1))
        if [ "$CONSECUTIVE_FAILS" -ge 2 ]; then
            echo "two consecutive failures — tunnel likely wedged, aborting sweep"
            exit 3
        fi
    fi
}

python scripts/tpu_health.py --timeout 420 || { echo "tunnel not healthy — aborting"; exit 2; }

Q60="--bits 8 --split --pad_multiple 16 --decode_block 11 \
    --prefill_min_free 16 --prefill_wait_ms 400 --prefill_quiet_ms 60"

# the 16c/128 regime that broke its convoy mid-run without the drain
# (9.85 mean rows, 119.81) — the drain should sustain 16.0 / ~131+
run serve_16c_split_128_q60d _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $Q60
run serve_16c_split_64_q60d _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 $Q60
# kv8 at both lengths under the drain
run serve_16c_split_128_kv8_q60d _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $Q60 --kv_bits 8
run serve_16c_split_64_kv8_q60d _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 $Q60 --kv_bits 8
# 32c record config replicate under the drain (expect ~unchanged: the
# 32c queue depth already held the convoy)
run serve_32c_split_256_kv8_q60d _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 $Q60 --kv_bits 8
# fresh headline: bench.py now embeds the kernel-smoke per-config drift
# values in its JSON line (on-chip Mosaic compile + numerics, 8 configs)
run headline_int8_b _X=1 -- python bench.py

echo "sweep complete -> $OUT"
