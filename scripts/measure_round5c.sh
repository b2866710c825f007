#!/bin/bash
# Round-5 sweep C: break the partial-cohort lock-in with a longer
# quiet-gap gather window.
#
# Diagnosis from sweeps A/B: with prefill_min_free=16 the engine is
# BISTABLE. Phase-locked full-16 convoys (16c kv8: mean_prefill_rows
# 16.0, 139.1 actions/sec) retire together, resubmit together, and
# re-admit full buckets. But once a group forms partial, retirements
# stagger forever: free<16 blocks admission mid-decode, and at each full
# drain only the OTHER cohort's ~7-9 resubmissions are queued, so the
# alternation self-perpetuates (16c bf16: 9.14 rows; 32c: 6.92 — the
# 1-core host's completer+client churn outlasts the 15 ms quiet gap, so
# stragglers miss the window). A quiet gap of ~60 ms covers the
# resubmission burst (~3-5 ms/client of host work) at a cost of ~60 ms
# device idle per ~460 ms convoy cycle — packing (+40%) dominates.
#
#   PYTHONPATH=/root/.axon_site:/root/repo bash scripts/measure_round5c.sh
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

# the directive-1 configs with the straggler-covering window
run serve_16c_split_128_q60 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $Q60
run serve_16c_split_64_q60 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 $Q60
# kv8 on top (the 139.1 config, now with the window holding the convoy)
run serve_16c_split_128_kv8_q60 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $Q60 --kv_bits 8
# offered-load scaling with the window
run serve_32c_split_256_q60 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 $Q60
run serve_32c_split_256_kv8_q60 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 $Q60 --kv_bits 8
# the 177.88 record config + the covered window: occupancy was already
# 16.0 there, so this mostly checks the window does not cost throughput
run serve_32c_split_256_kv8_vis8_q60 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 $Q60 --kv_bits 8 --vision_bits 8
# wider window check: does 100 ms buy anything 60 leaves behind?
run serve_32c_split_256_kv8_q100 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 --bits 8 --split --pad_multiple 16 \
    --decode_block 11 --prefill_min_free 16 --prefill_wait_ms 500 \
    --prefill_quiet_ms 100 --kv_bits 8

echo "sweep complete -> $OUT"
