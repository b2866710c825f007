#!/bin/bash
# Session-2 sweep for round-4 directive 1: the split engine's cost-model
# operating point (NOTES_ROUND4 "Split-engine cost model after the sweep"):
#   - decode_block=11: a row admitted at step 1 retires in ONE dispatch
#     (1 + 11 = 12 = 3*chunk tokens), no wasted 13th step / extra dispatch
#     round-trips.
#   - prefill_min_free=16 + prefill_wait_ms: 16 closed-loop clients
#     self-synchronize into Bp=16 prefill groups (idle-burst gather).
# Monolithic baseline first: cross-day host-speed calibration (r3 window
# measured 126.07; the slow 2026-08-19 window measured 94.06).
#
#   PYTHONPATH=/root/.axon_site:/root/repo bash scripts/measure_round4b.sh
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

# host-speed calibration point (r3: 126.07, slow window: 94.06)
run serve_16c_int8_monolithic_s2 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8

# the cost-model operating point: one-dispatch retirement + sync cycles
run serve_16c_split_block11_sync _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --split --pad_multiple 16 \
    --decode_block 11 --prefill_min_free 16 --prefill_wait_ms 60

# partial hysteresis: admit at half-batch (lower latency, maybe lower tput)
run serve_16c_split_block11_mf8 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --split --pad_multiple 16 \
    --decode_block 11 --prefill_min_free 8 --prefill_wait_ms 30

# block=4 with the same hysteresis: is one-dispatch retirement the win,
# or the batch-forming?
run serve_16c_split_block4_mf8 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8 --split --pad_multiple 16 \
    --decode_block 4 --prefill_min_free 8 --prefill_wait_ms 30

# longer run at the best-guess operating point (edge effects amortized)
run serve_16c_split_block11_sync_long _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 --bits 8 --split --pad_multiple 16 \
    --decode_block 11 --prefill_min_free 16 --prefill_wait_ms 60

echo "sweep complete -> $OUT"
