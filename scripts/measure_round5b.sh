#!/bin/bash
# Round-5 follow-on sweep: offered-load scaling (VERDICT directive 1).
#
# The 16-client runs are structurally capped for the split engine: 16
# closed-loop clients vs 16 decode slots means an arrival group can never
# fill the Bp=16 prefill bucket while slots are decoding (measured
# mean_prefill_rows 9.14 on the 16-bucket -> ~40% of front+prefill compute
# is filler rows). At 32 clients the queue keeps every prefill at the
# bucket's per-row asymptote (image_features 11.0 ms/row, prefill 8.9 —
# front_b16/b32 probes) and the persistent slots stay fully occupied.
# Monolithic runs the same offered load for the in-sweep comparison (its
# max_batch is 16 too; pipelined depth 3).
#
#   PYTHONPATH=/root/.axon_site:/root/repo bash scripts/measure_round5b.sh
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

SPLIT_FLAGS="--bits 8 --split --pad_multiple 16 --decode_block 11 \
    --prefill_min_free 16 --prefill_wait_ms 250 --prefill_quiet_ms 15"

# offered-load scaling: 32 closed-loop clients, 8 requests each
run serve_32c_int8_monolithic_256 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 --bits 8
run serve_32c_split_256 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 $SPLIT_FLAGS
# shorter 32c run: does the win hold without long-run amortization?
run serve_32c_split_128 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 4 $SPLIT_FLAGS
# 24 clients: the intermediate operating point
run serve_24c_split_192 _X=1 -- python scripts/bench_serve.py \
    --clients 24 --requests 8 $SPLIT_FLAGS

# cache trim retry at a prompt bound the warmup pool fits (the 288 row
# errored: 'push the green bowl...' pads to 304); cache_len 316 vs 332
run serve_16c_split_128_s304 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $SPLIT_FLAGS --max_prompt_len 304
# replicates: the 16c/128 split baseline and its vis8 variant moved
# 113.23 -> 130.88 with occupancy 9.14 -> 11.64 — separate the knob's
# effect from group-formation variance
run serve_16c_split_128_b _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $SPLIT_FLAGS
run serve_16c_split_128_vis8_b _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $SPLIT_FLAGS --vision_bits 8
# 32c + vis8: stack the two if vis8 replicates
run serve_32c_split_256_vis8 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 $SPLIT_FLAGS --vision_bits 8
# kv8 hit 139.1 at 16c/128 (full 16-row groups, occupancy 16.0,
# decode_dispatches 8): stack it with the 32c offered load
run serve_32c_split_256_kv8 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 $SPLIT_FLAGS --kv_bits 8
run serve_32c_split_256_kv8_vis8 _X=1 -- python scripts/bench_serve.py \
    --clients 32 --requests 8 $SPLIT_FLAGS --kv_bits 8 --vision_bits 8

echo "sweep complete -> $OUT"
