#!/bin/bash
# Round-5 TPU measurement sweep — VERDICT directives 1 (the 160 actions/sec
# split-phase bar, health-gated, with in-sweep monolithic baselines at BOTH
# run lengths), 3 (a GREEN --parity_check run with argmax margins on
# record), 4 (the bench.py kernel-config smoke matrix runs inside the
# headline job), and 7 (front scaling Bp=16/32 +- vision-int8 A/B inside
# the serving sweep).
#
# Run the moment the axon tunnel is healthy (scripts/tpu_health.py gates
# below) — outages can last hours, so the order is directive-critical
# first. ONE TPU job at a time (CLAUDE.md); each JSON line appends to
# MEASURE_ROUND5.jsonl with its tag, so a partial sweep still leaves
# usable numbers.
#
#   PYTHONPATH=/root/.axon_site:/root/repo bash scripts/measure_round5.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/.axon_site:$PWD"
OUT=MEASURE_ROUND5.jsonl

# Mid-sweep wedge guard: two consecutive failed/timed-out runs almost
# certainly mean the tunnel wedged under us; keeping going would burn 30
# min of killed clients per remaining run (which can EXTEND the wedge,
# CLAUDE.md). Abort instead; the babysitter loop re-fires the whole sweep
# after the next clean health probe, and completed tags are skipped below.
CONSECUTIVE_FAILS=0

already_done() {  # already_done <tag>: a non-null result is already on record
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

probe() {  # probe <tag> -- <cmd...>: capture the full stage table as text
    local tag="$1"; shift; shift
    if already_done "$tag"; then echo "=== $tag (cached) ==="; return 0; fi
    echo "=== $tag ==="
    if timeout 1800 "$@" > /tmp/measure_out.txt 2>&1; then
        # NB: pass the capture file as argv, NOT stdin — a heredoc script
        # would consume stdin itself and record "stages": [] (r5 bug)
        python -c '
import json, sys
lines = open(sys.argv[2]).read().strip().splitlines()
print(json.dumps({"tag": sys.argv[1], "result": {"stages": lines}}))
' "$tag" /tmp/measure_out.txt >> "$OUT"
        tail -8 /tmp/measure_out.txt
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

# (a) monolithic int8 depth-3 baseline — the exact r3 command (126.07 then);
# this calibrates today's host speed for every relative below
run serve_16c_int8_monolithic_64 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 --bits 8
run serve_16c_int8_monolithic_128 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 --bits 8

# (b) split block11 + quiet-gap gather at BOTH run lengths (the 64-request
# regime must not lose to monolithic — VERDICT directive 1)
run serve_16c_split_64 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 $SPLIT_FLAGS
run serve_16c_split_128 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $SPLIT_FLAGS

# (c) the GREEN parity run with margins on record (small measured phase;
# the parity block runs before it and fails the job on any violation)
run serve_16c_split_parity _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 2 $SPLIT_FLAGS --parity_check

# headline + the new kernel-config smoke matrix (directive 4: per-config
# Mosaic compile/numerics lines land on stderr of this job)
run headline_int8 _X=1 -- python bench.py

# (7) front scaling: image_features ms/row at Bp=16/32 (r4 measured 15.6
# at Bp=8, still falling) +- the gated int8 vision front
probe front_b16_vis8 -- python scripts/profile_front.py --batch 16
probe front_b32_vis8 -- python scripts/profile_front.py --batch 32
probe front_b16_visbf16 -- python scripts/profile_front.py --batch 16 --vision_bits 0

# (7) vision-int8 A/B inside the serving sweep (it lost at B=1 on the
# throttled MXU; batched serving fronts may differ)
run serve_16c_split_128_vis8 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $SPLIT_FLAGS --vision_bits 8

# tighter slot capacity: max_prompt_len 288 -> cache_len 300 (vs 332) cuts
# the decode kernel's per-step cache read ~10% (pool prompts pad to <= 272)
run serve_16c_split_128_s300 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $SPLIT_FLAGS --max_prompt_len 288

# longer split run: warm-slot amortization headroom check
run serve_16c_split_256 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 16 $SPLIT_FLAGS

# int8 KV cache on the fused decode path: cache reads are ~1/3 of decode
# HBM traffic at 16 slots, so kv8 should cut the decode floor ~1/6; the
# r4 crash class is covered by the bench.py smoke matrix now
run serve_16c_split_128_kv8 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 8 $SPLIT_FLAGS --kv_bits 8
run serve_16c_split_64_kv8 _X=1 -- python scripts/bench_serve.py \
    --clients 16 --requests 4 $SPLIT_FLAGS --kv_bits 8

echo "sweep complete -> $OUT"
