#!/bin/bash
# One-command TPU measurement sweep for the round-3 additions.
#
# Run the moment the axon tunnel is healthy (scripts/tpu_health.py) — the
# window may be narrow. Serializes every TPU job (ONE at a time per
# CLAUDE.md) and appends each JSON line to MEASURE_ROUND3.jsonl with its
# config tag, so a partial sweep still leaves usable numbers.
#
#   PYTHONPATH=/root/.axon_site:/root/repo bash scripts/measure_round3.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/.axon_site:$PWD"
OUT=MEASURE_ROUND3.jsonl

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

# headline + quant variants (B=1 single-stream)
run headline_int8      _X=1 -- python bench.py
run int8_kv8           SPATIALVLA_BENCH_KV_BITS=8 -- python bench.py
run int8_mlp4          SPATIALVLA_BENCH_MLP_BITS=4 -- python bench.py
run int4               SPATIALVLA_BENCH_BITS=4 -- python bench.py
run int4_g128          SPATIALVLA_BENCH_BITS=4 SPATIALVLA_BENCH_GROUP=128 -- python bench.py
run int8_depth256      SPATIALVLA_BENCH_DEPTH_RES=256 -- python bench.py

# serving load (flagship random-init, engine + batched fused decode;
# pipeline_depth=2 is the engine default — the _sync tags pin the
# synchronous-dispatch baseline for the pipelining A/B)
run serve_16c_int8      _X=1 -- python scripts/bench_serve.py --clients 16 --requests 4 --bits 8
run serve_16c_int8_sync _X=1 -- python scripts/bench_serve.py --clients 16 --requests 4 --bits 8 --pipeline_depth 1
run serve_16c_int8_kv8  _X=1 -- python scripts/bench_serve.py --clients 16 --requests 4 --bits 8 --kv_bits 8
run serve_16c_mixed     _X=1 -- python scripts/bench_serve.py --clients 16 --requests 4 --bits 8 --kv_bits 8 --mlp_bits 4

# training envelope (LoRA-shaped flagship, the recorded 656 ms/step config)
run train_lora_b2t2048 _X=1 -- python scripts/bench_train.py --reps 3 --sets 2

echo "sweep complete -> $OUT"
