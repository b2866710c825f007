"""End-of-round benchmark: flagship spatialvla-4b-224 greedy action
inference on one TPU chip (full model: SigLIP + ZoeDepth + Ego3D + Gemma2,
int8 weight-only LM + int8 vision-front serving — ops/quant.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference serves spatialvla-4b bf16 on one A100 (README.md:93,
8.5 GB inference). No actions/sec number is published; the denominator is a
roofline-derived A100-80GB-SXM estimate of the reference's eager-HF stack on
the same workload (prefill ~266 tokens + 11 sequential decode steps + HF
generate overhead, action chunk 4): ~57 actions/sec. Full line-item
derivation + sensitivity band: BASELINE.md "A100 inference denominator".
vs_baseline = ours / 57.
"""
import gc
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_BASELINE_ACTIONS_PER_SEC = 57.0  # derived in BASELINE.md, not published
ACTION_CHUNK = 4  # actions per generate call (3 tokens each)
# SPATIALVLA_BENCH_BITS=4 switches the LM to packed-int4 weight streaming
# (ops/quant.py) — quality-gated, NOT the default headline configuration
QUANT_BITS = int(os.environ.get("SPATIALVLA_BENCH_BITS", "8"))
# SPATIALVLA_BENCH_MLP_BITS=4 packs only the MLP matmuls to int4 (the
# mixed sweet spot: ~0.58x the int8 weight stream with the error kept out
# of the attention logits and the lm_head); quality-gated like int4
MLP_BITS = int(os.environ.get("SPATIALVLA_BENCH_MLP_BITS", "0")) or None
# SPATIALVLA_BENCH_GROUP: int4 scale granularity along K (default 0 =
# per-channel, the fast format — 95.8 actions/sec; 128 = grouped scales,
# ~23% less quant error but ~1.8x slower decode, 54.0 actions/sec —
# MEASURE_ROUND3.jsonl)
GROUP_SIZE = int(os.environ.get("SPATIALVLA_BENCH_GROUP", "0")) or None
# SPATIALVLA_BENCH_DEPTH_RES=256 runs the ZoeDepth stack at a reduced
# internal resolution (opt-in quality trade, zoe.predict_depth); 0 = native
DEPTH_RES = int(os.environ.get("SPATIALVLA_BENCH_DEPTH_RES", "0")) or None
# SPATIALVLA_BENCH_KV_BITS=8 serves with the int8 KV cache (per-slot
# scales, near-lossless; matters at batch >= 8 where the cache is ~1/3 of
# decode HBM traffic — at B=1 it is noise)
KV_BITS = int(os.environ.get("SPATIALVLA_BENCH_KV_BITS", "0")) or None
# SPATIALVLA_BENCH_VISION_BITS=8 additionally quantizes the vision front
# (SigLIP + zoe backbone + projector). Default off for the HEADLINE: the
# bench host's MXU is virtualized/throttled, so the front is compute-bound
# there and weight-streaming cuts measure neutral-to-negative
# (NOTES_ROUND3.md); on real v5e parts the B=1 front is bandwidth-bound
# and int8 should pay. Serving users opt in via policy.quantize().
VISION_BITS = int(os.environ.get("SPATIALVLA_BENCH_VISION_BITS", "0"))


# SPATIALVLA_BENCH_SMOKE=0 skips the per-config kernel smoke matrix (it
# adds ~a minute of compiles; the headline figure is unaffected either way)
RUN_SMOKE = os.environ.get("SPATIALVLA_BENCH_SMOKE", "1") != "0"


def _kernel_config_smoke():
    """On-chip Mosaic compile/run + numerics sweep over every serving-
    relevant fused-decode config: {int8, int4, int4-g128, int8+mlp4} x
    {bf16 KV, int8 KV}, at serving shapes (M=16, S=332, per-row position
    vector) on a 2-layer flagship-cross-section LM.

    Why: interpret-mode parity tests are green while Mosaic compiles red —
    twice now (r2 zoe conv, r4 kv8 scale layout, MEASURE_ROUND4
    serve_16c_split_mixed) — and the main bench gate only covers the
    default config at B=1. One decode step per config catches the third
    instance before a load test does (round-4 VERDICT directive 4). Each
    config also checks numerics against the XLA serving path, so a wrong-
    but-running layout fails too. Per-config results go to stderr; the
    driver's one-line stdout contract is untouched (the headline JSON
    additionally carries a compact "kernel_smoke" summary so the matrix
    leaves a persistent artifact in BENCH_r*.json)."""
    import sys

    results = []

    from spatialvla_tpu.config import Gemma2Config
    from spatialvla_tpu.models import gemma2
    from spatialvla_tpu.ops.decode_step import flatten_kv_scales, fused_decode_step
    from spatialvla_tpu.ops.quant import quantize_kv, quantize_lm_params

    tcfg = Gemma2Config(
        vocab_size=2048, hidden_size=2304, intermediate_size=9216,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=256,
        sliding_window=4096, query_pre_attn_scalar=256.0,
    )
    M, S, P = 16, 332, 300
    L, Nkv, D = tcfg.num_layers, tcfg.num_kv_heads, tcfg.head_dim
    rng = np.random.RandomState(11)
    base = gemma2.init_params(jax.random.PRNGKey(42), tcfg, dtype=jnp.bfloat16)
    emb_raw = jnp.asarray(
        rng.randn(M, tcfg.hidden_size).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    ck = jnp.asarray(
        (rng.randn(L, M, Nkv, S, D) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)
    cv = jnp.asarray(
        (rng.randn(L, M, Nkv, S, D) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)
    normalizer = jnp.asarray(tcfg.hidden_size**0.5, dtype=jnp.bfloat16)
    mask = jnp.broadcast_to(jnp.arange(S) <= P, (M, 1, 1, S))
    cache_xla = {
        "k": jnp.transpose(ck, (0, 1, 3, 2, 4)),
        "v": jnp.transpose(cv, (0, 1, 3, 2, 4)),
    }
    pos_vec = jnp.full((M,), P, jnp.int32)  # the serving per-row-vector path

    WEIGHTS = (
        ("int8", dict(bits=8)),
        ("int4", dict(bits=4)),
        ("int4-g128", dict(bits=4, group_size=128)),
        ("int8+mlp4", dict(bits=8, mlp_bits=4)),
    )
    import functools

    for name, qkw in WEIGHTS:
        qp = jax.jit(
            functools.partial(quantize_lm_params, fuse=True, **qkw)
        )(base)
        hx, _ = jax.jit(
            lambda p, e: gemma2.forward(
                p, tcfg, e[:, None, :], jnp.full((M, 1), P + 1), mask,
                cache=cache_xla, cache_position=P,
            )
        )(qp, emb_raw)
        hx_np = np.asarray(hx[:, 0], np.float32)
        scale_ref = np.abs(hx_np).max() + 1e-6
        for kv_name, kv8 in (("bf16kv", False), ("kv8", True)):
            if kv8:
                ck_in, ks = quantize_kv(ck)
                cv_in, vs = quantize_kv(cv)
                kw = {
                    "cache_k_scale": flatten_kv_scales(ks),
                    "cache_v_scale": flatten_kv_scales(vs),
                }
                tol = 0.08  # + int8-cache noise (test_decode_step envelopes)
            else:
                ck_in, cv_in, kw = ck, cv, {}
                tol = 0.05
            hf, _, _ = jax.jit(
                lambda p, x, k, v, kwd: fused_decode_step(
                    p, tcfg, x, k, v, pos_vec, pos_vec + 1, **kwd
                )
            )(qp, emb_raw * normalizer, ck_in, cv_in, kw)
            drift = float(
                np.abs(np.asarray(hf, np.float32) - hx_np).max() / scale_ref
            )
            assert drift < tol, (
                f"kernel smoke {name}+{kv_name}: fused-vs-XLA drift "
                f"{drift:.4f} >= {tol}"
            )
            print(
                f"bench smoke: {name}+{kv_name} ok (rel drift {drift:.4f})",
                file=sys.stderr, flush=True,
            )
            results.append(f"{name}+{kv_name}:{drift:.4f}")
    return results


def _watchdog(done, delay=300):
    """If the axon pool claim wedges (outages can last hours —
    NOTES_ROUND3.md), the bench would hang silently until the caller's
    timeout; say WHY on stderr so the recorded tail is a diagnosis."""
    import sys
    import threading

    def bark():
        if not done.wait(delay):
            print(
                "bench: no device work retired after "
                f"{delay}s — the axon tunnel is likely stuck in pool claim "
                "(run scripts/tpu_health.py for the staged diagnosis)",
                file=sys.stderr, flush=True,
            )

    threading.Thread(target=bark, daemon=True).start()


def main():
    import threading

    done = threading.Event()
    _watchdog(done)
    from __graft_entry__ import _example_batch, _flagship_cfg
    from spatialvla_tpu.models import spatialvla
    from spatialvla_tpu.ops.quant import quantize_lm_params, quantize_vision_params

    from spatialvla_tpu.models.zoe import precompute_rel_bias

    cfg = _flagship_cfg()

    # int8/int4 weight-only LM (decode is HBM-bandwidth bound), optional
    # int8 vision front, precomputed ZoeDepth relative-position bias
    # (gather-free backbone). Init + quantize run as ONE jitted program so
    # the bf16 LM and the quantization's f32 temporaries are program-
    # internal and never resident together with the final tree: the staged
    # materialize-bf16-then-quantize flow peaks over HBM at bits=4 with
    # grouped scales (the (L, G, 128, N) f32 reshape materializes full-
    # tensor copies that per-channel's fused amax reduction never does).
    def build(key):
        p = spatialvla.init_params(key, cfg, dtype=jnp.bfloat16)
        p = dict(p)
        p["lm"] = quantize_lm_params(
            p["lm"], bits=QUANT_BITS, mlp_bits=MLP_BITS, group_size=GROUP_SIZE
        )
        p["zoe"] = precompute_rel_bias(p["zoe"], cfg.zoe, image_size=DEPTH_RES)
        if VISION_BITS:
            p = quantize_vision_params(p, bits=VISION_BITS)
        return p

    params = jax.jit(build)(jax.random.PRNGKey(0))
    # block_until_ready is NOT reliable on the axon backend (CLAUDE.md):
    # sync via tiny dependent host transfers so the build retires before
    # the predict program's transients enqueue
    for leaf in jax.tree_util.tree_leaves(params):
        np.asarray(leaf[(0,) * leaf.ndim])
    done.set()  # device work retired: the tunnel is alive (watchdog off)
    gc.collect()

    batch = _example_batch(cfg, B=1, n_text=10, n_action=0)
    prefix_len = int(batch["input_ids"].shape[1])

    @jax.jit
    def predict(params, input_ids, pixel_values, intrinsic):
        return spatialvla.predict_action(
            params, cfg, input_ids,
            pixel_values=pixel_values, intrinsic=intrinsic,
            action_chunk_size=ACTION_CHUNK, compute_dtype=jnp.bfloat16,
            depth_image_size=DEPTH_RES, kv_bits=KV_BITS,
        )

    args = (params, batch["input_ids"], batch["pixel_values"], batch["intrinsic"])
    # warmup/compile (sync via host transfer: block_until_ready is not
    # reliable on the experimental axon backend)
    np.asarray(predict(*args))

    # on-TPU kernel-vs-XLA parity gate: one fused whole-LM decode step must
    # match the XLA serving path on the real platform (the CI suite covers
    # interpret mode only)
    from spatialvla_tpu.models import gemma2
    from spatialvla_tpu.ops.decode_step import fused_decode_step

    tcfg = cfg.text
    S = 32
    rngp = np.random.RandomState(7)
    x1 = jnp.asarray(rngp.randn(1, 1, tcfg.hidden_size).astype(np.float32)).astype(jnp.bfloat16)
    cache = gemma2.init_cache(tcfg, 1, S, dtype=jnp.bfloat16)
    pos = jnp.arange(1, 9)[None]
    pre = jnp.asarray(rngp.randn(1, 8, tcfg.hidden_size).astype(np.float32)).astype(jnp.bfloat16)
    mask = jnp.broadcast_to(jnp.arange(S) < 8, (1, 1, 8, S))
    _, cache = gemma2.forward(params["lm"], tcfg, pre, pos, mask, cache=cache, cache_position=0)
    smask = jnp.broadcast_to(jnp.arange(S) <= 8, (1, 1, 1, S))
    hx, _ = gemma2.forward(
        params["lm"], tcfg, x1, jnp.full((1, 1), 9), smask, cache=cache, cache_position=8
    )
    normalizer = jnp.asarray(tcfg.hidden_size**0.5, dtype=jnp.bfloat16)
    hf, _, _ = jax.jit(
        lambda p, x, ck, cv: fused_decode_step(
            p, tcfg, x, ck, cv, jnp.int32(8), jnp.int32(9)
        )
    )(
        params["lm"], x1[:, 0] * normalizer,
        jnp.transpose(cache["k"], (0, 1, 3, 2, 4)),
        jnp.transpose(cache["v"], (0, 1, 3, 2, 4)),
    )
    d = np.abs(np.asarray(hf, np.float32) - np.asarray(hx[0], np.float32))
    scale_ref = np.abs(np.asarray(hx, np.float32)).max() + 1e-6
    assert d.max() / scale_ref < 0.02, f"fused-decode parity drift: {d.max()} vs {scale_ref}"

    smoke = None
    if RUN_SMOKE:
        # per serving-config Mosaic compile + numerics matrix (stderr lines;
        # a config that compiles in interpret mode but fails on Mosaic —
        # the r2-zoe/r4-kv8 class — dies here, not in a load test)
        smoke = _kernel_config_smoke()

    # min over 3 sets of 20 async dispatches with one host-transfer sync
    # each (bench_train's convention): the shared bench host adds 3-5%
    # run-to-run noise to a single loop (r2 recorded 76.42, an identical-
    # config r3 re-run 73.48); the min is the reproducible figure
    n_iters, n_sets = 20, 3
    dt = float("inf")
    for _ in range(n_sets):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = predict(*args)
        np.asarray(out)
        dt = min(dt, (time.perf_counter() - t0) / n_iters)

    actions_per_sec = ACTION_CHUNK / dt
    tag = ", int%d mlp" % MLP_BITS if MLP_BITS else ""
    tag += ", g%d scales" % GROUP_SIZE if GROUP_SIZE else ""
    tag += ", int%d front" % VISION_BITS if VISION_BITS else ""
    tag += ", depth@%d" % DEPTH_RES if DEPTH_RES else ""
    tag += ", int%d kv" % KV_BITS if KV_BITS else ""
    line = {
        "metric": "spatialvla-4b-224 greedy inference, full model incl. depth (chunk=4, prefix=%d, int%d LM%s)" % (prefix_len, QUANT_BITS, tag),
        "value": round(actions_per_sec, 2),
        "unit": "actions/sec/chip",
        "vs_baseline": round(actions_per_sec / A100_BASELINE_ACTIONS_PER_SEC, 3),
    }
    if smoke is not None:
        line["kernel_smoke"] = smoke
    print(json.dumps(line))


if __name__ == "__main__":
    main()
