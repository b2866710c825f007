"""Decompose the B=1 serving latency of spatialvla-4b-224 into stages.

Per CLAUDE.md tunnel rules: each stage is ONE jitted function dispatched in a
20-iteration python loop with a single np.asarray sync at the end; numbers
below ~5 ms are dispatch-bound and only indicative.

Usage: PYTHONPATH=/root/repo python scripts/profile_front.py [--bits 8] [--vision_bits 0]
"""
import argparse
import gc
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--vision_bits", type=int, default=8,
                    help="0 keeps the vision front bf16")
    ap.add_argument("--depth_res", type=int, default=0,
                    help=">0 runs zoe at a reduced internal resolution")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1,
                    help="replicate the observation to B rows: probes the "
                         "serving prefill-bucket front cost per row "
                         "(round-4 NOTES: image_features 30 -> 15.6 ms/row "
                         "from Bp=1 to 8 and still falling — this measures "
                         "Bp=16/32)")
    args = ap.parse_args()

    from __graft_entry__ import _example_batch, _flagship_cfg
    from spatialvla_tpu.models import spatialvla, siglip, gemma2
    from spatialvla_tpu.models.zoe import precompute_rel_bias, predict_depth
    from spatialvla_tpu.ops.quant import quantize_lm_params, quantize_vision_params

    depth_res = args.depth_res or None
    cfg = _flagship_cfg()

    # init + quantize as ONE jitted program (same HBM reasoning as bench.py:
    # the staged materialize-bf16-then-quantize flow peaks over HBM at
    # bits=4 with grouped scales)
    def build(key):
        p = spatialvla.init_params(key, cfg, dtype=jnp.bfloat16)
        p = dict(p)
        p["lm"] = quantize_lm_params(p["lm"], bits=args.bits)
        p["zoe"] = precompute_rel_bias(p["zoe"], cfg.zoe, image_size=depth_res)
        if args.vision_bits:
            p = quantize_vision_params(p, bits=args.vision_bits)
        return p

    params = jax.jit(build)(jax.random.PRNGKey(0))
    for leaf in jax.tree_util.tree_leaves(params):
        np.asarray(leaf[(0,) * leaf.ndim])
    gc.collect()

    batch = _example_batch(cfg, B=1, n_text=10, n_action=0)
    ids, px, intr = batch["input_ids"], batch["pixel_values"], batch["intrinsic"]
    B = args.batch
    if B > 1:
        ids = jnp.concatenate([ids] * B)
        px = jnp.concatenate([px] * B)
        intr = jnp.concatenate([intr] * B)
    P = int(ids.shape[1])
    report = {}

    # 1. full predict
    @jax.jit
    def predict(params, ids, px, intr):
        return spatialvla.predict_action(
            params, cfg, ids, pixel_values=px, intrinsic=intr,
            action_chunk_size=4, compute_dtype=jnp.bfloat16,
            depth_image_size=depth_res)
    report["full_predict"] = timeit(predict, (params, ids, px, intr), args.iters)

    # 2. zoe depth
    @jax.jit
    def zoe_fn(params, px):
        return predict_depth(params["zoe"], cfg.zoe, px.astype(jnp.bfloat16),
                             target_hw=(224, 224), image_size=depth_res)
    report["zoe_depth"] = timeit(zoe_fn, (params, px), args.iters)

    # 3. siglip tower alone
    @jax.jit
    def siglip_fn(params, px):
        sp = (px.astype(jnp.bfloat16) - 0.5) / 0.5
        return siglip.forward(params["vision"], cfg.vision, sp)
    report["siglip"] = timeit(siglip_fn, (params, px), args.iters)

    # 4. full vision front (zoe + siglip + ego3d + projector)
    @jax.jit
    def feats_fn(params, px, intr):
        return spatialvla.get_image_features(
            params, cfg, px, intr, compute_dtype=jnp.bfloat16,
            depth_image_size=depth_res)
    report["image_features"] = timeit(feats_fn, (params, px, intr), args.iters)

    feats = feats_fn(params, px, intr)

    # 5. prefill (embed merge + gemma2 forward writing the cache)
    S = P + 12

    @jax.jit
    def prefill_fn(params, ids, feats):
        embeds = spatialvla.merge_input_embeddings(
            params, cfg, ids, feats, dtype=jnp.bfloat16)
        cache = gemma2.init_cache(cfg.text, B, S, dtype=jnp.bfloat16)
        pos = jnp.broadcast_to(jnp.arange(1, P + 1)[None], (B, P))
        mask = spatialvla.bidirectional_prefill_mask(P, S, B)
        hidden, cache = gemma2.forward(
            params["lm"], cfg.text, embeds, pos, mask, cache=cache,
            cache_position=0)
        return hidden, cache
    report["prefill"] = timeit(prefill_fn, (params, ids, feats), args.iters)

    decode = report["full_predict"] - report["image_features"] - report["prefill"]
    for k, v in report.items():
        suffix = f"  ({v*1e3/B:6.2f} ms/row)" if B > 1 else ""
        print(f"{k:>18}: {v*1e3:8.2f} ms{suffix}")
    print(f"{'decode (resid)':>18}: {decode*1e3:8.2f} ms  (~{decode/11*1e3:.2f} ms/step x 11)")


if __name__ == "__main__":
    main()
