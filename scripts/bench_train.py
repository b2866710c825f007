"""Training-throughput benchmark: one reproducible JSON line for the
train-step envelope (the reference's counterpart is the HF Trainer logs of
torchrun_pretrain.sh; this makes the repo's recorded numbers — e.g.
NOTES_ROUND2.md's 656 ms/step flagship B2xT2048 LoRA envelope — a command
instead of an ad-hoc session).

Defaults reproduce the recorded envelope: flagship 4B (SigLIP + ZoeDepth +
Gemma2), batch 2 x seq 2048 with ~298 real tokens per row (the reference's
actual pretrain sparsity — samples pad to seq_len 2048), remat, Pallas
flash attention fwd+bwd, chunked CE, LoRA-r32 trainables (full-4B AdamW
does not fit one 16 GB chip; fwd/bwd FLOPs through the frozen base match
full pretrain).

Usage (real TPU):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_train.py
    # full-parameter tiny smoke on CPU (also exercised by tests):
    ... bench_train.py --preset spatialvla_tiny --full --batch 2 --seq 64 \
        --attn xla --reps 2 --sets 1

Timing per CLAUDE.md tunnel rules: each set is `reps` dispatches of the ONE
jitted step with a single host-transfer sync at the end; the metric is the
min over sets of the per-step mean.
"""
import argparse
import json
import time

import numpy as np


def make_batch(cfg, B, seq, real_tokens, rng):
    import jax.numpy as jnp

    N = cfg.num_image_tokens
    n_action = 12
    n_text = max(real_tokens - N - n_action, 1)
    real = N + n_text + n_action
    assert real <= seq, f"{real} real tokens exceed seq {seq}"
    ids = np.concatenate(
        [
            np.full((B, N), cfg.image_token_index),
            rng.randint(10, 1000, (B, n_text)),
            rng.randint(
                cfg.action_token_begin_idx,
                cfg.action_token_begin_idx + cfg.spatial_token_num,
                (B, n_action),
            ),
            np.zeros((B, seq - real), np.int64),  # right pad
        ],
        axis=1,
    ).astype(np.int32)
    attn = np.zeros((B, seq), np.int32)
    attn[:, :real] = 1
    ttype = np.zeros((B, seq), np.int32)
    ttype[:, N + n_text : real] = 1
    labels = np.where((ttype == 1) & (attn == 1), ids, -100)
    s = cfg.vision.image_size
    # camera intrinsics: required whenever use_vision_zoe (the flagship
    # default) routes pixels through ZoeDepth -> backprojection (reference
    # scripts/intrinsics.json bridge K, rescaled to the model resolution)
    K = np.asarray(
        [[623.588 * s / 640, 0, 319.5 * s / 640],
         [0, 623.588 * s / 480, 239.5 * s / 480],
         [0, 0, 1.0]], np.float32,
    )
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(attn),
        "token_type_ids": jnp.asarray(ttype),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(rng.rand(B, s, s, 3).astype(np.float32)),
        "intrinsic": jnp.asarray(np.broadcast_to(K, (B, 3, 3)).copy()),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="spatialvla_4b",
                    choices=["spatialvla_4b", "spatialvla_tiny"])
    ap.add_argument("--full", action="store_true",
                    help="full-parameter AdamW instead of the LoRA envelope")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--real_tokens", type=int, default=298,
                    help="non-pad tokens per row (reference pretrain "
                         "sparsity: ~278-298 of seq 2048)")
    ap.add_argument("--attn", default="flash", choices=["xla", "flash"])
    ap.add_argument("--zoe", action="store_true",
                    help="force use_vision_zoe on the tiny preset (the "
                         "flagship always has it; lets CPU tests cover the "
                         "depth->backprojection train path)")
    ap.add_argument("--lora_rank", type=int, default=32)
    ap.add_argument("--loss_chunk", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sets", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from spatialvla_tpu.config import spatialvla_4b, spatialvla_tiny
    from spatialvla_tpu.models import spatialvla
    from spatialvla_tpu.train import (
        OptimizerConfig,
        TrainStepConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
        trainable_mask,
    )
    from spatialvla_tpu.train.lora import TARGET_PRESETS
    from spatialvla_tpu.train.train_step import (
        init_lora_train_state,
        make_lora_train_step,
    )

    flagship = args.preset == "spatialvla_4b"
    cfg = spatialvla_4b() if flagship else spatialvla_tiny(use_vision_zoe=args.zoe)
    lora = not args.full

    dtype = jnp.bfloat16 if lora else jnp.float32
    params = jax.jit(
        lambda k: spatialvla.init_params(k, cfg, dtype=dtype)
    )(jax.random.PRNGKey(0))

    ocfg = OptimizerConfig(learning_rate=1e-4, total_steps=100, schedule="constant")
    scfg = TrainStepConfig(
        use_remat=True,
        compute_dtype=jnp.bfloat16,
        attn_backend=args.attn,
        loss_chunk_size=args.loss_chunk,
    )
    if lora:
        tx = make_optimizer(ocfg, None, None)
        state = init_lora_train_state(
            jax.random.PRNGKey(1), params, tx,
            target_patterns=TARGET_PRESETS["linear"], rank=args.lora_rank,
        )
        step = make_lora_train_step(cfg, tx, scfg, rank=args.lora_rank)
        jstep = jax.jit(step, donate_argnums=(0,))
        step_args = (params,)
    else:
        mask = trainable_mask(params, freeze_llm_embed=True)
        tx = make_optimizer(ocfg, params, mask)
        state = init_train_state(params, tx)
        step = make_train_step(cfg, tx, scfg)
        jstep = jax.jit(step, donate_argnums=(0,))
        step_args = ()

    batch = make_batch(cfg, args.batch, args.seq, args.real_tokens,
                       np.random.RandomState(0))

    # warmup/compile (np.asarray sync: block_until_ready unreliable on axon)
    for _ in range(2):
        state, metrics = jstep(state, *step_args, batch)
    loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss), loss

    best = float("inf")
    for _ in range(args.sets):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            state, metrics = jstep(state, *step_args, batch)
        np.asarray(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / args.reps)

    result = {
        "metric": "%s %s train step (B%d x T%d, %s attn, remat, chunked CE)" % (
            args.preset,
            "LoRA-r%d" % args.lora_rank if lora else "full-AdamW",
            args.batch, args.seq, args.attn,
        ),
        "ms_per_step": round(best * 1e3, 1),
        "samples_per_sec": round(args.batch / best, 2),
        "loss": round(loss, 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
