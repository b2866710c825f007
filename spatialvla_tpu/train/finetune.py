"""Fine-tuning entry point (reference: train/spatialvla_finetune.py).

Loads a pretrained checkpoint + its processor, optionally re-grids the
spatial-token embeddings to the fine-tune data's Gaussian action statistics
(--adapt_emb, reference :229-238), and trains either the full model or LoRA
adapters (target presets 'linear' / 'linear+emb' / 'linear+emb+h' with the
spatial embedding in modules_to_save, reference :262-302). New-mixture
statistics are merged into the processor so old unnorm keys survive
(reference :315-327).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_dir", type=str, required=True,
                   help="dir with exported params + processor_config.json")
    p.add_argument("--data_root_dir", type=str, required=True)
    p.add_argument("--mixture", type=str, default="uiuc_d3field")
    p.add_argument("--output_dir", type=str, required=True)
    # lora
    p.add_argument("--use_lora", action="store_true")
    p.add_argument("--lora_rank", type=int, default=32)
    p.add_argument("--lora_alpha", type=float, default=32.0)
    p.add_argument("--lora_target", type=str, default="linear",
                   choices=["linear", "linear+emb", "linear+emb+h"])
    # adaptation
    p.add_argument("--adapt_emb", type=str, default=None,
                   help="gaussian stats json to re-grid spatial embeddings to")
    p.add_argument("--tokenizer_path", type=str, default=None,
                   help="override the tokenizer persisted beside the "
                        "pretrained checkpoint")
    p.add_argument("--prompt_template", type=str, default=None,
                   help="opt-in prompt template; default is the bare "
                        "lowercased instruction (reference parity)")
    p.add_argument("--min_sigma", type=float, default=0.0)
    # optimization
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--warmup_ratio", type=float, default=0.005)
    p.add_argument("--max_steps", type=int, default=10_000)
    p.add_argument("--per_device_batch_size", type=int, default=2)
    p.add_argument("--seq_len", type=int, default=320)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--action_forward_steps", type=int, default=3)
    p.add_argument("--shuffle_buffer_size", type=int, default=2048)
    p.add_argument("--attn_backend", type=str, default="flash",
                   choices=["xla", "flash", "ring", "pipeline"])
    p.add_argument("--mesh_sp", type=int, default=1,
                   help="sequence-parallel axis (ring attention); >1 "
                        "auto-selects attn_backend=ring")
    p.add_argument("--mesh_pp", type=int, default=1,
                   help="pipeline-parallel axis (GPipe decoder stages); >1 "
                        "auto-selects attn_backend=pipeline")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches per step (0 = one per stage)")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--loss_chunk_size", type=int, default=256)
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_fsdp", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--save_steps", type=int, default=10_000)
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--model_preset", type=str, default="spatialvla_4b",
                   choices=["spatialvla_4b", "spatialvla_tiny"])
    p.add_argument("--no_vision_zoe", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def build_everything(args):
    import dataclasses

    from ..config import spatialvla_4b, spatialvla_tiny
    from ..data import (
        FrameTransformConfig,
        InterleavedRLDSDataset,
        TrajTransformConfig,
        VLABatcher,
    )
    from ..models import spatialvla
    from ..parallel import (
        MeshConfig,
        form_global_batch,
        initialize_distributed,
        make_mesh,
        shard_params,
    )
    from ..processor import SpatialVLAProcessor
    from ..processor.text_tokenizer import load_text_tokenizer
    from . import (
        OptimizerConfig,
        TrainStepConfig,
        build_decode_luts,
        init_train_state,
        jit_train_step,
        make_optimizer,
        make_train_step,
        trainable_mask,
    )
    from .checkpoints import CheckpointManager, load_params
    from .lora import TARGET_PRESETS
    from .train_step import init_lora_train_state, make_lora_train_step

    initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )

    cfg = spatialvla_4b() if args.model_preset == "spatialvla_4b" else spatialvla_tiny()
    if args.no_vision_zoe:
        cfg = dataclasses.replace(cfg, use_vision_zoe=False, zoe=None)

    # processor from pretrained dir (restores the persisted tokenizer unless
    # overridden)
    text_tokenizer = (
        load_text_tokenizer(args.tokenizer_path) if args.tokenizer_path else None
    )
    processor = SpatialVLAProcessor.load(args.pretrained_dir, text_tokenizer)
    processor.action_chunk_size = args.action_forward_steps + 1

    mesh = make_mesh(
        MeshConfig(args.mesh_data, args.mesh_fsdp, args.mesh_model,
                   args.mesh_sp, args.mesh_pp)
    )
    if args.mesh_sp > 1 and args.attn_backend != "ring":
        print(f"mesh_sp={args.mesh_sp}: selecting attn_backend=ring")
        args.attn_backend = "ring"
    if args.mesh_pp > 1 and args.attn_backend != "pipeline":
        print(f"mesh_pp={args.mesh_pp}: selecting attn_backend=pipeline")
        args.attn_backend = "pipeline"
    params = spatialvla.init_params(jax.random.PRNGKey(args.seed), cfg)
    params = load_params(
        os.path.join(args.pretrained_dir), jax.tree_util.tree_map(np.asarray, params)
    )

    # optional spatial-embedding re-gridding to new gaussian stats
    if args.adapt_emb:
        gs = json.load(open(args.adapt_emb))
        new_emb = processor.action_tokenizer.adapt_to_gaussian(
            gs, min_sigma=args.min_sigma,
            embeddings=np.asarray(params["spatial_embed"], dtype=np.float32),
        )
        params = dict(params)
        params["spatial_embed"] = jnp.asarray(new_emb, dtype=params["spatial_embed"].dtype)
        # processor.bin_policy is a live view of the tokenizer's bins now

    params = shard_params(mesh, params)

    ds = InterleavedRLDSDataset(
        args.mixture,
        args.data_root_dir,
        traj_config=TrajTransformConfig(forward_window_size=args.action_forward_steps),
        frame_config=FrameTransformConfig(
            resize_size=(args.image_size, args.image_size)
        ),
        shuffle_buffer_size=args.shuffle_buffer_size,
        seed=args.seed + 3407 * jax.process_index(),
        shard_by_rank=(jax.process_index(), jax.process_count()),
    )
    # merge new statistics into processor (old unnorm keys survive)
    processor.statistics = {**processor.statistics, **ds.statistics}

    ocfg = OptimizerConfig(
        learning_rate=args.learning_rate,
        warmup_ratio=args.warmup_ratio,
        total_steps=args.max_steps,
    )
    luts = {
        k: jnp.asarray(v)
        for k, v in build_decode_luts(processor.action_tokenizer).items()
    }
    scfg = TrainStepConfig(
        use_remat=not args.no_remat,
        compute_dtype=jnp.bfloat16,
        attn_backend=args.attn_backend,
        pp_microbatches=args.pp_microbatches,
        loss_chunk_size=args.loss_chunk_size,
    )

    if args.use_lora:
        tx = make_optimizer(ocfg, None, None)
        state = init_lora_train_state(
            jax.random.PRNGKey(args.seed + 1), params, tx,
            target_patterns=TARGET_PRESETS[args.lora_target],
            rank=args.lora_rank,
        )
        step = make_lora_train_step(
            cfg, tx, scfg, alpha=args.lora_alpha, rank=args.lora_rank, luts=luts,
            mesh=mesh,
        )
        jstep = jax.jit(step, donate_argnums=(0,))
        step_args = (params,)
    else:
        mask = trainable_mask(params, freeze_llm_embed=cfg.use_spatial_token)
        tx = make_optimizer(ocfg, params, mask)
        state = init_train_state(params, tx)
        step = make_train_step(cfg, tx, scfg, luts=luts, mesh=mesh)
        jstep, state = jit_train_step(step, mesh, state)
        step_args = ()

    n_dp = mesh.shape["data"] * mesh.shape["fsdp"]
    global_rows = args.per_device_batch_size * n_dp
    nproc = jax.process_count()
    assert global_rows % nproc == 0, (global_rows, nproc)
    batcher = VLABatcher(
        processor, batch_size=global_rows // nproc,
        seq_len=args.seq_len, prompt_template=args.prompt_template,
    )

    def batches():
        for batch in batcher.batches(ds.frames()):
            batch.pop("actions", None)
            yield form_global_batch(mesh, batch)

    ckpt = CheckpointManager(
        os.path.join(args.output_dir, "checkpoints"),
        save_interval_steps=args.save_steps,
        max_to_keep=3,
    )
    if jax.process_index() == 0:
        processor.save(args.output_dir)
    return dict(
        cfg=cfg, state=state, jstep=jstep, step_args=step_args,
        batches=batches(), ckpt=ckpt, processor=processor, dataset=ds,
        base_params=params,
    )


def main(argv=None):
    from .trainer import TrainerConfig, train_loop

    args = build_argparser().parse_args(argv)
    parts = build_everything(args)
    tc = TrainerConfig(
        output_dir=args.output_dir,
        max_steps=args.max_steps,
        log_every=args.logging_steps,
        save_every=args.save_steps,
    )
    return train_loop(
        state=parts["state"],
        train_step=parts["jstep"],
        batches=parts["batches"],
        config=tc,
        checkpoint_manager=parts["ckpt"],
        step_args=parts["step_args"],
    )


if __name__ == "__main__":
    from ..parallel import honor_jax_platforms_env

    honor_jax_platforms_env()
    main()
