"""Pretraining entry point (reference: train/spatialvla_pretrain.py).

Composes: RLDS mixture pipeline -> processor/action tokenizer (Gaussian bin
policy) -> SpatialVLA model (random init or converted checkpoint) -> mesh-
sharded pjit train step -> Orbax checkpoints with processor artifacts.

Usage:
    python -m spatialvla_tpu.train.pretrain \
        --data_root_dir /data/oxe --mixture bridge \
        --output_dir out/pretrain --max_steps 100000 \
        --mesh_fsdp -1 --attn_backend flash
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # data (reference DataTrainingArguments)
    p.add_argument("--data_root_dir", type=str, required=True)
    p.add_argument("--mixture", type=str, default="bridge")
    p.add_argument("--shuffle_buffer_size", type=int, default=8192)
    p.add_argument("--obs_backward_steps", type=int, default=0)
    p.add_argument("--obs_backward_delta", type=int, default=1)
    p.add_argument("--action_forward_steps", type=int, default=3)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--seq_len", type=int, default=320)
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--camera_views", type=str, default="primary",
                   help="comma-separated views to load (primary,secondary,"
                        "wrist); each adds an image-token block per frame")
    p.add_argument("--load_depth", action="store_true",
                   help="plumb recorded depth observations to the model "
                        "(overrides the in-model ZoeDepth estimate)")
    # model (reference ModelArguments)
    p.add_argument("--model_preset", type=str, default="spatialvla_4b",
                   choices=["spatialvla_4b", "spatialvla_tiny"])
    p.add_argument("--init_checkpoint", type=str, default=None,
                   help="Orbax params dir (convert/ output) to start from")
    p.add_argument("--action_config", type=str, default=None,
                   help="action grid config json (defaults to 16/32/8 + 16^3 + 2)")
    p.add_argument("--gs_params", type=str, default=None,
                   help="gaussian stats json for the adaptive bin policy")
    p.add_argument("--intrinsics", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None,
                   help="dir with the HF Gemma/PaliGemma2 tokenizer files; "
                        "REQUIRED for reference-ecosystem compatibility "
                        "(omitting it falls back to the offline byte "
                        "tokenizer, test use only)")
    p.add_argument("--prompt_template", type=str, default=None,
                   help="opt-in prompt template with one '{}' slot; default "
                        "trains on the bare lowercased instruction like the "
                        "reference (data/dataset.py:130)")
    p.add_argument("--min_sigma", type=float, default=0.0)
    p.add_argument("--freeze_vision_tower", action="store_true")
    p.add_argument("--no_freeze_llm_embed", action="store_true")
    p.add_argument("--no_vision_zoe", action="store_true")
    p.add_argument("--flash_attn", dest="attn_backend", action="store_const",
                   const="flash", default="flash")
    p.add_argument("--attn_backend", type=str, choices=["xla", "flash", "ring", "pipeline"])
    # optimization
    p.add_argument("--per_device_batch_size", type=int, default=2)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--warmup_ratio", type=float, default=0.005)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--loss_chunk_size", type=int, default=256,
                   help="sequence-chunked CE (0 = full logits)")
    # mesh
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_fsdp", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--mesh_sp", type=int, default=1,
                   help="sequence-parallel axis (ring attention); >1 "
                        "auto-selects attn_backend=ring")
    p.add_argument("--mesh_pp", type=int, default=1,
                   help="pipeline-parallel axis (GPipe decoder stages); >1 "
                        "auto-selects attn_backend=pipeline")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches per step (0 = one per stage)")
    p.add_argument("--loader_workers", type=int, default=1,
                   help=">1 runs the input pipeline in N shard-disjoint "
                        "worker processes (data/mploader.py)")
    # io
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--save_steps", type=int, default=20_000)
    p.add_argument("--save_total_limit", type=int, default=3)
    p.add_argument("--logging_steps", type=int, default=500)
    p.add_argument("--profile_steps", type=int, nargs=2, default=None)
    p.add_argument("--seed", type=int, default=0)
    # multi-host bootstrap (reference train/dist_utils.py:29-99); normally
    # auto-detected from SLURM/OMPI/TPU-pod env, explicit flags for manual
    # launches
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def build_everything(args):
    from ..action import DEFAULT_NUM_BINS
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

    initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )

    cfg = spatialvla_4b() if args.model_preset == "spatialvla_4b" else spatialvla_tiny()
    if args.no_vision_zoe:
        cfg = dataclasses.replace(cfg, use_vision_zoe=False, zoe=None)

    # mesh + params
    mesh = make_mesh(
        MeshConfig(args.mesh_data, args.mesh_fsdp, args.mesh_model,
                   args.mesh_sp, args.mesh_pp)
    )
    if args.mesh_sp > 1 and (args.attn_backend or "flash") != "ring":
        print(f"mesh_sp={args.mesh_sp}: selecting attn_backend=ring "
              "(sequence-parallel ring flash attention)")
        args.attn_backend = "ring"
    if args.mesh_pp > 1 and (args.attn_backend or "flash") != "pipeline":
        print(f"mesh_pp={args.mesh_pp}: selecting attn_backend=pipeline "
              "(GPipe decoder stages)")
        args.attn_backend = "pipeline"
    params = spatialvla.init_params(jax.random.PRNGKey(args.seed), cfg)
    if args.init_checkpoint:
        params = load_params(args.init_checkpoint, jax.tree_util.tree_map(np.asarray, params))
    params = shard_params(mesh, params)

    # data
    ds = InterleavedRLDSDataset(
        args.mixture,
        args.data_root_dir,
        traj_config=TrajTransformConfig(
            backward_window_size=args.obs_backward_steps,
            backward_delta=args.obs_backward_delta,
            forward_window_size=args.action_forward_steps,
        ),
        frame_config=FrameTransformConfig(
            resize_size=(args.image_size, args.image_size),
            augment=not args.no_augment,
        ),
        shuffle_buffer_size=args.shuffle_buffer_size,
        seed=args.seed + 3407 * jax.process_index(),
        shard_by_rank=(jax.process_index(), jax.process_count()),
        load_camera_views=tuple(args.camera_views.split(",")),
        load_depth=args.load_depth,
    )

    # processor (gaussian bin policy from stats json or uniform)
    gs_params = json.load(open(args.gs_params)) if args.gs_params else None
    action_config = (
        json.load(open(args.action_config))
        if args.action_config
        else {"num_bins": DEFAULT_NUM_BINS, "use_spherical": True}
    )
    intrinsic_config = json.load(open(args.intrinsics)) if args.intrinsics else None
    from ..action import SpatialActionTokenizer

    action_tokenizer = SpatialActionTokenizer(
        num_bins=action_config["num_bins"],
        gs_params=gs_params,
        use_spherical=action_config.get("use_spherical", True),
        min_sigma=args.min_sigma,
        token_begin_idx=cfg.action_token_begin_idx,
    )
    text_tokenizer = load_text_tokenizer(args.tokenizer_path)
    if args.tokenizer_path is None and jax.process_index() == 0:
        print(
            "WARNING: no --tokenizer_path given; using the byte-level test "
            "tokenizer. The trained model's text interface will NOT be "
            "compatible with reference (PaliGemma2) checkpoints."
        )
    processor = SpatialVLAProcessor(
        text_tokenizer,
        action_tokenizer=action_tokenizer,
        image_token_id=cfg.image_token_index,
        action_token_begin_idx=cfg.action_token_begin_idx,
        image_seq_length=cfg.num_image_tokens,
        image_size=args.image_size,
        statistics=ds.statistics,
        intrinsic_config=intrinsic_config,
        action_config=action_config,
        action_chunk_size=args.action_forward_steps + 1,
        min_sigma=args.min_sigma,
    )

    # optimizer + step
    ocfg = OptimizerConfig(
        learning_rate=args.learning_rate,
        warmup_ratio=args.warmup_ratio,
        total_steps=args.max_steps,
        weight_decay=args.weight_decay,
    )
    mask = trainable_mask(
        params,
        freeze_llm_embed=not args.no_freeze_llm_embed and cfg.use_spatial_token,
        freeze_vision=args.freeze_vision_tower,
        freeze_zoe=True,
    )
    tx = make_optimizer(ocfg, params, mask)
    if jax.process_index() == 0:  # trainable-parameter dump (reference
        # spatialvla_pretrain.py:352-354)
        from ..utils import param_summary

        total = sum(param_summary(params, max_depth=1).values())
        trainable = {
            k: v for k, v in param_summary(
                jax.tree_util.tree_map(
                    lambda p, t: p if t else None, params, mask,
                    is_leaf=lambda x: x is None,
                ), max_depth=1,
            ).items()
        }
        print(f"params: {total/1e6:.1f}M total; trainable by module: "
              + ", ".join(f"{k}={v/1e6:.1f}M" for k, v in trainable.items()))
    luts = {k: jnp.asarray(v) for k, v in build_decode_luts(action_tokenizer).items()}
    step = make_train_step(
        cfg, tx,
        TrainStepConfig(
            use_remat=not args.no_remat,
            compute_dtype=jnp.bfloat16,
            micro_steps=args.grad_accum,
            attn_backend=args.attn_backend or "flash",
            pp_microbatches=args.pp_microbatches,
            loss_chunk_size=args.loss_chunk_size,
        ),
        luts=luts,
        mesh=mesh,
    )
    from jax.sharding import PartitionSpec as P

    state = init_train_state(params, tx)
    bspec = (
        P(None, ("data", "fsdp")) if args.grad_accum > 1 else P(("data", "fsdp"))
    )
    jstep, state = jit_train_step(step, mesh, state, batch_pspec=bspec)

    # global step batch = per_device * dp * grad_accum (reference batch-size
    # arithmetic, torchrun_pretrain.sh:15-20); each host contributes
    # global/process_count rows
    n_dp = mesh.shape["data"] * mesh.shape["fsdp"]
    global_rows = args.per_device_batch_size * n_dp * args.grad_accum
    nproc = jax.process_count()
    assert global_rows % nproc == 0, (global_rows, nproc)
    batcher = VLABatcher(
        processor, batch_size=global_rows // nproc, seq_len=args.seq_len,
        prompt_template=args.prompt_template,
    )

    def batches():
        if args.loader_workers > 1:
            # process-sharded loading: each worker owns a disjoint shard
            # subset; the parent-computed statistics ride along so workers
            # reuse them instead of racing the statistics pass
            from ..data.mploader import ProcessShardedFrameLoader

            loader = ProcessShardedFrameLoader(
                dict(
                    mixture=args.mixture,
                    data_dir=args.data_root_dir,
                    traj_config=ds.traj_config,
                    frame_config=ds.frame_config,
                    shuffle_buffer_size=args.shuffle_buffer_size,
                    seed=args.seed + 3407 * jax.process_index(),
                    shard_by_rank=(jax.process_index(), jax.process_count()),
                    statistics_override=ds.statistics,
                    load_camera_views=tuple(args.camera_views.split(",")),
                    load_depth=args.load_depth,
                ),
                num_workers=args.loader_workers,
            )
            frames = loader.frames()
        else:
            frames = ds.frames()
        for batch in batcher.batches(frames):
            batch.pop("actions", None)
            if args.grad_accum > 1:
                batch = {
                    k: v.reshape((args.grad_accum, -1) + v.shape[1:])
                    for k, v in batch.items()
                }
            yield form_global_batch(mesh, batch, bspec)

    ckpt = CheckpointManager(
        os.path.join(args.output_dir, "checkpoints"),
        save_interval_steps=args.save_steps,
        max_to_keep=args.save_total_limit,
    )
    sidecar = {"model_config": json.loads(cfg.to_json()), "mixture": args.mixture}
    if jax.process_index() == 0:
        processor.save(args.output_dir)
        from ..data.statistics import save_dataset_statistics

        save_dataset_statistics(
            ds.statistics, os.path.join(args.output_dir, "ds_stats.json")
        )
    return dict(
        cfg=cfg, mesh=mesh, state=state, jstep=jstep, batches=batches(),
        ckpt=ckpt, sidecar=sidecar, processor=processor, dataset=ds,
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
        save_total_limit=args.save_total_limit,
        profile_steps=tuple(args.profile_steps) if args.profile_steps else None,
    )
    state = train_loop(
        state=parts["state"],
        train_step=parts["jstep"],
        batches=parts["batches"],
        config=tc,
        checkpoint_manager=parts["ckpt"],
        sidecar=parts["sidecar"],
    )
    # bare-params export for inference / finetune-from (beside the processor)
    from .checkpoints import save_params

    save_params(args.output_dir, state["params"], config_json=parts["cfg"].to_json())
    return state


if __name__ == "__main__":
    from ..parallel import honor_jax_platforms_env

    honor_jax_platforms_env()
    main()
