"""pjit train step: bf16 compute over fp32 master params, remat, optional
micro-batch gradient accumulation, on-device action metrics.

Replaces the reference's HF Trainer + DeepSpeed engine + monkey-patched
compute_loss (train/monkey_patch.py) with one compiled XLA program: the
mesh shardings on params/batch make GSPMD insert the gradient all-reduce
(== DDP/NCCL) and parameter/optimizer-state all-gathers (== ZeRO)
automatically.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import SpatialVLAConfig
from ..models import spatialvla
from .metrics import action_metrics

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    use_remat: bool = True
    compute_dtype: Any = jnp.bfloat16
    micro_steps: int = 1  # gradient accumulation
    # "xla" | "flash" (Pallas fused attention) | "ring" (sequence-parallel
    # ring flash attention over the mesh's sp axis; pass mesh=) | "pipeline"
    # (GPipe stages over the mesh's pipe axis; pass mesh=)
    attn_backend: str = "xla"
    # "pipeline": GPipe microbatches per step (0 = one per pipeline stage)
    pp_microbatches: int = 0
    # sequence-chunked CE: caps logits memory at B x chunk x vocab (needed
    # for the 265k vocab at long seq); 0 = full-sequence logits
    loss_chunk_size: int = 0


def make_loss_fn(cfg: SpatialVLAConfig, step_cfg: TrainStepConfig, luts=None, mesh=None):
    if step_cfg.attn_backend in ("ring", "pipeline") and mesh is None:
        raise ValueError(
            f"attn_backend={step_cfg.attn_backend!r} requires "
            "make_*_train_step(mesh=...)"
        )

    def loss_fn(params: Params, batch: Dict[str, jnp.ndarray]):
        attn = batch.get("attention_mask", jnp.ones_like(batch["input_ids"]))
        chunked = step_cfg.loss_chunk_size > 0
        out = spatialvla.forward(
            params,
            cfg,
            batch["input_ids"],
            pixel_values=batch.get("pixel_values"),
            intrinsic=batch.get("intrinsic"),
            attention_mask=attn,
            token_type_ids=batch.get("token_type_ids"),
            labels=None if chunked else batch["labels"],
            depth=batch.get("depth"),
            use_remat=step_cfg.use_remat,
            compute_dtype=step_cfg.compute_dtype,
            attn_backend=step_cfg.attn_backend,
            mesh=mesh,
            pp_microbatches=step_cfg.pp_microbatches,
            with_logits=not chunked,
        )
        if chunked:
            from .loss import chunked_loss_and_metrics

            loss, metrics = chunked_loss_and_metrics(
                params["lm"], cfg.text, out["hidden"], batch["labels"], attn,
                begin_idx=cfg.action_token_begin_idx, luts=luts,
                chunk_size=step_cfg.loss_chunk_size,
            )
            return loss, metrics
        metrics = action_metrics(
            out["logits"],
            batch["labels"],
            attn,
            begin_idx=cfg.action_token_begin_idx,
            luts=luts,
        )
        metrics["loss"] = out["loss"]
        return out["loss"], metrics

    return loss_fn


def make_train_step(
    cfg: SpatialVLAConfig,
    tx: optax.GradientTransformation,
    step_cfg: TrainStepConfig = TrainStepConfig(),
    luts=None,
    mesh=None,
) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    state = {'params', 'opt_state', 'step'}; batch leaves are (B, ...) or
    (M, B, ...) when step_cfg.micro_steps > 1 (scanned accumulation).
    mesh is required for attn_backend='ring' (sequence parallelism)."""
    loss_fn = make_loss_fn(cfg, step_cfg, luts=luts, mesh=mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def compute_grads(params, batch):
        if step_cfg.micro_steps == 1:
            (_, metrics), grads = grad_fn(params, batch)
            return grads, metrics

        def micro(carry, mb):
            acc = carry
            (_, metrics), grads = grad_fn(params, mb)
            acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), acc, grads
            )
            return acc, metrics

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        acc, metrics = jax.lax.scan(micro, zeros, batch)
        grads = jax.tree_util.tree_map(lambda g: g / step_cfg.micro_steps, acc)
        metrics = jax.tree_util.tree_map(lambda m: m.mean(), metrics)
        return grads, metrics

    def train_step(state, batch):
        grads, metrics = compute_grads(state["params"], batch)
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }, metrics

    return train_step


def make_lora_train_step(
    cfg: SpatialVLAConfig,
    tx: optax.GradientTransformation,
    step_cfg: TrainStepConfig = TrainStepConfig(),
    *,
    alpha: float = 32.0,
    rank: int = 32,
    luts=None,
    mesh=None,
) -> Callable:
    """LoRA step: state holds only {'lora': factors, 'saved': full tensors}
    + opt state; frozen base params are a separate argument (no optimizer
    state for them — the ZeRO-friendly version of peft fine-tuning).

    train_step(state, base_params, batch) -> (state, metrics)."""
    from .lora import insert_saved, lora_apply_tree

    loss_inner = make_loss_fn(cfg, step_cfg, luts=luts, mesh=mesh)

    def loss_fn(trainable, base_params, batch):
        params = insert_saved(base_params, trainable["saved"])
        params = lora_apply_tree(params, trainable["lora"], alpha=alpha, rank=rank)
        return loss_inner(params, batch)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state, base_params, batch):
        (_, metrics), grads = grad_fn(state["trainable"], base_params, batch)
        updates, opt_state = tx.update(grads, state["opt_state"], state["trainable"])
        trainable = optax.apply_updates(state["trainable"], updates)
        return {
            "trainable": trainable,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }, metrics

    return train_step


def init_lora_train_state(
    key,
    base_params: Params,
    tx: optax.GradientTransformation,
    *,
    target_patterns,
    rank: int = 32,
    saved_patterns=None,
):
    from .lora import DEFAULT_SAVED, extract_saved, lora_init

    trainable = {
        "lora": lora_init(key, base_params, target_patterns=target_patterns, rank=rank),
        "saved": extract_saved(base_params, saved_patterns or DEFAULT_SAVED),
    }
    return {
        "trainable": trainable,
        "opt_state": tx.init(trainable),
        "step": jnp.zeros((), jnp.int32),
    }


def init_train_state(params: Params, tx: optax.GradientTransformation):
    return {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def jit_train_step(
    train_step: Callable,
    mesh,
    state,
    *,
    batch_pspec=None,
    donate: bool = True,
):
    """Wrap a train step in jit with mesh shardings: state shardings taken
    from the materialized state (leaves not already sharded on this mesh —
    e.g. optimizer step counters created eagerly — are replicated), batch
    sharded over (data, fsdp). Returns (jitted_step, state) with the state
    re-placed consistently."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def leaf_sharding(x):
        s = getattr(x, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh.shape == mesh.shape and s.mesh.devices.tolist() == mesh.devices.tolist():
            return s
        return NamedSharding(mesh, P())

    state_shardings = jax.tree_util.tree_map(leaf_sharding, state)
    state = jax.tree_util.tree_map(jax.device_put, state, state_shardings)
    bspec = batch_pspec or P(("data", "fsdp"))
    batch_sharding = NamedSharding(mesh, bspec)
    jitted = jax.jit(
        train_step,
        in_shardings=(state_shardings, batch_sharding),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,) if donate else (),
    )
    return jitted, state
