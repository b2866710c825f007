"""Optimizer, LR schedule, and parameter-freezing policy.

Reference training recipe (scripts/spatialvla_4b_pretrain/torchrun_pretrain.sh,
scripts/zero1.json): AdamW, linear warmup (ratio 0.005) + linear decay,
bf16, grad clipping 1.0, ZeRO-1. ZeRO semantics fall out of sharded
optimizer state following sharded parameters (GSPMD), not an engine.

Freezing policy (train/spatialvla_pretrain.py:333-350): the LM embedding
table is frozen whenever the separate spatial-token table is in use; the
vision tower optionally; ZoeDepth always. Frozen subtrees get
optax.set_to_zero via optax.multi_transform, so their optimizer state is
empty (no wasted HBM).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-5
    warmup_ratio: float = 0.005
    total_steps: int = 100_000
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    grad_clip: float = 1.0
    schedule: str = "linear"  # linear | cosine | constant


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 1)
    if cfg.schedule == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, warmup),
             optax.constant_schedule(cfg.learning_rate)],
            [warmup],
        )
    decay = {"linear": optax.linear_schedule(
                cfg.learning_rate, 0.0, max(cfg.total_steps - warmup, 1)),
             "cosine": optax.cosine_decay_schedule(
                cfg.learning_rate, max(cfg.total_steps - warmup, 1))}[cfg.schedule]
    return optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.learning_rate, warmup), decay], [warmup]
    )


def trainable_mask(
    params: Dict[str, Any],
    *,
    freeze_llm_embed: bool = True,
    freeze_vision: bool = False,
    freeze_zoe: bool = True,
    extra_frozen_paths: tuple = (),
) -> Dict[str, Any]:
    """Bool pytree: True = trainable."""

    def decide(path, _leaf):
        parts = []
        for k in path:
            parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
        p = "/".join(parts)
        if freeze_zoe and p.startswith("zoe"):
            return False
        if freeze_vision and p.startswith("vision"):
            return False
        if freeze_llm_embed and p in ("lm/embed", "embed"):
            return False
        for frozen in extra_frozen_paths:
            if p.startswith(frozen):
                return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(
    cfg: OptimizerConfig, params: Dict[str, Any], mask: Optional[Dict[str, Any]] = None
) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)
    core = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            schedule, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    if mask is None:
        return core
    labels = jax.tree_util.tree_map(lambda t: "train" if t else "frozen", mask)
    return optax.multi_transform(
        {"train": core, "frozen": optax.set_to_zero()}, labels
    )
