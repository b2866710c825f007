"""LoRA fine-tuning, functional-style.

The reference wraps the torch model with peft (train/spatialvla_finetune.py:
262-302: r/alpha, init_lora_weights='gaussian', target presets 'linear' /
'linear+emb' / 'linear+emb+h', plus modules_to_save for the spatial
embedding table). TPU-native equivalent: LoRA factors live in a separate
pytree; each step materializes effective weights W + (alpha/r) * A @ B with
the base tree stop-gradient'ed, so autodiff reaches only the factors (and
any 'saved' fully-trainable subtrees). Works unchanged for scanned (L, in,
out) stacks via batched einsum.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# path-regex presets mirroring spatialvla_finetune.py:264-286
TARGET_PRESETS: Dict[str, List[str]] = {
    "linear": [
        r"lm/layers/attn/[qkvo]$",
        r"lm/layers/mlp/(gate|up|down)$",
        r"vision/layers/attn/[qkvo]/w$",
        r"vision/layers/mlp/fc[12]/w$",
        r"projector/w$",
        r"ego3d/fc[12]/w$",
    ],
    "linear+emb": [],  # filled below
    "linear+emb+h": [],
}
# 'emb' in the reference preset means the SPATIAL embedding table
# (spatialvla_finetune.py:271-286 adds 'spatial_embed_tokens' to
# target_modules), never the frozen LM token embedding
TARGET_PRESETS["linear+emb"] = TARGET_PRESETS["linear"] + [r"^spatial_embed$"]
TARGET_PRESETS["linear+emb+h"] = TARGET_PRESETS["linear+emb"] + [r"lm/lm_head$"]

# subtrees kept fully trainable alongside LoRA (peft modules_to_save)
DEFAULT_SAVED = (r"^spatial_embed$",)


from ..utils.tree import path_str as _path_str


def _matches(p: str, patterns) -> bool:
    return any(re.search(pat, p) for pat in patterns)


def lora_init(
    key,
    params: Params,
    *,
    target_patterns: List[str],
    rank: int = 32,
    dtype=jnp.float32,
    exclude_patterns=DEFAULT_SAVED,
) -> Params:
    """Build the LoRA factor tree: for each matching 2D/3D weight
    (..., in, out) -> {'a': (..., in, r) gaussian, 'b': (..., r, out) zeros}.

    Paths matching ``exclude_patterns`` (the fully-trainable 'saved'
    subtrees, e.g. spatial_embed) never get factors: full training strictly
    dominates a LoRA adapter, and a factor over a saved leaf would
    stop-gradient it in lora_apply_tree."""
    leaves_with_paths = jax.tree_util.tree_leaves_with_path(params)
    factors = {}
    for i, (path, leaf) in enumerate(leaves_with_paths):
        p = _path_str(path)
        if not _matches(p, target_patterns) or leaf.ndim < 2:
            continue
        if exclude_patterns and _matches(p, exclude_patterns):
            continue
        k = jax.random.fold_in(key, i)
        a_shape = leaf.shape[:-1] + (rank,)
        b_shape = leaf.shape[:-2] + (rank, leaf.shape[-1])
        factors[p] = {
            # peft init_lora_weights='gaussian': A ~ N(0, 1/r), B zeros
            "a": (jax.random.normal(k, a_shape) / rank).astype(dtype),
            "b": jnp.zeros(b_shape, dtype=dtype),
        }
    return factors


def lora_merge(
    params: Params, lora: Params, *, alpha: float = 32.0, rank: int = 32
) -> Params:
    """Effective weights for the forward pass; base tree is stop-gradient'ed
    on adapted leaves so only factors receive gradients."""
    scale = alpha / rank

    def merge(path, leaf):
        p = _path_str(path)
        if p in lora:
            a, b = lora[p]["a"], lora[p]["b"]
            delta = jnp.einsum("...ir,...ro->...io", a, b) * scale
            return jax.lax.stop_gradient(leaf) + delta.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)


def lora_apply_tree(
    params: Params, lora: Params, *, alpha: float = 32.0, rank: int = 32,
    factored_prefixes: Tuple[str, ...] = ("lm/layers", "lm/lm_head"),
) -> Params:
    """Like lora_merge, but big-matrix leaves become factor dicts
    {'w', 'a', 'b'} applied as x@w + (x@a)@b (ops/quant.qmatmul) — the
    standard memory-safe LoRA application: no second full weight copy for
    the LM. Leaves outside factored_prefixes (vision tower, projector,
    embeddings — gathered, not matmul'd) are merged as dense deltas."""
    scale = alpha / rank

    def apply(path, leaf):
        p = _path_str(path)
        if p not in lora:
            return leaf
        a, b = lora[p]["a"], lora[p]["b"]
        if any(p.startswith(pref) for pref in factored_prefixes):
            return {
                "w": jax.lax.stop_gradient(leaf),
                "a": (a * scale).astype(a.dtype),
                "b": b,
            }
        delta = jnp.einsum("...ir,...ro->...io", a, b) * scale
        return jax.lax.stop_gradient(leaf) + delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(apply, params)


def lora_fold(params: Params, lora: Params, *, alpha: float = 32.0, rank: int = 32) -> Params:
    """Permanently fold trained factors into the base weights (export)."""
    merged = lora_merge(params, lora, alpha=alpha, rank=rank)
    return jax.tree_util.tree_map(jax.lax.stop_gradient, merged)


def extract_saved(params: Params, saved_patterns=DEFAULT_SAVED) -> Dict[str, Any]:
    """Flat {path: leaf} dict of the fully-trainable 'saved' tensors
    (peft modules_to_save, e.g. the spatial embedding table)."""
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        p = _path_str(path)
        if _matches(p, saved_patterns):
            out[p] = leaf
    return out


def insert_saved(params: Params, saved: Dict[str, Any]) -> Params:
    """Return a param tree with the saved tensors substituted back in (the
    rest of the tree stop-gradient'ed happens in lora_merge)."""

    def sub(path, leaf):
        p = _path_str(path)
        return saved[p] if p in saved else leaf

    return jax.tree_util.tree_map_with_path(sub, params)
