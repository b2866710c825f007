"""Parameter partitioning rules: pytree path -> PartitionSpec.

Replaces the reference's DeepSpeed ZeRO configs (scripts/zero{1,2,3}.json)
with GSPMD shardings: matmul weights shard their *input* feature dim over
"fsdp" (ZeRO-3 parameter sharding; XLA all-gathers on use) and their
*output* dim over "model" (Megatron-style TP). The scanned-layer leading L
axis is never sharded. Vectors/norms replicate.

Rules are matched by substring on the '/'-joined tree path, first hit wins.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Rules = List[Tuple[str, P]]

# (path regex, spec) — specs are for the *trailing* dims of each leaf;
# leading scan/stack dims are padded with None automatically.
DEFAULT_RULES: Rules = [
    # Gemma2 LM
    (r"lm/embed$", P("model", "fsdp")),          # (V, H): vocab over model
    (r"lm/lm_head$", P("fsdp", "model")),        # (H, V)
    (r"lm/layers/attn/[qkv]$", P("fsdp", "model")),  # (H, N*D): heads over model
    (r"lm/layers/attn/o$", P("model", "fsdp")),      # (N*D, H)
    (r"lm/layers/mlp/(gate|up)$", P("fsdp", "model")),
    (r"lm/layers/mlp/down$", P("model", "fsdp")),
    (r"lm/.*norm", P(None)),
    # SigLIP tower
    (r"vision/patch_embed/w$", P(None, None, None, "model")),
    (r"vision/layers/attn/[qkv]/w$", P("fsdp", "model")),
    (r"vision/layers/attn/o/w$", P("model", "fsdp")),
    (r"vision/layers/mlp/fc1/w$", P("fsdp", "model")),
    (r"vision/layers/mlp/fc2/w$", P("model", "fsdp")),
    (r"vision/pos_embed$", P(None, "fsdp")),
    # projector / ego3d / spatial embeddings
    (r"projector/w$", P("fsdp", "model")),
    (r"spatial_embed$", P("fsdp", None)),
    (r"ego3d/fc\d/w$", P(None, "fsdp")),
    # Zoe (frozen; shard the big backbone linears over fsdp)
    (r"zoe/.*(w|weight)$", P(None, "fsdp")),
    # standalone gemma2 tree (no "lm/" prefix)
    (r"^embed$", P("model", "fsdp")),
    (r"^lm_head$", P("fsdp", "model")),
    (r"^layers/attn/[qkv]$", P("fsdp", "model")),
    (r"^layers/attn/o$", P("model", "fsdp")),
    (r"^layers/mlp/(gate|up)$", P("fsdp", "model")),
    (r"^layers/mlp/down$", P("model", "fsdp")),
]


from ..utils.tree import path_str as _path_str


def spec_for(path_str: str, ndim: int, rules: Rules = None) -> P:
    for pattern, spec in rules or DEFAULT_RULES:
        if re.search(pattern, path_str):
            tail = tuple(spec)
            if len(tail) < ndim:  # pad leading stack dims (scan layer axis)
                tail = (None,) * (ndim - len(tail)) + tail
            elif len(tail) > ndim:
                tail = tail[-ndim:]
            return P(*tail)
    return P()  # replicate by default


def _divisible(spec: P, shape, mesh: Mesh) -> P:
    """Drop axis assignments whose mesh size does not divide the dim — a
    blanket rule can hit tensors with tiny dims (e.g. Zoe head convs with
    1- or 2-channel outputs), and an indivisible NamedSharding raises at
    device_put. Replicating those dims is always safe."""
    if mesh is None:
        return spec
    out = []
    for dim, ax in zip(shape[-len(tuple(spec)):] if spec else (), tuple(spec)):
        n = mesh.shape[ax] if isinstance(ax, str) else None
        out.append(ax if (ax is None or dim % n == 0) else None)
    pad = len(shape) - len(out)
    return P(*((None,) * pad + tuple(out)))


def param_pspecs(params: Dict[str, Any], rules: Rules = None, mesh: Mesh = None):
    """Pytree of PartitionSpecs mirroring `params`. With `mesh`, specs are
    validated for divisibility (indivisible dims fall back to replicated)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _divisible(
            spec_for(_path_str(path), leaf.ndim, rules), leaf.shape, mesh
        ),
        params,
    )


def param_shardings(mesh: Mesh, params: Dict[str, Any], rules: Rules = None):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_pspecs(params, rules, mesh)
    )


def shard_params(mesh: Mesh, params, rules: Rules = None):
    """Device-put a parameter tree with its computed shardings."""
    shardings = param_shardings(mesh, params, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
