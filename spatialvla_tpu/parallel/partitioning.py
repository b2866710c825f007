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
    (r"lm/layers/attn/qkv$", P("fsdp", "model")),    # fused serving tree (quant.py)
    (r"lm/layers/attn/o$", P("model", "fsdp")),      # (N*D, H)
    (r"lm/layers/mlp/(gate|up)$", P("fsdp", "model")),
    (r"lm/layers/mlp/gate_up$", P("fsdp", "model")),  # fused serving tree
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


def _quant_specs(path_str: str, node: Dict[str, Any], rules: Rules):
    """Specs for a QuantW dict {'qt', 'scale'} (ops/quant.py).

    Quantized weights are stored TRANSPOSED — original (..., K, N) with
    rule spec (a, b) becomes qt (..., N, K[/2]) — so qt takes (b, a) and
    the per-output-channel scale takes (b,) (grouped scales (..., N, G)
    take (b, None)). Looked up by the BASE path so the bf16 rules cover
    the serving tree unchanged; int4's packed K//2 dim and odd channel
    counts fall back to replicated via the _divisible mesh check."""
    qt, scale = node["qt"], node["scale"]
    base = spec_for(path_str, 2, rules)  # trailing (K, N) spec of the source
    a, b = tuple(base) if len(tuple(base)) == 2 else (None, None)
    lead_q = (None,) * (qt.ndim - 2)
    qt_spec = P(*(lead_q + (b, a)))
    grouped = scale.ndim == qt.ndim
    if grouped:
        scale_spec = P(*((None,) * (scale.ndim - 2) + (b, None)))
    else:
        scale_spec = P(*((None,) * (scale.ndim - 1) + (b,)))
    return {"qt": qt_spec, "scale": scale_spec}


def param_pspecs(params: Dict[str, Any], rules: Rules = None, mesh: Mesh = None):
    """Pytree of PartitionSpecs mirroring `params`. With `mesh`, specs are
    validated for divisibility (indivisible dims fall back to replicated).
    Quantized {'qt','scale'} sub-dicts (serving trees) inherit their base
    path's rule with the transposed-storage axis swap."""

    def walk(node, parts):
        if isinstance(node, dict):
            from ..ops.quant import is_quantized

            if is_quantized(node):
                return _quant_specs("/".join(parts), node, rules)
            return {k: walk(v, parts + [str(k)]) for k, v in node.items()}
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: spec_for(
                "/".join(parts + [_path_str(path)]).rstrip("/"), leaf.ndim, rules
            ),
            node,
        )

    specs = walk(params, [])
    return jax.tree_util.tree_map(
        lambda spec, leaf: _divisible(spec, leaf.shape, mesh), specs, params
    )


def param_shardings(mesh: Mesh, params: Dict[str, Any], rules: Rules = None):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_pspecs(params, rules, mesh)
    )


def shard_params(mesh: Mesh, params, rules: Rules = None):
    """Device-put a parameter tree with its computed shardings."""
    shardings = param_shardings(mesh, params, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
