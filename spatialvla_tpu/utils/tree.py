"""Pytree path utilities shared by partitioning/freezing/LoRA."""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax


def path_str(path) -> str:
    """jax key-path -> '/'-joined string."""
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def map_with_paths(fn: Callable[[str, Any], Any], tree):
    """tree_map with the '/'-joined path string as the first argument."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: fn(path_str(p), leaf), tree
    )


def leaves_with_paths(tree) -> List[Tuple[str, Any]]:
    return [
        (path_str(p), leaf) for p, leaf in jax.tree_util.tree_leaves_with_path(tree)
    ]


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def param_summary(tree, max_depth: int = 2) -> Dict[str, int]:
    """Parameter counts grouped by path prefix (the reference's
    trainable-parameter dump, spatialvla_pretrain.py:352-354)."""
    out: Dict[str, int] = {}
    for p, leaf in leaves_with_paths(tree):
        key = "/".join(p.split("/")[:max_depth])
        out[key] = out.get(key, 0) + int(leaf.size)
    return out
