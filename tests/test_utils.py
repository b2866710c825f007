import numpy as np

import jax
import jax.numpy as jnp

from spatialvla_tpu.utils import count_params, leaves_with_paths, param_summary, path_str


def test_tree_helpers():
    tree = {"a": {"b": jnp.zeros((2, 3)), "c": jnp.zeros((4,))}, "d": jnp.zeros((5,))}
    assert count_params(tree) == 6 + 4 + 5
    paths = dict(leaves_with_paths(tree))
    assert set(paths) == {"a/b", "a/c", "d"}
    summary = param_summary(tree, max_depth=1)
    assert summary == {"a": 10, "d": 5}


def test_param_summary_flagship_shape():
    from spatialvla_tpu.config import spatialvla_tiny
    from spatialvla_tpu.models import spatialvla

    cfg = spatialvla_tiny(use_vision_zoe=False)
    params = spatialvla.init_params(jax.random.PRNGKey(0), cfg)
    s = param_summary(params, max_depth=1)
    assert set(s) >= {"lm", "vision", "projector", "spatial_embed"}
    assert s["lm"] > s["vision"]
