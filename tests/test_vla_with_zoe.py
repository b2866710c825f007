"""Full VLA with the internal ZoeDepth tower (tiny config): the model
computes its own depth and fuses Ego3D position encodings."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import spatialvla_tiny
from spatialvla_tpu.models import spatialvla

CFG = spatialvla_tiny(use_vision_zoe=True)


@pytest.fixture(scope="module")
def params():
    return spatialvla.init_params(jax.random.PRNGKey(0), CFG)


def test_forward_with_internal_depth(params):
    rng = np.random.RandomState(0)
    B = 1
    N = CFG.num_image_tokens
    ids = np.concatenate(
        [np.full((B, N), CFG.image_token_index), rng.randint(0, 1000, (B, 4))], axis=1
    )
    T = ids.shape[1]
    pixels = rng.rand(B, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
    K = np.asarray([[[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]]], np.float32)
    out = spatialvla.forward(
        params, CFG, jnp.asarray(ids),
        pixel_values=jnp.asarray(pixels), intrinsic=jnp.asarray(K),
    )
    logits = np.asarray(out["logits"])
    assert logits.shape == (B, T, CFG.text.vocab_size)
    assert np.isfinite(logits).all()

    # depth branch actually matters: explicit depth != internal zoe depth
    out2 = spatialvla.forward(
        params, CFG, jnp.asarray(ids),
        pixel_values=jnp.asarray(pixels), intrinsic=jnp.asarray(K),
        depth=jnp.full((B, CFG.vision.image_size, CFG.vision.image_size), 5.0),
    )
    assert not np.allclose(logits, np.asarray(out2["logits"]))


def test_zoe_branch_gets_no_gradient(params):
    """The depth branch is frozen via stop_gradient (modeling_spatialvla.py:
    315 runs Zoe under no_grad)."""
    rng = np.random.RandomState(1)
    B = 1
    N = CFG.num_image_tokens
    ids = np.concatenate(
        [np.full((B, N), CFG.image_token_index), rng.randint(0, 1000, (B, 2))], axis=1
    )
    pixels = jnp.asarray(
        rng.rand(B, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
    )
    K = jnp.asarray([[[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]]])

    def loss(p):
        out = spatialvla.forward(
            p, CFG, jnp.asarray(ids), pixel_values=pixels, intrinsic=K
        )
        return jnp.sum(out["logits"] ** 2)

    grads = jax.grad(loss)(params)
    zoe_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["zoe"])
    )
    ego3d_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["ego3d"])
    )
    assert zoe_norm == 0.0
    assert ego3d_norm > 0.0
