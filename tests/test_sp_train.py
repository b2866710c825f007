"""Sequence-parallel training integration (VERDICT r2 #3): the ring
attention backend is reachable from the train step (attn_backend='ring'),
and one sharded train step on a (data=2, sp=4) mesh matches the unsharded
XLA step's loss and gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import spatialvla_tiny
from spatialvla_tpu.models import spatialvla
from spatialvla_tpu.parallel import MeshConfig, make_mesh
from spatialvla_tpu.train import (
    OptimizerConfig,
    TrainStepConfig,
    init_train_state,
    jit_train_step,
    make_optimizer,
    make_train_step,
)

CFG = spatialvla_tiny(use_vision_zoe=False)


def make_batch(rng, B=4, n_text=4, n_action=12):
    N = CFG.num_image_tokens
    ids = np.concatenate(
        [
            np.full((B, N), CFG.image_token_index),
            rng.randint(0, 1000, (B, n_text)),
            rng.randint(
                CFG.action_token_begin_idx,
                CFG.action_token_begin_idx + CFG.spatial_token_num,
                (B, n_action),
            ),
        ],
        axis=1,
    ).astype(np.int32)
    T = ids.shape[1]
    assert T % 4 == 0, T  # sp=4 divisibility
    ttype = np.zeros((B, T), np.int32)
    ttype[:, N + n_text:] = 1
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "token_type_ids": jnp.asarray(ttype),
        "labels": jnp.asarray(np.where(ttype == 0, -100, ids)),
        "pixel_values": jnp.asarray(
            rng.rand(B, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
        ),
    }


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_train_step_matches_unsharded():
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, model=1, sp=4))
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    batch = make_batch(np.random.RandomState(0))

    ocfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, schedule="constant")

    def run(backend, use_mesh):
        tx = make_optimizer(ocfg, params, None)
        scfg = TrainStepConfig(
            use_remat=False, compute_dtype=jnp.float32, attn_backend=backend
        )
        step = make_train_step(CFG, tx, scfg, mesh=mesh if use_mesh else None)
        if use_mesh:
            jstep, state = jit_train_step(
                step, mesh, init_train_state(params, tx), donate=False
            )
        else:
            jstep, state = jax.jit(step), init_train_state(params, tx)
        new_state, metrics = jstep(state, batch)
        return new_state, metrics

    ref_state, ref_metrics = run("xla", use_mesh=False)
    sp_state, sp_metrics = run("ring", use_mesh=True)

    ref_loss = float(ref_metrics["loss"])
    sp_loss = float(sp_metrics["loss"])
    assert np.isfinite(sp_loss)
    assert abs(sp_loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss)), (
        sp_loss, ref_loss,
    )
    # grad parity via the updated params (same optimizer, same start)
    flat_ref = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, ref_state["params"])
    )
    flat_sp = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, sp_state["params"])
    )
    worst = max(
        float(np.max(np.abs(a - b))) for a, b in zip(flat_ref, flat_sp)
    )
    assert worst < 5e-5, worst
    # grad-norm agreement is a direct whole-tree gradient check
    assert abs(float(ref_metrics["grad_norm"]) - float(sp_metrics["grad_norm"])) < 1e-3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_requires_mesh():
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=2, schedule="constant"),
        None, None,
    )
    with pytest.raises(ValueError, match="ring"):
        make_train_step(CFG, tx, TrainStepConfig(attn_backend="ring"))
