"""Training-layer tests: freezing policy, metrics, grad accumulation, and a
fully sharded train step on the virtual 8-device CPU mesh (data/fsdp/model
axes) — the multi-chip dry run."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.action import SpatialActionTokenizer
from spatialvla_tpu.config import spatialvla_tiny
from spatialvla_tpu.models import spatialvla
from spatialvla_tpu.parallel import MeshConfig, make_mesh, param_pspecs, shard_params
from spatialvla_tpu.train import (
    OptimizerConfig,
    TrainStepConfig,
    action_metrics,
    build_decode_luts,
    init_train_state,
    jit_train_step,
    make_optimizer,
    make_train_step,
    trainable_mask,
)

CFG = spatialvla_tiny(use_vision_zoe=False)


def make_batch(rng, B=2, n_text=4, n_action=6):
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
    ttype = np.zeros((B, T), np.int32)
    ttype[:, N + n_text :] = 1
    labels = np.where(ttype == 0, -100, ids)
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "token_type_ids": jnp.asarray(ttype),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(
            rng.rand(B, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
        ),
    }


def test_trainable_mask():
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    mask = trainable_mask(params, freeze_llm_embed=True, freeze_vision=True)
    assert mask["lm"]["embed"] is False
    assert mask["spatial_embed"] is True
    assert not any(jax.tree_util.tree_leaves(mask["vision"]))
    assert mask["lm"]["layers"]["attn"]["q"] is True


def test_train_step_overfits_tiny_batch():
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    ocfg = OptimizerConfig(learning_rate=5e-3, total_steps=50, schedule="constant",
                           warmup_ratio=0.02)
    mask = trainable_mask(params, freeze_llm_embed=True)
    tx = make_optimizer(ocfg, params, mask)
    step = make_train_step(CFG, tx, TrainStepConfig(use_remat=True, compute_dtype=jnp.float32))
    state = init_train_state(params, tx)
    batch = make_batch(np.random.RandomState(0))
    jstep = jax.jit(step)
    losses = []
    embed_before = np.asarray(state["params"]["lm"]["embed"])
    for _ in range(8):
        state, metrics = jstep(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.5, losses
    # frozen LM embedding unchanged; trainable spatial table changed
    np.testing.assert_array_equal(embed_before, np.asarray(state["params"]["lm"]["embed"]))
    assert float(metrics["accuracy"]) >= 0.0
    assert int(state["step"]) == 8


def test_grad_accumulation_equivalence():
    params = spatialvla.init_params(jax.random.PRNGKey(1), CFG)
    ocfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, schedule="constant")
    tx = make_optimizer(ocfg, params, None)
    rng = np.random.RandomState(1)
    b1 = make_batch(rng, B=2)
    b2 = make_batch(rng, B=2)
    big = jax.tree_util.tree_map(lambda a, b: jnp.concatenate([a, b]), b1, b2)
    micro = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), b1, b2)

    step1 = make_train_step(CFG, tx, TrainStepConfig(use_remat=False, compute_dtype=jnp.float32))
    step2 = make_train_step(
        CFG, tx, TrainStepConfig(use_remat=False, compute_dtype=jnp.float32, micro_steps=2)
    )
    s1, m1 = jax.jit(step1)(init_train_state(params, tx), big)
    s2, m2 = jax.jit(step2)(init_train_state(params, tx), micro)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1["params"], s2["params"]
    )
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5


def test_sharded_train_step_on_8_device_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    ocfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, schedule="constant")
    mask = trainable_mask(params, freeze_llm_embed=True)
    tx = make_optimizer(ocfg, params, mask)

    sharded_params = shard_params(mesh, params)
    state = init_train_state(sharded_params, tx)
    step = make_train_step(CFG, tx, TrainStepConfig(use_remat=True, compute_dtype=jnp.float32))
    jstep, state = jit_train_step(step, mesh, state, donate=False)

    batch = make_batch(np.random.RandomState(0), B=4)
    new_state, metrics = jstep(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # parity with unsharded execution
    ref_state, ref_metrics = jax.jit(step)(init_train_state(params, tx), batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    # sharding preserved on outputs
    q = new_state["params"]["lm"]["layers"]["attn"]["q"]
    assert q.sharding.spec == param_pspecs(params)["lm"]["layers"]["attn"]["q"]


def test_action_metrics_values():
    tok = SpatialActionTokenizer(token_begin_idx=CFG.action_token_begin_idx)
    luts = {k: jnp.asarray(v) for k, v in build_decode_luts(tok).items()}
    begin = CFG.action_token_begin_idx
    V = begin + 8194 + 10
    # sequence: [text, trans, rot, grip] targets; predictions: trans correct,
    # rot wrong, grip correct
    tgt_ids = np.array([[5, begin + 7, begin + 4096 + 3, begin + 8192 + 1]])
    pred_ids = np.array([[9, begin + 7, begin + 4096 + 9, begin + 8192 + 1]])
    labels = np.concatenate([[[-100]], tgt_ids], axis=1)  # labels shifted right
    T = labels.shape[1]
    logits = np.zeros((1, T, V), np.float32)
    for t in range(T - 1):
        logits[0, t, pred_ids[0, t]] = 10.0
    m = action_metrics(
        jnp.asarray(logits), jnp.asarray(labels), jnp.ones((1, T), jnp.int32),
        begin_idx=begin, luts=luts,
    )
    assert float(m["translation_accuracy"]) == 1.0
    assert float(m["rotation_accuracy"]) == 0.0
    assert float(m["gripper_accuracy"]) == 1.0
    assert abs(float(m["accuracy"]) - 2 / 3) < 1e-6
    assert float(m["l1_loss"]) > 0.0


def test_chunked_loss_matches_full():
    """loss_chunk_size > 0 must reproduce the full-logits loss and metrics."""
    from spatialvla_tpu.train.train_step import make_loss_fn
    from spatialvla_tpu.action import SpatialActionTokenizer

    params = spatialvla.init_params(jax.random.PRNGKey(5), CFG)
    tok = SpatialActionTokenizer(token_begin_idx=CFG.action_token_begin_idx)
    luts = {k: jnp.asarray(v) for k, v in build_decode_luts(tok).items()}
    batch = make_batch(np.random.RandomState(5), B=2)

    full = make_loss_fn(CFG, TrainStepConfig(use_remat=False, compute_dtype=jnp.float32), luts=luts)
    chunked = make_loss_fn(
        CFG, TrainStepConfig(use_remat=False, compute_dtype=jnp.float32, loss_chunk_size=7),
        luts=luts,
    )
    l1, m1 = full(params, batch)
    l2, m2 = chunked(params, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for k in ("accuracy", "translation_accuracy", "rotation_accuracy",
              "gripper_accuracy", "l1_loss"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5, err_msg=k)
    # gradients agree too
    g1 = jax.grad(lambda p: full(p, batch)[0])(params)
    g2 = jax.grad(lambda p: chunked(p, batch)[0])(params)
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5
