"""LoRA fine-tuning step + Orbax checkpoint round-trip tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import spatialvla_tiny
from spatialvla_tpu.models import spatialvla
from spatialvla_tpu.train import (
    OptimizerConfig,
    TrainStepConfig,
    make_optimizer,
)
from spatialvla_tpu.train.lora import (
    TARGET_PRESETS,
    extract_saved,
    insert_saved,
    lora_fold,
    lora_init,
    lora_merge,
)
from spatialvla_tpu.train.train_step import (
    init_lora_train_state,
    init_train_state,
    make_lora_train_step,
)
from tests.test_train import make_batch

CFG = spatialvla_tiny(use_vision_zoe=False)


def test_lora_init_targets():
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    lora = lora_init(
        jax.random.PRNGKey(1), params,
        target_patterns=TARGET_PRESETS["linear"], rank=4,
    )
    assert "lm/layers/attn/q" in lora
    assert "projector/w" in lora
    assert "lm/embed" not in lora
    a = lora["lm/layers/attn/q"]["a"]
    assert a.shape == (CFG.text.num_layers, CFG.text.hidden_size, 4)
    lora_h = lora_init(
        jax.random.PRNGKey(1), params,
        target_patterns=TARGET_PRESETS["linear+emb+h"], rank=4,
    )
    # '+h' adds the lm_head; 'emb' means the SPATIAL embedding (reference
    # spatialvla_finetune.py:271-286), which is excluded from factors here
    # because it is fully trained via the saved set (full training
    # dominates a LoRA adapter); the frozen LM token embedding is never a
    # target
    assert "lm/lm_head" in lora_h
    assert "lm/embed" not in lora_h
    assert "spatial_embed" not in lora_h


def test_lora_merge_identity_at_init():
    """b = 0 at init -> merge is the identity on values."""
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    lora = lora_init(jax.random.PRNGKey(1), params,
                     target_patterns=TARGET_PRESETS["linear"], rank=4)
    merged = lora_merge(params, lora)
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), params, merged)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0


def test_lora_train_step_only_updates_factors_and_saved():
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    ocfg = OptimizerConfig(learning_rate=5e-3, total_steps=20, schedule="constant")
    # build state first to init optimizer on the trainable tree
    tx = make_optimizer(ocfg, None, None)
    state = init_lora_train_state(
        jax.random.PRNGKey(1), params, tx,
        target_patterns=TARGET_PRESETS["linear"], rank=4,
    )
    step = make_lora_train_step(
        CFG, tx, TrainStepConfig(use_remat=False, compute_dtype=jnp.float32),
        alpha=8.0, rank=4,
    )
    batch = make_batch(np.random.RandomState(0))
    jstep = jax.jit(step)
    losses = []
    for _ in range(6):
        state, metrics = jstep(state, params, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # factors have moved
    b = state["trainable"]["lora"]["lm/layers/attn/q"]["b"]
    assert float(jnp.abs(b).max()) > 0
    # saved spatial embedding trains too
    assert not np.allclose(
        np.asarray(state["trainable"]["saved"]["spatial_embed"]),
        np.asarray(params["spatial_embed"]),
    )

    # folding produces a standalone param tree matching the adapter path
    full = insert_saved(params, state["trainable"]["saved"])
    folded = lora_fold(full, state["trainable"]["lora"], alpha=8.0, rank=4)
    out = spatialvla.forward(
        folded, CFG, batch["input_ids"], pixel_values=batch["pixel_values"],
        attention_mask=batch["attention_mask"],
        token_type_ids=batch["token_type_ids"], labels=batch["labels"],
    )
    adapter = lora_merge(full, state["trainable"]["lora"], alpha=8.0, rank=4)
    ref = spatialvla.forward(
        adapter, CFG, batch["input_ids"], pixel_values=batch["pixel_values"],
        attention_mask=batch["attention_mask"],
        token_type_ids=batch["token_type_ids"], labels=batch["labels"],
    )
    np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]), rtol=1e-5)


def test_extract_insert_saved_round_trip():
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    saved = extract_saved(params)
    assert list(saved.keys()) == ["spatial_embed"]
    new = {k: v + 1.0 for k, v in saved.items()}
    updated = insert_saved(params, new)
    np.testing.assert_allclose(
        np.asarray(updated["spatial_embed"]),
        np.asarray(params["spatial_embed"]) + 1.0,
    )


def test_checkpoint_round_trip(tmp_path):
    from spatialvla_tpu.train.checkpoints import CheckpointManager, load_params, save_params

    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    ocfg = OptimizerConfig(learning_rate=1e-3, total_steps=10)
    tx = make_optimizer(ocfg, params, None)
    state = init_train_state(params, tx)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.latest_step() is None
    assert mgr.save(0, state, sidecar={"note": "test"}, force=True)
    mgr.wait()
    assert mgr.latest_step() == 0
    restored = mgr.restore(jax.tree_util.tree_map(np.asarray, state))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["lm"]["final_norm"]),
        np.asarray(state["params"]["lm"]["final_norm"]),
    )
    mgr.close()

    save_params(str(tmp_path / "export"), params, config_json=CFG.to_json())
    loaded = load_params(str(tmp_path / "export"), jax.tree_util.tree_map(np.asarray, params))
    np.testing.assert_allclose(
        np.asarray(loaded["projector"]["w"]), np.asarray(params["projector"]["w"])
    )
