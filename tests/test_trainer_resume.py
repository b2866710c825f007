"""Trainer-loop auto-resume (SURVEY §5.4): checkpoints at intervals, a fresh
loop restores the latest step and continues without replaying data."""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import spatialvla_tiny
from spatialvla_tpu.models import spatialvla
from spatialvla_tpu.train import (
    OptimizerConfig,
    TrainStepConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from spatialvla_tpu.train.checkpoints import CheckpointManager
from spatialvla_tpu.train.trainer import TrainerConfig, train_loop
from tests.test_train import make_batch

CFG = spatialvla_tiny(use_vision_zoe=False)


def test_train_loop_resume(tmp_path):
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    ocfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, schedule="constant")
    tx = make_optimizer(ocfg, params, None)
    step = make_train_step(CFG, tx, TrainStepConfig(use_remat=False, compute_dtype=jnp.float32))
    jstep = jax.jit(step)
    batch = make_batch(np.random.RandomState(0))

    out = str(tmp_path / "run")
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=2, max_to_keep=2)
    tc = TrainerConfig(output_dir=out, max_steps=3, log_every=1, save_every=2)
    state = train_loop(
        state=init_train_state(params, tx), train_step=jstep,
        batches=itertools.repeat(batch), config=tc, checkpoint_manager=mgr,
    )
    assert int(state["step"]) == 3
    mgr.wait()
    assert mgr.latest_step() == 3  # final forced save
    params_after_3 = jax.tree_util.tree_map(np.asarray, state["params"])

    # a fresh loop resumes from the checkpoint and continues to step 5
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=2, max_to_keep=2)
    tc2 = TrainerConfig(output_dir=out, max_steps=5, log_every=1, save_every=2)
    state2 = train_loop(
        state=init_train_state(params, tx), train_step=jstep,
        batches=itertools.repeat(batch), config=tc2, checkpoint_manager=mgr2,
    )
    assert int(state2["step"]) == 5
    # the resumed run really started from step 3's params: one more pair of
    # steps must differ from the step-3 state
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b)))),
        params_after_3, jax.tree_util.tree_map(np.asarray, state2["params"]),
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0
    mgr.close()
    mgr2.close()


def test_sidecar_pruned_with_retention(tmp_path):
    """artifacts-<step>.json sidecars follow the manager's max_to_keep:
    sidecars for pruned checkpoints are deleted (ADVICE r2)."""
    import os

    state = {"x": jnp.zeros((2,)), "step": jnp.int32(0)}
    mgr = CheckpointManager(str(tmp_path / "ck"), save_interval_steps=1, max_to_keep=2)
    for s in range(1, 5):
        st = {"x": jnp.full((2,), float(s)), "step": jnp.int32(s)}
        mgr.save(s, st, sidecar={"step": s})
        mgr.wait()
    kept = sorted(mgr._mgr.all_steps())
    assert kept == [3, 4]
    sidecars = sorted(
        f for f in os.listdir(str(tmp_path / "ck")) if f.startswith("artifacts-")
    )
    assert sidecars == ["artifacts-3.json", "artifacts-4.json"]
    assert mgr.load_sidecar(4) == {"step": 4}
    mgr.close()
