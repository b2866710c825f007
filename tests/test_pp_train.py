"""Pipeline-parallel training integration: GPipe stages over the mesh's
`pipe` axis (parallel/pipeline.py) are reachable from the train step
(attn_backend='pipeline'), the generic schedule matches a sequential
stage application in both values and gradients, and one sharded train
step on a (data=2, pipe=2) mesh matches the unsharded XLA step's loss and
gradients. The reference has no PP (SURVEY §2.2: its 4B fits one GPU with
ZeRO-1) — this is the beyond-parity depth-wise scaling path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import spatialvla_tiny
from spatialvla_tpu.models import spatialvla
from spatialvla_tpu.parallel import MeshConfig, make_mesh, pipeline_apply
from spatialvla_tpu.train import (
    OptimizerConfig,
    TrainStepConfig,
    init_train_state,
    jit_train_step,
    make_optimizer,
    make_train_step,
)

CFG = spatialvla_tiny(use_vision_zoe=False)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_apply_matches_sequential(n_micro):
    """Generic GPipe schedule == sequential stage application, forward and
    backward, including m != S and a composed data axis."""
    S, B, T, H = 4, 16, 6, 16
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, model=1, sp=1, pipe=S))
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(S, H, H).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    scale = jnp.asarray(rng.rand(B).astype(np.float32) + 0.5)  # aux, (B,)

    def stage_fn(w_s, h, aux):
        return jnp.tanh(h @ w_s) * aux["scale"][:, None, None]

    def pipelined(w, x):
        return pipeline_apply(
            stage_fn, w, x, {"scale": scale}, mesh=mesh,
            n_microbatches=n_micro, batch_axes=("data",),
        )

    def sequential(w, x):
        for s in range(S):
            x = stage_fn(w[s], x, {"scale": scale})
        return x

    got = jax.jit(pipelined)(w, x)
    want = sequential(w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    loss_p = lambda w: jnp.sum(pipelined(w, x) ** 2)
    loss_s = lambda w: jnp.sum(sequential(w, x) ** 2)
    gp = jax.jit(jax.grad(loss_p))(w)
    gs = jax.grad(loss_s)(w)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_forward_pipeline_uneven_stages_match_flash():
    """Stage pair counts need not divide evenly (the flagship's 26 layers =
    13 pairs split 7+6 at S=2): a 6-layer stack (3 pairs) over 2 stages
    (2+1 pairs, short stage masked to identity) must match forward_flash."""
    import dataclasses

    from spatialvla_tpu.models import gemma2

    tcfg = dataclasses.replace(CFG.text, num_layers=6)
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, model=1, sp=1, pipe=2))
    params = gemma2.init_params(jax.random.PRNGKey(3), tcfg)
    rng = np.random.RandomState(3)
    B, T = 4, 16
    embeds = jnp.asarray(rng.randn(B, T, tcfg.hidden_size).astype(np.float32) * 0.1)
    pos = jnp.broadcast_to(jnp.arange(1, T + 1), (B, T))
    prefix = jnp.full((B,), 6, jnp.int32)
    valid = jnp.full((B,), T, jnp.int32)

    want = gemma2.forward_flash(params, tcfg, embeds, pos, prefix, valid)
    got = jax.jit(
        lambda p, e: gemma2.forward_pipeline(
            p, tcfg, e, pos, prefix, valid, mesh=mesh, n_microbatches=2
        )
    )(params, embeds)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


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
def test_pp_train_step_matches_unsharded():
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, model=1, sp=1, pipe=2))
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    batch = make_batch(np.random.RandomState(0), B=8)  # 4 microbatches of 2

    ocfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, schedule="constant")

    def run(backend, use_mesh):
        tx = make_optimizer(ocfg, params, None)
        scfg = TrainStepConfig(
            use_remat=False, compute_dtype=jnp.float32, attn_backend=backend,
            pp_microbatches=4,
        )
        step = make_train_step(CFG, tx, scfg, mesh=mesh if use_mesh else None)
        if use_mesh:
            jstep, state = jit_train_step(
                step, mesh, init_train_state(params, tx), donate=False
            )
        else:
            jstep, state = jax.jit(step), init_train_state(params, tx)
        return jstep(state, batch)

    ref_state, ref_metrics = run("xla", use_mesh=False)
    pp_state, pp_metrics = run("pipeline", use_mesh=True)

    ref_loss = float(ref_metrics["loss"])
    pp_loss = float(pp_metrics["loss"])
    assert np.isfinite(pp_loss)
    assert abs(pp_loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss)), (
        pp_loss, ref_loss,
    )
    flat_ref = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, ref_state["params"])
    )
    flat_pp = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, pp_state["params"])
    )
    worst = max(
        float(np.max(np.abs(a - b))) for a, b in zip(flat_ref, flat_pp)
    )
    assert worst < 5e-5, worst
    assert abs(float(ref_metrics["grad_norm"]) - float(pp_metrics["grad_norm"])) < 1e-3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pipeline_requires_mesh():
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=2, schedule="constant"),
        None, None,
    )
    with pytest.raises(ValueError, match="pipeline"):
        make_train_step(CFG, tx, TrainStepConfig(attn_backend="pipeline"))
