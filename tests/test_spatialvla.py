"""Fusion-model tests: embedding merge, prefix-LM training forward, and
greedy decode consistency (cache decode == iterated full forward)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import spatialvla_tiny
from spatialvla_tpu.models import spatialvla

CFG = spatialvla_tiny(use_vision_zoe=False)
# ego3d-enabled variant with externally supplied depth (no Zoe weights)
CFG3D = dataclasses.replace(CFG, use_vision_zoe=True)


@pytest.fixture(scope="module")
def params():
    return spatialvla.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def params3d():
    return spatialvla.init_params(jax.random.PRNGKey(0), CFG3D)


def _make_inputs(rng, B=2, n_text=5, n_action=6):
    N = CFG.num_image_tokens
    img_ids = np.full((B, N), CFG.image_token_index)
    text_ids = rng.randint(0, 1000, (B, n_text))
    act_ids = rng.randint(
        CFG.action_token_begin_idx, CFG.action_token_begin_idx + CFG.spatial_token_num,
        (B, n_action),
    )
    ids = np.concatenate([img_ids, text_ids, act_ids], axis=1)
    ttype = np.concatenate(
        [np.zeros((B, N + n_text), np.int32), np.ones((B, n_action), np.int32)], axis=1
    )
    pixels = rng.rand(B, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(ttype), jnp.asarray(pixels)


def test_merge_embeddings_places_image_and_spatial(params):
    rng = np.random.RandomState(0)
    ids, _, _ = _make_inputs(rng, B=1)
    N = CFG.num_image_tokens
    feats = jnp.arange(N, dtype=jnp.float32)[None, :, None].repeat(
        CFG.text.hidden_size, -1
    )  # feature j = const j
    emb = spatialvla.merge_input_embeddings(params, CFG, ids, feats)
    emb = np.asarray(emb)
    # image positions carry feature j
    for j in [0, 3, N - 1]:
        np.testing.assert_allclose(emb[0, j], j, atol=1e-6)
    # spatial action positions use the spatial table, not the LM table
    local = int(np.asarray(ids)[0, -1]) - CFG.action_token_begin_idx
    np.testing.assert_allclose(
        emb[0, -1], np.asarray(params["spatial_embed"])[local], atol=1e-6
    )


def test_training_forward_loss(params):
    rng = np.random.RandomState(1)
    ids, ttype, pixels = _make_inputs(rng)
    labels = np.where(np.asarray(ttype) == 0, -100, np.asarray(ids))
    out = spatialvla.forward(
        params, CFG, ids,
        pixel_values=pixels, token_type_ids=ttype, labels=jnp.asarray(labels),
    )
    assert out["logits"].shape == (2, ids.shape[1], CFG.text.vocab_size)
    loss = float(out["loss"])
    assert np.isfinite(loss) and loss > 0
    # random init -> loss near ln(vocab)
    assert abs(loss - np.log(CFG.text.vocab_size)) < 2.0


def test_prefix_lm_mask_semantics():
    attn = jnp.asarray([[1, 1, 1, 1, 0]])
    ttype = jnp.asarray([[0, 0, 1, 1, 0]])
    m = np.asarray(spatialvla.prefix_lm_mask(attn, ttype))[0, 0]
    # query 0 can see prefix key 1 (bidirectional prefix)
    assert m[0, 1]
    # query 0 cannot see suffix key 2
    assert not m[0, 2]
    # causal within suffix
    assert m[3, 2] and not m[2, 3]
    # nobody attends to padding
    assert not m[:, 4].any()


def test_ego3d_path_changes_features(params3d):
    rng = np.random.RandomState(2)
    ids, ttype, pixels = _make_inputs(rng, B=1)
    K = jnp.asarray([[[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]]])
    depth = jnp.ones((1, CFG.vision.image_size, CFG.vision.image_size)) * 1.5
    f_with = spatialvla.get_image_features(params3d, CFG3D, pixels, K, depth=depth)
    f_without = spatialvla.get_image_features(params3d, CFG, pixels, None)
    assert f_with.shape == f_without.shape
    assert not np.allclose(np.asarray(f_with), np.asarray(f_without))
    assert np.isfinite(np.asarray(f_with)).all()


def test_flash_backend_matches_xla(params):
    """attn_backend='flash' (Pallas kernel, interpret mode on CPU) must match
    the XLA masked-attention path, incl. the alternating sliding-window
    layers (tiny config window=8 < T)."""
    import functools
    import sys

    fa = sys.modules.get("spatialvla_tpu.ops.flash_attention")
    if fa is None:
        import spatialvla_tpu.ops.flash_attention  # noqa: F401

        fa = sys.modules["spatialvla_tpu.ops.flash_attention"]

    rng = np.random.RandomState(7)
    ids, ttype, pixels = _make_inputs(rng, B=2, n_text=3, n_action=4)
    attn = np.ones_like(np.asarray(ids))
    attn[1, -2:] = 0  # right padding on row 1
    ids_pad = np.asarray(ids).copy()
    ttype_pad = np.asarray(ttype).copy()
    ttype_pad[1, -2:] = 0

    kw = dict(
        pixel_values=pixels,
        attention_mask=jnp.asarray(attn),
        token_type_ids=jnp.asarray(ttype_pad),
    )
    ref = spatialvla.forward(params, CFG, jnp.asarray(ids_pad), **kw)

    orig = fa._flash_attention_impl
    fa._flash_attention_impl = functools.partial(orig, interpret=True)
    try:
        got = spatialvla.forward(
            params, CFG, jnp.asarray(ids_pad), attn_backend="flash", **kw
        )
    finally:
        fa._flash_attention_impl = orig

    valid0 = attn[0].sum()
    np.testing.assert_allclose(
        np.asarray(got["logits"])[0, :valid0], np.asarray(ref["logits"])[0, :valid0],
        atol=2e-4, rtol=2e-4,
    )
    valid1 = attn[1].sum()
    np.testing.assert_allclose(
        np.asarray(got["logits"])[1, :valid1], np.asarray(ref["logits"])[1, :valid1],
        atol=2e-4, rtol=2e-4,
    )


def test_greedy_decode_matches_iterated_full_forward(params):
    rng = np.random.RandomState(3)
    B, n_text = 1, 4
    N = CFG.num_image_tokens
    ids = np.concatenate(
        [np.full((B, N), CFG.image_token_index), rng.randint(0, 1000, (B, n_text))], axis=1
    )
    pixels = rng.rand(B, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
    steps = 5

    gen = np.asarray(
        spatialvla.generate_greedy(
            params, CFG, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
            max_new_tokens=steps, cache_dtype=jnp.float32,
        )
    )

    # oracle: iterated full forward with prefix-LM mask (prefix bidirectional,
    # generated tokens causal)
    cur = ids.copy()
    P = ids.shape[1]
    for _ in range(steps):
        T = cur.shape[1]
        ttype = np.concatenate([np.zeros((B, P)), np.ones((B, T - P))], axis=1).astype(np.int32)
        out = spatialvla.forward(
            params, CFG, jnp.asarray(cur), pixel_values=jnp.asarray(pixels),
            token_type_ids=jnp.asarray(ttype),
        )
        nxt = np.argmax(np.asarray(out["logits"])[:, -1], axis=-1)
        cur = np.concatenate([cur, nxt[:, None]], axis=1)

    np.testing.assert_array_equal(gen, cur[:, P:])


def test_multi_obs_forward(params):
    """(B, k, H, W, 3) pixel_values: k observation frames fill k image-token
    blocks (num_obs_steps > 1 parity)."""
    rng = np.random.RandomState(9)
    B, k = 1, 2
    N = CFG.num_image_tokens
    ids = np.concatenate(
        [np.full((B, k * N), CFG.image_token_index), rng.randint(0, 1000, (B, 3))],
        axis=1,
    )
    pixels = rng.rand(B, k, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
    out = spatialvla.forward(
        params, CFG, jnp.asarray(ids), pixel_values=jnp.asarray(pixels)
    )
    assert out["logits"].shape == (B, ids.shape[1], CFG.text.vocab_size)
    assert np.isfinite(np.asarray(out["logits"])).all()

    # frame order matters: swapping the two obs changes the prefix states
    swapped = pixels[:, ::-1]
    out2 = spatialvla.forward(
        params, CFG, jnp.asarray(ids), pixel_values=jnp.asarray(swapped)
    )
    assert not np.allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]))


def test_processor_multi_obs():
    from spatialvla_tpu.processor import ByteTokenizer, SpatialVLAProcessor

    proc = SpatialVLAProcessor(
        ByteTokenizer(), image_token_id=5000, action_token_begin_idx=6000,
        image_seq_length=16, image_size=28, num_obs_steps=2,
    )
    rng = np.random.RandomState(0)
    imgs = [(rng.rand(32, 48, 3) * 255).astype(np.uint8) for _ in range(2)]
    out = proc([imgs], ["do it"])
    assert out["pixel_values"].shape == (1, 2, 28, 28, 3)
    assert (out["input_ids"][0, :32] == 5000).all()
    assert out["input_ids"][0, 32] == proc.text_tokenizer.bos_id


def test_restricted_decode_stays_in_action_block(params):
    rng = np.random.RandomState(11)
    B = 1
    N = CFG.num_image_tokens
    ids = np.concatenate(
        [np.full((B, N), CFG.image_token_index), rng.randint(0, 1000, (B, 4))], axis=1
    )
    pixels = rng.rand(B, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
    gen = np.asarray(
        spatialvla.generate_greedy(
            params, CFG, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
            max_new_tokens=6, cache_dtype=jnp.float32,
            token_range=(CFG.action_token_begin_idx, CFG.spatial_token_num),
        )
    )
    assert gen.shape == (B, 6)
    assert (gen >= CFG.action_token_begin_idx).all()
    assert (gen < CFG.action_token_begin_idx + CFG.spatial_token_num).all()
    # restricted argmax == full argmax masked to the block
    # oracle: full forward with an all-prefix (bidirectional) mask, matching
    # the inference prefill semantics
    out = spatialvla.forward(
        params, CFG, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
        token_type_ids=jnp.zeros_like(jnp.asarray(ids)),
    )
    logits = np.asarray(out["logits"])[0, -1]
    begin = CFG.action_token_begin_idx
    expected = begin + np.argmax(logits[begin : begin + CFG.spatial_token_num])
    assert gen[0, 0] == expected


def test_padded_fused_decode_matches_xla_path(monkeypatch):
    """Right-padded mixed-length batches through the fused decode path
    (per-row cache positions, ops/decode_step.py) produce the same greedy
    tokens as the pad-aware XLA path — the serving engine batches requests
    with different instruction lengths through this route."""
    import functools

    from spatialvla_tpu.ops import decode_step as ds
    from spatialvla_tpu.ops.quant import quantize_lm_params

    monkeypatch.setattr(
        ds, "fused_decode_step",
        functools.partial(ds.fused_decode_step, interpret=True),
    )
    # widen the window so serving S fits it (the fused kernel treats window
    # and global layers identically below the window, as at 4b scale)
    cfg = dataclasses.replace(
        CFG, text=dataclasses.replace(CFG.text, sliding_window=512)
    )
    params = spatialvla.init_params(jax.random.PRNGKey(2), cfg)
    qparams = dict(params)
    qparams["lm"] = quantize_lm_params(params["lm"], fuse=True)

    rng = np.random.RandomState(11)
    B, n_text = 3, 6
    N = cfg.num_image_tokens
    P = N + n_text
    ids = np.concatenate(
        [np.full((B, N), cfg.image_token_index), rng.randint(0, 1000, (B, n_text))],
        axis=1,
    )
    am = np.ones((B, P), np.int32)
    am[1, -3:] = 0  # mixed prompt lengths, right-padded
    am[2, -1:] = 0
    pixels = jnp.asarray(
        rng.rand(B, cfg.vision.image_size, cfg.vision.image_size, 3).astype(np.float32)
    )
    common = dict(
        pixel_values=pixels, attention_mask=jnp.asarray(am), max_new_tokens=6,
    )
    gen_xla = spatialvla.generate_greedy(
        qparams, cfg, jnp.asarray(ids), use_fused_decode=False, **common
    )
    gen_fused = spatialvla.generate_greedy(
        qparams, cfg, jnp.asarray(ids), use_fused_decode=True, **common
    )
    np.testing.assert_array_equal(np.asarray(gen_fused), np.asarray(gen_xla))
    # the opt-in int8 KV cache rides the same padded fused path (per-row
    # quantize-and-scatter); token-identical on this config
    gen_kv8 = spatialvla.generate_greedy(
        qparams, cfg, jnp.asarray(ids), use_fused_decode=True, kv_bits=8,
        **common
    )
    np.testing.assert_array_equal(np.asarray(gen_kv8), np.asarray(gen_xla))
