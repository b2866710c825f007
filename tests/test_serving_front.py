"""Serving-front optimizations (VERDICT r3 #1): int8 weight-only vision
towers (SigLIP + zoe BEiT backbone + projector, ops/quant.py
quantize_vision_params) and the opt-in reduced-resolution depth mode
(zoe.predict_depth(image_size=...) + interpolated relative-position bias).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import spatialvla_tiny
from spatialvla_tpu.models import spatialvla, zoe
from spatialvla_tpu.ops.quant import is_quantized, quantize_vision_params

CFG = spatialvla_tiny(use_vision_zoe=True)


@pytest.fixture(scope="module")
def params():
    return spatialvla.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(1)
    px = jnp.asarray(rng.rand(1, 56, 56, 3).astype(np.float32))
    intr = jnp.asarray(
        np.array([[[64.0, 0, 28], [0, 64.0, 28], [0, 0, 1]]], np.float32)
    )
    return px, intr


def test_quantize_vision_params_structure(params):
    q = quantize_vision_params(params, bits=8)
    assert is_quantized(q["vision"]["layers"]["attn"]["q"]["w"])
    assert is_quantized(q["vision"]["layers"]["mlp"]["fc2"]["w"])
    assert is_quantized(q["zoe"]["backbone"]["layers"]["fc1"]["w"])
    assert is_quantized(q["zoe"]["backbone"]["layers"]["k"]["w"])
    assert "b" not in q["zoe"]["backbone"]["layers"]["k"]  # BEiT k has no bias
    assert is_quantized(q["projector"]["w"])
    # non-matmul weights and the LM are untouched
    assert q["vision"]["patch_embed"]["w"].dtype == params["vision"]["patch_embed"]["w"].dtype
    assert q["lm"] is params["lm"]
    assert q["zoe"]["neck"] is params["zoe"]["neck"]


def test_int8_vision_front_feature_parity(params, batch):
    """Image features through the int8 front stay close to bf16/fp32 —
    the per-matmul int8 error is ~0.8%; across the stacked towers the
    accumulated drift must stay small."""
    px, intr = batch
    q = quantize_vision_params(params, bits=8)
    ref = np.asarray(spatialvla.get_image_features(params, CFG, px, intr))
    got = np.asarray(spatialvla.get_image_features(q, CFG, px, intr))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.05, rel


def test_rel_table_interpolation():
    rng = np.random.RandomState(2)
    nh = 4
    w_src = 4
    num_rel = (2 * w_src - 1) ** 2 + 3
    table = jnp.asarray(rng.randn(num_rel, nh).astype(np.float32))
    # passthrough at the native window
    same = zoe._rel_table_for_window(table, w_src, w_src)
    assert same is table
    # downsized window: grid part resized, 3 cls tail rows preserved
    small = zoe._rel_table_for_window(table, w_src, 2)
    assert small.shape == ((2 * 2 - 1) ** 2 + 3, nh)
    np.testing.assert_allclose(
        np.asarray(small[-3:]), np.asarray(table[-3:]), rtol=1e-6
    )
    # a constant grid stays constant under bicubic interpolation
    const = jnp.concatenate(
        [jnp.full(((2 * w_src - 1) ** 2, nh), 0.7), table[-3:]], axis=0
    )
    small_c = zoe._rel_table_for_window(const, w_src, 2)
    np.testing.assert_allclose(np.asarray(small_c[:-3]), 0.7, atol=1e-5)


def test_reduced_res_depth_precomputed_matches_raw_table(params, batch):
    """At a reduced internal resolution the precomputed-bias path
    (precompute_rel_bias(image_size=...)) and the raw-table path must
    agree — both interpolate the same grid then index it."""
    px, _ = batch
    zp = params["zoe"]
    pre = zoe.precompute_rel_bias(zp, CFG.zoe, dtype=jnp.float32, image_size=32)
    d_raw = zoe.predict_depth(
        zp, CFG.zoe, px, target_hw=(56, 56), image_size=32
    )
    d_pre = zoe.predict_depth(
        pre, CFG.zoe, px, target_hw=(56, 56), image_size=32
    )
    assert d_raw.shape == (1, 56, 56)
    assert np.isfinite(np.asarray(d_raw)).all()
    np.testing.assert_allclose(
        np.asarray(d_pre), np.asarray(d_raw), rtol=2e-3, atol=2e-5
    )


def test_flash_prefill_matches_xla_prefill(params):
    """gemma2.prefill_flash (Pallas flash attention + cache collection)
    must match gemma2.forward with the bidirectional prefill mask: same
    final-normed hidden states AND the same K/V cache rows."""
    from spatialvla_tpu.models import gemma2

    tcfg = CFG.text
    B, P, S = 2, 10, 16
    rng = np.random.RandomState(3)
    embeds = jnp.asarray(
        rng.randn(B, P, tcfg.hidden_size).astype(np.float32) * 0.1
    )
    pos = jnp.arange(1, P + 1)[None].repeat(B, 0)

    h_flash, cache_flash = gemma2.prefill_flash(
        params["lm"], tcfg, embeds, pos, S, cache_dtype=jnp.float32
    )
    cache = gemma2.init_cache(tcfg, B, S, dtype=jnp.float32)
    mask = spatialvla.bidirectional_prefill_mask(P, S, B)
    h_xla, cache_xla = gemma2.forward(
        params["lm"], tcfg, embeds, pos, mask, cache=cache, cache_position=0
    )
    np.testing.assert_allclose(
        np.asarray(h_flash), np.asarray(h_xla), rtol=2e-4, atol=2e-5
    )
    for key in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(cache_flash[key]), np.asarray(cache_xla[key]),
            rtol=2e-4, atol=2e-5,
        )


def test_generate_greedy_flash_prefill_token_parity(params, batch):
    """Forcing the flash prefill on the CPU interpret path produces the
    same greedy tokens as the XLA prefill (full generate, fp32)."""
    px, intr = batch
    N = CFG.num_image_tokens
    ids = jnp.asarray(
        np.concatenate(
            [np.full((1, N), CFG.image_token_index), [[5, 6, 7]]], axis=1
        ).astype(np.int32)
    )
    kw = dict(
        pixel_values=px, intrinsic=intr, max_new_tokens=4,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32,
        token_range=(CFG.action_token_begin_idx, CFG.spatial_token_num),
        use_fused_decode=False,
    )
    ref = spatialvla.generate_greedy(params, CFG, ids, use_flash_prefill=False, **kw)
    got = spatialvla.generate_greedy(params, CFG, ids, use_flash_prefill=True, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_predict_action_quantized_front_reduced_depth(params, batch):
    """End-to-end predict through the int8 front + reduced-res depth:
    valid action ids, and the depth trade perturbs features only mildly
    (ids may legitimately differ on random weights)."""
    px, intr = batch
    q = quantize_vision_params(params, bits=8)
    N = CFG.num_image_tokens
    ids = jnp.asarray(
        np.concatenate(
            [np.full((1, N), CFG.image_token_index), [[7, 8, 9]]], axis=1
        ).astype(np.int32)
    )
    out = spatialvla.predict_action(
        q, CFG, ids, pixel_values=px, intrinsic=intr,
        action_chunk_size=2, compute_dtype=jnp.float32,
        depth_image_size=32,
    )
    out = np.asarray(out)
    assert out.shape == (1, 6)
    begin = CFG.action_token_begin_idx
    assert ((out >= begin) & (out < begin + CFG.spatial_token_num)).all()
