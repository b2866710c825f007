"""int8 weight-only quantization: kernel parity, quantization error bounds,
and quantized-decode token agreement on the tiny model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import spatialvla_tiny
from spatialvla_tpu.models import spatialvla
from spatialvla_tpu.ops.quant import (
    dequantize,
    int8_matmul,
    qmatmul,
    quantize_int8,
    quantize_lm_params,
)

CFG = spatialvla_tiny(use_vision_zoe=False)


def test_quantize_round_trip_error():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    qw = quantize_int8(w)
    assert qw["qt"].dtype == jnp.int8
    assert qw["qt"].shape == (256, 128)  # stored transposed
    err = np.abs(np.asarray(dequantize(qw)) - np.asarray(w))
    # error bounded by half a quantization step per channel
    step = np.asarray(qw["scale"])
    assert (err <= 0.5 * step[None, :] + 1e-6).all()


def test_int8_matmul_kernel_parity():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 384).astype(np.float32))
    qw = quantize_int8(w)
    # the kernel computes on the bf16 MXU (int8 codes are exact in bf16;
    # activations round to bf16 like the serving baseline)
    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    ref = np.asarray(
        (xb @ qw["qt"].T.astype(jnp.float32)) * qw["scale"][None, :]
    )
    got = np.asarray(
        int8_matmul(x, qw["qt"], qw["scale"], out_dtype=jnp.float32, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_qmatmul_dispatch():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 3, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    plain = np.asarray(qmatmul(x, w))
    np.testing.assert_allclose(plain, np.asarray(x @ w), rtol=1e-6)
    qw = quantize_int8(w)
    quant = np.asarray(qmatmul(x, qw, use_kernel=False))
    rel = np.abs(quant - plain).mean() / (np.abs(plain).mean() + 1e-9)
    assert rel < 0.02, rel


def test_quantized_decode_matches_bf16_tokens():
    """int8 LM weights produce the same greedy action tokens as fp32 on the
    tiny model (weight-only quantization preserves argmax for confident
    logits; we check agreement on a trained-free random model loosely:
    logits close in relative terms)."""
    params = spatialvla.init_params(jax.random.PRNGKey(0), CFG)
    qparams = dict(params)
    qparams["lm"] = quantize_lm_params(params["lm"])

    rng = np.random.RandomState(3)
    N = CFG.num_image_tokens
    ids = np.concatenate(
        [np.full((1, N), CFG.image_token_index), rng.randint(0, 1000, (1, 4))], axis=1
    )
    pixels = jnp.asarray(
        rng.rand(1, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
    )
    out_fp = spatialvla.forward(params, CFG, jnp.asarray(ids), pixel_values=pixels)
    out_q = spatialvla.forward(qparams, CFG, jnp.asarray(ids), pixel_values=pixels)
    a = np.asarray(out_fp["logits"][0, -1])
    b = np.asarray(out_q["logits"][0, -1])
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 0.05, rel

    # greedy decode runs end-to-end with the quantized tree
    gen = spatialvla.generate_greedy(
        qparams, CFG, jnp.asarray(ids), pixel_values=pixels, max_new_tokens=3,
        cache_dtype=jnp.float32,
    )
    assert np.asarray(gen).shape == (1, 3)


def test_int8_rmsnorm_matmul_kernel_parity():
    """Fused rms_norm+matvec kernel (interpret mode) == norm-then-qmatmul."""
    from spatialvla_tpu.models.layers import rms_norm
    from spatialvla_tpu.ops.quant import int8_rmsnorm_matmul

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 128).astype(np.float32))
    nw = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    qw = quantize_int8(w)
    got = np.asarray(
        int8_rmsnorm_matmul(x, nw, qw["qt"], qw["scale"],
                            out_dtype=jnp.float32, interpret=True)
    )
    xn = rms_norm(nw, x).astype(jnp.bfloat16).astype(jnp.float32)
    ref = np.asarray((xn @ qw["qt"].T.astype(jnp.float32)) * qw["scale"][None, :])
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# int4 (packed-nibble) path
# ---------------------------------------------------------------------------

def test_quantize_int4_pack_layout_and_round_trip():
    from spatialvla_tpu.ops.quant import dequantize, quantize_int4, unpack_int4

    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    qw = quantize_int4(w, group_size=None)
    assert qw["qt"].dtype == jnp.uint8
    assert qw["qt"].shape == (256, 64)  # (N, K // 2), transposed + packed
    codes = np.asarray(unpack_int4(qw["qt"]))
    assert codes.min() >= -8 and codes.max() <= 7
    # column j packed with column j + K/2: exact code round-trip
    wf = np.asarray(w, np.float32)
    scale = np.asarray(qw["scale"])
    q_ref = np.clip(np.round(wf / np.maximum(scale[None, :], 1e-12)), -8, 7)
    np.testing.assert_array_equal(codes.T, q_ref)
    err = np.abs(np.asarray(dequantize(qw)) - wf)
    assert (err <= 0.5 * scale[None, :] + 1e-6).all()


def test_int4_matmul_kernel_parity():
    from spatialvla_tpu.ops.quant import quantize_int4, unpack_int4

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(4, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 384).astype(np.float32))
    qw = quantize_int4(w, group_size=None)
    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    wd = unpack_int4(qw["qt"]).astype(jnp.float32)
    ref = np.asarray((xb @ wd.T) * qw["scale"][None, :])
    got = np.asarray(
        int8_matmul(x, qw["qt"], qw["scale"], out_dtype=jnp.float32, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_int4_grouped_matmul_kernel_parity():
    """Group-wise int4 kernel (interpret) == group-wise f32-partial math.

    The kernel (grouped_int4_dot, the per-group-partial-dot formulation —
    fastest of the three measured, see its docstring) computes per-group
    f32 partial dots on exact-in-bf16 codes with f32 scales applied to the
    partials: the matching reference is the group-sliced f32 einsum below,
    which it equals to f32 accumulation noise. The XLA serving fallback
    (grouped_dequant_t: bf16-rounded scaled weights) is a different
    rounding convention and only agrees to bf16 tolerance — checked with
    a loose bound so the two paths can't silently diverge."""
    from spatialvla_tpu.ops.quant import quantize_int4, unpack_int4

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 384).astype(np.float32))
    qw = quantize_int4(w, group_size=64)  # G = 4 groups along K
    assert qw["scale"].shape == (384, 4)
    xb = np.asarray(x.astype(jnp.bfloat16), np.float32)  # (4, 256)
    codes = np.asarray(unpack_int4(qw["qt"]), np.float32)  # (384, 256)
    scale = np.asarray(qw["scale"], np.float32)  # (384, 4)
    g = 256 // 4
    ref = sum(
        (xb[:, j * g : (j + 1) * g] @ codes[:, j * g : (j + 1) * g].T)
        * scale[:, j][None, :]
        for j in range(4)
    )
    got = np.asarray(
        int8_matmul(x, qw["qt"], qw["scale"], out_dtype=jnp.float32,
                    interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
    # the bf16-rounded XLA fallback stays within bf16 rounding of the kernel
    wd_f32 = np.asarray(dequantize(qw, jnp.bfloat16), np.float32)  # (K, N)
    ref_f32 = xb @ wd_f32
    np.testing.assert_allclose(got, ref_f32, rtol=0.2, atol=0.2)


def test_int4_rmsnorm_matmul_kernel_parity():
    from spatialvla_tpu.models.layers import rms_norm
    from spatialvla_tpu.ops.quant import (
        int8_rmsnorm_matmul,
        quantize_int4,
        unpack_int4,
    )

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 128).astype(np.float32))
    nw = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    qw = quantize_int4(w, group_size=None)
    got = np.asarray(
        int8_rmsnorm_matmul(x, nw, qw["qt"], qw["scale"],
                            out_dtype=jnp.float32, interpret=True)
    )
    xn = rms_norm(nw, x).astype(jnp.bfloat16).astype(jnp.float32)
    wd = unpack_int4(qw["qt"]).astype(jnp.float32)
    ref = np.asarray((xn @ wd.T) * qw["scale"][None, :])
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_qmatmul_int4_dispatch_and_lm_tree():
    from spatialvla_tpu.ops.quant import quantize_int4

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 3, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    plain = np.asarray(qmatmul(x, w))
    quant = np.asarray(qmatmul(x, quantize_int4(w, group_size=None), use_kernel=False))
    rel = np.abs(quant - plain).mean() / (np.abs(plain).mean() + 1e-9)
    assert rel < 0.15, rel  # int4 step is 16x coarser than int8 (~11%
    # relative error on gaussian weights — the documented quality trade)

    # the full quantized LM tree at bits=4 runs the tiny forward end-to-end
    params = spatialvla.init_params(jax.random.PRNGKey(1), CFG)
    qparams = dict(params)
    qparams["lm"] = quantize_lm_params(params["lm"], bits=4)
    ids = np.concatenate(
        [np.full((1, CFG.num_image_tokens), CFG.image_token_index),
         rng.randint(0, 1000, (1, 4))], axis=1,
    )
    pixels = jnp.asarray(
        rng.rand(1, CFG.vision.image_size, CFG.vision.image_size, 3).astype(np.float32)
    )
    out_fp = spatialvla.forward(params, CFG, jnp.asarray(ids), pixel_values=pixels)
    out_q = spatialvla.forward(qparams, CFG, jnp.asarray(ids), pixel_values=pixels)
    a = np.asarray(out_fp["logits"][0, -1])
    b = np.asarray(out_q["logits"][0, -1])
    assert np.isfinite(b).all()
    # per-channel int4 error compounds across layers — on a random-init tiny
    # model the relative logit drift is large (this is exactly why bits=4 is
    # quality-gated, not default); just bound it away from garbage
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 1.0, rel
