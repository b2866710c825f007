"""Pallas flash-attention parity vs the XLA oracle (interpret mode on CPU)
across causal / prefix-LM / sliding-window / GQA / padding configurations,
plus gradient checks through the custom VJP."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.ops.flash_attention import (
    _attention_reference,
    _flash_attention_impl,
    flash_attention,
)


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=jnp.float32)


def _run(q, k, v, prefix, valid, qoff, **kw):
    ours = _flash_attention_impl(
        q, k, v, jnp.asarray(prefix), jnp.asarray(valid), jnp.asarray(qoff),
        kw.get("scale", 1.0), kw.get("logit_softcap"), kw.get("window"),
        kw.get("causal", True), kw.get("block_q", 64), kw.get("block_k", 64),
        interpret=True,
    )
    ref = _attention_reference(
        q, k, v, jnp.asarray(prefix), jnp.asarray(valid), jnp.asarray(qoff),
        scale=kw.get("scale", 1.0), logit_softcap=kw.get("logit_softcap"),
        window=kw.get("window"), causal=kw.get("causal", True),
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5)
    return ours


def test_causal_gqa():
    B, T, Nq, Nkv, D = 2, 128, 4, 2, 32
    q, k, v = _rand((B, T, Nq, D), 0), _rand((B, T, Nkv, D), 1), _rand((B, T, Nkv, D), 2)
    _run(q, k, v, [0, 0], [T, T], [0, 0], scale=0.25, logit_softcap=50.0)


def test_prefix_lm_and_padding():
    B, T, Nq, Nkv, D = 2, 96, 2, 1, 16
    q, k, v = _rand((B, T, Nq, D), 3), _rand((B, T, Nkv, D), 4), _rand((B, T, Nkv, D), 5)
    # row 0: prefix 40, valid 80 (right padding); row 1: prefix 16, full
    _run(q, k, v, [40, 16], [80, T], [0, 0], scale=0.5, logit_softcap=30.0,
         block_q=32, block_k=32)


def test_sliding_window():
    B, T, Nq, Nkv, D = 1, 128, 2, 2, 16
    q, k, v = _rand((B, T, Nq, D), 6), _rand((B, T, Nkv, D), 7), _rand((B, T, Nkv, D), 8)
    _run(q, k, v, [0], [T], [0], window=24, block_q=32, block_k=32)


def test_window_with_prefix():
    B, T, Nq, Nkv, D = 1, 64, 2, 1, 16
    q, k, v = _rand((B, T, Nq, D), 9), _rand((B, T, Nkv, D), 10), _rand((B, T, Nkv, D), 11)
    _run(q, k, v, [24], [60], [0], window=16, block_q=16, block_k=16,
         logit_softcap=50.0)


def test_non_divisible_lengths_pad():
    B, T, Nq, Nkv, D = 1, 70, 2, 2, 16
    q, k, v = _rand((B, T, Nq, D), 12), _rand((B, T, Nkv, D), 13), _rand((B, T, Nkv, D), 14)
    _run(q, k, v, [10], [T], [0], block_q=32, block_k=32)


def test_query_offset_decode_chunk():
    """Queries are a suffix chunk at absolute offset (chunked prefill)."""
    B, Tk, Tq, Nq, Nkv, D = 1, 128, 32, 2, 1, 16
    k = _rand((B, Tk, Nkv, D), 15)
    v = _rand((B, Tk, Nkv, D), 16)
    q = _rand((B, Tq, Nq, D), 17)
    _run(q, k, v, [0], [96], [64], block_q=32, block_k=32)


def test_gradients_match_reference():
    B, T, Nq, Nkv, D = 1, 64, 2, 1, 16
    q, k, v = _rand((B, T, Nq, D), 18), _rand((B, T, Nkv, D), 19), _rand((B, T, Nkv, D), 20)
    prefix = jnp.asarray([20])
    valid = jnp.asarray([60])
    qoff = jnp.asarray([0])

    def loss_fa(q, k, v):
        return flash_attention(
            q, k, v, prefix, valid, qoff, 0.3, 50.0, None, True, 32, 32
        ).sum()

    def loss_ref(q, k, v):
        return _attention_reference(
            q, k, v, prefix, valid, qoff, scale=0.3, logit_softcap=50.0,
            window=None, causal=True,
        ).sum()

    # interpret mode for the forward inside custom_vjp on CPU
    import sys

    fa = sys.modules["spatialvla_tpu.ops.flash_attention"]
    orig = fa._flash_attention_impl
    fa._flash_attention_impl = functools.partial(orig, interpret=True)
    try:
        g1 = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._flash_attention_impl = orig
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# fused Pallas backward parity (interpret mode) vs the XLA reference VJP
# ---------------------------------------------------------------------------

def _bwd_case(B, T, Nq, Nkv, D, prefix, valid, qoff, seed=0, **kw):
    from spatialvla_tpu.ops.flash_attention import (
        _flash_attention_bwd_impl,
    )

    q = _rand((B, T, Nq, D), seed)
    k = _rand((B, T, Nkv, D), seed + 1)
    v = _rand((B, T, Nkv, D), seed + 2)
    do = _rand((B, T, Nq, D), seed + 3)
    prefix = jnp.asarray(prefix, jnp.int32)
    valid = jnp.asarray(valid, jnp.int32)
    qoff = jnp.asarray(qoff, jnp.int32)
    scale = kw.get("scale", 0.25)
    cap = kw.get("logit_softcap")
    window = kw.get("window")
    bq, bk = kw.get("block_q", 32), kw.get("block_k", 32)

    out, lse = _flash_attention_impl(
        q, k, v, prefix, valid, qoff, scale, cap, window, True, bq, bk,
        interpret=True, with_lse=True,
    )
    dq, dk, dv = _flash_attention_bwd_impl(
        q, k, v, out, lse, do, prefix, valid, qoff,
        scale, cap, window, True, bq, bk, interpret=True,
    )
    f = lambda q, k, v: _attention_reference(
        q, k, v, prefix, valid, qoff,
        scale=scale, logit_softcap=cap, window=window, causal=True,
    )
    _, vjp = jax.vjp(f, q, k, v)
    rdq, rdk, rdv = vjp(do)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=2e-4, rtol=2e-4)


def test_bwd_causal_gqa_softcap():
    _bwd_case(2, 64, 4, 2, 32, [0, 0], [64, 64], [0, 0],
              logit_softcap=50.0)


def test_bwd_prefix_padding():
    _bwd_case(2, 96, 2, 1, 16, [40, 16], [80, 96], [0, 0],
              logit_softcap=30.0, scale=0.5)


def test_bwd_sliding_window():
    _bwd_case(1, 128, 2, 2, 16, [0], [128], [0], window=32)


def test_bwd_nondivisible_padding_path():
    _bwd_case(1, 72, 2, 1, 16, [24], [60], [0], logit_softcap=20.0,
              block_q=32, block_k=32)
