"""Parity of the whole-LM fused decode kernel (ops/decode_step.py,
interpret mode) against the XLA serving path (gemma2.forward with the
fused-quantized tree): hidden state, new k/v rows, and greedy-token
agreement over a short decode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import Gemma2Config
from spatialvla_tpu.models import gemma2
from spatialvla_tpu.ops.decode_step import fused_decode_step
from spatialvla_tpu.ops.quant import quantize_lm_params

CFG = Gemma2Config(
    vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=4,
    num_heads=4, num_kv_heads=2, head_dim=32, sliding_window=512,
    query_pre_attn_scalar=32.0,
)


@pytest.fixture(
    scope="module",
    params=[(8, None, None), (4, None, None), (8, 4, None), (4, None, 16)],
    ids=["int8", "int4", "int8+mlp4", "int4-g16"],
)
def qparams(request):
    params = gemma2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    for i, k in enumerate(
        ["input_norm", "post_attn_norm", "pre_ffn_norm", "post_ffn_norm"]
    ):
        params["layers"][k] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(i + 1), params["layers"][k].shape
        )
    params["final_norm"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), params["final_norm"].shape
    )
    bits, mlp_bits, group_size = request.param
    return quantize_lm_params(
        params, fuse=True, bits=bits, mlp_bits=mlp_bits, group_size=group_size
    )


def prefill(qparams, B, P, Smax, seed=0):
    rng = np.random.RandomState(seed)
    embeds = jnp.asarray(
        rng.randn(B, P, CFG.hidden_size).astype(np.float32)
    ).astype(jnp.bfloat16)
    cache = gemma2.init_cache(CFG, B, Smax, dtype=jnp.bfloat16)
    pos = jnp.arange(1, P + 1)[None]
    mask = jnp.broadcast_to(jnp.arange(Smax) < P, (B, 1, P, Smax))
    hid, cache = gemma2.forward(
        qparams, CFG, embeds, pos, mask, cache=cache, cache_position=0
    )
    return hid, cache, rng


@pytest.mark.parametrize("B", [1, 3])
def test_fused_step_matches_xla_serving_path(qparams, B):
    P, Smax = 6, 16
    _, cache, rng = prefill(qparams, B, P, Smax)
    x_new = jnp.asarray(
        rng.randn(B, 1, CFG.hidden_size).astype(np.float32)
    ).astype(jnp.bfloat16)

    step_mask = jnp.broadcast_to(jnp.arange(Smax) <= P, (B, 1, 1, Smax))
    hx, cache_x = gemma2.forward(
        qparams, CFG, x_new, jnp.full((B, 1), P + 1), step_mask,
        cache=cache, cache_position=P,
    )

    normalizer = jnp.asarray(CFG.hidden_size**0.5, dtype=jnp.bfloat16)
    ck = jnp.transpose(cache["k"], (0, 1, 3, 2, 4))
    cv = jnp.transpose(cache["v"], (0, 1, 3, 2, 4))
    h_f, k_new, v_new = fused_decode_step(
        qparams, CFG, x_new[:, 0] * normalizer, ck, cv,
        jnp.int32(P), jnp.int32(P + 1), interpret=True,
    )

    np.testing.assert_allclose(
        np.asarray(h_f, np.float32), np.asarray(hx[:, 0], np.float32),
        atol=0.06, rtol=0.02,
    )
    np.testing.assert_allclose(
        np.asarray(k_new, np.float32),
        np.asarray(cache_x["k"][:, :, P], np.float32),
        atol=0.02,
    )
    np.testing.assert_allclose(
        np.asarray(v_new, np.float32),
        np.asarray(cache_x["v"][:, :, P], np.float32),
        atol=0.02,
    )


@pytest.mark.parametrize("B", [1, 3])
def test_fused_step_int8_kv_cache(qparams, B):
    """Opt-in int8 KV cache (quantize_kv + per-slot scales folded into the
    logits/probability rows): the fused step on the quantized cache tracks
    the XLA path on the bf16 cache within the int8 noise, and stays within
    a tight envelope of the bf16-cache fused step."""
    from spatialvla_tpu.ops.quant import quantize_kv

    P, Smax = 6, 16
    _, cache, rng = prefill(qparams, B, P, Smax)
    x_new = jnp.asarray(
        rng.randn(B, 1, CFG.hidden_size).astype(np.float32)
    ).astype(jnp.bfloat16)

    step_mask = jnp.broadcast_to(jnp.arange(Smax) <= P, (B, 1, 1, Smax))
    hx, _ = gemma2.forward(
        qparams, CFG, x_new, jnp.full((B, 1), P + 1), step_mask,
        cache=cache, cache_position=P,
    )

    normalizer = jnp.asarray(CFG.hidden_size**0.5, dtype=jnp.bfloat16)
    ck = jnp.transpose(cache["k"], (0, 1, 3, 2, 4))
    cv = jnp.transpose(cache["v"], (0, 1, 3, 2, 4))
    h_bf16, k_bf16, v_bf16 = fused_decode_step(
        qparams, CFG, x_new[:, 0] * normalizer, ck, cv,
        jnp.int32(P), jnp.int32(P + 1), interpret=True,
    )
    ck8, ks = quantize_kv(ck)
    cv8, vs = quantize_kv(cv)
    h_q, k_q, v_q = fused_decode_step(
        qparams, CFG, x_new[:, 0] * normalizer, ck8, cv8,
        jnp.int32(P), jnp.int32(P + 1),
        cache_k_scale=ks, cache_v_scale=vs, interpret=True,
    )
    assert k_q.dtype == jnp.bfloat16 and v_q.dtype == jnp.bfloat16
    # int8-KV vs bf16-KV fused: only the cache representation differs
    np.testing.assert_allclose(
        np.asarray(h_q, np.float32), np.asarray(h_bf16, np.float32),
        atol=0.05, rtol=0.02,
    )
    # new k/v rows are computed from the current token, not the cache —
    # but the two kernel variants are different compiled programs, so the
    # f32 matvec accumulation order differs by bf16 ULPs (same class as
    # the M-dependence note on test_fused_step_per_row_positions)
    np.testing.assert_allclose(
        np.asarray(k_q, np.float32), np.asarray(k_bf16, np.float32), atol=4e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_q, np.float32), np.asarray(v_bf16, np.float32), atol=4e-3
    )
    # and against the XLA serving path
    np.testing.assert_allclose(
        np.asarray(h_q, np.float32), np.asarray(hx[:, 0], np.float32),
        atol=0.08, rtol=0.03,
    )


def test_fused_step_per_row_positions(qparams):
    """A vector-position call on rows sitting at DIFFERENT cache depths
    (mixed-length serving batch) matches reference calls at each row's
    scalar position.

    The references are batched at the SAME M with the row replicated:
    XLA's dot accumulation order differs between M=1 and M=3 (gemv vs gemm
    tiling), which perturbs the int4 grouped-dequant f32 sums by bf16 ULPs
    that compound over layers — measured 0.0156 max on this config with
    IDENTICAL rows and a uniform scalar position, i.e. pure M-dependence,
    no per-row logic involved. Holding M fixed makes the comparison exact,
    so a wrong per-row mask/RoPE position cannot hide under tolerance."""
    Smax = 16
    M = 3
    lens = [6, 4, 5]
    rows = [prefill(qparams, 1, p, Smax, seed=20 + i) for i, p in enumerate(lens)]
    xs = [
        jnp.asarray(r[2].randn(1, CFG.hidden_size).astype(np.float32)).astype(
            jnp.bfloat16
        )
        for r in rows
    ]
    normalizer = jnp.asarray(CFG.hidden_size**0.5, dtype=jnp.bfloat16)

    singles = []
    for (_, cache, _), x, p in zip(rows, xs, lens):
        ck = jnp.transpose(cache["k"], (0, 1, 3, 2, 4))
        cv = jnp.transpose(cache["v"], (0, 1, 3, 2, 4))
        singles.append(
            fused_decode_step(
                qparams, CFG,
                jnp.concatenate([x] * M, axis=0) * normalizer,
                jnp.concatenate([ck] * M, axis=1),
                jnp.concatenate([cv] * M, axis=1),
                jnp.int32(p), jnp.int32(p + 1), interpret=True,
            )
        )

    ck_all = jnp.concatenate(
        [jnp.transpose(c["k"], (0, 1, 3, 2, 4)) for _, c, _ in rows], axis=1
    )
    cv_all = jnp.concatenate(
        [jnp.transpose(c["v"], (0, 1, 3, 2, 4)) for _, c, _ in rows], axis=1
    )
    x_all = jnp.concatenate(xs, axis=0)
    h, k_new, v_new = fused_decode_step(
        qparams, CFG, x_all * normalizer, ck_all, cv_all,
        jnp.asarray(lens, jnp.int32), jnp.asarray(lens, jnp.int32) + 1,
        interpret=True,
    )
    # compare against row m of the replicated call: same M, same unrolled
    # attention loop index -> bit-identical expected
    for m, (hs, ks, vs) in enumerate(singles):
        np.testing.assert_allclose(
            np.asarray(h[m], np.float32), np.asarray(hs[m], np.float32), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(k_new[:, m], np.float32), np.asarray(ks[:, m], np.float32),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(v_new[:, m], np.float32), np.asarray(vs[:, m], np.float32),
            atol=1e-5,
        )


def test_fused_decode_loop_token_parity(qparams):
    """4 chained fused steps (cache scatter outside the kernel) produce the
    same greedy tokens as the XLA decode loop."""
    B, P, Smax = 1, 5, 16
    hid, cache, rng = prefill(qparams, B, P, Smax, seed=3)
    head = qparams["lm_head"]
    from spatialvla_tpu.ops.quant import qmatmul

    def next_tok(h2d):
        return jnp.argmax(qmatmul(h2d.astype(jnp.bfloat16), head), axis=-1)

    emb = qparams["embed"]
    normalizer = jnp.asarray(CFG.hidden_size**0.5, dtype=jnp.bfloat16)

    # XLA loop
    tok = next_tok(hid[:, -1])
    toks_x = [int(tok[0])]
    cx = {k: v for k, v in cache.items()}
    for t in range(3):
        e = jnp.take(emb, tok, axis=0)[:, None].astype(jnp.bfloat16)
        mask = jnp.broadcast_to(jnp.arange(Smax) <= P + t, (B, 1, 1, Smax))
        hx, cx = gemma2.forward(
            qparams, CFG, e, jnp.full((B, 1), P + t + 1), mask,
            cache=cx, cache_position=P + t,
        )
        tok = next_tok(hx[:, 0])
        toks_x.append(int(tok[0]))

    # fused loop
    ck = jnp.transpose(cache["k"], (0, 1, 3, 2, 4))
    cv = jnp.transpose(cache["v"], (0, 1, 3, 2, 4))
    tok = next_tok(hid[:, -1])
    toks_f = [int(tok[0])]
    for t in range(3):
        e = jnp.take(emb, tok, axis=0).astype(jnp.bfloat16)
        h_f, k_new, v_new = fused_decode_step(
            qparams, CFG, e * normalizer, ck, cv,
            jnp.int32(P + t), jnp.int32(P + t + 1), interpret=True,
        )
        ck = jax.lax.dynamic_update_slice(
            ck, k_new[:, :, :, None, :], (0, 0, 0, P + t, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v_new[:, :, :, None, :], (0, 0, 0, P + t, 0)
        )
        tok = next_tok(h_f)
        toks_f.append(int(tok[0]))

    assert toks_f == toks_x


def test_fused_decode_loop_int8_kv_token_parity(qparams):
    """The full chained decode with the int8 KV cache (quantized prefill
    cache + per-step quantize-and-scatter of new rows) emits the same
    greedy tokens as the XLA loop on the bf16 cache."""
    from spatialvla_tpu.ops.quant import qmatmul, quantize_kv

    B, P, Smax = 1, 5, 16
    hid, cache, rng = prefill(qparams, B, P, Smax, seed=3)
    head = qparams["lm_head"]

    def next_tok(h2d):
        return jnp.argmax(qmatmul(h2d.astype(jnp.bfloat16), head), axis=-1)

    emb = qparams["embed"]
    normalizer = jnp.asarray(CFG.hidden_size**0.5, dtype=jnp.bfloat16)

    # XLA loop (bf16 cache) — the oracle
    tok = next_tok(hid[:, -1])
    toks_x = [int(tok[0])]
    cx = {k: v for k, v in cache.items()}
    for t in range(3):
        e = jnp.take(emb, tok, axis=0)[:, None].astype(jnp.bfloat16)
        mask = jnp.broadcast_to(jnp.arange(Smax) <= P + t, (B, 1, 1, Smax))
        hx, cx = gemma2.forward(
            qparams, CFG, e, jnp.full((B, 1), P + t + 1), mask,
            cache=cx, cache_position=P + t,
        )
        tok = next_tok(hx[:, 0])
        toks_x.append(int(tok[0]))

    # fused loop on the int8 cache
    ck, ks = quantize_kv(jnp.transpose(cache["k"], (0, 1, 3, 2, 4)))
    cv, vs = quantize_kv(jnp.transpose(cache["v"], (0, 1, 3, 2, 4)))
    tok = next_tok(hid[:, -1])
    toks_q = [int(tok[0])]
    for t in range(3):
        e = jnp.take(emb, tok, axis=0).astype(jnp.bfloat16)
        h_q, k_new, v_new = fused_decode_step(
            qparams, CFG, e * normalizer, ck, cv,
            jnp.int32(P + t), jnp.int32(P + t + 1),
            cache_k_scale=ks, cache_v_scale=vs, interpret=True,
        )
        k8, ks_new = quantize_kv(k_new)
        v8, vs_new = quantize_kv(v_new)
        ck = jax.lax.dynamic_update_slice(
            ck, k8[:, :, :, None, :], (0, 0, 0, P + t, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v8[:, :, :, None, :], (0, 0, 0, P + t, 0)
        )
        ks = jax.lax.dynamic_update_slice(
            ks, ks_new[:, :, :, None], (0, 0, 0, P + t)
        )
        vs = jax.lax.dynamic_update_slice(
            vs, vs_new[:, :, :, None], (0, 0, 0, P + t)
        )
        tok = next_tok(h_q)
        toks_q.append(int(tok[0]))

    assert toks_q == toks_x


def test_xla_decode_step_matches_fused(qparams):
    """models/spatialvla.xla_decode_step (the GSPMD-partitionable twin the
    mesh-sharded split engine decodes through) tracks the fused Pallas step
    on the same per-row-position serving batch — hidden state and new k/v
    rows within the cross-program bf16 envelope (bf16 cache; the int8-KV
    twin is compared in test_xla_decode_step_matches_fused_int8_cache)."""
    from spatialvla_tpu.models.spatialvla import xla_decode_step

    Smax, M = 16, 3
    lens = [6, 4, 5]
    rows = [prefill(qparams, 1, p, Smax, seed=50 + i) for i, p in enumerate(lens)]
    xs = [
        jnp.asarray(r[2].randn(1, CFG.hidden_size).astype(np.float32)).astype(
            jnp.bfloat16
        )
        for r in rows
    ]
    normalizer = jnp.asarray(CFG.hidden_size**0.5, dtype=jnp.bfloat16)
    ck = jnp.concatenate(
        [jnp.transpose(c["k"], (0, 1, 3, 2, 4)) for _, c, _ in rows], axis=1
    )
    cv = jnp.concatenate(
        [jnp.transpose(c["v"], (0, 1, 3, 2, 4)) for _, c, _ in rows], axis=1
    )
    x_all = jnp.concatenate(xs, axis=0) * normalizer
    pos = jnp.asarray(lens, jnp.int32)

    lm = {"layers": qparams["layers"], "final_norm": qparams["final_norm"]}
    h_x, k_x, v_x = xla_decode_step(lm, CFG, x_all, ck, cv, pos, pos + 1)
    h_f, k_f, v_f = fused_decode_step(
        qparams, CFG, x_all, ck, cv, pos, pos + 1, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(h_x, np.float32), np.asarray(h_f, np.float32),
        atol=0.06, rtol=0.02,
    )
    np.testing.assert_allclose(
        np.asarray(k_x, np.float32), np.asarray(k_f, np.float32), atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(v_x, np.float32), np.asarray(v_f, np.float32), atol=0.02
    )


def test_fused_step_rejects_broken_scale_layout(qparams):
    """A KV-scale tensor in neither the legacy (L, M, Nkv, S) nor the
    kernel-flat (L, Nkv, 1, M*S) layout fails loudly at trace time — the
    deliberately-broken-layout dry run the round-4 verdict asked the smoke
    matrix to catch (a silently mis-laid scale would corrupt every
    attention row instead)."""
    from spatialvla_tpu.ops.quant import quantize_kv

    B, P, Smax = 3, 5, 16
    _, cache, rng = prefill(qparams, B, P, Smax)
    ck, ks = quantize_kv(jnp.transpose(cache["k"], (0, 1, 3, 2, 4)))
    cv, vs = quantize_kv(jnp.transpose(cache["v"], (0, 1, 3, 2, 4)))
    x = jnp.asarray(rng.randn(B, CFG.hidden_size).astype(np.float32))
    broken = jnp.transpose(ks, (0, 2, 1, 3))  # (L, Nkv, M, S): wrong
    with pytest.raises(AssertionError, match="cache_k_scale"):
        fused_decode_step(
            qparams, CFG, x, ck, cv, jnp.int32(P), jnp.int32(P + 1),
            cache_k_scale=broken, cache_v_scale=vs, interpret=True,
        )


def test_xla_decode_step_int8_requires_flat_scales(qparams):
    """An int8 cache without the kernel's pre-flattened (L, Nkv, 1, M*S)
    per-slot scales fails loudly at trace time — codes without scales (or
    scales in the legacy (L, M, Nkv, S) layout) would silently mis-weight
    every attention row otherwise."""
    from spatialvla_tpu.models.spatialvla import xla_decode_step
    from spatialvla_tpu.ops.quant import quantize_kv

    _, cache, rng = prefill(qparams, 1, 5, 16)
    ck, ks = quantize_kv(jnp.transpose(cache["k"], (0, 1, 3, 2, 4)))
    cv, vs = quantize_kv(jnp.transpose(cache["v"], (0, 1, 3, 2, 4)))
    x = jnp.asarray(rng.randn(1, CFG.hidden_size).astype(np.float32))
    lm = {"layers": qparams["layers"], "final_norm": qparams["final_norm"]}
    with pytest.raises(AssertionError, match="per-slot scales"):
        xla_decode_step(lm, CFG, x, ck, cv, jnp.int32(5), jnp.int32(6))
    with pytest.raises(AssertionError, match="per-slot scales"):
        # legacy layout (not pre-flattened) is rejected too
        xla_decode_step(
            lm, CFG, x, ck, cv, jnp.int32(5), jnp.int32(6),
            cache_k_scale=ks, cache_v_scale=vs,
        )


def test_xla_decode_step_matches_fused_int8_cache(qparams):
    """xla_decode_step's code-domain int8-KV attention (logits * k_scale
    after the q.K dot, probs * v_scale before the V dot — the fused
    kernel's association, ops/decode_step.py:289-314) tracks the fused
    Pallas step on the same quantized cache: mesh-sharded split serving
    decodes through this path when kv_bits=8."""
    from spatialvla_tpu.models.spatialvla import xla_decode_step
    from spatialvla_tpu.ops.decode_step import flatten_kv_scales
    from spatialvla_tpu.ops.quant import quantize_kv

    Smax, M = 16, 3
    lens = [6, 4, 5]
    rows = [prefill(qparams, 1, p, Smax, seed=70 + i) for i, p in enumerate(lens)]
    xs = [
        jnp.asarray(r[2].randn(1, CFG.hidden_size).astype(np.float32)).astype(
            jnp.bfloat16
        )
        for r in rows
    ]
    normalizer = jnp.asarray(CFG.hidden_size**0.5, dtype=jnp.bfloat16)
    ck_bf = jnp.concatenate(
        [jnp.transpose(c["k"], (0, 1, 3, 2, 4)) for _, c, _ in rows], axis=1
    )
    cv_bf = jnp.concatenate(
        [jnp.transpose(c["v"], (0, 1, 3, 2, 4)) for _, c, _ in rows], axis=1
    )
    ck, ks = quantize_kv(ck_bf)
    cv, vs = quantize_kv(cv_bf)
    ks_flat, vs_flat = flatten_kv_scales(ks), flatten_kv_scales(vs)
    x_all = jnp.concatenate(xs, axis=0) * normalizer
    pos = jnp.asarray(lens, jnp.int32)

    lm = {"layers": qparams["layers"], "final_norm": qparams["final_norm"]}
    h_x, k_x, v_x = xla_decode_step(
        lm, CFG, x_all, ck, cv, pos, pos + 1,
        cache_k_scale=ks_flat, cache_v_scale=vs_flat,
    )
    h_f, k_f, v_f = fused_decode_step(
        qparams, CFG, x_all, ck, cv, pos, pos + 1,
        cache_k_scale=ks_flat, cache_v_scale=vs_flat, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(h_x, np.float32), np.asarray(h_f, np.float32),
        atol=0.06, rtol=0.02,
    )
    # new k/v rows leave both paths in bf16 for the caller to re-quantize
    assert k_x.dtype == jnp.bfloat16 and k_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(k_x, np.float32), np.asarray(k_f, np.float32), atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(v_x, np.float32), np.asarray(v_f, np.float32), atol=0.02
    )


# ---------------------------------------------------------------------------
# VMEM budgeting: the weight-block budget yields to the KV-cache footprint
# (the fixed 2.7 MB blocks overflowed the scoped-vmem stack at B=16 bf16
# cache — MEASURE_ROUND3.jsonl serve_16c_int8), and impossible configs fail
# with a clear error instead of a Mosaic stack overflow
# ---------------------------------------------------------------------------

def test_weight_block_budget_yields_to_cache():
    from spatialvla_tpu.ops.decode_step import _BLOCK_BYTES, _weight_block_budget

    flagship = dict(Nkv=4, D=256, H=2304, I=9216, N0=4096, Nq=8)
    # B=1 serving: full blocks
    assert (
        _weight_block_budget(M=1, S=278, kv_quant=False, **flagship)
        == _BLOCK_BYTES
    )
    # B=16 bf16 cache (the config that failed to compile): shrunken blocks
    b16 = _weight_block_budget(M=16, S=332, kv_quant=False, **flagship)
    assert 512 * 1024 <= b16 < _BLOCK_BYTES
    # int8 KV halves the cache blocks: budget recovers
    assert _weight_block_budget(M=16, S=332, kv_quant=True, **flagship) > b16


def test_weight_block_budget_impossible_config_raises():
    import pytest

    from spatialvla_tpu.ops.decode_step import _weight_block_budget

    with pytest.raises(ValueError, match="kv_bits=8"):
        _weight_block_budget(
            M=64, S=2048, kv_quant=False,
            Nkv=4, D=256, H=2304, I=9216, N0=4096, Nq=8,
        )
