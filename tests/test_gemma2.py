"""Numerical parity of the JAX Gemma2 decoder against HF transformers'
torch implementation (random weights, fp32, eager attention), plus KV-cache
decode consistency."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import Gemma2Config
from spatialvla_tpu.convert import gemma2_from_state_dict
from spatialvla_tpu.models import gemma2

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = Gemma2Config(
    vocab_size=1090,
    hidden_size=48,
    intermediate_size=96,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    sliding_window=8,  # < seq len so window masking is exercised
    query_pre_attn_scalar=16.0,
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.Gemma2Config(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        head_dim=TINY.head_dim,
        sliding_window=TINY.sliding_window,
        query_pre_attn_scalar=TINY.query_pre_attn_scalar,
        attn_logit_softcapping=TINY.attn_logit_softcap,
        final_logit_softcapping=TINY.final_logit_softcap,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        hidden_activation="gelu_pytorch_tanh",
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.Gemma2ForCausalLM(cfg).eval()
    return model


@pytest.fixture(scope="module")
def jx_params(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    if "lm_head.weight" not in sd:  # HF may tie despite the flag
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    return gemma2_from_state_dict(sd, TINY)


def _hf_logits(hf_model, input_ids, attention_mask=None):
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=None if attention_mask is None else torch.tensor(attention_mask),
        )
    return out.logits.numpy()


def _our_logits(jx_params, input_ids, base_mask, position_ids):
    embeds = gemma2.embed_tokens(jx_params, jnp.asarray(input_ids))
    h, _ = gemma2.forward(
        jx_params, TINY, embeds, jnp.asarray(position_ids), jnp.asarray(base_mask)
    )
    return np.asarray(gemma2.compute_logits(jx_params, TINY, h))


def test_causal_forward_parity(hf_model, jx_params):
    rng = np.random.RandomState(0)
    B, T = 2, 32
    ids = rng.randint(0, TINY.vocab_size, (B, T))
    attn = np.ones((B, T), dtype=np.int64)
    ref = _hf_logits(hf_model, ids, attn)
    base_mask = np.asarray(gemma2.causal_base_mask(jnp.asarray(attn)))
    pos = np.arange(T)[None, :].repeat(B, 0)  # HF uses 0-based positions here
    ours = _our_logits(jx_params, ids, base_mask, pos)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_padding_mask_parity(hf_model, jx_params):
    rng = np.random.RandomState(1)
    B, T = 2, 16
    ids = rng.randint(0, TINY.vocab_size, (B, T))
    attn = np.ones((B, T), dtype=np.int64)
    attn[0, 12:] = 0  # right padding
    ref = _hf_logits(hf_model, ids, attn)
    base_mask = np.asarray(gemma2.causal_base_mask(jnp.asarray(attn)))
    pos = np.arange(T)[None, :].repeat(B, 0)
    ours = _our_logits(jx_params, ids, base_mask, pos)
    # compare only non-pad query positions
    np.testing.assert_allclose(ours[0, :12], ref[0, :12], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours[1], ref[1], atol=2e-4, rtol=2e-4)


def test_prefix_lm_mask_parity(hf_model, jx_params):
    """Bidirectional prefix + causal suffix, passed to HF as a 4D mask.

    T < sliding_window so the window never binds: transformers >= 4.5x
    applies an explicit 4D mask verbatim to every layer, whereas the
    reference's vendored decoder composes the sliding window on top
    (modeling_gemma2.py:461-473) — we follow the reference; the window
    composition itself is unit-tested in test_make_masks_sliding below."""
    rng = np.random.RandomState(2)
    B, T, P = 2, 7, 4  # total length below the sliding window (8)
    ids = rng.randint(0, TINY.vocab_size, (B, T))

    causal = np.tril(np.ones((T, T), dtype=bool))
    prefix = np.zeros((T, T), dtype=bool)
    prefix[:, :P] = True  # every query may see all prefix keys
    allowed = causal | prefix
    base_mask = np.broadcast_to(allowed[None, None], (B, 1, T, T))

    min_dtype = torch.finfo(torch.float32).min
    mask_4d = torch.where(
        torch.tensor(base_mask), torch.tensor(0.0), torch.tensor(min_dtype)
    ).expand(B, 1, T, T).contiguous()
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids), attention_mask=mask_4d
        ).logits.numpy()

    pos = np.arange(T)[None, :].repeat(B, 0)
    ours = _our_logits(jx_params, ids, base_mask, pos)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_make_masks_sliding():
    """The sliding mask drops only *past* keys at distance >= window
    (modeling_gemma2.py:461-473): allowed iff q_pos - k_pos < window, so a
    bidirectional prefix is unaffected in the future direction."""
    B, T, W = 1, 12, 4
    cfg = Gemma2Config(sliding_window=W, num_layers=2)
    base = jnp.ones((B, 1, T, T), dtype=bool)
    qpos = jnp.arange(T)[None]
    kpos = jnp.arange(T)
    g, s = gemma2.make_masks(cfg, base, qpos, kpos)
    np.testing.assert_array_equal(np.asarray(g), np.ones((B, 1, T, T), bool))
    s = np.asarray(s)[0, 0]
    for q in range(T):
        for k in range(T):
            assert s[q, k] == (q - k < W), (q, k)


def test_kv_cache_decode_matches_full_forward(jx_params):
    """Prefill P tokens into a static cache, decode the rest one-by-one;
    logits must match the full-sequence forward at each position."""
    rng = np.random.RandomState(3)
    B, T, P, S = 2, 24, 16, 32
    ids = rng.randint(0, TINY.vocab_size, (B, T))
    pos_full = np.arange(T)[None, :].repeat(B, 0) + 1  # PaliGemma-style 1-based
    base_full = np.asarray(gemma2.causal_base_mask(jnp.ones((B, T))))
    full = _our_logits(jx_params, ids, base_full, pos_full)

    cache = gemma2.init_cache(TINY, B, S, dtype=jnp.float32)

    # prefill: queries [0,P), keys = all S slots; slot s valid iff s < P and s <= q
    q_idx = np.arange(P)
    k_idx = np.arange(S)
    prefill_mask = (k_idx[None, :] <= q_idx[:, None])[None, None].repeat(B, 0)
    embeds = gemma2.embed_tokens(jx_params, jnp.asarray(ids[:, :P]))
    h, cache = gemma2.forward(
        jx_params, TINY, embeds, jnp.asarray(pos_full[:, :P]),
        jnp.asarray(prefill_mask), cache=cache, cache_position=0,
    )
    logits_p = np.asarray(gemma2.compute_logits(jx_params, TINY, h))
    np.testing.assert_allclose(logits_p, full[:, :P], atol=2e-4, rtol=2e-4)

    for t in range(P, T):
        step_mask = np.broadcast_to(k_idx <= t, (B, 1, 1, S))
        embeds = gemma2.embed_tokens(jx_params, jnp.asarray(ids[:, t : t + 1]))
        h, cache = gemma2.forward(
            jx_params, TINY, embeds, jnp.asarray(pos_full[:, t : t + 1]),
            jnp.asarray(step_mask), cache=cache, cache_position=t,
        )
        logits_t = np.asarray(gemma2.compute_logits(jx_params, TINY, h))[:, 0]
        np.testing.assert_allclose(logits_t, full[:, t], atol=5e-4, rtol=5e-4)


def test_remat_matches(jx_params):
    rng = np.random.RandomState(4)
    B, T = 1, 8
    ids = rng.randint(0, TINY.vocab_size, (B, T))
    base_mask = np.asarray(gemma2.causal_base_mask(jnp.ones((B, T))))
    pos = np.arange(T)[None, :] + 1
    embeds = gemma2.embed_tokens(jx_params, jnp.asarray(ids))
    h1, _ = gemma2.forward(jx_params, TINY, embeds, jnp.asarray(pos), jnp.asarray(base_mask))
    h2, _ = gemma2.forward(
        jx_params, TINY, embeds, jnp.asarray(pos), jnp.asarray(base_mask), use_remat=True
    )
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
