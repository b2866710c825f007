"""Gemma2 decoder, TPU-native.

Design (vs the reference's vendored torch decoder, model/modeling_gemma2.py):
  - layers are *stacked* along a leading axis and iterated with
    ``jax.lax.scan`` — one compiled layer body regardless of depth, and the
    stacked parameter arrays shard cleanly along fsdp/model mesh axes;
  - the KV cache is a static-shape (L, B, S_max, N_kv, D) buffer updated
    with dynamic_update_slice (the reference's HybridCache is also static,
    modeling_gemma2.py:712-720);
  - sliding-window vs global attention alternates per layer
    (even layers windowed: ``is_sliding = not bool(layer_idx % 2)``,
    modeling_gemma2.py:343); both masks are precomputed once per call and
    selected per scan step;
  - semantics parity: sandwich RMSNorm (:444-448), attn softcap 50 (:182-185),
    final logit softcap 30 (:994-997), query scaling
    query_pre_attn_scalar**-0.5 (:342), embeddings scaled by sqrt(hidden)
    in the input dtype (:739-742), fp32 RoPE (:111-119), fp32 softmax.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Gemma2Config
from ..ops.quant import is_quantized, qmatmul, qnorm_matmul
from .attention import multi_head_attention
from .layers import gelu_tanh, normal_init, rms_norm, softcap
from .rope import apply_rope, rope_cos_sin

Array = jax.Array
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_params(key: Array, cfg: Gemma2Config, dtype=jnp.float32) -> Params:
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    Nq, Nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = jax.random.split(key, 8)
    params = {
        "embed": normal_init(ks[0], (cfg.vocab_size, H), dtype=dtype),
        "layers": {
            "attn": {
                "q": normal_init(ks[1], (L, H, Nq * D), dtype=dtype),
                "k": normal_init(ks[2], (L, H, Nkv * D), dtype=dtype),
                "v": normal_init(ks[3], (L, H, Nkv * D), dtype=dtype),
                "o": normal_init(ks[4], (L, Nq * D, H), dtype=dtype),
            },
            "mlp": {
                "gate": normal_init(ks[5], (L, H, I), dtype=dtype),
                "up": normal_init(ks[6], (L, H, I), dtype=dtype),
                "down": normal_init(ks[7], (L, I, H), dtype=dtype),
            },
            "input_norm": jnp.zeros((L, H), dtype=dtype),
            "post_attn_norm": jnp.zeros((L, H), dtype=dtype),
            "pre_ffn_norm": jnp.zeros((L, H), dtype=dtype),
            "post_ffn_norm": jnp.zeros((L, H), dtype=dtype),
        },
        "final_norm": jnp.zeros((H,), dtype=dtype),
    }
    if not cfg.tie_lm_head:
        params["lm_head"] = normal_init(
            jax.random.fold_in(key, 99), (H, cfg.vocab_size), dtype=dtype
        )
    return params


def init_cache(cfg: Gemma2Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> Params:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}


def is_sliding_flags(cfg: Gemma2Config) -> Array:
    """Even layers use the sliding window (modeling_gemma2.py:343)."""
    return (jnp.arange(cfg.num_layers) % 2) == 0


# ---------------------------------------------------------------------------
# embedding
# ---------------------------------------------------------------------------

def embed_tokens(params: Params, input_ids: Array, dtype=None) -> Array:
    emb = params["embed"]
    if dtype is not None:
        emb = emb.astype(dtype)
    return jnp.take(emb, input_ids, axis=0)


# ---------------------------------------------------------------------------
# layer body
# ---------------------------------------------------------------------------

def _attention_block(
    lp: Params,
    cfg: Gemma2Config,
    h: Array,  # (B, T, H) pre input-norm (norm fused where possible)
    norm_w: Array,
    cos: Array,
    sin: Array,
    mask: Array,  # (B, 1, T, S) bool
    cache_kv: Optional[Tuple[Array, Array]],
    cache_position: Optional[Array],
) -> Tuple[Array, Optional[Tuple[Array, Array]]]:
    B, T, H = h.shape
    Nq, Nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "qkv" in lp:  # fused quantized serving tree (norm fused into kernel)
        qkv = qnorm_matmul(h, norm_w, lp["qkv"], eps=cfg.rms_norm_eps)
        q, k, v = jnp.split(qkv, [Nq * D, Nq * D + Nkv * D], axis=-1)
        q = q.reshape(B, T, Nq, D)
        k = k.reshape(B, T, Nkv, D)
        v = v.reshape(B, T, Nkv, D)
    else:
        x = rms_norm(norm_w, h, cfg.rms_norm_eps)
        q = qmatmul(x, lp["q"]).reshape(B, T, Nq, D)
        k = qmatmul(x, lp["k"]).reshape(B, T, Nkv, D)
        v = qmatmul(x, lp["v"]).reshape(B, T, Nkv, D)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache = None
    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_position, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_position, 0, 0))
        k, v = ck.astype(h.dtype), cv.astype(h.dtype)
        new_cache = (ck, cv)

    scale = cfg.query_pre_attn_scalar**-0.5
    out = multi_head_attention(
        q, k, v, mask, scale=scale, logit_softcap=cfg.attn_logit_softcap
    )
    attn_dtype = h.dtype
    out = qmatmul(out.reshape(B, T, Nq * D).astype(attn_dtype), lp["o"])
    return out, new_cache


def _mlp_block(lp: Params, h: Array, norm_w: Array, eps: float) -> Array:
    if "gate_up" in lp:  # fused quantized serving tree (norm fused)
        gu = qnorm_matmul(h, norm_w, lp["gate_up"], eps=eps)
        gate, up = jnp.split(gu, 2, axis=-1)
        return qmatmul(gelu_tanh(gate) * up, lp["down"])
    x = rms_norm(norm_w, h, eps)
    gate = gelu_tanh(qmatmul(x, lp["gate"]))
    up = qmatmul(x, lp["up"])
    return qmatmul(gate * up, lp["down"])


def _decoder_layer(
    cfg: Gemma2Config,
    h: Array,
    lp: Params,
    is_sliding: Array,  # scalar bool
    cos: Array,
    sin: Array,
    mask_global: Array,
    mask_sliding: Array,
    cache_kv: Optional[Tuple[Array, Array]],
    cache_position: Optional[Array],
):
    mask = jnp.where(is_sliding, mask_sliding, mask_global)
    attn_out, new_cache = _attention_block(
        lp["attn"], cfg, h, lp["input_norm"], cos, sin, mask, cache_kv,
        cache_position,
    )
    h = h + rms_norm(lp["post_attn_norm"], attn_out, cfg.rms_norm_eps)
    mlp_out = _mlp_block(lp["mlp"], h, lp["pre_ffn_norm"], cfg.rms_norm_eps)
    h = h + rms_norm(lp["post_ffn_norm"], mlp_out, cfg.rms_norm_eps)
    return h, new_cache


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

def make_masks(
    cfg: Gemma2Config,
    base_mask: Array,  # (B, 1, T, S) bool — causal/prefix-LM/padding, prebuilt
    q_positions: Array,  # (B, T) absolute positions (0-based cache slots)
    k_positions: Array,  # (S,) or (B, S) absolute positions of cache slots
) -> Tuple[Array, Array]:
    """Returns (global_mask, sliding_mask). The sliding mask additionally
    requires q_pos - k_pos < window (only past tokens beyond the window are
    dropped, matching modeling_gemma2.py:461-473). k_positions may be
    per-row (B, S) when cache slots do not equal token positions (right-
    padded serving batches)."""
    if k_positions.ndim == 1:
        k_positions = k_positions[None, :]
    delta = q_positions[:, :, None] - k_positions[:, None, :]
    within = (delta < cfg.sliding_window)[:, None]
    return base_mask, base_mask & within


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _attention_block_flash(
    lp: Params,
    cfg: Gemma2Config,
    x: Array,
    cos: Array,
    sin: Array,
    prefix_lens: Array,
    valid_lens: Array,
    window: Optional[int],
) -> Array:
    """Training-path attention through the fused Pallas kernel (no cache)."""
    from ..ops.flash_attention import flash_attention

    B, T, H = x.shape
    Nq, Nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = apply_rope(qmatmul(x, lp["q"]).reshape(B, T, Nq, D), cos, sin)
    k = apply_rope(qmatmul(x, lp["k"]).reshape(B, T, Nkv, D), cos, sin)
    v = qmatmul(x, lp["v"]).reshape(B, T, Nkv, D)
    out = flash_attention(
        q, k, v, prefix_lens, valid_lens, jnp.zeros_like(prefix_lens),
        cfg.query_pre_attn_scalar**-0.5, cfg.attn_logit_softcap, window, True,
    )
    return qmatmul(out.reshape(B, T, Nq * D), lp["o"])


def _decoder_layer_flash(
    cfg: Gemma2Config,
    h: Array,
    lp: Params,
    cos: Array,
    sin: Array,
    prefix_lens: Array,
    valid_lens: Array,
    window: Optional[int],
) -> Array:
    x = rms_norm(lp["input_norm"], h, cfg.rms_norm_eps)
    attn_out = _attention_block_flash(
        lp["attn"], cfg, x, cos, sin, prefix_lens, valid_lens, window
    )
    h = h + rms_norm(lp["post_attn_norm"], attn_out, cfg.rms_norm_eps)
    mlp_out = _mlp_block(lp["mlp"], h, lp["pre_ffn_norm"], cfg.rms_norm_eps)
    h = h + rms_norm(lp["post_ffn_norm"], mlp_out, cfg.rms_norm_eps)
    return h


def forward_flash(
    params: Params,
    cfg: Gemma2Config,
    inputs_embeds: Array,
    position_ids: Array,
    prefix_lens: Array,  # (B,) bidirectional-prefix boundary (0 = causal)
    valid_lens: Array,  # (B,) right-pad boundary
    *,
    use_remat: bool = False,
) -> Array:
    """Full-sequence forward through the Pallas flash-attention kernel.

    The alternating window/global layers become a scan over layer *pairs*
    (even layer windowed, odd global — modeling_gemma2.py:343) so the
    sliding-window size stays a compile-time kernel constant."""
    B, T, H = inputs_embeds.shape
    L = cfg.num_layers
    assert L % 2 == 0, "paired scan expects an even number of layers"
    normalizer = jnp.asarray(cfg.hidden_size**0.5, dtype=inputs_embeds.dtype)
    h = inputs_embeds * normalizer
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)

    # stack (L, ...) -> (L/2, 2, ...)
    paired = jax.tree_util.tree_map(
        lambda x: x.reshape((L // 2, 2) + x.shape[1:]), params["layers"]
    )

    def step(carry, lp_pair):
        lp0 = jax.tree_util.tree_map(lambda x: x[0], lp_pair)
        lp1 = jax.tree_util.tree_map(lambda x: x[1], lp_pair)
        hh = _decoder_layer_flash(
            cfg, carry, lp0, cos, sin, prefix_lens, valid_lens, cfg.sliding_window
        )
        hh = _decoder_layer_flash(
            cfg, hh, lp1, cos, sin, prefix_lens, valid_lens, None
        )
        return hh, None

    if use_remat:
        step = jax.checkpoint(step, prevent_cse=False)
    h, _ = jax.lax.scan(step, h, paired)
    return rms_norm(params["final_norm"], h, cfg.rms_norm_eps)


def _attention_block_flash_cache(
    lp: Params,
    cfg: Gemma2Config,
    h: Array,  # (B, P, H) pre-norm residual
    norm_w: Array,
    cos: Array,
    sin: Array,
    prefix_lens: Array,
    valid_lens: Array,
    window: Optional[int],
) -> Tuple[Array, Array, Array]:
    """Serving-prefill attention through the Pallas flash kernel; returns
    (attn_out, k, v) with k roped — the (B, P, Nkv, D) cache rows. Handles
    both the plain q/k/v tree and the fused-quantized serving tree
    (qkv + norm fused into the int8 kernel, like _attention_block)."""
    from ..ops.flash_attention import flash_attention

    B, P, H = h.shape
    Nq, Nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "qkv" in lp:  # fused quantized serving tree
        qkv = qnorm_matmul(h, norm_w, lp["qkv"], eps=cfg.rms_norm_eps)
        q, k, v = jnp.split(qkv, [Nq * D, Nq * D + Nkv * D], axis=-1)
        q = q.reshape(B, P, Nq, D)
        k = k.reshape(B, P, Nkv, D)
        v = v.reshape(B, P, Nkv, D)
    else:
        x = rms_norm(norm_w, h, cfg.rms_norm_eps)
        q = qmatmul(x, lp["q"]).reshape(B, P, Nq, D)
        k = qmatmul(x, lp["k"]).reshape(B, P, Nkv, D)
        v = qmatmul(x, lp["v"]).reshape(B, P, Nkv, D)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    out = flash_attention(
        q, k, v, prefix_lens, valid_lens, jnp.zeros_like(prefix_lens),
        cfg.query_pre_attn_scalar**-0.5, cfg.attn_logit_softcap, window, True,
    )
    out = qmatmul(out.reshape(B, P, Nq * D).astype(h.dtype), lp["o"])
    return out, k, v


def prefill_flash(
    params: Params,
    cfg: Gemma2Config,
    inputs_embeds: Array,  # (B, P, H) raw merged embeds (pre-normalizer)
    position_ids: Array,  # (B, P)
    cache_len: int,
    *,
    cache_dtype=jnp.bfloat16,
) -> Tuple[Array, Params]:
    """Serving prefill over an UNPADDED fully-bidirectional prefix through
    the Pallas flash kernel, returning (final_normed_hidden, cache) — the
    flash-path replacement for gemma2.forward(..., cache=, cache_position=0)
    with bidirectional_prefill_mask (generation prefill,
    modeling_gemma2.py:712-720). K/V are collected from the scan and placed
    in cache slots [0, P); slots [P, cache_len) are zero (masked by the
    decode step's length bound)."""
    B, P, H = inputs_embeds.shape
    L = cfg.num_layers
    assert L % 2 == 0, "paired scan expects an even number of layers"
    normalizer = jnp.asarray(cfg.hidden_size**0.5, dtype=inputs_embeds.dtype)
    h = inputs_embeds * normalizer
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)
    prefix_lens = jnp.full((B,), P, jnp.int32)  # fully bidirectional prefix
    valid_lens = prefix_lens

    def one(h, lp, window):
        attn_out, k, v = _attention_block_flash_cache(
            lp["attn"], cfg, h, lp["input_norm"], cos, sin,
            prefix_lens, valid_lens, window,
        )
        h = h + rms_norm(lp["post_attn_norm"], attn_out, cfg.rms_norm_eps)
        mlp_out = _mlp_block(lp["mlp"], h, lp["pre_ffn_norm"], cfg.rms_norm_eps)
        h = h + rms_norm(lp["post_ffn_norm"], mlp_out, cfg.rms_norm_eps)
        return h, k, v

    paired = jax.tree_util.tree_map(
        lambda x: x.reshape((L // 2, 2) + x.shape[1:]), params["layers"]
    )

    def step(carry, lp_pair):
        lp0 = jax.tree_util.tree_map(lambda x: x[0], lp_pair)
        lp1 = jax.tree_util.tree_map(lambda x: x[1], lp_pair)
        hh, k0, v0 = one(carry, lp0, cfg.sliding_window)
        hh, k1, v1 = one(hh, lp1, None)
        return hh, (
            jnp.stack([k0, k1]).astype(cache_dtype),
            jnp.stack([v0, v1]).astype(cache_dtype),
        )

    h, (ks, vs) = jax.lax.scan(step, h, paired)
    # (L/2, 2, B, P, Nkv, D) -> (L, B, S, Nkv, D) cache with zero tail
    pad = [(0, 0), (0, 0), (0, cache_len - P), (0, 0), (0, 0)]
    cache = {
        "k": jnp.pad(ks.reshape((L,) + ks.shape[2:]), pad),
        "v": jnp.pad(vs.reshape((L,) + vs.shape[2:]), pad),
    }
    return rms_norm(params["final_norm"], h, cfg.rms_norm_eps), cache


def forward_ring(
    params: Params,
    cfg: Gemma2Config,
    inputs_embeds: Array,
    position_ids: Array,
    prefix_lens: Array,  # (B,) global bidirectional-prefix boundary (0 = causal)
    valid_lens: Array,  # (B,) global right-pad boundary
    *,
    mesh,
    axis_name: str = "sp",
    batch_axes: tuple = ("data", "fsdp"),
    use_remat: bool = False,
) -> Array:
    """Sequence-parallel full forward: the forward_flash layer structure with
    attention routed through the ring-flash kernel
    (parallel/ring_attention.py) over the ``sp`` mesh axis. Activations are
    constrained to (batch over ``batch_axes``, seq over ``sp``) so the
    QKV/MLP matmuls are sequence-sharded too and only the K/V ring rotations
    communicate. The reference has no SP (SURVEY §5.7); this is the
    documented TPU-native stretch for seq >> 2048."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.ring_attention import ring_flash_attention

    B, T, H = inputs_embeds.shape
    L = cfg.num_layers
    assert L % 2 == 0, "paired scan expects an even number of layers"
    b_ax = tuple(a for a in batch_axes if a in mesh.shape) or None
    act_sharding = NamedSharding(mesh, P(b_ax, axis_name, None))
    constrain = lambda x: jax.lax.with_sharding_constraint(x, act_sharding)

    normalizer = jnp.asarray(cfg.hidden_size**0.5, dtype=inputs_embeds.dtype)
    h = constrain(inputs_embeds * normalizer)
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)

    def attn(x, lp, window):
        Nq, Nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        q = apply_rope(qmatmul(x, lp["q"]).reshape(B, T, Nq, D), cos, sin)
        k = apply_rope(qmatmul(x, lp["k"]).reshape(B, T, Nkv, D), cos, sin)
        v = qmatmul(x, lp["v"]).reshape(B, T, Nkv, D)
        out = ring_flash_attention(
            q, k, v, prefix_lens.astype(jnp.int32), valid_lens.astype(jnp.int32),
            mesh=mesh, axis_name=axis_name, scale=cfg.query_pre_attn_scalar**-0.5,
            logit_softcap=cfg.attn_logit_softcap, window=window, causal=True,
            batch_axes=batch_axes,
        )
        return qmatmul(out.reshape(B, T, Nq * D), lp["o"])

    def layer(h, lp, window):
        x = rms_norm(lp["input_norm"], h, cfg.rms_norm_eps)
        h = h + rms_norm(lp["post_attn_norm"], attn(x, lp["attn"], window), cfg.rms_norm_eps)
        mlp_out = _mlp_block(lp["mlp"], h, lp["pre_ffn_norm"], cfg.rms_norm_eps)
        return constrain(h + rms_norm(lp["post_ffn_norm"], mlp_out, cfg.rms_norm_eps))

    paired = jax.tree_util.tree_map(
        lambda x: x.reshape((L // 2, 2) + x.shape[1:]), params["layers"]
    )

    def step(carry, lp_pair):
        lp0 = jax.tree_util.tree_map(lambda x: x[0], lp_pair)
        lp1 = jax.tree_util.tree_map(lambda x: x[1], lp_pair)
        hh = layer(carry, lp0, cfg.sliding_window)
        hh = layer(hh, lp1, None)
        return hh, None

    if use_remat:
        step = jax.checkpoint(step, prevent_cse=False)
    h, _ = jax.lax.scan(step, h, paired)
    return rms_norm(params["final_norm"], h, cfg.rms_norm_eps)


def forward_pipeline(
    params: Params,
    cfg: Gemma2Config,
    inputs_embeds: Array,
    position_ids: Array,
    prefix_lens: Array,  # (B,) bidirectional-prefix boundary (0 = causal)
    valid_lens: Array,  # (B,) right-pad boundary
    *,
    mesh,
    axis_name: str = "pipe",
    n_microbatches: int = 0,  # 0 -> one microbatch per stage
    batch_axes: tuple = ("data", "fsdp"),
    use_remat: bool = False,
) -> Array:
    """Pipeline-parallel full forward: the decoder stack split into
    ``mesh.shape["pipe"]`` depth-wise stages with GPipe microbatching
    (parallel/pipeline.py). Per-stage math is exactly forward_flash's layer
    pairs, so outputs match the unsharded flash path. The reference has no
    PP (SURVEY §2.2: not required for parity) — beyond-parity scaling for
    models whose depth exceeds one chip/slice.

    Stages hold whole window/global layer *pairs* (alternation preserved)
    but need not be equal: the pair count is balanced across stages (e.g.
    Gemma2-2B's 26 layers = 13 pairs split 7+6 at S=2, 4+3+3+3 at S=4).
    Short stages scan the same padded pair count with inactive pairs
    masked to identity, so the stacked (S, maxP, 2, ...) parameter layout
    stays uniform for the pipe-axis sharding."""
    import numpy as np

    from ..parallel.pipeline import pipeline_apply

    B, T, H = inputs_embeds.shape
    L = cfg.num_layers
    S = mesh.shape[axis_name]
    assert L % 2 == 0, f"{L} layers do not form window/global pairs"
    n_pairs = L // 2
    assert S <= n_pairs, f"{S} stages exceed the {n_pairs} layer pairs"
    if n_microbatches:
        m = n_microbatches
    else:  # largest divisor of B that is <= S (GPipe default m = S)
        m = max(d for d in range(1, min(S, B) + 1) if B % d == 0)
    normalizer = jnp.asarray(cfg.hidden_size**0.5, dtype=inputs_embeds.dtype)
    h = inputs_embeds * normalizer

    # balanced pair partition; every stage padded to maxP pairs (padded
    # slots duplicate a real pair's params — harmless, masked to identity)
    base, rem = divmod(n_pairs, S)
    counts = np.asarray([base + (s < rem) for s in range(S)], np.int32)
    maxP = int(counts.max())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    idx = np.minimum(
        starts[:, None] + np.arange(maxP)[None], n_pairs - 1
    )  # (S, maxP)
    paired = jax.tree_util.tree_map(
        lambda x: x.reshape((n_pairs, 2) + x.shape[1:]), params["layers"]
    )
    staged = {
        "layers": jax.tree_util.tree_map(lambda x: x[idx], paired),
        "n_pairs": jnp.asarray(counts),
    }

    def stage_fn(sp, x, aux):
        cos, sin = rope_cos_sin(aux["position_ids"], cfg.head_dim, cfg.rope_theta)

        def step(carry, pair_i):
            lp_pair, i = pair_i
            lp0 = jax.tree_util.tree_map(lambda w: w[0], lp_pair)
            lp1 = jax.tree_util.tree_map(lambda w: w[1], lp_pair)
            hh = _decoder_layer_flash(
                cfg, carry, lp0, cos, sin, aux["prefix_lens"],
                aux["valid_lens"], cfg.sliding_window,
            )
            hh = _decoder_layer_flash(
                cfg, hh, lp1, cos, sin, aux["prefix_lens"],
                aux["valid_lens"], None,
            )
            return jnp.where(i < sp["n_pairs"], hh, carry), None

        if use_remat:
            step = jax.checkpoint(step, prevent_cse=False)
        y, _ = jax.lax.scan(step, x, (sp["layers"], jnp.arange(maxP)))
        return y

    aux = {
        "position_ids": position_ids,
        "prefix_lens": prefix_lens.astype(jnp.int32),
        "valid_lens": valid_lens.astype(jnp.int32),
    }
    out = pipeline_apply(
        stage_fn, staged, h, aux,
        mesh=mesh, n_microbatches=m, axis_name=axis_name,
        batch_axes=batch_axes,
    )
    return rms_norm(params["final_norm"], out, cfg.rms_norm_eps)


def forward(
    params: Params,
    cfg: Gemma2Config,
    inputs_embeds: Array,  # (B, T, H) — *unscaled*; scaling happens here
    position_ids: Array,  # (B, T) 1-indexed RoPE positions
    base_mask: Array,  # (B, 1, T, S) bool
    *,
    cache: Optional[Params] = None,
    cache_position: Optional[Array] = None,  # scalar: first cache slot to write
    window_positions: Optional[Tuple[Array, Array]] = None,
    use_remat: bool = False,
) -> Tuple[Array, Optional[Params]]:
    """Runs the decoder stack; returns (final_norm(h), new_cache).

    When cache is None, attention spans the input itself (S == T).
    cache_position indexes cache *slots* (0-based); RoPE uses position_ids
    (the VLA passes cache slot + 1, PaliGemma convention).
    window_positions=(q_pos (B, T), k_pos (B, S)) overrides the slot-based
    positions used by the sliding-window mask — needed when slots != token
    positions (right-padded serving batches)."""
    B, T, H = inputs_embeds.shape

    # sqrt(hidden) embedding scale, computed in the activation dtype so the
    # bf16 rounding matches the reference (modeling_gemma2.py:739-742)
    normalizer = jnp.asarray(cfg.hidden_size**0.5, dtype=inputs_embeds.dtype)
    h = inputs_embeds * normalizer

    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)

    if cache is not None:
        S = cache["k"].shape[2]
        k_positions = jnp.arange(S)
    else:
        S = T
        k_positions = jnp.arange(T)  # absolute slots of the input block
    q_positions = (
        jnp.arange(T)[None, :] + (cache_position if cache_position is not None else 0)
    )
    q_positions = jnp.broadcast_to(q_positions, (B, T))
    if window_positions is not None:
        q_positions, k_positions = window_positions
    mask_global, mask_sliding = make_masks(cfg, base_mask, q_positions, k_positions)

    flags = is_sliding_flags(cfg)

    def step(carry, xs):
        lp, ck, cv, is_sliding = xs
        cache_kv = (ck, cv) if cache is not None else None
        hh, new_cache = _decoder_layer(
            cfg, carry, lp, is_sliding, cos, sin, mask_global, mask_sliding,
            cache_kv, cache_position,
        )
        ys = new_cache if new_cache is not None else (jnp.zeros((), h.dtype),) * 2
        return hh, ys

    if use_remat:
        step = jax.checkpoint(step, prevent_cse=False)

    if cache is not None:
        xs = (params["layers"], cache["k"], cache["v"], flags)
    else:
        dummy = jnp.zeros((cfg.num_layers,), dtype=h.dtype)
        xs = (params["layers"], dummy, dummy, flags)

    h, ys = jax.lax.scan(step, h, xs)
    new_cache = {"k": ys[0], "v": ys[1]} if cache is not None else None

    h = rms_norm(params["final_norm"], h, cfg.rms_norm_eps)
    return h, new_cache


def compute_logits(
    params: Params,
    cfg: Gemma2Config,
    hidden: Array,  # (B, T, H) final-normed
    dtype=jnp.float32,
) -> Array:
    """lm_head + final logit softcap. fp32 MXU accumulation."""
    head = params["lm_head"] if "lm_head" in params else params["embed"].T
    if isinstance(head, dict):  # quantized OR LoRA-factored ('linear+emb+h')
        logits = qmatmul(hidden, head).astype(dtype)
    else:
        logits = jnp.einsum(
            "bth,hv->btv", hidden, head.astype(hidden.dtype),
            preferred_element_type=dtype,
        )
    return softcap(logits, cfg.final_logit_softcap)


def causal_base_mask(attention_mask: Array) -> Array:
    """(B, T) padding mask -> (B, 1, T, T) causal bool mask."""
    B, T = attention_mask.shape
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    pad = attention_mask.astype(bool)
    return causal[None, None] & pad[:, None, None, :]
