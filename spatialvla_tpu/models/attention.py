"""Multi-head attention with GQA, tanh logit soft-capping, and sliding
windows — XLA path (einsum + fp32 softmax). The Pallas fused kernel in
spatialvla_tpu.ops.flash_attention implements the same contract for the hot
path; this module is the reference semantics and the fallback.

Mask convention throughout the framework: boolean (B, 1, Tq, Tk),
True = may attend. Sliding windows are applied from absolute positions, so
the same code serves training (full sequence) and decode (static KV cache):
allowed iff q_pos - k_pos < window (only *past* tokens beyond the window are
masked, matching modeling_gemma2.py:461-473 — a bidirectional prefix is
unaffected by the window in the future direction).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .layers import softcap

Array = jax.Array

NEG_INF = -1e30  # large-negative for fp32 softmax masking


def sliding_window_mask(
    q_positions: Array, k_positions: Array, window: int
) -> Array:
    """(B, Tq), (Tk,) -> (B, 1, Tq, Tk) bool; True where within window."""
    delta = q_positions[:, :, None] - k_positions[None, None, :]
    return (delta < window)[:, None, :, :]


def causal_mask(q_positions: Array, k_positions: Array) -> Array:
    """True where k_pos <= q_pos."""
    return (k_positions[None, None, :] <= q_positions[:, :, None])[:, None]


def multi_head_attention(
    q: Array,  # (B, Tq, Nq, D)
    k: Array,  # (B, Tk, Nkv, D)
    v: Array,  # (B, Tk, Nkv, D)
    mask: Optional[Array],  # (B, 1, Tq, Tk) bool, True = attend
    *,
    scale: float,
    logit_softcap: Optional[float] = None,
) -> Array:
    """Grouped-query attention; returns (B, Tq, Nq, D) in q's dtype.

    Logits accumulate in fp32 on the MXU (preferred_element_type), softmax
    in fp32 (parity with the reference's fp32 softmax,
    modeling_gemma2.py:188)."""
    B, Tq, Nq, D = q.shape
    Nkv = k.shape[2]
    g = Nq // Nkv
    qg = q.reshape(B, Tq, Nkv, g, D)
    # (B, Nkv, g, Tq, Tk)
    logits = jnp.einsum(
        "btngd,bsnd->bngts", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    logits = softcap(logits, logit_softcap)
    if mask is not None:
        logits = jnp.where(mask[:, :, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bngts,bsnd->btngd", probs, v)
    return out.reshape(B, Tq, Nq, D)
