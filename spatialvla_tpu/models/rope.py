"""Rotary position embedding, fp32 trig (reference: modeling_gemma2.py:95-154
forces float32 cos/sin since bf16 loses precision on long contexts)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rope_cos_sin(position_ids: Array, head_dim: int, base: float = 10000.0):
    """position_ids: (B, T) int -> cos, sin: (B, T, head_dim) fp32.

    Layout matches the half-rotation convention: freqs are tiled twice along
    the last axis and rotate_half swaps/negates halves."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # (D/2,)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, :]  # (B,T,D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B,T,D)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: Array) -> Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x: (B, T, N, D); cos/sin: (B, T, D) fp32. Returns x's dtype."""
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + _rotate_half(x) * s
