"""Shared functional building blocks.

Modules are (init, apply) pairs over plain pytrees of jnp arrays — no
framework classes. Linear weights are stored as (in_features, out_features)
so application is ``x @ W + b``, which XLA maps directly onto the MXU.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def normal_init(key, shape, std=0.02, dtype=jnp.float32):
    return (std * jax.random.normal(key, shape)).astype(dtype)


def xavier_uniform_init(key, shape, gain=1.0, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    a = gain * (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, minval=-a, maxval=a).astype(dtype)


def linear_init(key, in_dim, out_dim, bias=True, std=0.02, dtype=jnp.float32):
    p = {"w": normal_init(key, (in_dim, out_dim), std=std, dtype=dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype=dtype)
    return p


def linear(p, x: Array) -> Array:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def rms_norm(weight: Array, x: Array, eps: float = 1e-6, *, plus_one: bool = True) -> Array:
    """Gemma-style RMSNorm: fp32 accumulation, learnable scale stored as an
    offset from 1 (reference: modeling_gemma2.py:60-77)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    scale = (1.0 + w) if plus_one else w
    return (xf * scale).astype(dtype)


def layer_norm(p, x: Array, eps: float = 1e-6) -> Array:
    """Standard LayerNorm with fp32 accumulation."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype=dtype), "bias": jnp.zeros((dim,), dtype=dtype)}


def gelu_tanh(x: Array) -> Array:
    """gelu_pytorch_tanh activation (Gemma2 MLP / SigLIP MLP)."""
    return jax.nn.gelu(x, approximate=True)


def softcap(x: Array, cap: Optional[float]) -> Array:
    """tanh logit soft-capping: cap * tanh(x / cap)."""
    if cap is None:
        return x
    return jnp.tanh(x / cap) * cap


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
