"""SigLIP ViT vision encoder (so400m-14/224 topology), TPU-native.

Reference behavior: the HF SiglipVisionModel used as the VLA's vision tower
(modeling_spatialvla.py:166,310) with vision_use_head=False — conv patch
embed + learned position embed, pre-LN transformer blocks with bias'd QKV
and gelu-tanh MLP, final post-layernorm, no CLS token, no pooling head.

TPU design: the patch conv is expressed as an unfold + matmul-friendly
conv_general_dilated (XLA lowers it onto the MXU); encoder layers are
stacked and scanned like the Gemma2 decoder; attention runs through the
shared multi_head_attention (fp32 softmax) or the Pallas kernel.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import SiglipVisionConfig
from ..ops.quant import qmatmul
from .attention import multi_head_attention
from .layers import gelu_tanh, layer_norm, layer_norm_init, normal_init

Array = jax.Array
Params = Dict[str, Any]


def init_params(key: Array, cfg: SiglipVisionConfig, dtype=jnp.float32) -> Params:
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    P = cfg.patch_size
    ks = jax.random.split(key, 12)

    def wb(k, din, dout, stacked=True):
        shape = (L, din, dout) if stacked else (din, dout)
        bshape = (L, dout) if stacked else (dout,)
        return {
            "w": normal_init(k, shape, dtype=dtype),
            "b": jnp.zeros(bshape, dtype=dtype),
        }

    def ln_stack():
        return {
            "scale": jnp.ones((L, H), dtype=dtype),
            "bias": jnp.zeros((L, H), dtype=dtype),
        }

    return {
        "patch_embed": {
            "w": normal_init(ks[0], (P, P, 3, H), dtype=dtype),
            "b": jnp.zeros((H,), dtype=dtype),
        },
        "pos_embed": normal_init(ks[1], (cfg.num_patches, H), dtype=dtype),
        "layers": {
            "attn": {
                "q": wb(ks[2], H, H),
                "k": wb(ks[3], H, H),
                "v": wb(ks[4], H, H),
                "o": wb(ks[5], H, H),
            },
            "ln1": ln_stack(),
            "ln2": ln_stack(),
            "mlp": {"fc1": wb(ks[6], H, I), "fc2": wb(ks[7], I, H)},
        },
        "post_ln": layer_norm_init(H, dtype=dtype),
    }


def _patchify(params: Params, cfg: SiglipVisionConfig, pixel_values: Array) -> Array:
    """(B, H, W, 3) NHWC image -> (B, N, hidden) patch embeddings.

    Non-overlapping patch conv == reshape to patches + single matmul, which
    is the MXU-friendliest lowering."""
    B, Himg, Wimg, C = pixel_values.shape
    P = cfg.patch_size
    hp, wp = Himg // P, Wimg // P
    x = pixel_values.reshape(B, hp, P, wp, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp * wp, P * P * C)
    w = params["patch_embed"]["w"].astype(x.dtype)
    # conv weight (P, P, 3, H) -> unfold layout (P*P*3, H): patch pixels are
    # flattened (row, col, channel) to match the reshape above
    w = w.reshape(P * P * C, -1)
    return x @ w + params["patch_embed"]["b"].astype(x.dtype)


def _linear(x: Array, p: Params) -> Array:
    """x @ w + b where w may be a plain array or an int8/int4 QuantW dict
    (ops/quant.py) — the serving path quantizes the encoder matmuls."""
    y = qmatmul(x, p["w"])
    return y + p["b"].astype(y.dtype)


def _encoder_layer(cfg: SiglipVisionConfig, h: Array, lp: Params) -> Array:
    B, N, H = h.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    x = layer_norm(lp["ln1"], h, cfg.layer_norm_eps)
    q = _linear(x, lp["attn"]["q"]).reshape(B, N, nh, hd)
    k = _linear(x, lp["attn"]["k"]).reshape(B, N, nh, hd)
    v = _linear(x, lp["attn"]["v"]).reshape(B, N, nh, hd)
    attn = multi_head_attention(q, k, v, None, scale=hd**-0.5)
    attn = attn.reshape(B, N, H)
    h = h + _linear(attn, lp["attn"]["o"])

    x2 = layer_norm(lp["ln2"], h, cfg.layer_norm_eps)
    y = gelu_tanh(_linear(x2, lp["mlp"]["fc1"]))
    return h + _linear(y, lp["mlp"]["fc2"])


def forward(
    params: Params,
    cfg: SiglipVisionConfig,
    pixel_values: Array,  # (B, H, W, 3) NHWC, already SigLIP-normalized
    *,
    use_remat: bool = False,
) -> Array:
    """Returns last_hidden_state (B, N, hidden)."""
    h = _patchify(params, cfg, pixel_values)
    h = h + params["pos_embed"].astype(h.dtype)[None]

    def step(carry, lp):
        return _encoder_layer(cfg, carry, lp), None

    if use_remat:
        step = jax.checkpoint(step, prevent_cse=False)
    h, _ = jax.lax.scan(step, h, params["layers"])
    return layer_norm(params["post_ln"], h, cfg.layer_norm_eps)
