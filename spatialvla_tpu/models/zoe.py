"""ZoeDepth metric-depth estimator in functional JAX (NHWC, TPU-native).

Reference behavior: the frozen HF ZoeDepthForDepthEstimation used as the
VLA's depth branch (modeling_spatialvla.py:34,176,313-323) — BEiT-large
backbone (per-layer relative position bias + layer scale), DPT-style
reassemble/fusion neck, relative-depth head, and the metric-bins module
(patch-transformer domain classifier over NYU/KITTI experts, softplus seed
bin regressor, unnormed attractor stack, conditional log-binomial softmax).
Bug-compatible quirks preserved: inv_attractor uses its default
alpha=300/gamma=2 rather than the config values, and the expert attractor
layers keep the default 16 attractor points while n_bins carries the
per-stage attractor count (HF modeling_zoedepth.py notes the upstream
provenance of both).

Everything is channels-last; interpolations use the matmul resampler in
resize.py to reproduce torch align_corners semantics exactly.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ZoeDepthConfig
from ..ops.quant import qmatmul
from .layers import layer_norm, layer_norm_init, normal_init
from .resize import reflect_pad2d, resize2d

Array = jax.Array
Params = Dict[str, Any]

ZOE_MEAN = 0.5
ZOE_STD = 0.5
REASSEMBLE_FACTORS = (4, 2, 1, 0.5)
ATTRACTOR_ALPHA = 300.0  # inv_attractor defaults (bug-compatible)
ATTRACTOR_GAMMA = 2


# ---------------------------------------------------------------------------
# conv helpers (NHWC / HWIO)
# ---------------------------------------------------------------------------

def conv2d(p, x: Array, *, stride: int = 1, padding: int = 0) -> Array:
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)], dimension_numbers=dn,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose_block(p, x: Array, factor: int) -> Array:
    """Non-overlapping k=s transpose conv: per-pixel linear map to an fxf
    block. weight layout (f, f, out, in)."""
    B, H, W, C = x.shape
    w = p["w"].astype(x.dtype)  # (f, f, O, I)
    y = jnp.einsum("bhwc,ijoc->bhwijo", x, w)
    O = w.shape[2]
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * factor, W * factor, O)
    return y + p["b"].astype(x.dtype)


def linear(p, x: Array) -> Array:
    # w may be int8/int4-quantized for serving (ops/quant.py
    # quantize_vision_params); qmatmul passes plain arrays through as x @ w
    y = qmatmul(x, p["w"])
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def softplus(x: Array) -> Array:
    return jax.nn.softplus(x)


# ---------------------------------------------------------------------------
# BEiT backbone
# ---------------------------------------------------------------------------

def beit_relative_position_index(window: int) -> np.ndarray:
    """(N+1, N+1) int index into the ((2w-1)^2 + 3)-row bias table; the
    three tail rows serve cls->token, token->cls, cls->cls."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    num_rel = (2 * window - 1) ** 2 + 3
    N = window * window
    idx = np.zeros((N + 1, N + 1), dtype=np.int64)
    idx[1:, 1:] = rel.sum(-1)
    # tail-row assignment per HF modeling_beit.generate_relative_position_index:
    # cls->token = num_rel-3, token->cls = num_rel-2, cls->cls = num_rel-1
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


def init_backbone(key, cfg: ZoeDepthConfig, dtype=jnp.float32) -> Params:
    L, C, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    P = cfg.patch_size
    window = cfg.image_size // P
    num_rel = (2 * window - 1) ** 2 + 3
    ks = jax.random.split(key, 10)

    def wb(k, din, dout, stacked=True, bias=True):
        shape = (L, din, dout) if stacked else (din, dout)
        p = {"w": normal_init(k, shape, dtype=dtype)}
        if bias:
            p["b"] = jnp.zeros((L, dout) if stacked else (dout,), dtype=dtype)
        return p

    return {
        "patch_embed": {
            "w": normal_init(ks[0], (P, P, 3, C), dtype=dtype),
            "b": jnp.zeros((C,), dtype=dtype),
        },
        "cls_token": jnp.zeros((1, 1, C), dtype=dtype),
        "layers": {
            "ln1": {"scale": jnp.ones((L, C), dtype), "bias": jnp.zeros((L, C), dtype)},
            "ln2": {"scale": jnp.ones((L, C), dtype), "bias": jnp.zeros((L, C), dtype)},
            "q": wb(ks[1], C, C),
            "k": wb(ks[2], C, C, bias=False),
            "v": wb(ks[3], C, C),
            "proj": wb(ks[4], C, C),
            "rel_pos_table": jnp.zeros((L, num_rel, cfg.num_heads), dtype=dtype),
            "lambda1": jnp.full((L, C), 0.1, dtype=dtype),
            "lambda2": jnp.full((L, C), 0.1, dtype=dtype),
            "fc1": wb(ks[5], C, I),
            "fc2": wb(ks[6], I, C),
        },
    }


def _rel_table_for_window(table: Array, window_src: int, window_dst: int) -> Array:
    """(num_rel_src, nh) bias table -> (num_rel_dst, nh) for a different
    patch-grid window: bicubic-resize the (2w-1, 2w-1) relative-offset grid
    (HF BeitSelfAttention.interpolate_pos_encoding semantics); the 3 tail
    rows (cls->token / token->cls / cls->cls) pass through unchanged."""
    if window_dst == window_src:
        return table
    side_s, side_d = 2 * window_src - 1, 2 * window_dst - 1
    grid = table[: side_s * side_s].reshape(side_s, side_s, -1)
    grid = resize2d(
        grid[None].astype(jnp.float32), (side_d, side_d),
        method="bicubic", align_corners=True,
    )[0].astype(table.dtype)
    return jnp.concatenate(
        [grid.reshape(side_d * side_d, -1), table[side_s * side_s:]], axis=0
    )


def precompute_rel_bias(
    zoe_params: Params, cfg: ZoeDepthConfig, dtype=jnp.bfloat16,
    image_size: Optional[int] = None,
) -> Params:
    """Serving-time transform: materialize the (static) relative-position
    bias (L, nh, N+1, N+1) once, replacing the per-forward 5M-row gather
    from the (num_rel, nh) table — the gather's tiny-row DMA dominates the
    backbone otherwise. Costs ~(L * nh * 578^2) of HBM (bf16 ~256 MB for
    beit-large/384).

    image_size: build the bias for a REDUCED internal zoe resolution (the
    opt-in fast-depth serving mode; predict_depth(image_size=...) must
    match). The bias grid is bicubically interpolated to the smaller
    window (_rel_table_for_window)."""
    window = (image_size or cfg.image_size) // cfg.patch_size
    window_src = cfg.image_size // cfg.patch_size
    rel_idx = jnp.asarray(beit_relative_position_index(window))
    layers = dict(zoe_params["backbone"]["layers"])
    table = layers.pop("rel_pos_table")  # (L, num_rel, nh)
    table = jax.vmap(
        lambda t: _rel_table_for_window(t, window_src, window)
    )(table)
    bias = table[:, rel_idx]  # (L, N+1, N+1, nh)
    layers["rel_pos_bias"] = jnp.transpose(bias, (0, 3, 1, 2)).astype(dtype)
    backbone = dict(zoe_params["backbone"])
    backbone["layers"] = layers
    out = dict(zoe_params)
    out["backbone"] = backbone
    return out


def backbone_forward(
    params: Params, cfg: ZoeDepthConfig, pixel_values: Array,
    out_indices: Tuple[int, ...],
) -> List[Array]:
    """pixel_values (B, H, W, 3) normalized -> list of (B, N+1, C) token
    sequences after the tapped layers (1-based indices, matching HF
    BeitBackbone out_indices semantics)."""
    B = pixel_values.shape[0]
    C = cfg.hidden_size
    nh = cfg.num_heads
    hd = C // nh
    # patch-grid window from the ACTUAL input (reduced-resolution serving
    # mode runs the backbone below cfg.image_size); the bias table is
    # interpolated when the windows differ
    window = pixel_values.shape[1] // cfg.patch_size
    window_src = cfg.image_size // cfg.patch_size

    x = conv2d(params["patch_embed"], pixel_values, stride=cfg.patch_size)
    x = x.reshape(B, -1, C)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, C))
    h = jnp.concatenate([cls, x], axis=1)  # (B, N+1, C)

    rel_idx = jnp.asarray(beit_relative_position_index(window))

    def layer(h, lp):
        x = layer_norm(lp["ln1"], h, cfg.layer_norm_eps)
        q = linear(lp["q"], x).reshape(B, -1, nh, hd)
        k = linear(lp["k"], x).reshape(B, -1, nh, hd)  # no bias
        v = linear(lp["v"], x).reshape(B, -1, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) * (hd**-0.5)
        if "rel_pos_bias" in lp:  # precomputed (nh, N+1, N+1)
            logits = logits + lp["rel_pos_bias"].astype(jnp.float32)[None]
        else:
            table = _rel_table_for_window(
                lp["rel_pos_table"], window_src, window
            )
            bias = table.astype(jnp.float32)[rel_idx]  # (N+1, N+1, nh)
            logits = logits + bias.transpose(2, 0, 1)[None]
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(B, -1, C)
        attn = linear(lp["proj"], attn)
        h = h + lp["lambda1"].astype(h.dtype) * attn
        x2 = layer_norm(lp["ln2"], h, cfg.layer_norm_eps)
        y = jax.nn.gelu(linear(lp["fc1"], x2), approximate=False)
        y = linear(lp["fc2"], y)
        h = h + lp["lambda2"].astype(h.dtype) * y
        return h, h

    _, all_h = jax.lax.scan(layer, h, params["layers"])
    return [all_h[i - 1] for i in out_indices]


# ---------------------------------------------------------------------------
# neck
# ---------------------------------------------------------------------------

def init_neck(key, cfg: ZoeDepthConfig, dtype=jnp.float32) -> Params:
    C = cfg.hidden_size
    F = cfg.fusion_hidden_size
    ks = jax.random.split(key, 64)
    ki = iter(ks)

    def conv_p(k, kh, kw, cin, cout, bias=True):
        p = {"w": normal_init(k, (kh, kw, cin, cout), dtype=dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype=dtype)
        return p

    reassemble = []
    for size, factor in zip(cfg.neck_hidden_sizes, REASSEMBLE_FACTORS):
        entry = {
            "readout": {
                "w": normal_init(next(ki), (2 * C, C), dtype=dtype),
                "b": jnp.zeros((C,), dtype=dtype),
            },
            "projection": conv_p(next(ki), 1, 1, C, size),
        }
        if factor > 1:
            entry["resize"] = {
                "w": normal_init(next(ki), (int(factor), int(factor), size, size), dtype=dtype),
                "b": jnp.zeros((size,), dtype=dtype),
            }
        elif factor < 1:
            entry["resize"] = conv_p(next(ki), 3, 3, size, size)
        reassemble.append(entry)

    convs = [
        conv_p(next(ki), 3, 3, size, F, bias=False) for size in cfg.neck_hidden_sizes
    ]

    def residual_unit():
        return {
            "conv1": conv_p(next(ki), 3, 3, F, F),
            "conv2": conv_p(next(ki), 3, 3, F, F),
        }

    fusion = [
        {
            "projection": conv_p(next(ki), 1, 1, F, F),
            "res1": residual_unit(),
            "res2": residual_unit(),
        }
        for _ in cfg.neck_hidden_sizes
    ]
    return {"reassemble": reassemble, "convs": convs, "fusion": fusion}


def _residual_unit(p, x: Array) -> Array:
    y = jax.nn.relu(x)
    y = conv2d(p["conv1"], y, padding=1)
    y = jax.nn.relu(y)
    y = conv2d(p["conv2"], y, padding=1)
    return x + y


def _fusion_layer(p, hidden: Array, residual: Optional[Array]) -> Array:
    if residual is not None:
        if hidden.shape[1:3] != residual.shape[1:3]:
            residual = resize2d(residual, hidden.shape[1:3], align_corners=False)
        hidden = hidden + _residual_unit(p["res1"], residual)
    hidden = _residual_unit(p["res2"], hidden)
    hidden = resize2d(
        hidden, (hidden.shape[1] * 2, hidden.shape[2] * 2), align_corners=True
    )
    return conv2d(p["projection"], hidden)


def neck_forward(
    params: Params, cfg: ZoeDepthConfig, hidden_states: List[Array],
    patch_h: int, patch_w: int,
) -> Tuple[List[Array], Array]:
    """Token sequences -> (fused pyramid [coarsest-first], bottleneck)."""
    feats = []
    for hs, entry, factor in zip(hidden_states, params["reassemble"], REASSEMBLE_FACTORS):
        cls, tokens = hs[:, 0], hs[:, 1:]
        B, N, C = tokens.shape
        # readout: concat cls to every token, project back (readout_type
        # 'project')
        readout = jnp.broadcast_to(cls[:, None], tokens.shape)
        x = jnp.concatenate([tokens, readout], axis=-1)
        x = jax.nn.gelu(linear(entry["readout"], x), approximate=False)
        x = x.reshape(B, patch_h, patch_w, C)
        x = conv2d(entry["projection"], x)
        if factor > 1:
            x = conv_transpose_block(entry["resize"], x, int(factor))
        elif factor < 1:
            x = conv2d(entry["resize"], x, stride=2, padding=1)
        feats.append(x)

    feats = [conv2d(p, f, padding=1) for p, f in zip(params["convs"], feats)]

    fused = []
    state = None
    for f, p in zip(feats[::-1], params["fusion"]):
        state = _fusion_layer(p, f, None) if state is None else _fusion_layer(p, state, f)
        fused.append(state)
    return fused, feats[-1]


# ---------------------------------------------------------------------------
# relative depth head
# ---------------------------------------------------------------------------

def init_relative_head(key, cfg: ZoeDepthConfig, dtype=jnp.float32) -> Params:
    F = cfg.fusion_hidden_size
    ks = jax.random.split(key, 3)
    return {
        "conv1": {"w": normal_init(ks[0], (3, 3, F, F // 2), dtype=dtype), "b": jnp.zeros((F // 2,), dtype)},
        "conv2": {"w": normal_init(ks[1], (3, 3, F // 2, cfg.num_relative_features), dtype=dtype), "b": jnp.zeros((cfg.num_relative_features,), dtype)},
        "conv3": {"w": normal_init(ks[2], (1, 1, cfg.num_relative_features, 1), dtype=dtype), "b": jnp.zeros((1,), dtype)},
    }


def relative_head_forward(params: Params, fused: List[Array]) -> Tuple[Array, Array]:
    x = fused[-1]  # finest
    x = conv2d(params["conv1"], x, padding=1)
    x = resize2d(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
    x = conv2d(params["conv2"], x, padding=1)
    x = jax.nn.relu(x)
    features = x
    x = conv2d(params["conv3"], x)
    x = jax.nn.relu(x)
    return x[..., 0], features  # (B, H, W), (B, H, W, 32)


# ---------------------------------------------------------------------------
# metric bins module
# ---------------------------------------------------------------------------

def init_patch_transformer(key, cfg: ZoeDepthConfig, dtype=jnp.float32) -> Params:
    H = cfg.patch_transformer_hidden_size
    I = cfg.patch_transformer_intermediate_size
    L = cfg.num_patch_transformer_layers
    ks = jax.random.split(key, 8)

    def wb(k, din, dout):
        return {"w": normal_init(k, (L, din, dout), dtype=dtype), "b": jnp.zeros((L, dout), dtype)}

    return {
        "embed_conv": {"w": normal_init(ks[0], (1, 1, cfg.bottleneck_features, H), dtype=dtype), "b": jnp.zeros((H,), dtype)},
        "layers": {
            "q": wb(ks[1], H, H), "k": wb(ks[2], H, H), "v": wb(ks[3], H, H),
            "out": wb(ks[4], H, H),
            "fc1": wb(ks[5], H, I), "fc2": wb(ks[6], I, H),
            "ln1": {"scale": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
            "ln2": {"scale": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
        },
    }


def _positional_encoding_1d(seq_len: int, dim: int) -> jnp.ndarray:
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    index = jnp.arange(0, dim, 2, dtype=jnp.float32)[None, :]
    div = jnp.exp(index * (-jnp.log(10000.0) / dim))
    pe = position * div  # (S, dim/2)
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=1)  # (S, dim)


def patch_transformer_forward(params: Params, cfg: ZoeDepthConfig, x: Array) -> Array:
    """x (B, H, W, bottleneck) -> cls embedding (B, hidden)."""
    nh = cfg.patch_transformer_num_attention_heads
    emb = conv2d(params["embed_conv"], x)  # (B, H, W, C)
    B, H, W, C = emb.shape
    tokens = emb.reshape(B, H * W, C)
    tokens = jnp.concatenate([jnp.zeros((B, 1, C), tokens.dtype), tokens], axis=1)
    S = tokens.shape[1]
    tokens = tokens + _positional_encoding_1d(S, C).astype(tokens.dtype)[None]

    hd = C // nh

    def layer(h, lp):
        q = linear(lp["q"], h).reshape(B, S, nh, hd)
        k = linear(lp["k"], h).reshape(B, S, nh, hd)
        v = linear(lp["v"], h).reshape(B, S, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) * (hd**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        attn = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(B, S, C)
        attn = linear(lp["out"], attn)
        # torch nn.LayerNorm default eps (HF ZoeDepthTransformerEncoderLayer
        # uses bare nn.LayerNorm), NOT this repo's 1e-6 default
        h = layer_norm(lp["ln1"], h + attn, 1e-5)
        y = jax.nn.relu(linear(lp["fc1"], h))
        y = linear(lp["fc2"], y)
        h = layer_norm(lp["ln2"], h + y, 1e-5)
        return h, None

    tokens, _ = jax.lax.scan(layer, tokens, params["layers"])
    return tokens[:, 0]


def init_metric_head(key, cfg: ZoeDepthConfig, dtype=jnp.float32) -> Params:
    Bf = cfg.bottleneck_features
    E = cfg.bin_embedding_dim
    F = cfg.fusion_hidden_size
    ks = jax.random.split(key, 64)
    ki = iter(ks)

    def conv1x1(cin, cout):
        return {"w": normal_init(next(ki), (1, 1, cin, cout), dtype=dtype), "b": jnp.zeros((cout,), dtype)}

    def projector(cin, cout, mlp):
        return {"conv1": conv1x1(cin, mlp), "conv2": conv1x1(mlp, cout)}

    def seed_regressor(n_bins, mlp):
        return {"conv1": conv1x1(Bf, mlp), "conv2": conv1x1(mlp, n_bins)}

    def attractor():
        return {"conv1": conv1x1(E, E), "conv2": conv1x1(E, 16)}  # 16 = HF default

    def log_binomial(last_in, factor):
        bott = (last_in + E) // factor
        return {"conv1": conv1x1(last_in + E, bott), "conv2": conv1x1(bott, 4)}

    def mlp_classifier(h):
        return {
            "fc1": {"w": normal_init(next(ki), (h, h), dtype=dtype), "b": jnp.zeros((h,), dtype)},
            "fc2": {"w": normal_init(next(ki), (h, 2), dtype=dtype), "b": jnp.zeros((2,), dtype)},
        }

    experts = {}
    for name in ("nyu", "kitti"):
        experts[name] = {
            "seed_bin_regressor": seed_regressor(cfg.num_bins, E // 2),
            "attractors": [attractor() for _ in cfg.n_attractors],
            "log_binomial": log_binomial(cfg.num_relative_features, 4),
        }
    return {
        "conv2": conv1x1(Bf, Bf),
        "patch_transformer": init_patch_transformer(next(ki), cfg, dtype=dtype),
        "mlp_classifier": mlp_classifier(cfg.patch_transformer_hidden_size),
        "seed_projector": projector(Bf, E, E // 2),
        "projectors": [projector(F, E, E // 2) for _ in range(4)],
        "experts": experts,
    }


def _projector_fwd(p, x):
    return conv2d(p["conv2"], jax.nn.relu(conv2d(p["conv1"], x)))


def _seed_bins_softplus(p, x):
    y = conv2d(p["conv2"], jax.nn.relu(conv2d(p["conv1"], x)))
    return softplus(y)


def _inv_attractor(dx):
    return dx / (1.0 + ATTRACTOR_ALPHA * dx**ATTRACTOR_GAMMA)


def _attractor_unnormed(p, x, prev_bin, prev_bin_embedding):
    if prev_bin_embedding is not None:
        if prev_bin_embedding.shape[1:3] != x.shape[1:3]:
            prev_bin_embedding = resize2d(prev_bin_embedding, x.shape[1:3], align_corners=True)
        x = x + prev_bin_embedding
    attractors = softplus(conv2d(p["conv2"], jax.nn.relu(conv2d(p["conv1"], x))))
    hw = attractors.shape[1:3]
    bin_centers = resize2d(prev_bin, hw, align_corners=True)
    # delta: mean over attractor points of inv_attractor(a - c)
    delta = _inv_attractor(
        attractors[..., None] - bin_centers[..., None, :]
    ).mean(axis=-2)
    new_centers = bin_centers + delta
    return new_centers, new_centers


def _log_binomial_softmax(probs, temperature, n_classes):
    """probs (B, H, W), temperature (B, H, W, 1) -> (B, H, W, n_classes).

    Computed in the input dtype: the reference serves the whole ZoeDepth in
    bf16 (predict_action casts to bf16, modeling_spatialvla.py:489), so bf16
    here matches its serving precision; fp32 inputs (parity tests) stay
    fp32. The (B, H, W, n_classes) intermediate at 384^2 is HBM-bound, so
    the dtype halves the metric head's traffic in serving."""
    dt = probs.dtype if probs.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    probs = probs.astype(dt)
    temperature = temperature.astype(dt)
    eps = 1e-4
    k_idx = jnp.arange(n_classes, dtype=dt)
    k_minus_1 = jnp.asarray(float(n_classes - 1), dtype=dt)
    p = jnp.clip(probs, eps, 1.0)[..., None]
    one_minus = jnp.clip(1 - probs, eps, 1.0)[..., None]

    def log_binom(n, k, e=1e-7):
        # clamp the last log argument: XLA may reassociate (n - k) + e into
        # (n + e) - k == 0 for k == n, and 0 * log(0) -> NaN under jit
        n = n + e
        k = k + e
        return (
            n * jnp.log(n)
            - k * jnp.log(k)
            - (n - k) * jnp.log(jnp.maximum(n - k + e, 1e-12))
        )

    y = (
        log_binom(k_minus_1, k_idx)
        + k_idx * jnp.log(p)
        + (k_minus_1 - k_idx) * jnp.log(one_minus)
    )
    return jax.nn.softmax(y / temperature, axis=-1)


def _conditional_log_binomial(p, cfg: ZoeDepthConfig, main: Array, condition: Array) -> Array:
    x = jnp.concatenate([main, condition], axis=-1)
    x = conv2d(p["conv1"], x)
    x = jax.nn.gelu(x, approximate=False)
    x = softplus(conv2d(p["conv2"], x))
    eps = 1e-4
    prob = x[..., :2] + eps
    prob = prob[..., 0] / (prob[..., 0] + prob[..., 1])
    temp = x[..., 2:] + eps
    temp = temp[..., 0] / (temp[..., 0] + temp[..., 1])
    temp = ((cfg.max_temp - cfg.min_temp) * temp + cfg.min_temp)[..., None]
    return _log_binomial_softmax(prob, temp, cfg.num_bins)


def _expert_forward(
    expert: Params, shared: Params, cfg: ZoeDepthConfig,
    x: Array, fused: List[Array], outconv: Array,
) -> Array:
    prev_bin = _seed_bins_softplus(expert["seed_bin_regressor"], x)  # unnormed
    prev_emb = _projector_fwd(shared["seed_projector"], x)
    bin_centers = prev_bin
    for proj, attr, feature in zip(shared["projectors"], expert["attractors"], fused):
        emb = _projector_fwd(proj, feature)
        prev_bin, bin_centers = _attractor_unnormed(attr, emb, prev_bin, prev_emb)
        prev_emb = emb
    last = outconv
    bin_centers = resize2d(bin_centers, last.shape[1:3], align_corners=True)
    emb = resize2d(prev_emb, last.shape[1:3], align_corners=True)
    probs = _conditional_log_binomial(expert["log_binomial"], cfg, last, emb)
    return jnp.sum(probs * bin_centers, axis=-1)  # (B, H, W)


def metric_head_forward(
    params: Params, cfg: ZoeDepthConfig,
    outconv: Array, bottleneck: Array, fused: List[Array],
    *,
    domain: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Returns (metric_depth (B, H, W), domain_logits (B, 2))."""
    x = conv2d(params["conv2"], bottleneck)
    embedding = patch_transformer_forward(params["patch_transformer"], cfg, x)
    h = jax.nn.relu(linear(params["mlp_classifier"]["fc1"], embedding))
    domain_logits = linear(params["mlp_classifier"]["fc2"], h)

    def run(name):
        return _expert_forward(params["experts"][name], params, cfg, x, fused, outconv)

    if domain is not None:
        return run(domain), domain_logits

    vote = jax.nn.softmax(domain_logits.sum(axis=0), axis=-1)
    idx = jnp.argmax(vote)
    depth = jax.lax.cond(idx == 0, lambda: run("nyu"), lambda: run("kitti"))
    return depth, domain_logits


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

DEFAULT_OUT_INDICES = (6, 12, 18, 24)


def init_params(key, cfg: ZoeDepthConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "backbone": init_backbone(ks[0], cfg, dtype=dtype),
        "neck": init_neck(ks[1], cfg, dtype=dtype),
        "relative_head": init_relative_head(ks[2], cfg, dtype=dtype),
        "metric_head": init_metric_head(ks[3], cfg, dtype=dtype),
    }


def forward(
    params: Params, cfg: ZoeDepthConfig, pixel_values: Array,
    *, domain: Optional[str] = None,
) -> Dict[str, Array]:
    """pixel_values (B, H, W, 3) already Zoe-normalized. Returns
    {'predicted_depth' (B, 2H', 2W'), 'domain_logits'}."""
    ph = pixel_values.shape[1] // cfg.patch_size
    pw = pixel_values.shape[2] // cfg.patch_size
    out_idx = tuple(cfg.out_indices)
    hidden = backbone_forward(params["backbone"], cfg, pixel_values, out_idx)
    fused, bottleneck = neck_forward(params["neck"], cfg, hidden, ph, pw)
    relative_depth, rel_features = relative_head_forward(params["relative_head"], fused)
    metric, domain_logits = metric_head_forward(
        params["metric_head"], cfg, rel_features, bottleneck, fused, domain=domain
    )
    return {
        "predicted_depth": metric,
        "relative_depth": relative_depth,
        "domain_logits": domain_logits,
    }


def preprocess(
    pixel_values: Array, cfg: ZoeDepthConfig, pad: int = 31,
    image_size: Optional[int] = None,
) -> Tuple[Array, int]:
    """Raw [0,1] NHWC pixels -> Zoe input: reflect-pad 31px, bicubic resize
    to (image_size, image_size) with align_corners=True, then mean/std 0.5
    normalize — matching process_zoe (modeling_spatialvla.py:99-110, which
    normalizes *after* pad+resize). image_size overrides cfg.image_size
    (reduced-resolution serving mode)."""
    size = image_size or cfg.image_size
    x = reflect_pad2d(pixel_values, pad, pad)
    x = resize2d(x, (size, size), method="bicubic", align_corners=True)
    x = (x - ZOE_MEAN) / ZOE_STD
    return x, pad


def predict_depth(
    params: Params, cfg: ZoeDepthConfig, pixel_values: Array,
    *, target_hw: Tuple[int, int], domain: Optional[str] = None,
    image_size: Optional[int] = None,
) -> Array:
    """Full reference depth path (modeling_spatialvla.py:313-323): pad ->
    resize -> zoe -> bicubic upsample to padded resolution -> center crop
    back to target_hw. Returns (B, H, W) metric depth.

    image_size: run the zoe stack at a reduced internal resolution (e.g.
    256 instead of 384 — ~2.2x fewer backbone tokens). An opt-in serving
    trade: depth quality degrades gracefully (quality-gate like int4,
    scripts/eval_quant.py); a precomputed rel bias must be built for the
    same size (precompute_rel_bias(image_size=...))."""
    x, pad = preprocess(pixel_values, cfg, image_size=image_size)
    out = forward(params, cfg, x, domain=domain)
    depth = out["predicted_depth"]  # (B, h, w)
    H, W = target_hw
    depth = resize2d(
        depth, (H + 2 * pad, W + 2 * pad), method="bicubic",
        align_corners=True, channels_last=False,
    )
    return depth[:, pad:-pad, pad:-pad]
