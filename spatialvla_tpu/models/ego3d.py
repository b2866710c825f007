"""Ego3D position encoding: metric-depth back-projection + NeRF-style
sinusoidal frequency MLP, added to the SigLIP patch features.

Reference behavior (modeling_spatialvla.py):
  - backproject_patch (:195-223): area-pool the depth map to
    (hp*reso, wp*reso), lift pixel-center homogeneous coords through
    K^-1 scaled by depth, regroup into per-patch point bundles
    (B, num_patches, 3*reso^2);
  - Ego3DPositionEmbeddingMLP (:41-97): x -> ((x - [0,0,2])/2), frequency
    encode with 2^k bands (identity + sin + cos), then
    Linear -> LayerNorm -> ReLU -> Linear.

TPU notes: the uv grid and K^-1 are tiny; everything is batched matmuls
and pooling — pure XLA. Frequency encoding is fp32 (the reference computes
it under no_grad in the buffer dtype).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import Ego3DConfig
from .layers import layer_norm, layer_norm_init, normal_init, xavier_uniform_init

Array = jax.Array
Params = Dict[str, Any]


def init_params(key: Array, cfg: Ego3DConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    F = cfg.freq_out_channels
    H = cfg.num_pos_feats
    # xavier-uniform with gain 0.01: "init with small weights to maintain
    # stable training" (modeling_spatialvla.py:67-71)
    return {
        "fc1": {
            "w": xavier_uniform_init(k1, (F, H), gain=0.01, dtype=dtype),
            "b": jnp.zeros((H,), dtype=dtype),
        },
        "ln": layer_norm_init(H, dtype=dtype),
        "fc2": {
            "w": xavier_uniform_init(k2, (H, H), gain=0.01, dtype=dtype),
            "b": jnp.zeros((H,), dtype=dtype),
        },
    }


def uv_grid(image_size: int, patch_size: int, reso: int) -> jnp.ndarray:
    """Homogeneous pixel-center coordinates (3, n) for the reso-subsampled
    patch grid (modeling_spatialvla.py:181-185)."""
    step = patch_size // reso
    coords = jnp.arange(0, image_size, step, dtype=jnp.float32) + patch_size / reso / 2
    y, x = jnp.meshgrid(coords, coords, indexing="ij")
    ones = jnp.ones_like(x)
    return jnp.stack([x, y, ones], axis=0).reshape(3, -1)


def area_pool_depth(depth: Array, out_h: int, out_w: int) -> Array:
    """(B, H, W) -> (B, out_h, out_w) average pooling (area interpolation
    for integer downscale factors, matching F.interpolate mode='area')."""
    B, H, W = depth.shape
    fh, fw = H // out_h, W // out_w
    d = depth[:, : out_h * fh, : out_w * fw]
    d = d.reshape(B, out_h, fh, out_w, fw)
    return d.mean(axis=(2, 4))


def backproject_patch(
    K: Array,  # (B, 3, 3) camera intrinsics
    depth: Array,  # (B, H, W) metric depth
    *,
    image_size: int,
    patch_size: int,
    reso: int,
) -> Array:
    """Returns per-patch 3D point bundles (B, num_patches, 3*reso^2) in the
    camera frame."""
    B = depth.shape[0]
    hp = wp = image_size // patch_size
    d = area_pool_depth(depth.astype(jnp.float32), hp * reso, wp * reso)
    d = d.reshape(B, 1, -1)  # (B, 1, n)
    uv = uv_grid(image_size, patch_size, reso)  # (3, n)
    Kinv = jnp.linalg.inv(K.astype(jnp.float32))  # (B, 3, 3)
    p_cam = (Kinv @ uv[None]) * d  # (B, 3, n)
    # regroup (B, 3, hp, reso, wp, reso) -> (B, hp*wp, reso*reso*3)
    p = p_cam.reshape(B, 3, hp, reso, wp, reso)
    p = p.transpose(0, 2, 4, 3, 5, 1).reshape(B, hp * wp, reso * reso * 3)
    return p


def frequency_encoding(xyz: Array, cfg: Ego3DConfig) -> Array:
    """(B, N, C) -> (B, N, C*(2*n_freqs+1)): identity + sin/cos at log-spaced
    bands, after centering on [0, 0, 2] and scaling by 1/2."""
    center = jnp.tile(jnp.asarray([0.0, 0.0, 2.0], dtype=jnp.float32), cfg.in_channels // 3)
    freq_bands = 2.0 ** jnp.linspace(0.0, cfg.n_freqs - 1, cfg.n_freqs)
    xn = (xyz.astype(jnp.float32) - center) / 2.0
    xf = xn[..., None] * freq_bands  # (B, N, C, nf)
    enc = jnp.concatenate([xn[..., None], jnp.sin(xf), jnp.cos(xf)], axis=-1)
    B, N = xyz.shape[:2]
    return enc.reshape(B, N, -1)


def forward(params: Params, cfg: Ego3DConfig, xyz: Array, dtype=None) -> Array:
    """(B, N, 3*reso^2) camera-frame points -> (B, N, num_pos_feats)."""
    enc = frequency_encoding(xyz, cfg)
    if dtype is not None:
        enc = enc.astype(dtype)
    h = enc @ params["fc1"]["w"].astype(enc.dtype) + params["fc1"]["b"].astype(enc.dtype)
    h = layer_norm(params["ln"], h, 1e-5)  # torch nn.LayerNorm default eps
    # (reference Ego3DPositionEmbeddingMLP uses bare nn.LayerNorm,
    # modeling_spatialvla.py:59-64)
    h = jax.nn.relu(h)
    return h @ params["fc2"]["w"].astype(h.dtype) + params["fc2"]["b"].astype(h.dtype)
