"""Separable image resampling with torch-parity semantics.

jax.image.resize only implements half-pixel (align_corners=False) sampling;
the depth branch needs torch's align_corners=True bilinear/bicubic
(modeling_spatialvla.py:107,318-323 and the DPT/Zoe neck). Implemented as
two dense (out, in) interpolation matrices applied along H then W — XLA
turns these into MXU matmuls, which at our sizes beats gather-based
resampling on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    if out_size == 1:
        return np.zeros((1,))
    if align_corners:
        return np.arange(out_size) * (in_size - 1) / (out_size - 1)
    return np.clip((np.arange(out_size) + 0.5) * in_size / out_size - 0.5, 0, in_size - 1)


def _linear_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    src = _source_coords(out_size, in_size, align_corners)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), lo] += 1 - w_hi
    mat[np.arange(out_size), hi] += w_hi
    return mat


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    out = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return out


def _cubic_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    src = _source_coords(out_size, in_size, align_corners)
    base = np.floor(src).astype(int)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for off in (-1, 0, 1, 2):
        idx = np.clip(base + off, 0, in_size - 1)
        w = _cubic_kernel(src - (base + off))
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


def _matrices(in_h, in_w, out_h, out_w, method, align_corners):
    f = _linear_matrix if method == "bilinear" else _cubic_matrix
    return f(out_h, in_h, align_corners), f(out_w, in_w, align_corners)


def resize2d(
    x: jax.Array,  # (..., H, W) or (..., H, W, C)
    out_hw,
    *,
    method: str = "bilinear",
    align_corners: bool = True,
    channels_last: bool = True,
) -> jax.Array:
    """Resize the two spatial dims. channels_last=True treats the input as
    (..., H, W, C); otherwise (..., H, W)."""
    out_h, out_w = out_hw
    if channels_last and x.ndim >= 3:
        H, W = x.shape[-3], x.shape[-2]
        mh, mw = _matrices(H, W, out_h, out_w, method, align_corners)
        mh = jnp.asarray(mh, x.dtype)
        mw = jnp.asarray(mw, x.dtype)
        x = jnp.einsum("oh,...hwc->...owc", mh, x)
        x = jnp.einsum("pw,...owc->...opc", mw, x)
        return x
    H, W = x.shape[-2], x.shape[-1]
    mh, mw = _matrices(H, W, out_h, out_w, method, align_corners)
    mh = jnp.asarray(mh, x.dtype)
    mw = jnp.asarray(mw, x.dtype)
    x = jnp.einsum("oh,...hw->...ow", mh, x)
    x = jnp.einsum("pw,...ow->...op", mw, x)
    return x


def reflect_pad2d(x: jax.Array, pad_h: int, pad_w: int, *, channels_last: bool = True) -> jax.Array:
    """Reflect padding (no edge repeat — torch 'reflect') on H/W."""
    if channels_last and x.ndim >= 3:
        cfg = [(0, 0)] * (x.ndim - 3) + [(pad_h, pad_h), (pad_w, pad_w), (0, 0)]
    else:
        cfg = [(0, 0)] * (x.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
    return jnp.pad(x, cfg, mode="reflect")
