"""Weight-only int8/int4 quantization for serving.

Greedy action decoding is HBM-bandwidth bound: every decode step streams the
full LM (weights dominate — the 265k-row lm_head alone is ~1.2 GB in bf16).
Symmetric per-output-channel int8 halves the streamed bytes; dequantization
happens on-chip inside a Pallas kernel (int8 tiles -> VMEM -> convert ->
MXU), so the bf16 copy never exists in HBM.

int4 halves the stream again: two nibbles per byte, packed along the
contraction dim (column j shares a byte with column j + K/2, so the in-kernel
unpack is two shifts + a lane concat). int4 weights are stored as *uint8* —
the dtype is the static marker that distinguishes the two formats under jit.
int4 is opt-in (``quantize_lm_params(..., bits=4)``): per-channel symmetric
4-bit is a real accuracy trade, gate it on your task before serving with it.

The reference has no quantization path (it serves torch bf16 on an A100,
README.md:93); this is a TPU-serving extension, off by default.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# {"qt": int8 (..., N, K) — *transposed* so each output-channel block is a
#  contiguous row range (sequential DMA), "scale": f32 (..., N)}
QuantW = Dict[str, Any]


def quantize_int8(w: jnp.ndarray) -> QuantW:
    """(..., K, N) float -> symmetric per-N-channel int8, stored (..., N, K)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, N)
    scale = amax / 127.0
    q = jnp.round(wf / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
    return {"qt": jnp.swapaxes(q, -1, -2), "scale": scale[..., 0, :]}


def quantize_int4(w: jnp.ndarray) -> QuantW:
    """(..., K, N) float -> symmetric per-N-channel int4 (levels [-8, 7]),
    stored (..., N, K//2) uint8 with column j packed against column j + K/2
    (low nibble = j, high nibble = j + K/2)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, N)
    scale = amax / 7.0
    q = jnp.clip(
        jnp.round(wf / jnp.maximum(scale, 1e-12)), -8, 7
    ).astype(jnp.int32)
    qt = jnp.swapaxes(q, -1, -2)  # (..., N, K)
    K = qt.shape[-1]
    assert K % 2 == 0, f"int4 packing needs an even contraction dim, got {K}"
    lo = qt[..., : K // 2] + 8
    hi = qt[..., K // 2 :] + 8
    return {"qt": (lo | (hi << 4)).astype(jnp.uint8), "scale": scale[..., 0, :]}


def unpack_int4(qt: jnp.ndarray) -> jnp.ndarray:
    """(..., N, K//2) uint8 -> (..., N, K) int32 codes in [-8, 7]."""
    w32 = qt.astype(jnp.int32)
    return jnp.concatenate([(w32 & 15) - 8, ((w32 >> 4) & 15) - 8], axis=-1)


def is_int4(w) -> bool:
    return is_quantized(w) and w["qt"].dtype == jnp.uint8


def dequantize(qw: QuantW, dtype=jnp.float32) -> jnp.ndarray:
    """-> (..., K, N) float."""
    qt = unpack_int4(qw["qt"]) if is_int4(qw) else qw["qt"]
    q = jnp.swapaxes(qt, -1, -2).astype(jnp.float32)
    return (q * qw["scale"][..., None, :]).astype(dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "qt" in w and "scale" in w


def is_lora_factored(w) -> bool:
    """{'w': base, 'a': (..., in, r), 'b': (..., r, out)} — applied as
    x@w + (x@a)@b without materializing the delta (train/lora.py)."""
    return isinstance(w, dict) and "w" in w and "a" in w and "b" in w


# ---------------------------------------------------------------------------
# pallas kernel: x (M, K) bf16 @ wq (K, N) int8/int4 * scale (N,) -> (M, N)
# ---------------------------------------------------------------------------

def _q_dot(x_bf16, w, *, k_dim=None):
    """(M, K) bf16 @ quantized block -> (M, bn) f32 (unscaled).

    w is either an int8 block (bn, K) or a packed-int4 uint8 block
    (bn, K//2). int4 nibbles are stored offset-binary (code + 8) so the
    unpack is just widen + mask/shift + bf16 convert (3 VPU ops per
    element); the +8 bias factors out of the dot as 8 * sum(x), which is
    O(M) instead of two O(bn*K) vector subtractions. int8/int4 codes are
    exact in bf16, and fp32 MXU would be 4x slower for the same matvec."""
    if w.dtype == jnp.uint8:  # int4 nibbles, biased +8
        w32 = w.astype(jnp.int32)
        wb = jnp.concatenate([w32 & 15, w32 >> 4], axis=-1).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            x_bf16, wb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bias = 8.0 * jnp.sum(x_bf16.astype(jnp.float32), axis=-1, keepdims=True)
        return acc - bias
    return jax.lax.dot_general(
        x_bf16, w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _q8_kernel(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    # bf16 MXU with fp32 accumulation
    x = x_ref[:].astype(jnp.bfloat16)  # (M, K)
    acc = _q_dot(x, w_ref[:])  # (M, bn) — contiguous weight rows
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)[None, :]).astype(out_dtype)


def _pick_block_n(K: int, N: int, M: int) -> int:
    # VMEM per grid step ≈ w_int8 (K*bn) + w_bf16 convert (2*K*bn) +
    # x_bf16 (M*K*2) + out; stay well under the 16MB scoped limit
    budget = 10 * 1024 * 1024 - M * K * 2
    bn = max(128, min(N, budget // max(3 * K + 4 * M, 1)))
    return (bn // 128) * 128


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_matmul(
    x: jnp.ndarray,  # (M, K)
    qt: jnp.ndarray,  # (N, K) int8 (transposed weight)
    scale: jnp.ndarray,  # (N,)
    *,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    N, Kb = qt.shape  # Kb == K (int8) or K // 2 (packed int4)
    bn = _pick_block_n(K, N, M)
    # non-divisible N: pallas pads boundary blocks automatically
    grid = (pl.cdiv(N, bn),)
    return pl.pallas_call(
        functools.partial(_q8_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kb), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
    )(x, qt, scale.reshape(1, -1))


def _q8_norm_kernel(x_ref, nw_ref, w_ref, s_ref, o_ref, *, out_dtype, eps):
    # gemma RMSNorm fused in front of the matvec (recomputed per block — the
    # norm is O(M*K) VPU work vs the block's DMA)
    xf = x_ref[:].astype(jnp.float32)  # (M, K)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + eps) * (1.0 + nw_ref[0, :].astype(jnp.float32))
    x = xn.astype(jnp.bfloat16)
    acc = _q_dot(x, w_ref[:])  # (M, bn)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)[None, :]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype", "interpret"))
def int8_rmsnorm_matmul(
    x: jnp.ndarray,  # (M, K) *unnormed*
    norm_w: jnp.ndarray,  # (K,) gemma rms weight (stored as offset from 1)
    qt: jnp.ndarray,  # (N, K) int8
    scale: jnp.ndarray,  # (N,)
    *,
    eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """rms_norm(x) @ dequant(qt) in one kernel (decode fast path)."""
    M, K = x.shape
    N, Kb = qt.shape
    bn = _pick_block_n(K, N, M)
    grid = (pl.cdiv(N, bn),)
    return pl.pallas_call(
        functools.partial(_q8_norm_kernel, out_dtype=out_dtype, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kb), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
    )(x, norm_w.reshape(1, -1), qt, scale.reshape(1, -1))


def qnorm_matmul(x, norm_w, w, *, eps: float = 1e-6, use_kernel=None):
    """Fused rms_norm + matmul when w is quantized and the shape fits the
    decode kernel; otherwise norm in XLA then qmatmul."""
    from ..models.layers import rms_norm

    if use_kernel is None:
        use_kernel = jax.devices()[0].platform != "cpu"
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if is_quantized(w) and use_kernel and x2.shape[0] <= 16:
        y = int8_rmsnorm_matmul(
            x2, norm_w, w["qt"], w["scale"], eps=eps, out_dtype=x.dtype
        )
        return y.reshape(lead + (y.shape[-1],))
    return qmatmul(rms_norm(norm_w, x, eps), w, use_kernel=use_kernel)


def qmatmul(x: jnp.ndarray, w, *, use_kernel=None) -> jnp.ndarray:
    """x (..., K) @ w, where w is a plain array, a QuantW dict, or a LoRA
    factor dict (base + low-rank delta applied without forming W + AB)."""
    if is_lora_factored(w):
        base = qmatmul(x, w["w"], use_kernel=use_kernel)
        delta = (x @ w["a"].astype(x.dtype)) @ w["b"].astype(x.dtype)
        return base + delta
    if not is_quantized(w):
        return x @ w.astype(x.dtype)
    if use_kernel is None:  # Pallas path only off-CPU
        use_kernel = jax.devices()[0].platform != "cpu"
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    # the kernel is the decode (small-M matvec) path; prefill/training
    # shapes go through XLA (transient f32 dequant is cheap vs the matmul)
    if use_kernel and x2.shape[0] <= 16:
        y = int8_matmul(x2, w["qt"], w["scale"], out_dtype=x.dtype)
    else:  # XLA path (prefill / training shapes): transient bf16 dequant
        qt = unpack_int4(w["qt"]) if is_int4(w) else w["qt"]
        wd = qt.astype(x.dtype) * w["scale"].astype(x.dtype)[:, None]
        y = jnp.einsum("mk,nk->mn", x2, wd)
    return y.reshape(lead + (y.shape[-1],))


# ---------------------------------------------------------------------------
# parameter-tree quantization
# ---------------------------------------------------------------------------

def quantize_lm_params(
    lm_params: Dict[str, Any], *, fuse: bool = True, bits: int = 8
) -> Dict[str, Any]:
    """Quantize the Gemma2 weight matrices (stacked layer tensors and the
    lm_head); embeddings/norms stay high precision (gather/elementwise).

    fuse=True additionally concatenates q|k|v and gate|up along the output
    dim so the decode step issues one kernel per projection group (kernel
    launch count dominates the bandwidth win otherwise).

    bits=4 packs two weights per byte (quantize_int4) — halves the decode
    DMA floor again, but per-channel symmetric int4 is an accuracy trade;
    quality-gate it before serving with it."""
    quantize = {8: quantize_int8, 4: quantize_int4}[bits]
    out = dict(lm_params)
    attn = lm_params["layers"]["attn"]
    mlp = lm_params["layers"]["mlp"]
    layers = dict(lm_params["layers"])
    if fuse:
        qkv = jnp.concatenate([attn["q"], attn["k"], attn["v"]], axis=-1)
        gate_up = jnp.concatenate([mlp["gate"], mlp["up"]], axis=-1)
        layers["attn"] = {
            "qkv": quantize(qkv),
            "o": quantize(attn["o"]),
        }
        layers["mlp"] = {
            "gate_up": quantize(gate_up),
            "down": quantize(mlp["down"]),
        }
    else:
        layers["attn"] = {k: quantize(v) for k, v in attn.items()}
        layers["mlp"] = {k: quantize(v) for k, v in mlp.items()}
    out["layers"] = layers
    if "lm_head" in lm_params:
        out["lm_head"] = quantize(lm_params["lm_head"])
    return out
