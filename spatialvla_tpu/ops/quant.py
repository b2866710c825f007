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


def quantize_kv(x: jnp.ndarray):
    """KV-cache int8: symmetric per-slot quantization over the head dim.

    (..., D) float -> (codes int8 (..., D), scale f32 (...)). Per-slot
    scales keep the error ~0.4% per element — far finer granularity than
    weight quantization because each (layer, row, head, slot) vector gets
    its own scale; the scale tensor is 1/(2D) of the bf16 cache bytes.
    Used by the fused decode step's opt-in int8 cache (kv_bits=8): cache
    reads are ~1/3 of decode HBM traffic at batch 16."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    codes = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return codes, scale


def quantize_int4(w: jnp.ndarray, group_size: int = None) -> QuantW:
    """(..., K, N) float -> symmetric int4 (levels [-8, 7]), stored
    (..., N, K//2) uint8 with column j packed against column j + K/2
    (low nibble = j, high nibble = j + K/2).

    group_size: contraction-dim scale granularity. None (default) = one
    scale per output channel — the fast format (one MXU dot per block;
    95.8 actions/sec end-to-end on the bench host). group_size=128 cuts
    the quantization error ~23% (the per-row amax over K=2048 gaussian
    weights is ~3.5 sigma; over a 128-group ~2.7 sigma) and its scale
    bytes are negligible DMA (1/256 of the packed weights), but it is a
    DOMINATED operating point as measured: its best kernel formulation
    decodes at 54.0 actions/sec (MEASURE_ROUND3 int4_g128; two other
    formulations measured slower still — see grouped_int4_dot) while the
    mixed tree quantize(bits=8, mlp_bits=4) is both faster (92.2) and
    more accurate (gate L1 0.0288 vs 0.0507, NOTES_ROUND3). Use mixed
    when int4's accuracy is the concern; grouped scales remain available
    as a documented experiment."""
    wf = w.astype(jnp.float32)
    K = wf.shape[-2]
    if group_size is not None:
        # clamp so the nibble-pack halves (columns [0, K/2) and [K/2, K))
        # stay group-aligned even for small K
        group_size = min(group_size, K // 2)
        assert group_size > 0 and K % group_size == 0 and (K // 2) % group_size == 0, (
            K, group_size,
        )
        G = K // group_size
        wg = wf.reshape(wf.shape[:-2] + (G, group_size, wf.shape[-1]))
        amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)  # (..., G, 1, N)
        scale_g = amax / 7.0
        q = jnp.clip(jnp.round(wg / jnp.maximum(scale_g, 1e-12)), -8, 7)
        q = q.reshape(wf.shape).astype(jnp.int32)
        # scale stored (..., N, G): rows match the transposed weight layout
        scale = jnp.swapaxes(scale_g[..., 0, :], -1, -2)
    else:
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, N)
        scale = amax / 7.0
        q = jnp.clip(
            jnp.round(wf / jnp.maximum(scale, 1e-12)), -8, 7
        ).astype(jnp.int32)
        scale = scale[..., 0, :]
    qt = jnp.swapaxes(q, -1, -2)  # (..., N, K)
    assert K % 2 == 0, f"int4 packing needs an even contraction dim, got {K}"
    lo = qt[..., : K // 2] + 8
    hi = qt[..., K // 2 :] + 8
    return {"qt": (lo | (hi << 4)).astype(jnp.uint8), "scale": scale}


def unpack_int4(qt: jnp.ndarray) -> jnp.ndarray:
    """(..., N, K//2) uint8 -> (..., N, K) int32 codes in [-8, 7]."""
    w32 = qt.astype(jnp.int32)
    return jnp.concatenate([(w32 & 15) - 8, ((w32 >> 4) & 15) - 8], axis=-1)


def is_int4(w) -> bool:
    return is_quantized(w) and w["qt"].dtype == jnp.uint8


def is_grouped(w) -> bool:
    """Group-wise scales: scale has the trailing (N, G) shape (same rank as
    qt) instead of per-channel (N,)."""
    return is_quantized(w) and w["scale"].ndim == w["qt"].ndim


def grouped_dequant_t(qt_codes: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """Transposed-layout grouped dequant: codes (..., N, K) x scale
    (..., N, G) -> (..., N, K) via a reshape-multiply — (N, G, K/G) *
    scale[..., None] — which XLA fuses into the consuming dot's operand.
    (An explicit jnp.repeat scale map defeats that fusion; at 4B scale the
    resulting materialized/hoisted buffers exhausted device memory —
    NOTES_ROUND3.md.)"""
    N, K = qt_codes.shape[-2:]
    G = scale.shape[-1]
    lead = qt_codes.shape[:-2]
    q3 = qt_codes.astype(dtype).reshape(lead + (N, G, K // G))
    return (q3 * scale[..., None].astype(dtype)).reshape(lead + (N, K))


def dequantize(qw: QuantW, dtype=jnp.float32) -> jnp.ndarray:
    """-> (..., K, N) float."""
    qt = unpack_int4(qw["qt"]) if is_int4(qw) else qw["qt"]
    if is_grouped(qw):
        return jnp.swapaxes(
            grouped_dequant_t(qt, qw["scale"], jnp.float32), -1, -2
        ).astype(dtype)
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

def grouped_int4_dot(x_bf16, lo, hi, s32, G, g):
    """Grouped-scale int4 dot shared by the standalone quant kernel and the
    whole-LM fused decode kernel (ops/decode_step.py): one MXU partial dot
    PER GROUP on the raw biased codes with the scale applied to the
    (M, bn) f32 partial — O(G*M*bn) scale work. The offset-binary +8 bias
    becomes an (M, G) x (G, bn) matmul of group sums against scales.

    This is the FASTEST of three formulations measured end-to-end on the
    bench host (g128 decode, actions/sec): per-group partial dots 54.0
    (MEASURE_ROUND3 int4_g128), fold-scales-into-codes 9.62
    (MEASURE_ROUND4 int4_g128_fold — the O(bn*K) elementwise scale pass
    per block is VPU-bound, the same regime as the 8x-slower jnp.repeat
    dequant: MEASURE_ROUND3.prev 11.76 vs 93.9), and all of them lose to
    per-channel int4 (95.8) and int8 (76.6). Grouped int4 is therefore a
    documented experiment, not a recommended serving mode — see
    quantize_int4's docstring for the operating-point analysis.

    lo/hi: bf16 nibble halves (column j packs with column j + K/2, so
    groups [0, G/2) live in `lo` and [G/2, G) in `hi`); s32: (bn, G) f32
    scales; g: elements per group along K."""
    dims = (((1,), (1,)), ((), ()))
    acc = None
    for j in range(G):  # static unroll: one MXU dot per group
        codes = (
            lo[:, j * g : (j + 1) * g]
            if j < G // 2
            else hi[:, (j - G // 2) * g : (j - G // 2 + 1) * g]
        )
        pj = jax.lax.dot_general(
            x_bf16[:, j * g : (j + 1) * g], codes, dims,
            preferred_element_type=jnp.float32,
        ) * s32[:, j][None, :]
        acc = pj if acc is None else acc + pj
    xsum = jnp.sum(
        x_bf16.astype(jnp.float32).reshape(x_bf16.shape[0], G, g), axis=-1
    )  # (M, G)
    bias = 8.0 * jax.lax.dot_general(
        xsum, s32, dims, preferred_element_type=jnp.float32
    )
    return acc - bias


def _q_dot_scaled(x_bf16, w, s):
    """(M, K) bf16 @ quantized block -> (M, bn) f32, scale applied.

    w is either an int8 block (bn, K) or a packed-int4 uint8 block
    (bn, K//2). s is the scale block: (1, bn) per-channel, or (bn, G)
    group-wise (int4 only; column k's scale is s[:, k // (K/G)]).

    int4 nibbles are stored offset-binary (code + 8) so the unpack is just
    widen + mask/shift + bf16 convert (3 VPU ops per element). Per-channel:
    the +8 bias factors out of the dot as 8 * sum(x) — O(M) instead of two
    O(bn*K) vector subtractions. Group-wise: grouped_int4_dot runs one MXU
    partial dot per group with the scale applied to the f32 partial — see
    its docstring for the two slower formulations this outmeasured.
    int8/int4 codes are exact in bf16; fp32 MXU would be 4x slower."""
    dims = (((1,), (1,)), ((), ()))
    grouped = s.shape[0] != 1  # (bn, G) vs (1, bn)
    if w.dtype == jnp.uint8:  # int4 nibbles, biased +8
        w32 = w.astype(jnp.int32)
        lo = (w32 & 15).astype(jnp.bfloat16)
        hi = (w32 >> 4).astype(jnp.bfloat16)
        Kh = w.shape[-1]
        K = 2 * Kh
        if grouped:
            G = s.shape[-1]
            return grouped_int4_dot(
                x_bf16, lo, hi, s.astype(jnp.float32), G, K // G
            )
        acc = jax.lax.dot_general(
            x_bf16[:, :Kh], lo, dims, preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            x_bf16[:, Kh:], hi, dims, preferred_element_type=jnp.float32,
        )
        bias = 8.0 * jnp.sum(x_bf16.astype(jnp.float32), axis=-1, keepdims=True)
        return (acc - bias) * s[0].astype(jnp.float32)[None, :]
    acc = jax.lax.dot_general(
        x_bf16, w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc * s[0].astype(jnp.float32)[None, :]


def _q8_kernel(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    # bf16 MXU with fp32 accumulation
    x = x_ref[:].astype(jnp.bfloat16)  # (M, K)
    o_ref[:] = _q_dot_scaled(x, w_ref[:], s_ref[:]).astype(out_dtype)


# Rows above this take the XLA path (transient bf16 dequant + plain
# matmul). The Pallas kernel is a small-M matvec design; mid-round the
# int8 threshold was raised to 512 to cover the 266-row prefill, and a
# STANDALONE timing of that prefill favored the kernel (~3 ms vs ~11 ms) —
# but end-to-end it measured 4% SLOWER on the full predict (73.35 vs 76.42
# actions/sec, same commit, same host: XLA fuses the transient dequant
# into the surrounding prefill program, which the standalone probe could
# not see). int4 flips the other way end-to-end (95.7 vs 93.8: its XLA
# fallback pays nibble unpack AND a 4x-inflated bf16 transient), so the
# threshold is per-format. Decode matvecs (M <= batch) always fit both.
QKERNEL_MAX_M = 16  # int8 qt
QKERNEL_MAX_M_INT4 = 512  # packed-int4 qt (uint8 nibbles)


def _qkernel_max_m(qt) -> int:
    return QKERNEL_MAX_M_INT4 if qt.dtype == jnp.uint8 else QKERNEL_MAX_M


def _pick_block_n(K: int, N: int, M: int, *, grouped: bool = False) -> int:
    # VMEM per grid step ≈ w block + dequant temporaries + x_bf16 + out;
    # stay well under the 16MB scoped limit. Per-channel: w_int8/packed
    # (≤ K) + w_bf16 convert (2K) ≈ 3K bytes/row. Grouped (scale-expanded
    # codes): packed (K/2) + widened w32 (2K) + lo/hi bf16 nibbles (2K) +
    # f32 scaled transients (4K) + bf16 scaled copies (2K) ≈ 10K bytes/row.
    per_row = 10 * K if grouped else 3 * K
    budget = 10 * 1024 * 1024 - M * K * 2
    bn = max(128, min(N, budget // max(per_row + 4 * M, 1)))
    return (bn // 128) * 128


def _scale_spec(scale: jnp.ndarray, bn: int):
    """(BlockSpec, operand) for a per-channel (N,) or grouped (N, G) scale."""
    if scale.ndim == 2:  # grouped: row block follows the weight block
        G = scale.shape[-1]
        return (
            pl.BlockSpec((bn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scale,
        )
    return (
        pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        scale.reshape(1, -1),
    )


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_matmul(
    x: jnp.ndarray,  # (M, K)
    qt: jnp.ndarray,  # (N, K) int8 (transposed weight)
    scale: jnp.ndarray,  # (N,) per-channel or (N, G) grouped
    *,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    N, Kb = qt.shape  # Kb == K (int8) or K // 2 (packed int4)
    bn = _pick_block_n(K, N, M, grouped=scale.ndim == 2)
    # non-divisible N: pallas pads boundary blocks automatically
    grid = (pl.cdiv(N, bn),)
    sspec, sop = _scale_spec(scale, bn)
    return pl.pallas_call(
        functools.partial(_q8_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kb), lambda i: (i, 0), memory_space=pltpu.VMEM),
            sspec,
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
    )(x, qt, sop)


def _q8_norm_kernel(x_ref, nw_ref, w_ref, s_ref, o_ref, *, out_dtype, eps):
    # gemma RMSNorm fused in front of the matvec (recomputed per block — the
    # norm is O(M*K) VPU work vs the block's DMA)
    xf = x_ref[:].astype(jnp.float32)  # (M, K)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + eps) * (1.0 + nw_ref[0, :].astype(jnp.float32))
    x = xn.astype(jnp.bfloat16)
    o_ref[:] = _q_dot_scaled(x, w_ref[:], s_ref[:]).astype(out_dtype)


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
    bn = _pick_block_n(K, N, M, grouped=scale.ndim == 2)
    grid = (pl.cdiv(N, bn),)
    sspec, sop = _scale_spec(scale, bn)
    return pl.pallas_call(
        functools.partial(_q8_norm_kernel, out_dtype=out_dtype, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kb), lambda i: (i, 0), memory_space=pltpu.VMEM),
            sspec,
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
    )(x, norm_w.reshape(1, -1), qt, sop)


import contextlib
import threading

_TRACE_FLAGS = threading.local()


@contextlib.contextmanager
def xla_matmuls():
    """Force the XLA (non-Pallas) quantized-matmul path for code traced
    inside this block. Mesh-sharded serving uses it: GSPMD partitions the
    einsum + elementwise-dequant graph across the mesh automatically,
    but the single-device Pallas microkernels would be wrapped in full
    all-gathers instead of partitioned. Trace-time and thread-local —
    wrap the model call INSIDE the jitted function body."""
    prev = getattr(_TRACE_FLAGS, "xla_only", False)
    _TRACE_FLAGS.xla_only = True
    try:
        yield
    finally:
        _TRACE_FLAGS.xla_only = prev


def _kernel_default() -> bool:
    if getattr(_TRACE_FLAGS, "xla_only", False):
        return False
    return jax.devices()[0].platform != "cpu"


def qnorm_matmul(x, norm_w, w, *, eps: float = 1e-6, use_kernel=None):
    """Fused rms_norm + matmul when w is quantized and the shape fits the
    decode kernel; otherwise norm in XLA then qmatmul."""
    from ..models.layers import rms_norm

    if use_kernel is None:
        use_kernel = _kernel_default()
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if is_quantized(w) and use_kernel and x2.shape[0] <= _qkernel_max_m(w["qt"]):
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
    if use_kernel is None:  # Pallas path only off-CPU (and not under a mesh)
        use_kernel = _kernel_default()
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if use_kernel and x2.shape[0] <= _qkernel_max_m(w["qt"]):
        y = int8_matmul(x2, w["qt"], w["scale"], out_dtype=x.dtype)
    else:  # XLA path (prefill / training shapes): transient bf16 dequant
        qt = unpack_int4(w["qt"]) if is_int4(w) else w["qt"]
        if is_grouped(w):
            wd = grouped_dequant_t(qt, w["scale"], x.dtype)
        else:
            wd = qt.astype(x.dtype) * w["scale"].astype(x.dtype)[:, None]
        y = jnp.einsum("mk,nk->mn", x2, wd)
    return y.reshape(lead + (y.shape[-1],))


# ---------------------------------------------------------------------------
# parameter-tree quantization
# ---------------------------------------------------------------------------

def quantize_lm_params(
    lm_params: Dict[str, Any], *, fuse: bool = True, bits: int = 8,
    group_size: int = None, mlp_bits: int = None,
) -> Dict[str, Any]:
    """Quantize the Gemma2 weight matrices (stacked layer tensors and the
    lm_head); embeddings/norms stay high precision (gather/elementwise).

    fuse=True additionally concatenates q|k|v and gate|up along the output
    dim so the decode step issues one kernel per projection group (kernel
    launch count dominates the bandwidth win otherwise).

    bits=4 packs two weights per byte (quantize_int4) — halves the decode
    DMA floor again. Scales default per-channel (the fast format);
    group_size=128 trades ~1.8x decode speed for ~23% less quantization
    error (measured — see quantize_int4). int4 remains an accuracy trade
    to quality-gate before serving (scripts/eval_quant.py).

    mlp_bits overrides the precision of the MLP matmuls only (the mixed
    sweet spot: bits=8, mlp_bits=4 packs the ~2/3 of weight bytes living
    in gate/up/down to int4 while attention + lm_head stay int8 — ~0.58x
    the int8 stream with the quantization error kept out of the attention
    logits and the output head; the fused decode kernel handles
    per-projection formats natively). Quality-gate like int4."""
    if bits not in (4, 8):
        raise ValueError(f"bits={bits}: weight quantization supports 8 or 4")
    if mlp_bits is not None and mlp_bits not in (4, 8):
        raise ValueError(f"mlp_bits={mlp_bits}: supports 8 or 4 (or None)")

    def _q(b):
        if b == 4:
            return functools.partial(quantize_int4, group_size=group_size)
        return quantize_int8

    quantize = _q(bits)
    quantize_mlp = _q(mlp_bits if mlp_bits is not None else bits)
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
            "gate_up": quantize_mlp(gate_up),
            "down": quantize_mlp(mlp["down"]),
        }
    else:
        layers["attn"] = {k: quantize(v) for k, v in attn.items()}
        layers["mlp"] = {k: quantize_mlp(v) for k, v in mlp.items()}
    out["layers"] = layers
    if "lm_head" in lm_params:
        out["lm_head"] = quantize(lm_params["lm_head"])
    return out


def _quantize_wb(p: Dict[str, Any], quantize) -> Dict[str, Any]:
    """{'w': (..., K, N) float, 'b'?} -> {'w': QuantW, 'b'?} (bias stays
    high precision — one elementwise add outside the kernel)."""
    out = dict(p)
    out["w"] = quantize(p["w"])
    return out


def quantize_vision_params(
    params: Dict[str, Any], *, bits: int = 8, group_size: int = None
) -> Dict[str, Any]:
    """Weight-only quantization of the serving FRONT: the SigLIP encoder's
    stacked layer matmuls, the ZoeDepth BEiT-backbone matmuls (~85% of the
    zoe parameter bytes; neck/head convs stay bf16 — they are small and
    conv-shaped), and the vision->LM projector. Patch embeds, positional
    tables, norms, and layer-scale vectors stay high precision.

    At B=1 the whole front is HBM-bandwidth bound on TPU (M = 256/577
    tokens), so halving the streamed weight bytes is a direct latency win;
    the matmuls dispatch to the Pallas int8 kernel (M <= QKERNEL_MAX_M)
    which dequantizes in VMEM — no bf16 weight copy ever exists in HBM.
    Vision counterpart of quantize_lm_params; same opt-in serving-only
    contract (the reference serves torch bf16 end to end, README.md:93)."""
    if bits not in (4, 8):
        raise ValueError(f"bits={bits}: weight quantization supports 8 or 4")
    if bits == 4:
        quantize = functools.partial(quantize_int4, group_size=group_size)
    else:
        quantize = quantize_int8
    out = dict(params)
    if "vision" in params:
        vis = dict(params["vision"])
        layers = dict(vis["layers"])
        layers["attn"] = {
            k: _quantize_wb(v, quantize) for k, v in layers["attn"].items()
        }
        layers["mlp"] = {
            k: _quantize_wb(v, quantize) for k, v in layers["mlp"].items()
        }
        vis["layers"] = layers
        out["vision"] = vis
    if "zoe" in params:
        zoe = dict(params["zoe"])
        backbone = dict(zoe["backbone"])
        layers = dict(backbone["layers"])
        for name in ("q", "k", "v", "proj", "fc1", "fc2"):
            layers[name] = _quantize_wb(layers[name], quantize)
        backbone["layers"] = layers
        zoe["backbone"] = backbone
        out["zoe"] = zoe
    if "projector" in params:
        out["projector"] = _quantize_wb(params["projector"], quantize)
    return out
