"""Whole-LM fused greedy-decode step: ONE Pallas kernel for all Gemma2
layers of a single decode position.

Why: greedy decode is HBM-bandwidth bound (the int8 LM streams ~2 GB of
weights per token), but round 1 spent ~45% of the step on ~105 XLA kernel
launches (~12 us each) and inter-kernel glue. This kernel runs the entire
26-layer stack in a single pallas_call with a (layer, phase-step) grid:
weight blocks stream HBM->VMEM through the Pallas pipeline while the
residual stream lives in VMEM scratch for the whole step. Replaces the
decode path of flash-attn + cuBLAS matvecs in the reference
(modeling_gemma2.py:198-241 territory).

Per layer the grid walks phases
    [qkv matvec blocks][attention][o blocks][gate_up blocks][down blocks]
with the phase boundaries baked in as static constants. The KV cache is a
read-only input in serving layout (L, M, Nkv, S, D); the kernel emits the
current position's k/v per layer and the caller scatters them into the
cache (no aliasing, no full-block writebacks).

Numerics mirror the XLA serving path (ops/quant.py + models/gemma2.py):
int8 (or packed-int4 uint8) blocks dequantize to bf16 on-chip, matvecs
accumulate fp32 on the MXU,
norms/softmax in fp32, intermediate activations rounded to bf16 at the same
points as the XLA path. Sliding-window layers are identical to global ones
at serving lengths (S <= 4096), which the caller asserts.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

_BLOCK_BYTES = 2_700_000  # int8 bytes per streamed weight block; the
# pallas pipeline double-buffers every ref, so the kernel asks the compiler
# for a raised scoped-vmem limit (physical VMEM is far larger than the
# default 16 MB scope)


def _pick_bn(N: int, K: int, budget: int = _BLOCK_BYTES) -> int:
    """Largest divisor of N that is a multiple of 128 (or N itself) with
    bn*K <= budget."""
    cands = [d for d in range(N, 0, -1) if N % d == 0 and (d % 128 == 0 or d == N)]
    for d in cands:
        if d * K <= budget:
            return d
    return cands[-1]


def _weight_block_budget(M, Nkv, S, D, kv_quant, H, I, N0, Nq) -> int:
    """Per-block byte budget for the four streamed weight refs.

    The kernel's VMEM residents are (a) the k/v cache blocks
    (1, M, Nkv, S, D), double-buffered by the pipeline, (b) the f32
    scratch (residual stream + phase accumulators), and (c) the four
    weight refs x2 buffers. (a) scales with batch*cache-length: at
    B=16 x S=332 a bf16 cache plus 2.7 MB weight blocks overflowed the
    ~82 MB scoped-vmem stack by 0.5 MB (MEASURE_ROUND3 serve_16c_int8),
    so the weight budget yields to the cache instead of a fixed constant.
    Floor 512 KB: blocks below that waste the DMA pipeline; above ~60 MB
    total the Mosaic scoped-vmem stack overflows."""
    G = Nq // Nkv
    kv_bytes = 1 if kv_quant else 2
    cache_total = 2 * 2 * M * Nkv * S * D * kv_bytes  # k+v, double-buffered
    if kv_quant:
        cache_total += 2 * 2 * M * Nkv * S * 4  # per-slot f32 scales
    scratch_bytes = 4 * M * (4 * H + N0 + Nq * D + 3 * I)
    # batched-attention transients: the (M*G, M*S) f32 logits/exp/probs
    # triple lives across the softmax chain (the K/V operands are loads of
    # the already-budgeted pipeline cache block)
    attn_tmp = 3 * 4 * (M * G) * (M * S)
    left = (60 * 1024 * 1024 - cache_total - scratch_bytes - attn_tmp
            - 4 * 1024 * 1024)
    if left < 8 * 512 * 1024:
        raise ValueError(
            "fused decode step cannot fit VMEM: the KV-cache blocks alone "
            f"(batch={M}, cache_len={S}, {'int8' if kv_quant else 'bf16'} "
            f"cache = {cache_total / 2**20:.0f} MiB double-buffered) leave "
            "no room for the streamed weight blocks. Reduce the batch / "
            "cache length, or serve with kv_bits=8 (policy.quantize), or "
            "use the XLA decode path (use_fused_decode=False)."
        )
    return max(512 * 1024, min(_BLOCK_BYTES, left // 8))


def flatten_kv_scales(sc: jnp.ndarray) -> jnp.ndarray:
    """(L, M, Nkv, S) per-slot KV scales -> the kernel's pre-flattened
    (L, Nkv, 1, M*S) layout (column j of the batched attention's flattened
    key axis is cache slot (m = j // S, s = j % S)).

    Persistent callers (the split engine's serving state, the monolithic
    decode scan carry) should store scales in THIS layout and scatter new
    per-step scales into it directly — relayouting inside fused_decode_step
    made every decode step pay a full transpose+reshape of both scale
    tensors (~2*L*M*Nkv*S*4 bytes of extra HBM traffic, ~3% of the int8
    cache read at 4B/M=16)."""
    L, M, Nkv, S = sc.shape
    return sc.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(L, Nkv, 1, M * S)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * (1.0 + w.astype(jnp.float32))


def _rope(x, cos, sin):
    # half-rotation convention (models/rope.py); bf16 operands like the XLA
    # path, fp32 cos/sin source
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos + rot * sin


def _matvec_block(x_bf16, w_ref, s_ref):
    """(M, K) bf16 @ int8 block (bn, K) or packed-int4 uint8 block
    (bn, K//2) -> (M, bn) f32, scale applied.

    s_ref block: (1, 1, bn) per-channel, or (1, bn, G) for group-wise int4
    scales (ops/quant.py:quantize_int4 group_size).

    int4 nibbles are offset-binary (code + 8; column j packed with column
    j + K/2): unpack is widen + mask/shift + bf16 convert only. Per-channel
    the +8 bias factors out of the dot as 8 * sum(x); group-wise the dot is
    split into one partial dot PER GROUP on the raw codes with the scale
    applied to the (M, bn) partial — O(G*M*bn) scale work instead of
    dequantizing the whole (bn, K) block on the VPU (the block-dequant
    formulation measured 8x slower end-to-end on TPU: the elementwise
    multiply + lane-repeat over every weight element dominated the saved
    DMA — MEASURE_ROUND3.jsonl int4 11.76 vs 93.9 actions/sec). The bias
    becomes an (M, G) x (G, bn) matmul of group sums against scales."""
    w = w_ref[0]
    grouped = s_ref.shape[1] != 1  # (1, bn, G) vs (1, 1, bn)
    dims = (((1,), (1,)), ((), ()))
    if w.dtype == jnp.uint8:
        # two half-K dots instead of unpack-then-concat: saves the lane
        # concat copy over the (bn, K) block
        Kh = w.shape[-1]
        w32 = w.astype(jnp.int32)
        lo = (w32 & 15).astype(jnp.bfloat16)
        hi = (w32 >> 4).astype(jnp.bfloat16)
        if grouped:
            from .quant import grouped_int4_dot

            s = s_ref[0]  # (bn, G) — columns [0, Kh) map to groups [0, G/2)
            G = s.shape[-1]
            return grouped_int4_dot(
                x_bf16, lo, hi, s.astype(jnp.float32), G, (2 * Kh) // G
            )
        acc = jax.lax.dot_general(
            x_bf16[:, :Kh], lo, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            x_bf16[:, Kh:], hi, dims, preferred_element_type=jnp.float32
        )
        acc = acc - 8.0 * jnp.sum(
            x_bf16.astype(jnp.float32), axis=-1, keepdims=True
        )
    else:
        acc = jax.lax.dot_general(
            x_bf16, w.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
    return acc * s_ref[0, 0].astype(jnp.float32)[None, :]


def _decode_kernel(
    # inputs (VMEM blocks)
    pcols_ref,  # (1, M*S) int32: p[m] repeated S times (cache-valid bounds,
    # laid out along the flattened (m, s) key columns of the batched
    # attention — see _attention)
    x_ref,  # (M, H) f32 — sqrt(H)-scaled input embedding
    cos_ref, sin_ref,  # (M, D) f32 — per-row RoPE tables
    norm_in_ref, norm_pa_ref, norm_pf_ref, norm_pd_ref,  # (1, H)
    norm_final_ref,  # (1, H)
    qkv_qt_ref, qkv_s_ref,
    o_qt_ref, o_s_ref,
    gu_qt_ref, gu_s_ref,
    dn_qt_ref, dn_s_ref,
    kc_ref, vc_ref,  # (1, M, Nkv, S, D) bf16 (or int8 when kv_quant)
    ks_ref, vs_ref,  # (1, Nkv, 1, M*S) f32 per-slot scales, pre-flattened
    # host-side along the batched attention's (m, s) key columns (dummy
    # (1, Nkv, 1, 1) for the bf16 cache)
    # outputs
    h_out_ref,  # (M, H) f32 final-normed hidden
    knew_ref, vnew_ref,  # (1, M, Nkv, D) f32
    # scratch
    h_scr,  # (M, H) f32 residual stream
    xn_scr,  # (M, H) f32 normed input to qkv / gate_up (bf16-rounded)
    qkv_scr,  # (M, N0) f32
    attn_scr,  # (M, NqD) f32
    oacc_scr,  # (M, H) f32
    g_scr,  # (M, 2I) f32
    act_scr,  # (M, I) f32
    dacc_scr,  # (M, H) f32
    *,
    M, H, I, Nq, Nkv, D, S, L,
    bn0, bn1, bn2, bn3,
    B0, B1, B2, B3,
    eps, q_scale, attn_cap, kv_quant,
):
    l = pl.program_id(0)
    t = pl.program_id(1)
    G = Nq // Nkv
    NqD, NkvD = Nq * D, Nkv * D
    A = B0  # attention step
    O0 = B0 + 1
    G0 = O0 + B1
    D0 = G0 + B2
    T = D0 + B3

    @pl.when((l == 0) & (t == 0))
    def _init():
        h_scr[:] = x_ref[:]

    @pl.when(t == 0)
    def _input_norm():
        xn = _rms(h_scr[:], norm_in_ref[0, 0], eps)
        xn_scr[:] = xn.astype(jnp.bfloat16).astype(jnp.float32)

    @pl.when(t < B0)
    def _qkv():
        acc = _matvec_block(xn_scr[:].astype(jnp.bfloat16), qkv_qt_ref, qkv_s_ref)
        # bf16-round like the XLA serving kernels' bf16 outputs
        acc = acc.astype(jnp.bfloat16).astype(jnp.float32)
        qkv_scr[:, pl.ds(t * bn0, bn0)] = acc

    @pl.when(t == A)
    def _attention():
        # Batched across all M rows per kv head: each row attends only its
        # own cache, so the (M*G, M*S) logits are block-diagonal — the
        # off-diagonal blocks are computed redundantly by one large MXU dot
        # and masked to -1e30 (their softmax terms are exactly 0.0 in f32,
        # and the probability@V dot accumulates exact zeros), instead of
        # M*Nkv unrolled (G, S) matmuls whose per-iteration latency
        # dominated the phase (measured ~3.6 ms/step of non-DMA overhead at
        # M=16, S=332 — decode 7.71 ms/step vs a ~4.1 ms DMA floor).
        # Column j of the flattened key axis is cache slot (m' = j // S,
        # s = j % S); pcols_ref carries p[m'] per column, so the mask
        # (rowm == colm) & (s < p) needs no in-kernel gather.
        cos = cos_ref[:].astype(jnp.bfloat16).astype(jnp.float32)  # (M, D)
        sin = sin_ref[:].astype(jnp.bfloat16).astype(jnp.float32)
        qkv = qkv_scr[:]
        k_new_all = _rope(
            qkv[:, NqD : NqD + NkvD].reshape(M, Nkv, D)
            .astype(jnp.bfloat16).astype(jnp.float32),
            cos[:, None, :], sin[:, None, :],
        )  # (M, Nkv, D)
        v_new_all = qkv[:, NqD + NkvD :].reshape(M, Nkv, D)
        knew_ref[0] = k_new_all
        vnew_ref[0] = v_new_all
        q_all = (
            _rope(
                qkv[:, :NqD].reshape(M, Nq, D)
                .astype(jnp.bfloat16).astype(jnp.float32),
                cos[:, None, :], sin[:, None, :],
            )
            * q_scale
        )  # (M, Nq, D) f32
        pcols = pcols_ref[0]  # (M*S,) int32
        siota = jax.lax.broadcasted_iota(jnp.int32, (1, M * S), 1)
        colm = siota // S
        col_valid = (siota % S) < pcols[None, :]
        rowm = jax.lax.broadcasted_iota(jnp.int32, (M * G, 1), 0) // G
        for h in range(Nkv):  # static unroll: one batched dot per kv head
            q16 = (
                q_all[:, h * G : (h + 1) * G].astype(jnp.bfloat16)
                .reshape(M * G, D)
            )
            K = kc_ref[0, :, h]  # (M, S, D) bf16 / int8
            V = vc_ref[0, :, h]
            if kv_quant:  # int8 codes <= 127 are exact in bf16; widen
                # BEFORE the (M, S, D) -> (M*S, D) collapse — Mosaic's
                # vector-layout inference rejects the shape cast on the
                # 8-bit layout (the serve_16c_split_mixed on-chip compile
                # failure, MEASURE_ROUND4)
                K = K.astype(jnp.float32).astype(jnp.bfloat16)
                V = V.astype(jnp.float32).astype(jnp.bfloat16)
            K = K.reshape(M * S, D)
            V = V.reshape(M * S, D)
            logits = jax.lax.dot_general(
                q16, K, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (M*G, M*S)
            if kv_quant:  # per-slot scales fold into the logits row
                # (1, M*S) row comes pre-shaped from the host (the in-kernel
                # (M, S) -> (1, M*S) f32 collapse was the exact Mosaic
                # "unsupported shape cast" that killed the mixed config)
                logits = logits * ks_ref[0, h]
            k16 = k_new_all[:, h].astype(jnp.bfloat16)  # (M, D)
            self_logit = jnp.sum(
                q16.astype(jnp.float32).reshape(M, G, D)
                * k16.astype(jnp.float32)[:, None, :],
                axis=-1,
            ).reshape(M * G, 1)
            logits = jnp.tanh(logits / attn_cap) * attn_cap
            self_logit = jnp.tanh(self_logit / attn_cap) * attn_cap
            logits = jnp.where(
                (rowm == colm) & col_valid, logits, -1e30
            )
            mx = jnp.maximum(
                jnp.max(logits, axis=-1, keepdims=True), self_logit
            )
            e = jnp.exp(logits - mx)
            e_self = jnp.exp(self_logit - mx)
            denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
            probs = e / denom
            p16 = probs.astype(jnp.bfloat16)
            if kv_quant:  # per-slot V scales fold into the prob row
                pv = (probs * vs_ref[0, h]).astype(jnp.bfloat16)
            else:
                pv = p16
            out = jax.lax.dot_general(
                pv, V, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (M*G, D)
            out = out + (
                (e_self / denom).astype(jnp.bfloat16).astype(jnp.float32)
                * v_new_all[:, h].repeat(G, axis=0)
            )
            out16 = out.astype(jnp.bfloat16).astype(jnp.float32)
            attn_scr[:, pl.ds(h * G * D, G * D)] = out16.reshape(M, G * D)

    @pl.when((t >= O0) & (t < G0))
    def _o_proj():
        b = t - O0
        acc = _matvec_block(attn_scr[:].astype(jnp.bfloat16), o_qt_ref, o_s_ref)
        oacc_scr[:, pl.ds(b * bn1, bn1)] = acc.astype(jnp.bfloat16).astype(jnp.float32)

    @pl.when(t == G0 - 1)
    def _post_attn():
        upd = _rms(oacc_scr[:], norm_pa_ref[0, 0], eps).astype(jnp.bfloat16)
        h = (h_scr[:].astype(jnp.bfloat16) + upd).astype(jnp.float32)
        h_scr[:] = h
        xn = _rms(h, norm_pf_ref[0, 0], eps)
        xn_scr[:] = xn.astype(jnp.bfloat16).astype(jnp.float32)

    @pl.when((t >= G0) & (t < D0))
    def _gate_up():
        b = t - G0
        acc = _matvec_block(xn_scr[:].astype(jnp.bfloat16), gu_qt_ref, gu_s_ref)
        g_scr[:, pl.ds(b * bn2, bn2)] = acc.astype(jnp.bfloat16).astype(jnp.float32)

    @pl.when(t == D0 - 1)
    def _activate():
        gate = g_scr[:, :I].astype(jnp.bfloat16)
        up = g_scr[:, I:].astype(jnp.bfloat16)
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
            jnp.bfloat16
        ) * up
        act_scr[:] = act.astype(jnp.float32)

    @pl.when(t >= D0)
    def _down():
        b = t - D0
        acc = _matvec_block(act_scr[:].astype(jnp.bfloat16), dn_qt_ref, dn_s_ref)
        dacc_scr[:, pl.ds(b * bn3, bn3)] = acc.astype(jnp.bfloat16).astype(jnp.float32)

    @pl.when(t == T - 1)
    def _post_ffn():
        upd = _rms(dacc_scr[:], norm_pd_ref[0, 0], eps).astype(jnp.bfloat16)
        h = (h_scr[:].astype(jnp.bfloat16) + upd).astype(jnp.float32)
        h_scr[:] = h

        @pl.when(l == L - 1)
        def _final():
            out = _rms(h, norm_final_ref[0], eps).astype(jnp.bfloat16)
            h_out_ref[:] = out.astype(jnp.float32)


def fused_decode_step(
    lm_params: Params,  # fused-quantized serving tree (quantize_lm_params)
    cfg,  # Gemma2Config (hashable dataclass)
    x: jnp.ndarray,  # (M, H) bf16/f32 — embeddings * sqrt(H)
    cache_k: jnp.ndarray,  # (L, M, Nkv, S, D) bf16, valid slots [0, position)
    cache_v: jnp.ndarray,
    position: jnp.ndarray,  # int32 scalar or (M,) — slot the new token occupies
    rope_position: jnp.ndarray,  # int32 scalar or (M,) — RoPE position id
    *,
    cache_k_scale: jnp.ndarray = None,  # (L, M, Nkv, S) f32 — int8 cache only
    cache_v_scale: jnp.ndarray = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (hidden (M, H) bf16 final-normed, k_new, v_new
    (L, M, Nkv, D) bf16). Caller scatters k_new/v_new into the cache at
    `position`.

    `position`/`rope_position` may be per-row (M,) vectors: rows of a
    serving batch may sit at different sequence positions (mixed prompt
    lengths, right-padded prefill) — each row masks its own valid-cache
    interval [0, position[m]) and applies its own RoPE angle.

    int8 KV cache (opt-in, ops/quant.py:quantize_kv): pass int8
    `cache_k`/`cache_v` with per-slot `cache_*_scale` — halves the cache's
    share of decode HBM traffic (~1/3 of the step at batch 16); scales fold
    into the logits/probability rows so the MXU operands stay bf16. k_new/
    v_new are returned unquantized (bf16) — the caller quantizes before
    scattering so the kernel stays quantization-scheme-agnostic."""
    layers = lm_params["layers"]
    qkv, o = layers["attn"]["qkv"], layers["attn"]["o"]
    gu, dn = layers["mlp"]["gate_up"], layers["mlp"]["down"]
    L, M = cfg.num_layers, x.shape[0]
    H, I = cfg.hidden_size, cfg.intermediate_size
    Nq, Nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    S = cache_k.shape[3]
    N0 = Nq * D + 2 * Nkv * D
    kv_quant = cache_k.dtype == jnp.int8
    if kv_quant:
        assert cache_k_scale is not None and cache_v_scale is not None, (
            "int8 KV cache requires per-slot cache_k_scale/cache_v_scale"
        )
        # the kernel wants one (1, M*S) scale row per (layer, kv head),
        # matching the batched attention's flattened (m, s) key columns —
        # the in-kernel (M, S) -> (1, M*S) collapse is an unsupported
        # Mosaic shape cast (serve_16c_split_mixed failure). Persistent
        # callers pass the (L, Nkv, 1, M*S) layout directly (zero relayout
        # per step — see flatten_kv_scales); (L, M, Nkv, S) is accepted and
        # flattened here for one-shot callers.
        flat_shape = (L, Nkv, 1, M * S)
        if cache_k_scale.shape == flat_shape:
            ks_in = cache_k_scale.astype(jnp.float32)
            vs_in = cache_v_scale.astype(jnp.float32)
        else:
            assert cache_k_scale.shape == (L, M, Nkv, S), (
                f"cache_k_scale: expected {(L, M, Nkv, S)} or {flat_shape}, "
                f"got {cache_k_scale.shape}"
            )
            ks_in = flatten_kv_scales(cache_k_scale)
            vs_in = flatten_kv_scales(cache_v_scale)
    else:  # dummy refs; the kernel never reads them (static kv_quant flag)
        ks_in = vs_in = jnp.ones((L, Nkv, 1, 1), jnp.float32)
    Msc = M * S if kv_quant else 1
    assert S <= cfg.sliding_window, (
        "serving cache exceeds the sliding window; the fused decode step "
        "treats window and global layers identically"
    )

    # packed byte width of each weight's contraction dim (int8: K bytes/row,
    # int4: K/2) — drives both the VMEM block budget and the BlockSpecs
    Kb0, Kb1 = qkv["qt"].shape[-1], o["qt"].shape[-1]
    Kb2, Kb3 = gu["qt"].shape[-1], dn["qt"].shape[-1]
    budget = _weight_block_budget(M, Nkv, S, D, kv_quant, H, I, N0, Nq)
    bn0 = _pick_bn(N0, Kb0, budget)
    bn1 = _pick_bn(H, Kb1, budget)
    bn2 = _pick_bn(2 * I, Kb2, budget)
    bn3 = _pick_bn(H, Kb3, budget)
    B0, B1, B2, B3 = N0 // bn0, H // bn1, 2 * I // bn2, H // bn3
    T = B0 + 1 + B1 + B2 + B3

    position = jnp.broadcast_to(
        jnp.asarray(position, jnp.int32).reshape(-1), (M,)
    )
    rope_position = jnp.broadcast_to(
        jnp.asarray(rope_position, jnp.int32).reshape(-1), (M,)
    )

    # per-row rope tables for the current positions
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D)
    )
    freqs = rope_position.astype(jnp.float32)[:, None] * inv_freq[None]  # (M, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (M, D)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    f32 = lambda a: a.astype(jnp.float32)
    norms = layers

    kernel = functools.partial(
        _decode_kernel,
        M=M, H=H, I=I, Nq=Nq, Nkv=Nkv, D=D, S=S, L=L,
        bn0=bn0, bn1=bn1, bn2=bn2, bn3=bn3,
        B0=B0, B1=B1, B2=B2, B3=B3,
        eps=cfg.rms_norm_eps,
        q_scale=cfg.query_pre_attn_scalar**-0.5,
        attn_cap=cfg.attn_logit_softcap,
        kv_quant=kv_quant,
    )
    A, O0, G0, D0 = B0, B0 + 1, B0 + 1 + B1, B0 + 1 + B1 + B2

    const = lambda *blk: pl.BlockSpec(blk, lambda l, t: (0,) * len(blk))
    perlayer = lambda *blk: pl.BlockSpec(
        (1, 1) + blk, lambda l, t: (l, 0) + (0,) * len(blk)
    )

    def wspec(n_blocks, start, bn, K):
        return pl.BlockSpec(
            (1, bn, K),
            lambda l, t, s=start, nb=n_blocks: (
                l, jnp.clip(t - s, 0, nb - 1), 0
            ),
        )

    def sspec(n_blocks, start, bn, scale):
        if scale.ndim == 3:  # grouped (L, N, G): rows follow the weight block
            G = scale.shape[-1]
            return pl.BlockSpec(
                (1, bn, G),
                lambda l, t, s=start, nb=n_blocks: (l, jnp.clip(t - s, 0, nb - 1), 0),
            )
        return pl.BlockSpec(
            (1, 1, bn),
            lambda l, t, s=start, nb=n_blocks: (l, 0, jnp.clip(t - s, 0, nb - 1)),
        )

    def sop(scale):
        return f32(scale) if scale.ndim == 3 else f32(scale)[:, None]

    out = pl.pallas_call(
        kernel,
        grid=(L, T),
        in_specs=[
            const(1, M * S),  # pcols: p[m] per flattened (m, s) key column
            const(M, H),  # x
            const(M, D), const(M, D),  # cos, sin (per row)
            perlayer(H), perlayer(H), perlayer(H), perlayer(H),  # layer norms
            const(1, H),  # final norm
            wspec(B0, 0, bn0, Kb0), sspec(B0, 0, bn0, qkv["scale"]),
            wspec(B1, O0, bn1, Kb1), sspec(B1, O0, bn1, o["scale"]),
            wspec(B2, G0, bn2, Kb2), sspec(B2, G0, bn2, gu["scale"]),
            wspec(B3, D0, bn3, Kb3), sspec(B3, D0, bn3, dn["scale"]),
            pl.BlockSpec((1, M, Nkv, S, D), lambda l, t: (l, 0, 0, 0, 0)),
            pl.BlockSpec((1, M, Nkv, S, D), lambda l, t: (l, 0, 0, 0, 0)),
            pl.BlockSpec((1, Nkv, 1, Msc), lambda l, t: (l, 0, 0, 0)),
            pl.BlockSpec((1, Nkv, 1, Msc), lambda l, t: (l, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((M, H), lambda l, t: (0, 0)),
            pl.BlockSpec((1, M, Nkv, D), lambda l, t: (l, 0, 0, 0)),
            pl.BlockSpec((1, M, Nkv, D), lambda l, t: (l, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, H), jnp.float32),
            jax.ShapeDtypeStruct((L, M, Nkv, D), jnp.float32),
            jax.ShapeDtypeStruct((L, M, Nkv, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, H), jnp.float32),
            pltpu.VMEM((M, H), jnp.float32),
            pltpu.VMEM((M, N0), jnp.float32),
            pltpu.VMEM((M, Nq * D), jnp.float32),
            pltpu.VMEM((M, H), jnp.float32),
            pltpu.VMEM((M, 2 * I), jnp.float32),
            pltpu.VMEM((M, I), jnp.float32),
            pltpu.VMEM((M, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        jnp.repeat(position, S).reshape(1, M * S),
        f32(x),
        cos, sin,
        f32(norms["input_norm"])[:, None], f32(norms["post_attn_norm"])[:, None],
        f32(norms["pre_ffn_norm"])[:, None], f32(norms["post_ffn_norm"])[:, None],
        f32(lm_params["final_norm"]).reshape(1, H),
        qkv["qt"], sop(qkv["scale"]),
        o["qt"], sop(o["scale"]),
        gu["qt"], sop(gu["scale"]),
        dn["qt"], sop(dn["scale"]),
        cache_k, cache_v,
        ks_in, vs_in,
    )
    hidden, k_new, v_new = out
    new_dtype = jnp.bfloat16 if kv_quant else cache_k.dtype
    return (
        hidden.astype(jnp.bfloat16),
        k_new.astype(new_dtype),
        v_new.astype(new_dtype),
    )
