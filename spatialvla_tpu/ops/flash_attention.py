"""Fused flash attention for TPU (Pallas/Mosaic).

The TPU-native replacement for the reference's flash-attn CUDA kernels
(model/modeling_gemma2.py:198-241) with the Gemma2 specifics the stock
kernels lack bundled in:

  - tanh logit soft-capping (cap * tanh(x / cap)) applied pre-mask
    (modeling_gemma2.py:182-185 / flash-attn >= 2.6 softcap param);
  - grouped-query attention: kv heads are indexed as q_head // group, no
    repeat_kv materialization;
  - sliding-window masking from absolute positions (only *past* tokens
    beyond the window are dropped — modeling_gemma2.py:461-473);
  - prefix-LM masks: every query may attend to keys < prefix_len;
    causal afterwards; keys >= valid_len (right padding) are masked.

Online-softmax tiling: queries are blocked on the grid; each block streams
kv tiles with running (max, sum, acc) fp32 statistics in VMEM scratch, so
the T x T score matrix never exists in HBM.

Backward: fused FlashAttention-2-style Pallas kernels (dq kernel + dk/dv
kernel) recomputing block probabilities from the saved log-sum-exp, with
the tanh-softcap chain rule (ds_raw = ds_capped * (1 - tanh^2)) and the
same dead-block skipping as the forward. The XLA reference VJP remains the
CPU fallback and the parity oracle.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attention_reference(q, k, v, prefix_lens, valid_lens, q_offset, *,
                         scale, logit_softcap, window, causal):
    """XLA reference with identical mask semantics (used for the VJP and as
    the fallback/parity oracle)."""
    B, Tq, Nq, D = q.shape
    Tk = k.shape[1]
    g = Nq // k.shape[2]
    qg = q.reshape(B, Tq, k.shape[2], g, D)
    logits = jnp.einsum("btngd,bsnd->bngts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap
    q_pos = q_offset[:, None] + jnp.arange(Tq)[None, :]  # (B, Tq)
    k_pos = jnp.arange(Tk)[None, :]  # (1, Tk)
    mask = k_pos[:, None, :] < valid_lens[:, None, None]  # (B, Tq, Tk)
    if causal:
        allowed = k_pos[:, None, :] <= q_pos[:, :, None]
        if prefix_lens is not None:
            allowed |= k_pos[:, None, :] < prefix_lens[:, None, None]
        mask &= allowed
    if window is not None:
        mask &= (q_pos[:, :, None] - k_pos[:, None, :]) < window
    logits = jnp.where(mask[:, None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bngts,bsnd->btngd", probs, v)
    return out.reshape(B, Tq, Nq, D)


def _fa_kernel(
    # scalar prefetch
    prefix_ref, valid_ref, qoff_ref,
    # inputs
    q_ref, k_ref, v_ref,
    # outputs
    o_ref, lse_ref,
    # scratch
    m_ref, l_ref, acc_ref,
    *,
    scale: float,
    logit_softcap: Optional[float],
    window: Optional[int],
    causal: bool,
    block_q: int,
    block_k: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # skip compute on fully-masked kv blocks (beyond causal+prefix reach,
    # older than the sliding window, or entirely in the right padding) —
    # at T=2048 causal skipping halves the attention FLOPs
    q_start = qoff_ref[b] + qi * block_q
    k_start = ki * block_k
    k_end = k_start + block_k - 1
    dead = k_start >= valid_ref[b]
    if causal:
        dead |= (k_start > q_start + block_q - 1) & (k_start >= prefix_ref[b])
    if window is not None:
        dead |= (q_start - k_end) >= window

    @pl.when(jnp.logical_not(dead))
    def _compute():
        # dots run in the INPUT dtype with fp32 accumulation: bf16 operands
        # hit the fast MXU path in training; fp32 inputs (parity tests)
        # stay exact
        q = q_ref[0, 0]  # (block_q, D)
        k = k_ref[0, 0]  # (block_k, D)
        v = v_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k)
        if logit_softcap is not None:
            s = jnp.tanh(s / logit_softcap) * logit_softcap

        q_pos = (
            qoff_ref[b]
            + qi * block_q
            + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        )
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = k_pos < valid_ref[b]
        if causal:
            allowed = k_pos <= q_pos
            allowed |= k_pos < prefix_ref[b]
            mask &= allowed
        if window is not None:
            mask &= (q_pos - k_pos) < window
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:]  # (block_q, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = correction * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(ki == num_k - 1)
    def _finish():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> 0 output
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)
        # log-sum-exp residual for the fused backward; fully-masked rows
        # get an arbitrary finite value (their p recomputes to exp(-1e30-x)=0)
        m = m_ref[:]
        lse_ref[0, 0] = jnp.where(
            jnp.isfinite(m), m + jnp.log(l), 0.0
        )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11)
)
def flash_attention(
    q: jnp.ndarray,  # (B, Tq, Nq, D)
    k: jnp.ndarray,  # (B, Tk, Nkv, D)
    v: jnp.ndarray,
    prefix_lens: jnp.ndarray,  # (B,) int32; 0 -> pure causal
    valid_lens: jnp.ndarray,  # (B,) int32 right-pad boundary
    q_offset: jnp.ndarray,  # (B,) int32 absolute position of q[0]
    scale: float = 1.0,
    logit_softcap: Optional[float] = None,
    window: Optional[int] = None,
    causal: bool = True,
    block_q: int = 128,
    block_k: int = 128,
) -> jnp.ndarray:
    return _flash_attention_impl(
        q, k, v, prefix_lens, valid_lens, q_offset, scale, logit_softcap,
        window, causal, block_q, block_k,
    )


def _flash_attention_impl(
    q, k, v, prefix_lens, valid_lens, q_offset, scale, logit_softcap,
    window, causal, block_q, block_k, interpret: Optional[bool] = None,
    with_lse: bool = False,
):
    if interpret is None:  # Mosaic has no CPU backend; interpret there
        interpret = jax.devices()[0].platform == "cpu"
    B, Tq, Nq, D = q.shape
    Tk, Nkv = k.shape[1], k.shape[2]
    g = Nq // Nkv
    block_q = min(block_q, Tq)
    block_k = min(block_k, Tk)
    if Tq % block_q or Tk % block_k:
        # pad to block multiples (valid_lens masks the padding keys)
        pad_q = (-Tq) % block_q
        pad_k = (-Tk) % block_k
        qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        out = _flash_attention_impl(
            qp, kp, vp, prefix_lens, valid_lens, q_offset, scale,
            logit_softcap, window, causal, block_q, block_k, interpret,
            with_lse,
        )
        if with_lse:
            return out[0][:, :Tq], out[1][:, :, :Tq]
        return out[:, :Tq]

    # layout: (B, N, T, D) per-head blocks
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (B, Nq, Tq // block_q, Tk // block_k)

    kernel = functools.partial(
        _fa_kernel,
        scale=scale,
        logit_softcap=logit_softcap,
        window=window,
        causal=causal,
        block_q=block_q,
        block_k=block_k,

    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, D), lambda b, h, qi, ki, *_: (b, h // g, ki, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, D), lambda b, h, qi, ki, *_: (b, h // g, ki, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_q, 1), lambda b, h, qi, ki, *_: (b, h, qi, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Nq, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Nq, Tq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        prefix_lens.astype(jnp.int32),
        valid_lens.astype(jnp.int32),
        q_offset.astype(jnp.int32),
        qt, kt, vt,
    )
    if with_lse:
        return out.transpose(0, 2, 1, 3), lse
    return out.transpose(0, 2, 1, 3)


def _fa_fwd(q, k, v, prefix_lens, valid_lens, q_offset, scale, logit_softcap,
            window, causal, block_q, block_k):
    out, lse = _flash_attention_impl(
        q, k, v, prefix_lens, valid_lens, q_offset, scale, logit_softcap,
        window, causal, block_q, block_k, with_lse=True,
    )
    return out, (q, k, v, out, lse, prefix_lens, valid_lens, q_offset)


# ---------------------------------------------------------------------------
# fused backward (FlashAttention-2 style)
# ---------------------------------------------------------------------------

def _block_mask_and_p(
    s_raw, lse_blk, b, qi, ki, prefix_ref, valid_ref, qoff_ref,
    *, scale, logit_softcap, window, causal, block_q, block_k,
):
    """Recompute masked, softcapped probabilities for one (q, k) block and
    the softcap derivative factor. Returns (p, dcap) with p fp32."""
    s = s_raw * scale
    if logit_softcap is not None:
        s = jnp.tanh(s / logit_softcap) * logit_softcap
        dcap = 1.0 - (s / logit_softcap) ** 2  # 1 - tanh^2
    else:
        dcap = None
    q_pos = (
        qoff_ref[b] + qi * block_q
        + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    )
    k_pos = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    mask = k_pos < valid_ref[b]
    if causal:
        allowed = k_pos <= q_pos
        allowed |= k_pos < prefix_ref[b]
        mask &= allowed
    if window is not None:
        mask &= (q_pos - k_pos) < window
    s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - lse_blk)  # (block_q, block_k); masked -> exp(-1e30-x)=0
    return p, dcap


def _dead_block(b, qi, ki, prefix_ref, valid_ref, qoff_ref, *,
                window, causal, block_q, block_k):
    q_start = qoff_ref[b] + qi * block_q
    k_start = ki * block_k
    k_end = k_start + block_k - 1
    dead = k_start >= valid_ref[b]
    if causal:
        dead |= (k_start > q_start + block_q - 1) & (k_start >= prefix_ref[b])
    if window is not None:
        dead |= (q_start - k_end) >= window
    return dead


def _fa_bwd_dq_kernel(
    prefix_ref, valid_ref, qoff_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    acc_ref,
    *, scale, logit_softcap, window, causal, block_q, block_k,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dead = _dead_block(b, qi, ki, prefix_ref, valid_ref, qoff_ref,
                       window=window, causal=causal,
                       block_q=block_q, block_k=block_k)

    @pl.when(jnp.logical_not(dead))
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        s_raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p, dcap = _block_mask_and_p(
            s_raw, lse_ref[0, 0], b, qi, ki, prefix_ref, valid_ref, qoff_ref,
            scale=scale, logit_softcap=logit_softcap, window=window,
            causal=causal, block_q=block_q, block_k=block_k,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        ds = p * (dp - delta_ref[0, 0])
        if dcap is not None:
            ds = ds * dcap
        acc_ref[:] += scale * jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == num_k - 1)
    def _finish():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _fa_bwd_dkv_kernel(
    prefix_ref, valid_ref, qoff_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, logit_softcap, window, causal, block_q, block_k,
):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    num_q = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    dead = _dead_block(b, qi, ki, prefix_ref, valid_ref, qoff_ref,
                       window=window, causal=causal,
                       block_q=block_q, block_k=block_k)

    @pl.when(jnp.logical_not(dead))
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        s_raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p, dcap = _block_mask_and_p(
            s_raw, lse_ref[0, 0], b, qi, ki, prefix_ref, valid_ref, qoff_ref,
            scale=scale, logit_softcap=logit_softcap, window=window,
            causal=causal, block_q=block_q, block_k=block_k,
        )
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # p^T @ do -> (bk, D)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_ref[0, 0])
        if dcap is not None:
            ds = ds * dcap
        dk_acc[:] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # ds^T @ q -> (bk, D)

    @pl.when(qi == num_q - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_attention_bwd_impl(
    q, k, v, out, lse, do, prefix_lens, valid_lens, q_offset,
    scale, logit_softcap, window, causal, block_q, block_k,
    interpret: Optional[bool] = None,
):
    if interpret is None:  # Mosaic has no CPU backend; interpret there
        interpret = jax.devices()[0].platform == "cpu"
    B, Tq, Nq, D = q.shape
    Tk, Nkv = k.shape[1], k.shape[2]
    g = Nq // Nkv
    block_q = min(block_q, Tq)
    block_k = min(block_k, Tk)
    if Tq % block_q or Tk % block_k:
        pad_q = (-Tq) % block_q
        pad_k = (-Tk) % block_k
        pq = ((0, 0), (0, pad_q), (0, 0), (0, 0))
        pk = ((0, 0), (0, pad_k), (0, 0), (0, 0))
        dq, dk, dv = _flash_attention_bwd_impl(
            jnp.pad(q, pq), jnp.pad(k, pk), jnp.pad(v, pk),
            jnp.pad(out, pq), jnp.pad(lse, ((0, 0), (0, 0), (0, pad_q), (0, 0))),
            jnp.pad(do, pq), prefix_lens, valid_lens, q_offset,
            scale, logit_softcap, window, causal, block_q, block_k, interpret,
        )
        return dq[:, :Tq], dk[:, :Tk], dv[:, :Tk]

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = do.transpose(0, 2, 1, 3)
    # delta_i = rowsum(dO_i * O_i) (cheap XLA elementwise)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)[..., None]  # (B, Nq, Tq, 1)

    args = (
        prefix_lens.astype(jnp.int32),
        valid_lens.astype(jnp.int32),
        q_offset.astype(jnp.int32),
    )
    kw = dict(
        scale=scale, logit_softcap=logit_softcap, window=window,
        causal=causal, block_q=block_q, block_k=block_k,
    )
    qspec = lambda: pl.BlockSpec(
        (1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)
    )
    kvspec = lambda: pl.BlockSpec(
        (1, 1, block_k, D), lambda b, h, qi, ki, *_: (b, h // g, ki, 0)
    )
    lspec = lambda: pl.BlockSpec(
        (1, 1, block_q, 1), lambda b, h, qi, ki, *_: (b, h, qi, 0)
    )
    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, Nq, Tq // block_q, Tk // block_k),
            in_specs=[qspec(), kvspec(), kvspec(), qspec(), lspec(), lspec()],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)
            ),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Nq, Tq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args, qt, kt, vt, dot, lse, delta)

    # dk/dv per q-head (kv blocks on the 3rd grid dim, accumulate over q)
    qspec2 = lambda: pl.BlockSpec(
        (1, 1, block_q, D), lambda b, h, ki, qi, *_: (b, h, qi, 0)
    )
    kvspec2 = lambda: pl.BlockSpec(
        (1, 1, block_k, D), lambda b, h, ki, qi, *_: (b, h // g, ki, 0)
    )
    lspec2 = lambda: pl.BlockSpec(
        (1, 1, block_q, 1), lambda b, h, ki, qi, *_: (b, h, qi, 0)
    )
    okv = lambda: pl.BlockSpec(
        (1, 1, block_k, D), lambda b, h, ki, qi, *_: (b, h, ki, 0)
    )

    dkh, dvh = pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, Nq, Tk // block_k, Tq // block_q),
            in_specs=[qspec2(), kvspec2(), kvspec2(), qspec2(), lspec2(), lspec2()],
            out_specs=[okv(), okv()],
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Nq, Tk, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Nq, Tk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args, qt, kt, vt, dot, lse, delta)

    # reduce the q-head groups onto their kv head
    dk = dkh.reshape(B, Nkv, g, Tk, D).sum(axis=2).transpose(0, 2, 1, 3)
    dv = dvh.reshape(B, Nkv, g, Tk, D).sum(axis=2).transpose(0, 2, 1, 3)
    return (
        dq.transpose(0, 2, 1, 3),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
    )


def _fa_bwd(scale, logit_softcap, window, causal, block_q, block_k, res, g_out):
    q, k, v, out, lse, prefix_lens, valid_lens, q_offset = res
    if jax.devices()[0].platform == "cpu":
        # XLA reference VJP (CPU fallback / oracle)
        f = lambda q, k, v: _attention_reference(
            q, k, v, prefix_lens, valid_lens, q_offset,
            scale=scale, logit_softcap=logit_softcap, window=window,
            causal=causal,
        )
        _, vjp = jax.vjp(f, q, k, v)
        dq, dk, dv = vjp(g_out)
        return dq, dk, dv, None, None, None
    dq, dk, dv = _flash_attention_bwd_impl(
        q, k, v, out, lse, g_out, prefix_lens, valid_lens, q_offset,
        scale, logit_softcap, window, causal, block_q, block_k,
    )
    return dq, dk, dv, None, None, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)
