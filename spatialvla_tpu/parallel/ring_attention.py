"""Ring-attention sequence parallelism over an ``sp`` mesh axis.

The reference has no sequence/context parallelism (SURVEY §5.7: sequences
are <=2048; its only long-context machinery is Gemma2's alternating sliding
window). This is the documented TPU-native stretch: shard the sequence over
an ICI mesh axis and rotate K/V shards around the ring with
``lax.ppermute`` while each device's Q stays resident, merging the
per-shard online-softmax partials via their log-sum-exp. The Pallas flash
kernel (ops/flash_attention.py) is reused unchanged: every per-shard call
runs in the visiting shard's key frame by shifting ``q_offset`` /
``prefix_lens`` / ``valid_lens`` by the shard's global key start.

Backward is the standard ring: dK/dV accumulators travel with their K/V
shard (arriving home after n rotations), dQ accumulates locally; per-shard
grads come from the fused FlashAttention-2 backward kernels recomputing
block probabilities from the *merged* LSE.

Collectives ride the ``sp`` axis (ICI when the mesh is laid out on a
physical ring); wall-clock overlap of ppermute with compute is left to XLA
latency hiding.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_attention import (
    _flash_attention_bwd_impl,
    _flash_attention_impl,
)

try:
    from jax import shard_map  # jax >= 0.4.35
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


# ---------------------------------------------------------------------------
# partial merging
# ---------------------------------------------------------------------------


def _valid_rows(q_pos, prefix, valid, window, causal, k_start, k_len):
    """(B, Tq) bool: does q row have ANY attendable key in the global key
    interval [k_start, k_start + k_len)? Needed because the kernel emits a
    *finite* LSE (0.0) for fully-masked rows (flash_attention.py:158-162),
    which must not enter the ring merge."""
    qp = q_pos[None, :]  # (1, Tq)
    if causal:
        hi = jnp.maximum(prefix[:, None], qp + 1)  # exclusive upper bound
        hi = jnp.minimum(hi, valid[:, None])
    else:
        hi = jnp.broadcast_to(valid[:, None], (valid.shape[0], qp.shape[1]))
    if window is not None:
        lo = jnp.maximum(qp - (window - 1), 0)
    else:
        lo = jnp.zeros_like(qp)
    lo = jnp.maximum(lo, k_start)
    hi = jnp.minimum(hi, k_start + k_len)
    return lo < hi


def _merge(out_a, lse_a, out_b, lse_b, valid_b):
    """Merge two normalized attention partials by their LSEs.
    out (B, Tq, Nq, D) f32; lse (B, Nq, Tq, 1) f32; valid_b (B, Tq)."""
    lse_b = jnp.where(valid_b[:, None, :, None], lse_b, -jnp.inf)
    m = jnp.maximum(lse_a, lse_b)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    wa = jnp.exp(lse_a - m_safe)  # exp(-inf) = 0 for absent partials
    wb = jnp.exp(lse_b - m_safe)
    den = wa + wb
    lse = jnp.where(
        den > 0.0, m_safe + jnp.log(jnp.where(den > 0.0, den, 1.0)), -jnp.inf
    )
    den_safe = jnp.where(den == 0.0, 1.0, den)
    to_btn1 = lambda w: jnp.swapaxes(w[..., 0], 1, 2)[..., None]  # (B,Tq,Nq,1)
    out = (out_a * to_btn1(wa) + out_b * to_btn1(wb)) / to_btn1(den_safe)
    return out, lse


# ---------------------------------------------------------------------------
# per-shard (inside shard_map) forward/backward
# ---------------------------------------------------------------------------


def _ring_fwd(q, k, v, prefix, valid, n, axis_name, scale, logit_softcap,
              window, causal, block_q, block_k, interpret):
    idx = lax.axis_index(axis_name)
    B, Tq, Nq, D = q.shape
    Tk = k.shape[1]
    q_off = jnp.full((B,), idx * Tq, jnp.int32)
    q_pos = (idx * Tq + jnp.arange(Tq)).astype(jnp.int32)
    perm = [(j, (j + 1) % n) for j in range(n)]

    out = jnp.zeros((B, Tq, Nq, D), jnp.float32)
    lse = jnp.full((B, Nq, Tq, 1), -jnp.inf, jnp.float32)

    # unrolled over the (static, small) ring size so the final discarded
    # K/V rotation is skipped — fori_loop would issue n ppermutes for n-1
    # needed
    k_blk, v_blk = k, v
    for i in range(n):
        src = (idx - i) % n  # ring position the visiting shard came from
        k_start = (src * Tk).astype(jnp.int32)
        o_i, lse_i = _flash_attention_impl(
            q, k_blk, v_blk, prefix - k_start, valid - k_start,
            q_off - k_start, scale, logit_softcap, window, causal,
            block_q, block_k, interpret, with_lse=True,
        )
        vr = _valid_rows(q_pos, prefix, valid, window, causal, k_start, Tk)
        out, lse = _merge(out, lse, o_i.astype(jnp.float32), lse_i, vr)
        if i + 1 < n:
            k_blk = lax.ppermute(k_blk, axis_name, perm)
            v_blk = lax.ppermute(v_blk, axis_name, perm)
    # rows with no valid key anywhere: match the kernel's finite-LSE
    # convention so the backward recompute stays NaN-free
    lse = jnp.where(jnp.isfinite(lse), lse, 0.0)
    return out.astype(q.dtype), lse


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13)
)
def _ring_local(q, k, v, prefix, valid, n, axis_name, scale, logit_softcap,
                window, causal, block_q, block_k, interpret):
    out, _ = _ring_fwd(q, k, v, prefix, valid, n, axis_name, scale,
                       logit_softcap, window, causal, block_q, block_k,
                       interpret)
    return out


def _ring_fwd_rule(q, k, v, prefix, valid, n, axis_name, scale,
                   logit_softcap, window, causal, block_q, block_k, interpret):
    out, lse = _ring_fwd(q, k, v, prefix, valid, n, axis_name, scale,
                         logit_softcap, window, causal, block_q, block_k,
                         interpret)
    return out, (q, k, v, prefix, valid, out, lse)


def _ring_bwd_rule(n, axis_name, scale, logit_softcap, window, causal,
                   block_q, block_k, interpret, res, do):
    q, k, v, prefix, valid, out, lse = res
    idx = lax.axis_index(axis_name)
    B, Tq = q.shape[:2]
    Tk = k.shape[1]
    q_off = jnp.full((B,), idx * Tq, jnp.int32)
    perm = [(j, (j + 1) % n) for j in range(n)]

    k_blk, v_blk = k, v
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)
    dq = jnp.zeros(q.shape, jnp.float32)
    for i in range(n):
        src = (idx - i) % n
        k_start = (src * Tk).astype(jnp.int32)
        dq_i, dk_i, dv_i = _flash_attention_bwd_impl(
            q, k_blk, v_blk, out, lse, do, prefix - k_start,
            valid - k_start, q_off - k_start, scale, logit_softcap, window,
            causal, block_q, block_k, interpret,
        )
        dq = dq + dq_i.astype(jnp.float32)
        # dK/dV accumulators rotate WITH their K/V shard: after n rotations
        # each accumulated shard is back on its home device (the K/V blocks
        # themselves only need the first n-1 rotations)
        dk = lax.ppermute(dk + dk_i.astype(jnp.float32), axis_name, perm)
        dv = lax.ppermute(dv + dv_i.astype(jnp.float32), axis_name, perm)
        if i + 1 < n:
            k_blk = lax.ppermute(k_blk, axis_name, perm)
            v_blk = lax.ppermute(v_blk, axis_name, perm)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None, None


_ring_local.defvjp(_ring_fwd_rule, _ring_bwd_rule)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def ring_flash_attention(
    q: jnp.ndarray,  # (B, T, Nq, D) — T sharded over `axis_name`
    k: jnp.ndarray,  # (B, T, Nkv, D)
    v: jnp.ndarray,
    prefix_lens: jnp.ndarray,  # (B,) int32 global prefix-LM boundary; 0 = causal
    valid_lens: jnp.ndarray,  # (B,) int32 global right-pad boundary
    *,
    mesh: Mesh,
    axis_name: str = "sp",
    scale: float = 1.0,
    logit_softcap: Optional[float] = None,
    window: Optional[int] = None,
    causal: bool = True,
    block_q: int = 128,
    block_k: int = 128,
    interpret: Optional[bool] = None,
    batch_axes: tuple = (),
) -> jnp.ndarray:
    """Sequence-parallel flash attention: q/k/v sequence dim sharded over
    ``mesh.shape[axis_name]`` devices, output sharded the same way.
    Differentiable (fused ring backward). Global positions are the
    concatenation order of the shards; ``prefix_lens``/``valid_lens`` are
    global and replicated.

    ``batch_axes`` optionally shards the batch dim over further mesh axes
    (e.g. ("data", "fsdp")) so SP composes with DP/FSDP instead of
    all-gathering the batch at the shard_map boundary; the ring ppermutes
    only ever ride ``axis_name``."""
    n = mesh.shape[axis_name]
    assert q.shape[1] % n == 0 and k.shape[1] % n == 0, (
        f"sequence {q.shape[1]} not divisible by sp={n}"
    )
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    local = functools.partial(
        _ring_local, n=n, axis_name=axis_name, scale=scale,
        logit_softcap=logit_softcap, window=window, causal=causal,
        block_q=min(block_q, q.shape[1] // n), block_k=min(block_k, k.shape[1] // n),
        interpret=interpret,
    )
    b_ax = tuple(a for a in batch_axes if a in mesh.shape) or None
    seq = P(b_ax, axis_name, None, None)
    kw = dict(
        mesh=mesh, in_specs=(seq, seq, seq, P(b_ax), P(b_ax)), out_specs=seq
    )
    try:  # replication checking off (manual collectives): arg renamed across jax versions
        fn = shard_map(lambda q, k, v, p, vl: local(q, k, v, p, vl),
                       check_vma=False, **kw)
    except TypeError:  # pragma: no cover
        fn = shard_map(lambda q, k, v, p, vl: local(q, k, v, p, vl),
                       check_rep=False, **kw)
    return fn(q, k, v, prefix_lens.astype(jnp.int32), valid_lens.astype(jnp.int32))
