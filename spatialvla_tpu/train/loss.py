"""Memory-efficient (sequence-chunked) cross-entropy + action metrics.

The 265k-token vocabulary makes full-sequence logits the training memory
bottleneck (B x T x V fp32 ≈ 2.2 GB per sample at T=2048). The reference
materializes them (modeling_spatialvla.py:416); on TPU we instead scan the
sequence in chunks: each chunk projects hidden -> logits, reduces to
(loss-sum, argmax, count) accumulators, and is rematerialized in backward
(jax.checkpoint), so peak logits memory is B x chunk x V.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Gemma2Config
from ..models.layers import softcap
from ..ops.quant import qmatmul

Array = jnp.ndarray


def chunked_loss_and_metrics(
    lm_params: Dict,
    cfg: Gemma2Config,
    hidden: Array,  # (B, T, H) final-normed decoder output
    labels: Array,  # (B, T)
    attention_mask: Array,  # (B, T)
    *,
    begin_idx: int,
    luts: Optional[Dict[str, Array]] = None,
    chunk_size: int = 256,
    ignore_index: int = -100,
    n_translation: int = 4096,
    n_rotation: int = 4096,
    n_gripper: int = 2,
) -> Tuple[Array, Dict[str, Array]]:
    B, T, H = hidden.shape
    head = lm_params["lm_head"] if "lm_head" in lm_params else lm_params["embed"].T

    # shift: logits at position t predict labels[t + 1]
    shift_hidden = hidden[:, :-1]
    shift_labels = labels[:, 1:]
    shift_attn = attention_mask[:, 1:]
    S = T - 1
    pad = (-S) % chunk_size
    if pad:
        shift_hidden = jnp.pad(shift_hidden, ((0, 0), (0, pad), (0, 0)))
        shift_labels = jnp.pad(shift_labels, ((0, 0), (0, pad)), constant_values=ignore_index)
        shift_attn = jnp.pad(shift_attn, ((0, 0), (0, pad)))
    n_chunks = shift_hidden.shape[1] // chunk_size

    hs = shift_hidden.reshape(B, n_chunks, chunk_size, H).transpose(1, 0, 2, 3)
    ls = shift_labels.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)
    ms = shift_attn.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)

    def chunk_stats(h, lab, msk):
        logits = qmatmul(h, head).astype(jnp.float32)
        logits = softcap(logits, cfg.final_logit_softcap)
        valid = (lab != ignore_index) & (msk != 0)
        safe = jnp.where(valid, lab, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss_sum = jnp.where(valid, nll, 0.0).sum()
        count = valid.sum()
        preds = jnp.argmax(logits, axis=-1)
        return loss_sum, count, preds, valid

    chunk_stats = jax.checkpoint(chunk_stats, prevent_cse=False)

    def body(carry, xs):
        loss_sum, count = carry
        h, lab, msk = xs
        ls_, c_, preds, valid = chunk_stats(h, lab, msk)
        return (loss_sum + ls_, count + c_), (preds, valid)

    (loss_sum, count), (preds, valid) = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (hs, ls, ms)
    )
    loss = loss_sum / jnp.maximum(count, 1)

    # metrics from the accumulated predictions (n_chunks, B, C) -> (B, S)
    preds = preds.transpose(1, 0, 2).reshape(B, -1)[:, :S]
    valid = valid.transpose(1, 0, 2).reshape(B, -1)[:, :S]
    targets = labels[:, 1:]

    t0, t1 = begin_idx, begin_idx + n_translation
    r1 = t1 + n_rotation
    g1 = r1 + n_gripper

    def range_acc(lo, hi):
        in_range = valid & (targets >= lo) & (targets < hi)
        correct = in_range & (preds == targets)
        return correct.sum() / jnp.maximum(in_range.sum(), 1), in_range

    acc_all, _ = range_acc(t0, g1)
    acc_t, in_t = range_acc(t0, t1)
    acc_r, in_r = range_acc(t1, r1)
    acc_g, in_g = range_acc(r1, g1)
    metrics = {
        "loss": loss,
        "accuracy": acc_all,
        "translation_accuracy": acc_t,
        "rotation_accuracy": acc_r,
        "gripper_accuracy": acc_g,
    }
    if luts is not None:
        def group_l1(lut, in_range, lo, n):
            p = jnp.clip(preds - lo, 0, n - 1)
            t = jnp.clip(targets - lo, 0, n - 1)
            d = jnp.abs(lut[p] - lut[t]).sum(-1)
            return jnp.where(in_range, d, 0.0).sum()

        total = (
            group_l1(luts["translation"], in_t, t0, n_translation)
            + group_l1(luts["rotation"], in_r, t1, n_rotation)
            + group_l1(luts["gripper"], in_g, r1, n_gripper)
        )
        metrics["l1_loss"] = total / (7 * jnp.maximum(in_t.sum(), 1))
    return loss, metrics
