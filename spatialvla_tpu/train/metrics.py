"""On-device training metrics.

The reference computes action-token accuracies and a continuous L1 inside a
patched compute_loss with a host sync (.cpu().numpy(),
train/monkey_patch.py:222-326). Here everything stays on device: token
accuracies are masked reductions, and the continuous L1 uses precomputed
bin-center lookup tables (id -> decoded action component) so no host
round-trip happens in the step loop.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..action import SpatialActionTokenizer

Array = jnp.ndarray


def build_decode_luts(tok: SpatialActionTokenizer) -> Dict[str, np.ndarray]:
    """Dense id -> continuous-action lookup tables for device-side L1."""
    t_ids = np.arange(tok.translation.vocab_size)
    r_ids = np.arange(tok.rotation.vocab_size)
    g_ids = np.arange(tok.gripper.vocab_size)
    return {
        "translation": tok.translation.decode(t_ids).astype(np.float32),  # (Nt, 3)
        "rotation": tok.rotation.decode(r_ids).astype(np.float32),  # (Nr, 3)
        "gripper": tok.gripper.decode(g_ids).astype(np.float32),  # (Ng, 1)
    }


def _range_accuracy(preds, targets, valid, lo, hi):
    in_range = valid & (targets >= lo) & (targets < hi)
    correct = in_range & (preds == targets)
    n = jnp.maximum(in_range.sum(), 1)
    return correct.sum() / n, in_range


def action_metrics(
    logits: Array,  # (B, T, V)
    labels: Array,  # (B, T), -100 ignored
    attention_mask: Array,  # (B, T)
    *,
    begin_idx: int,
    n_translation: int = 4096,
    n_rotation: int = 4096,
    n_gripper: int = 2,
    luts: Optional[Dict[str, Array]] = None,
) -> Dict[str, Array]:
    """Next-token accuracies restricted to the action-token id ranges, plus
    continuous L1 between decoded predicted and target actions."""
    preds = jnp.argmax(logits[:, :-1], axis=-1)
    targets = labels[:, 1:]
    valid = (targets != -100) & (attention_mask[:, 1:] != 0)

    t0, t1 = begin_idx, begin_idx + n_translation
    r1 = t1 + n_rotation
    g1 = r1 + n_gripper

    acc_all, in_action = _range_accuracy(preds, targets, valid, t0, g1)
    acc_t, in_t = _range_accuracy(preds, targets, valid, t0, t1)
    acc_r, in_r = _range_accuracy(preds, targets, valid, t1, r1)
    acc_g, in_g = _range_accuracy(preds, targets, valid, r1, g1)

    out = {
        "accuracy": acc_all,
        "translation_accuracy": acc_t,
        "rotation_accuracy": acc_r,
        "gripper_accuracy": acc_g,
    }

    if luts is not None:
        def group_l1(lut, in_range, lo, n):
            p = jnp.clip(preds - lo, 0, n - 1)
            t = jnp.clip(targets - lo, 0, n - 1)
            d = jnp.abs(lut[p] - lut[t]).sum(-1)  # (B, T-1)
            return jnp.where(in_range, d, 0.0).sum()

        total = (
            group_l1(luts["translation"], in_t, t0, n_translation)
            + group_l1(luts["rotation"], in_r, t1, n_rotation)
            + group_l1(luts["gripper"], in_g, r1, n_gripper)
        )
        n_steps = jnp.maximum(in_t.sum(), 1)  # one triplet per action step
        out["l1_loss"] = total / (7 * n_steps)
    return out
