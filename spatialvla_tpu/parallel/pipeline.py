"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (its 4B model fits one GPU with
ZeRO-1 — scripts/zero1.json — so SURVEY §2.2 marks PP "not required for
parity"); this is beyond-parity TPU infrastructure for scaling the decoder
depth-wise across chips whose HBM cannot hold a stage-replicated model, or
across slow inter-slice links where tensor parallelism's per-layer
collectives do not amortize.

TPU-first design: the layer stack is split into ``S = mesh.shape["pipe"]``
contiguous stages whose parameters are sharded over the pipe axis (each
device holds only its own stage's weights — depth-wise model sharding).
Activations flow stage-to-stage with ``lax.ppermute`` (one ICI hop on a
ring-ordered axis) in the standard GPipe microbatch schedule: the global
batch splits into ``m`` microbatches, tick ``t`` has stage ``s`` computing
microbatch ``t - s``, so the pipeline drains in ``m + S - 1`` ticks with an
``(S-1)/(m+S-1)`` bubble. Everything lives inside ONE ``lax.scan`` under
``shard_map`` — a single compiled program, reverse-differentiable (the
transpose of ``ppermute`` is the reverse rotation, so the backward pass is
automatically the reverse-order pipeline).

Composition: the microbatch batch dim may additionally be sharded over
``batch_axes`` (DP/FSDP axes) — PP x DP. Weight-dim sharding inside a stage
(ZeRO-3/TP *within* shard_map) is out of scope; stages hold their weights
replicated across the data axes, which matches the reference's practical
regime (ZeRO-1 gathers full weights per step anyway).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.4.35
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
    stage_params: Any,  # pytree, leading dim S on every leaf
    x: jnp.ndarray,  # (B, T, H) activations entering stage 0
    aux: Any,  # pytree of per-example arrays, leading dim B (not pipelined)
    *,
    mesh,
    n_microbatches: int,
    axis_name: str = "pipe",
    batch_axes: tuple = (),
) -> jnp.ndarray:
    """Run ``x`` through ``S`` pipelined stages; returns the (B, T, H)
    output of the last stage, replicated over the pipe axis.

    ``stage_fn(params_s, x_mb, aux_mb) -> y_mb`` applies ONE stage to one
    microbatch and must preserve the activation shape. ``aux`` (positions,
    lengths, ...) is replicated over the pipe axis and indexed locally —
    at tick ``t`` stage ``s`` works on microbatch ``t - s``, a schedule
    every device can compute itself, so only the activations ride the ring.
    """
    S = mesh.shape[axis_name]
    m = n_microbatches
    B = x.shape[0]
    assert B % m == 0, f"batch {B} not divisible by {m} microbatches"
    b = B // m
    b_prod = int(np.prod([mesh.shape[a] for a in batch_axes if a in mesh.shape]))
    assert b % max(b_prod, 1) == 0, (
        f"microbatch size {b} (= {B} / {m} microbatches) not divisible by "
        f"the composed batch axes {batch_axes} of total size {b_prod}"
    )
    xm = x.reshape((m, b) + x.shape[1:])
    auxm = jax.tree_util.tree_map(
        lambda a: a.reshape((m, b) + a.shape[1:]), aux
    )

    b_ax = tuple(a for a in batch_axes if a in mesh.shape) or None

    def spec_for(arr, leading):
        return P(leading, b_ax, *([None] * (arr.ndim - 2)))

    param_specs = jax.tree_util.tree_map(
        lambda p: P(axis_name, *([None] * (p.ndim - 1))), stage_params
    )
    x_spec = spec_for(xm, None)
    aux_specs = jax.tree_util.tree_map(lambda a: spec_for(a, None), auxm)

    def body(params_local, xm_local, auxm_local):
        sp = jax.tree_util.tree_map(lambda p: p[0], params_local)  # my stage
        my = lax.axis_index(axis_name)
        is_last = (my == S - 1)

        def tick(carry, t):
            h, outs = carry
            # this stage's microbatch at tick t (clipped during the bubble;
            # bubble outputs are masked out of `outs` below)
            idx = jnp.clip(t - my, 0, m - 1)
            active = (t >= my) & (t - my < m)
            aux_t = jax.tree_util.tree_map(
                lambda a: lax.dynamic_index_in_dim(a, idx, 0, keepdims=False),
                auxm_local,
            )
            # stage 0 pulls from the microbatch queue; others consume the
            # activation their predecessor sent last tick
            x_in = jnp.where(
                my == 0,
                lax.dynamic_index_in_dim(xm_local, idx, 0, keepdims=False),
                h,
            )
            # bubble ticks (t < my, or past the last microbatch) skip the
            # stage compute entirely — cond executes one branch, so the
            # (S-1)/(m+S-1) bubble costs DMA/sync only, not FLOPs
            y = lax.cond(
                active,
                lambda x: stage_fn(sp, x, aux_t),
                lambda x: x,
                x_in,
            )
            # last stage banks its (valid) result for microbatch idx
            prev = lax.dynamic_index_in_dim(outs, idx, 0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(active & is_last, y, prev), idx, 0
            )
            # hand off to the next stage (the S-1 -> 0 wrap is ignored:
            # stage 0 always reads from the queue instead)
            h_next = lax.ppermute(
                y, axis_name, [(i, (i + 1) % S) for i in range(S)]
            )
            return (h_next, outs), None

        h0 = jnp.zeros_like(xm_local[0])
        outs0 = jnp.zeros_like(xm_local)
        (_, outs), _ = lax.scan(tick, (h0, outs0), jnp.arange(m + S - 1))
        # only the last stage holds real outputs; replicate over the ring
        return lax.psum(jnp.where(is_last, outs, 0.0), axis_name)

    kw = dict(
        mesh=mesh,
        in_specs=(param_specs, x_spec, aux_specs),
        out_specs=x_spec,
    )
    try:  # replication checking off (manual collectives); arg renamed across jax versions
        fn = shard_map(body, check_vma=False, **kw)
    except TypeError:  # pragma: no cover
        fn = shard_map(body, check_rep=False, **kw)
    out = fn(stage_params, xm, auxm)
    return out.reshape((B,) + out.shape[2:])
