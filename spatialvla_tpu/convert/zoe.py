"""HF ZoeDepthForDepthEstimation state dict -> spatialvla_tpu zoe pytree.

Layout conversions: torch Conv2d (O, I, kH, kW) -> HWIO; ConvTranspose2d
(I, O, kH, kW) -> (kH, kW, O, I); Linear (O, I) -> (I, O); per-layer
tensors stacked along the scan axis.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import numpy as np
import jax.numpy as jnp

from ..config import ZoeDepthConfig


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)  # HWIO
    out = {"w": jnp.asarray(w)}
    if f"{name}.bias" in sd:
        out["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _convT(sd, name):
    w = np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)  # (kH,kW,O,I)
    return {
        "w": jnp.asarray(w),
        "b": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
    }


def _lin(sd, name, bias=True):
    out = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T)}
    if bias and f"{name}.bias" in sd:
        out["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _ln(sd, name):
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
    }


def _stack(items):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)


def zoe_from_state_dict(
    sd: Mapping[str, Any], cfg: ZoeDepthConfig, prefix: str = "", dtype=None
) -> Dict[str, Any]:
    p = prefix
    L = cfg.num_layers

    # backbone
    layers = []
    for i in range(L):
        b = f"{p}backbone.encoder.layer.{i}"
        layers.append({
            "ln1": _ln(sd, f"{b}.layernorm_before"),
            "ln2": _ln(sd, f"{b}.layernorm_after"),
            "q": _lin(sd, f"{b}.attention.attention.query"),
            "k": _lin(sd, f"{b}.attention.attention.key", bias=False),
            "v": _lin(sd, f"{b}.attention.attention.value"),
            "proj": _lin(sd, f"{b}.attention.output.dense"),
            "rel_pos_table": jnp.asarray(np.asarray(
                sd[f"{b}.attention.attention.relative_position_bias.relative_position_bias_table"])),
            "lambda1": jnp.asarray(np.asarray(sd[f"{b}.lambda_1"])),
            "lambda2": jnp.asarray(np.asarray(sd[f"{b}.lambda_2"])),
            "fc1": _lin(sd, f"{b}.intermediate.dense"),
            "fc2": _lin(sd, f"{b}.output.dense"),
        })
    backbone = {
        "patch_embed": _conv(sd, f"{p}backbone.embeddings.patch_embeddings.projection"),
        "cls_token": jnp.asarray(np.asarray(sd[f"{p}backbone.embeddings.cls_token"])),
        "layers": _stack(layers),
    }

    # neck
    reassemble = []
    from ..models.zoe import REASSEMBLE_FACTORS

    for i, factor in enumerate(REASSEMBLE_FACTORS):
        entry = {
            "readout": _lin(sd, f"{p}neck.reassemble_stage.readout_projects.{i}.0"),
            "projection": _conv(sd, f"{p}neck.reassemble_stage.layers.{i}.projection"),
        }
        if factor > 1:
            entry["resize"] = _convT(sd, f"{p}neck.reassemble_stage.layers.{i}.resize")
        elif factor < 1:
            entry["resize"] = _conv(sd, f"{p}neck.reassemble_stage.layers.{i}.resize")
        reassemble.append(entry)

    def residual(name):
        return {
            "conv1": _conv(sd, f"{name}.convolution1"),
            "conv2": _conv(sd, f"{name}.convolution2"),
        }

    fusion = [
        {
            "projection": _conv(sd, f"{p}neck.fusion_stage.layers.{i}.projection"),
            "res1": residual(f"{p}neck.fusion_stage.layers.{i}.residual_layer1"),
            "res2": residual(f"{p}neck.fusion_stage.layers.{i}.residual_layer2"),
        }
        for i in range(4)
    ]
    neck = {
        "reassemble": reassemble,
        "convs": [_conv(sd, f"{p}neck.convs.{i}") for i in range(4)],
        "fusion": fusion,
    }

    relative_head = {
        "conv1": _conv(sd, f"{p}relative_head.conv1"),
        "conv2": _conv(sd, f"{p}relative_head.conv2"),
        "conv3": _conv(sd, f"{p}relative_head.conv3"),
    }

    # metric head
    pt_layers = []
    for i in range(cfg.num_patch_transformer_layers):
        b = f"{p}metric_head.patch_transformer.transformer_encoder.{i}"
        pt_layers.append({
            "q": _lin(sd, f"{b}.self_attn.query"),
            "k": _lin(sd, f"{b}.self_attn.key"),
            "v": _lin(sd, f"{b}.self_attn.value"),
            "out": _lin(sd, f"{b}.self_attn.out_proj"),
            "fc1": _lin(sd, f"{b}.linear1"),
            "fc2": _lin(sd, f"{b}.linear2"),
            "ln1": _ln(sd, f"{b}.norm1"),
            "ln2": _ln(sd, f"{b}.norm2"),
        })

    def projector(name):
        return {"conv1": _conv(sd, f"{name}.conv1"), "conv2": _conv(sd, f"{name}.conv2")}

    experts = {}
    for name in ("nyu", "kitti"):
        experts[name] = {
            "seed_bin_regressor": projector(f"{p}metric_head.seed_bin_regressors.{name}"),
            "attractors": [
                projector(f"{p}metric_head.attractors.{name}.{i}") for i in range(4)
            ],
            "log_binomial": {
                "conv1": _conv(sd, f"{p}metric_head.conditional_log_binomial.{name}.mlp.0"),
                "conv2": _conv(sd, f"{p}metric_head.conditional_log_binomial.{name}.mlp.2"),
            },
        }

    metric_head = {
        "conv2": _conv(sd, f"{p}metric_head.conv2"),
        "patch_transformer": {
            "embed_conv": _conv(sd, f"{p}metric_head.patch_transformer.embedding_convPxP"),
            "layers": _stack(pt_layers),
        },
        "mlp_classifier": {
            "fc1": _lin(sd, f"{p}metric_head.mlp_classifier.linear1"),
            "fc2": _lin(sd, f"{p}metric_head.mlp_classifier.linear2"),
        },
        "seed_projector": projector(f"{p}metric_head.seed_projector"),
        "projectors": [projector(f"{p}metric_head.projectors.{i}") for i in range(4)],
        "experts": experts,
    }

    params = {
        "backbone": backbone,
        "neck": neck,
        "relative_head": relative_head,
        "metric_head": metric_head,
    }
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    return params
