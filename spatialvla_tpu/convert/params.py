"""HF-layout state dict -> spatialvla_tpu parameter pytrees.

Works on any Mapping[str, np.ndarray] (torch state_dict tensors converted
via .numpy(), or safetensors numpy loads), so the converter has no hard
torch dependency. Torch Linear weights are (out, in) and are transposed to
our (in, out) layout; per-layer tensors are stacked along a leading layer
axis to match the scanned-layer parameterization.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import numpy as np
import jax.numpy as jnp

from ..config import Gemma2Config, SiglipVisionConfig, SpatialVLAConfig


def _t(x) -> np.ndarray:
    return np.asarray(x).T


def _stack(sd: Mapping, fmt: str, L: int, transpose=True) -> jnp.ndarray:
    arrs = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
    if transpose:
        arrs = [a.T for a in arrs]
    return jnp.asarray(np.stack(arrs))


def gemma2_from_state_dict(
    sd: Mapping[str, Any], cfg: Gemma2Config, prefix: str = "", dtype=None
) -> Dict[str, Any]:
    """Map an HF Gemma2ForCausalLM state dict (keys like
    ``model.layers.0.self_attn.q_proj.weight``) to our pytree."""
    p = prefix
    L = cfg.num_layers
    params = {
        "embed": jnp.asarray(np.asarray(sd[f"{p}model.embed_tokens.weight"])),
        "layers": {
            "attn": {
                "q": _stack(sd, f"{p}model.layers.{{}}.self_attn.q_proj.weight", L),
                "k": _stack(sd, f"{p}model.layers.{{}}.self_attn.k_proj.weight", L),
                "v": _stack(sd, f"{p}model.layers.{{}}.self_attn.v_proj.weight", L),
                "o": _stack(sd, f"{p}model.layers.{{}}.self_attn.o_proj.weight", L),
            },
            "mlp": {
                "gate": _stack(sd, f"{p}model.layers.{{}}.mlp.gate_proj.weight", L),
                "up": _stack(sd, f"{p}model.layers.{{}}.mlp.up_proj.weight", L),
                "down": _stack(sd, f"{p}model.layers.{{}}.mlp.down_proj.weight", L),
            },
            "input_norm": _stack(sd, f"{p}model.layers.{{}}.input_layernorm.weight", L, transpose=False),
            "post_attn_norm": _stack(sd, f"{p}model.layers.{{}}.post_attention_layernorm.weight", L, transpose=False),
            "pre_ffn_norm": _stack(sd, f"{p}model.layers.{{}}.pre_feedforward_layernorm.weight", L, transpose=False),
            "post_ffn_norm": _stack(sd, f"{p}model.layers.{{}}.post_feedforward_layernorm.weight", L, transpose=False),
        },
        "final_norm": jnp.asarray(np.asarray(sd[f"{p}model.norm.weight"])),
    }
    if f"{p}lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(_t(sd[f"{p}lm_head.weight"]))
    elif not cfg.tie_lm_head:
        # tied checkpoint but untied config: clone the embedding
        params["lm_head"] = params["embed"].T
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    return params


def siglip_from_state_dict(
    sd: Mapping[str, Any], cfg: SiglipVisionConfig, prefix: str = "", dtype=None
) -> Dict[str, Any]:
    """Map an HF SiglipVisionModel state dict (keys like
    ``vision_model.encoder.layers.0.self_attn.q_proj.weight``)."""
    p = prefix
    L = cfg.num_layers

    def stack_wb(fmt: str, transpose=True):
        w = _stack(sd, fmt + ".weight", L, transpose=transpose)
        b = _stack(sd, fmt + ".bias", L, transpose=False)
        return {"w": w, "b": b}

    def ln(fmt: str):
        return {
            "scale": _stack(sd, fmt + ".weight", L, transpose=False),
            "bias": _stack(sd, fmt + ".bias", L, transpose=False),
        }

    # conv patch embed: torch conv weight (H, 3, P, P) -> (P, P, 3, H) HWIO
    conv_w = np.asarray(sd[f"{p}vision_model.embeddings.patch_embedding.weight"])
    conv_w = conv_w.transpose(2, 3, 1, 0)
    params = {
        "patch_embed": {
            "w": jnp.asarray(conv_w),
            "b": jnp.asarray(np.asarray(sd[f"{p}vision_model.embeddings.patch_embedding.bias"])),
        },
        "pos_embed": jnp.asarray(
            np.asarray(sd[f"{p}vision_model.embeddings.position_embedding.weight"])
        ),
        "layers": {
            "attn": {
                "q": stack_wb(f"{p}vision_model.encoder.layers.{{}}.self_attn.q_proj"),
                "k": stack_wb(f"{p}vision_model.encoder.layers.{{}}.self_attn.k_proj"),
                "v": stack_wb(f"{p}vision_model.encoder.layers.{{}}.self_attn.v_proj"),
                "o": stack_wb(f"{p}vision_model.encoder.layers.{{}}.self_attn.out_proj"),
            },
            "ln1": ln(f"{p}vision_model.encoder.layers.{{}}.layer_norm1"),
            "ln2": ln(f"{p}vision_model.encoder.layers.{{}}.layer_norm2"),
            "mlp": {
                "fc1": stack_wb(f"{p}vision_model.encoder.layers.{{}}.mlp.fc1"),
                "fc2": stack_wb(f"{p}vision_model.encoder.layers.{{}}.mlp.fc2"),
            },
        },
        "post_ln": {
            "scale": jnp.asarray(np.asarray(sd[f"{p}vision_model.post_layernorm.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{p}vision_model.post_layernorm.bias"])),
        },
    }
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    return params


def ego3d_from_state_dict(sd: Mapping[str, Any], prefix: str = "", dtype=None):
    """Ego3DPositionEmbeddingMLP: Sequential(Linear, LayerNorm, ReLU, Linear)
    under ``position_embedding_head.{0,1,3}`` (modeling_spatialvla.py:59-64)."""
    p = prefix
    params = {
        "fc1": {
            "w": jnp.asarray(_t(sd[f"{p}position_embedding_head.0.weight"])),
            "b": jnp.asarray(np.asarray(sd[f"{p}position_embedding_head.0.bias"])),
        },
        "ln": {
            "scale": jnp.asarray(np.asarray(sd[f"{p}position_embedding_head.1.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{p}position_embedding_head.1.bias"])),
        },
        "fc2": {
            "w": jnp.asarray(_t(sd[f"{p}position_embedding_head.3.weight"])),
            "b": jnp.asarray(np.asarray(sd[f"{p}position_embedding_head.3.bias"])),
        },
    }
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    return params


def spatialvla_from_state_dict(
    sd: Mapping[str, Any], cfg: SpatialVLAConfig, dtype=None
) -> Dict[str, Any]:
    """Map a SpatialVLAForConditionalGeneration state dict to the fusion
    pytree (vision_tower / projector / ego3d / language_model /
    spatial_embed / [zoe])."""
    params = {
        "vision": siglip_from_state_dict(sd, cfg.vision, prefix="vision_tower.", dtype=dtype),
        "projector": {
            "w": jnp.asarray(_t(sd["multi_modal_projector.linear.weight"])),
            "b": jnp.asarray(np.asarray(sd["multi_modal_projector.linear.bias"])),
        },
        "lm": gemma2_from_state_dict(sd, cfg.text, prefix="language_model.", dtype=dtype),
    }
    if cfg.use_spatial_token:
        params["spatial_embed"] = jnp.asarray(np.asarray(sd["spatial_embed_tokens.weight"]))
    if cfg.use_vision_zoe and any(k.startswith("position_embedding_3d.") for k in sd):
        params["ego3d"] = ego3d_from_state_dict(sd, prefix="position_embedding_3d.", dtype=dtype)
    if cfg.use_vision_zoe and any(k.startswith("vision_zoe_model.") for k in sd):
        from .zoe import zoe_from_state_dict

        params["zoe"] = zoe_from_state_dict(sd, cfg.zoe, prefix="vision_zoe_model.", dtype=dtype)
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    return params
