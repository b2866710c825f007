"""Offline test of the reference-format HF checkpoint loader: fabricate a
tiny checkpoint dir (safetensors + reference config.json + processor json),
load through SpatialVLAPolicy.from_hf_checkpoint, run predict end-to-end."""
import json

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
safetensors = pytest.importorskip("safetensors")

from spatialvla_tpu.config import spatialvla_tiny

CFG = spatialvla_tiny(use_vision_zoe=False)


def _build_reference_style_checkpoint(directory):
    """Compose vision/text/projector/ego3d/spatial tensors with the
    reference module prefixes (modeling_spatialvla.py attribute names)."""
    from safetensors.numpy import save_file

    torch.manual_seed(0)
    sd = {}

    vis_cfg = transformers.SiglipVisionConfig(
        hidden_size=CFG.vision.hidden_size,
        intermediate_size=CFG.vision.intermediate_size,
        num_hidden_layers=CFG.vision.num_layers,
        num_attention_heads=CFG.vision.num_heads,
        patch_size=CFG.vision.patch_size,
        image_size=CFG.vision.image_size,
        vision_use_head=False,
    )
    vis = transformers.SiglipVisionModel(vis_cfg).eval()
    for k, v in vis.state_dict().items():
        sd[f"vision_tower.{k}"] = v.numpy()

    txt_cfg = transformers.Gemma2Config(
        vocab_size=CFG.text.vocab_size,
        hidden_size=CFG.text.hidden_size,
        intermediate_size=CFG.text.intermediate_size,
        num_hidden_layers=CFG.text.num_layers,
        num_attention_heads=CFG.text.num_heads,
        num_key_value_heads=CFG.text.num_kv_heads,
        head_dim=CFG.text.head_dim,
        sliding_window=CFG.text.sliding_window,
        query_pre_attn_scalar=CFG.text.query_pre_attn_scalar,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    lm = transformers.Gemma2ForCausalLM(txt_cfg).eval()
    for k, v in lm.state_dict().items():
        sd[f"language_model.{k}"] = v.numpy()
    if "language_model.lm_head.weight" not in sd:
        sd["language_model.lm_head.weight"] = sd["language_model.model.embed_tokens.weight"]

    rng = np.random.RandomState(0)
    sd["multi_modal_projector.linear.weight"] = (
        rng.randn(CFG.text.hidden_size, CFG.vision.hidden_size).astype(np.float32) * 0.02
    )
    sd["multi_modal_projector.linear.bias"] = np.zeros(CFG.text.hidden_size, np.float32)
    sd["spatial_embed_tokens.weight"] = (
        rng.randn(CFG.spatial_token_num, CFG.text.hidden_size).astype(np.float32) * 0.02
    )
    F = CFG.ego3d.freq_out_channels
    H = CFG.ego3d.num_pos_feats
    sd["position_embedding_3d.position_embedding_head.0.weight"] = rng.randn(H, F).astype(np.float32) * 0.01
    sd["position_embedding_3d.position_embedding_head.0.bias"] = np.zeros(H, np.float32)
    sd["position_embedding_3d.position_embedding_head.1.weight"] = np.ones(H, np.float32)
    sd["position_embedding_3d.position_embedding_head.1.bias"] = np.zeros(H, np.float32)
    sd["position_embedding_3d.position_embedding_head.3.weight"] = rng.randn(H, H).astype(np.float32) * 0.01
    sd["position_embedding_3d.position_embedding_head.3.bias"] = np.zeros(H, np.float32)

    save_file(sd, str(directory / "model.safetensors"))

    config = {
        "model_type": "spatialvla",
        "vision_config": {
            "hidden_size": CFG.vision.hidden_size,
            "intermediate_size": CFG.vision.intermediate_size,
            "num_hidden_layers": CFG.vision.num_layers,
            "num_attention_heads": CFG.vision.num_heads,
            "patch_size": CFG.vision.patch_size,
            "image_size": CFG.vision.image_size,
            "projection_dim": CFG.text.hidden_size,
        },
        "text_config": {
            "vocab_size": CFG.text.vocab_size,
            "hidden_size": CFG.text.hidden_size,
            "intermediate_size": CFG.text.intermediate_size,
            "num_hidden_layers": CFG.text.num_layers,
            "num_attention_heads": CFG.text.num_heads,
            "num_key_value_heads": CFG.text.num_kv_heads,
            "head_dim": CFG.text.head_dim,
            "sliding_window": CFG.text.sliding_window,
            "query_pre_attn_scalar": CFG.text.query_pre_attn_scalar,
            "attn_logit_softcapping": 50.0,
            "final_logit_softcapping": 30.0,
        },
        "image_token_index": CFG.image_token_index,
        "spatial_token_num": CFG.spatial_token_num,
        "action_token_begin_idx": CFG.action_token_begin_idx,
        "use_spatial_token": True,
        "use_vision_zoe": False,
        "ego3d_patch_reso": CFG.ego3d.patch_reso,
        "n_freqs": CFG.ego3d.n_freqs,
    }
    (directory / "config.json").write_text(json.dumps(config))

    processor = {
        "statistics": {
            "bridge_orig/1.0.0": {
                "action": {
                    "q01": [-0.1] * 6 + [0.0],
                    "q99": [0.1] * 6 + [1.0],
                    "mask": [True] * 6 + [False],
                }
            }
        },
        "action_config": {
            "num_bins": {
                "translation": {"theta_bins": 16, "phi_bins": 32, "r_bins": 8},
                "rotation": {"roll_bins": 16, "pitch_bins": 16, "yaw_bins": 16},
                "gripper": 2,
            },
            "use_spherical": True,
        },
        "intrinsic_config": {
            "default": {
                "intrinsic": [[623.0, 0, 319.5], [0, 623.0, 239.5], [0, 0, 1]],
                "width": 640,
                "height": 480,
            }
        },
        "bin_policy": None,
        "num_obs_steps": 1,
        "obs_delta": 1,
        "action_chunk_size": 4,
        "min_sigma": 0.0,
    }
    (directory / "processor_config.json").write_text(json.dumps(processor))


def test_policy_from_hf_checkpoint(tmp_path):
    _build_reference_style_checkpoint(tmp_path)

    from spatialvla_tpu.inference import SpatialVLAPolicy

    policy = SpatialVLAPolicy.from_hf_checkpoint(str(tmp_path), param_dtype=None)
    assert policy.config.text.vocab_size == CFG.text.vocab_size
    assert policy.processor.action_chunk_size == 4

    rng = np.random.RandomState(1)
    image = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    out = policy.predict(image, "pick up the block", unnorm_key="bridge_orig/1.0.0")
    assert out["actions"].shape == (4, 7)
    assert np.isfinite(out["actions"]).all()
    # unnormalized translation within the stats box (masked dims)
    assert (np.abs(out["actions"][:, :6]) <= 0.1 + 1e-9).all()

    # determinism
    out2 = policy.predict(image, "pick up the block", unnorm_key="bridge_orig/1.0.0")
    np.testing.assert_array_equal(out["action_ids"], out2["action_ids"])


def test_loaded_params_match_submodule_parity(tmp_path):
    """The loaded vision tower reproduces HF SiglipVisionModel outputs."""
    _build_reference_style_checkpoint(tmp_path)
    from spatialvla_tpu.convert.hf_checkpoint import load_hf_checkpoint
    from spatialvla_tpu.models import siglip

    params, config, _ = load_hf_checkpoint(str(tmp_path))
    sd = {}
    from safetensors.numpy import load_file

    sd = load_file(str(tmp_path / "model.safetensors"))
    # rebuild the HF vision model from the saved tensors
    vis_cfg = transformers.SiglipVisionConfig(
        hidden_size=CFG.vision.hidden_size,
        intermediate_size=CFG.vision.intermediate_size,
        num_hidden_layers=CFG.vision.num_layers,
        num_attention_heads=CFG.vision.num_heads,
        patch_size=CFG.vision.patch_size,
        image_size=CFG.vision.image_size,
        vision_use_head=False,
        attn_implementation="eager",
    )
    vis = transformers.SiglipVisionModel(vis_cfg).eval()
    vis.load_state_dict(
        {k[len("vision_tower."):]: torch.tensor(v) for k, v in sd.items()
         if k.startswith("vision_tower.")}
    )
    rng = np.random.RandomState(2)
    imgs = rng.randn(1, 3, CFG.vision.image_size, CFG.vision.image_size).astype(np.float32)
    with torch.no_grad():
        ref = vis(pixel_values=torch.tensor(imgs)).last_hidden_state.numpy()
    import jax.numpy as jnp

    got = siglip.forward(params["vision"], config.vision, jnp.asarray(imgs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-4)


def test_policy_quantize(tmp_path):
    _build_reference_style_checkpoint(tmp_path)
    from spatialvla_tpu.inference import SpatialVLAPolicy

    rng = np.random.RandomState(3)
    image = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    policy = SpatialVLAPolicy.from_hf_checkpoint(str(tmp_path), param_dtype=None)
    out_fp = policy.predict(image, "pick", unnorm_key="bridge_orig/1.0.0")
    policy.quantize()
    out_q8 = policy.predict(image, "pick", unnorm_key="bridge_orig/1.0.0")
    assert out_q8["actions"].shape == out_fp["actions"].shape
    assert np.isfinite(out_q8["actions"]).all()


def test_lazy_safetensors_dict_matches_eager(tmp_path):
    """The streaming loader (LazySafetensorsDict) must be a drop-in
    Mapping: same keys, per-tensor loads identical to the eager dict, no
    tensor materialized by key iteration/containment, and the converted
    pytree identical through spatialvla_from_state_dict."""
    from spatialvla_tpu.convert.hf_checkpoint import (
        config_from_hf,
        lazy_safetensors_dir,
        load_safetensors_dir,
    )
    from spatialvla_tpu.convert.params import spatialvla_from_state_dict

    _build_reference_style_checkpoint(tmp_path)
    eager = load_safetensors_dir(str(tmp_path))
    lazy = lazy_safetensors_dir(str(tmp_path))
    assert set(lazy) == set(eager) and len(lazy) == len(eager)
    some_key = next(iter(eager))
    assert some_key in lazy  # Mapping __contains__ resolves without loading
    assert "definitely/not/a/key" not in lazy
    for k in eager:
        np.testing.assert_array_equal(np.asarray(lazy[k]), np.asarray(eager[k]))

    with open(tmp_path / "config.json") as f:
        cfg = config_from_hf(json.load(f))
    p_eager = spatialvla_from_state_dict(eager, cfg)
    p_lazy = spatialvla_from_state_dict(lazy, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_eager, p_lazy,
    )
