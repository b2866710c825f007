"""Fusion golden parity WITH the ZoeDepth tower: the full reference torch
model (SigLIP + ZoeDepth + Ego3D + Gemma2, tiny config) as oracle for the
depth -> backproject -> Ego3D -> feature-add seam that the no-zoe golden
(test_vla_golden_reference.py) cannot exercise.

The reference's process_zoe resizes to a HARD-CODED 384x384
(modeling_spatialvla.py:99-110) regardless of the zoe config, so the tiny
zoe here uses image_size=384 / patch_size=32 to keep both sides on the
same preprocessing target.
"""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from spatialvla_tpu.config import (
    Ego3DConfig,
    Gemma2Config,
    SiglipVisionConfig,
    SpatialVLAConfig,
    ZoeDepthConfig,
)
from spatialvla_tpu.convert.params import spatialvla_from_state_dict
from spatialvla_tpu.models import spatialvla
from tests.test_vla_golden_reference import _install_torchvision_stub

IMAGE_ID, ACTION_BEGIN, N_ACTION, VOCAB = 1000, 1024, 100, 1200
IMG = 56  # vision input; (56/14)^2 = 16 image tokens
N_IMG = 16

ZOE_TINY = ZoeDepthConfig(
    hidden_size=32,
    intermediate_size=64,
    num_layers=4,
    num_heads=4,
    patch_size=32,
    image_size=384,  # matches the reference's hard-coded process_zoe target
    neck_hidden_sizes=(8, 16, 32, 32),
    out_indices=(1, 2, 3, 4),
    fusion_hidden_size=16,
    bottleneck_features=16,
    num_relative_features=8,
    bin_embedding_dim=8,
    num_patch_transformer_layers=4,
    patch_transformer_hidden_size=128,
    patch_transformer_intermediate_size=64,
    patch_transformer_num_attention_heads=2,
    num_bins=16,
)


@pytest.fixture(scope="module")
def ref_model():
    _install_torchvision_stub()
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from model.configuration_spatialvla import SpatialVLAConfig as RefCfg
    from model.modeling_spatialvla import SpatialVLAForConditionalGeneration

    bb = transformers.BeitConfig(
        hidden_size=ZOE_TINY.hidden_size,
        num_hidden_layers=ZOE_TINY.num_layers,
        num_attention_heads=ZOE_TINY.num_heads,
        intermediate_size=ZOE_TINY.intermediate_size,
        image_size=ZOE_TINY.image_size,
        patch_size=ZOE_TINY.patch_size,
        use_absolute_position_embeddings=False,
        use_relative_position_bias=True,
        layer_scale_init_value=0.1,
        out_indices=list(ZOE_TINY.out_indices),
        reshape_hidden_states=False,
    )
    zoe_cfg = transformers.ZoeDepthConfig(
        backbone_config=bb,
        neck_hidden_sizes=list(ZOE_TINY.neck_hidden_sizes),
        fusion_hidden_size=ZOE_TINY.fusion_hidden_size,
        bottleneck_features=ZOE_TINY.bottleneck_features,
        num_relative_features=ZOE_TINY.num_relative_features,
        bin_embedding_dim=ZOE_TINY.bin_embedding_dim,
        num_attractors=list(ZOE_TINY.n_attractors),
        bin_centers_type="softplus",
        bin_configurations=[
            {"n_bins": ZOE_TINY.num_bins, "min_depth": 0.001, "max_depth": 10.0,
             "name": "nyu"},
            {"n_bins": ZOE_TINY.num_bins, "min_depth": 0.001, "max_depth": 80.0,
             "name": "kitti"},
        ],
        num_patch_transformer_layers=ZOE_TINY.num_patch_transformer_layers,
        patch_transformer_hidden_size=ZOE_TINY.patch_transformer_hidden_size,
        patch_transformer_intermediate_size=ZOE_TINY.patch_transformer_intermediate_size,
        patch_transformer_num_attention_heads=ZOE_TINY.patch_transformer_num_attention_heads,
        min_temp=ZOE_TINY.min_temp,
        max_temp=ZOE_TINY.max_temp,
    )
    vis = dict(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=IMG, patch_size=14, num_channels=3,
        vision_use_head=False, layer_norm_eps=1e-6,
        hidden_act="gelu_pytorch_tanh",
    )
    txt = dict(
        hidden_size=48, intermediate_size=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=VOCAB, max_position_embeddings=512, sliding_window=8,
        query_pre_attn_scalar=16.0, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, hidden_activation="gelu_pytorch_tanh",
        rope_theta=10000.0, rms_norm_eps=1e-6,
    )
    cfg = RefCfg(
        vision_config=vis, text_config=txt, vision_zoe_config=zoe_cfg,
        use_vision_zoe=True, image_token_index=IMAGE_ID, vocab_size=VOCAB,
        projection_dim=48, action_token_begin_idx=ACTION_BEGIN,
        spatial_token_num=N_ACTION, use_spatial_token=True,
        ego3d_patch_reso=2, n_freqs=8,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = SpatialVLAForConditionalGeneration(cfg).eval()
    # random HF zoe init zeroes many tables -> perturb for non-trivial depth
    with torch.no_grad():
        for p in model.vision_zoe_model.parameters():
            p.add_(0.05 * torch.randn_like(p))
    return model


@pytest.fixture(scope="module")
def our_cfg():
    return SpatialVLAConfig(
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
            patch_size=14, image_size=IMG, projection_dim=48,
        ),
        text=Gemma2Config(
            vocab_size=VOCAB, hidden_size=48, intermediate_size=96,
            num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
            sliding_window=8, query_pre_attn_scalar=16.0,
        ),
        ego3d=Ego3DConfig(patch_reso=2, n_freqs=8, num_pos_feats=32),
        zoe=ZOE_TINY,
        image_token_index=IMAGE_ID, spatial_token_num=N_ACTION,
        action_token_begin_idx=ACTION_BEGIN, use_spatial_token=True,
        use_vision_zoe=True,
    )


@pytest.fixture(scope="module")
def our_params(ref_model, our_cfg):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return spatialvla_from_state_dict(sd, our_cfg)


def _sample(B=1, n_text=5, n_action=6, seed=0):
    rng = np.random.RandomState(seed)
    ids = np.concatenate(
        [
            np.full((B, N_IMG), IMAGE_ID),
            rng.randint(10, 900, (B, n_text)),
            rng.randint(ACTION_BEGIN, ACTION_BEGIN + N_ACTION, (B, n_action)),
        ],
        axis=1,
    ).astype(np.int64)
    T = ids.shape[1]
    ttype = np.zeros((B, T), np.int64)
    ttype[:, N_IMG + n_text:] = 1
    px = rng.rand(B, 3, IMG, IMG).astype(np.float32)
    K = np.tile(
        np.array([[[120.0, 0, IMG / 2], [0, 120.0, IMG / 2], [0, 0, 1]]],
                 np.float32),
        (B, 1, 1),
    )
    return ids, ttype, px, K


def test_image_features_with_zoe_parity(ref_model, our_cfg, our_params):
    _, _, px, K = _sample()
    with torch.no_grad():
        want = ref_model.get_image_features(
            torch.tensor(px), torch.tensor(K)
        ).numpy()
    got = np.asarray(
        spatialvla.get_image_features(
            our_params, our_cfg, jnp.asarray(px.transpose(0, 2, 3, 1)),
            jnp.asarray(K),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_forward_logits_with_zoe_parity(ref_model, our_cfg, our_params):
    ids, ttype, px, K = _sample()
    attn = np.ones_like(ids)
    labels = np.where(ttype == 1, ids, -100)  # labels select the prefix-LM
    # mask mode on both sides (without them the reference goes bidirectional)
    with torch.no_grad():
        want = ref_model(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
            attention_mask=torch.tensor(attn),
            token_type_ids=torch.tensor(ttype), intrinsic=torch.tensor(K),
            labels=torch.tensor(labels),
        ).logits.numpy()
    got = np.asarray(
        spatialvla.forward(
            our_params, our_cfg, jnp.asarray(ids.astype(np.int32)),
            pixel_values=jnp.asarray(px.transpose(0, 2, 3, 1)),
            attention_mask=jnp.asarray(attn.astype(np.int32)),
            token_type_ids=jnp.asarray(ttype.astype(np.int32)),
            intrinsic=jnp.asarray(K),
            labels=jnp.asarray(labels.astype(np.int32)),
        )["logits"]
    )
    assert np.isfinite(got).all()
    # fp32 end-to-end; tolerance absorbs resize/conv op-order differences
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_greedy_decode_with_zoe_token_identical(ref_model, our_cfg, our_params):
    ids, _, px, K = _sample(n_action=0, seed=4)
    with torch.no_grad():
        gen = ref_model.generate(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
            attention_mask=torch.ones_like(torch.tensor(ids)),
            intrinsic=torch.tensor(K),
            max_new_tokens=6, do_sample=False,
        )
    want = gen[:, ids.shape[1]:].numpy()
    got = np.asarray(
        spatialvla.generate_greedy(
            our_params, our_cfg, jnp.asarray(ids.astype(np.int32)),
            pixel_values=jnp.asarray(px.transpose(0, 2, 3, 1)),
            intrinsic=jnp.asarray(K), max_new_tokens=6,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_array_equal(got, want)
