"""Fusion-level golden parity against the reference torch model.

Executes /root/reference/model/modeling_spatialvla.py (read-only, tiny
config, no ZoeDepth — the depth tower is golden-tested separately in
test_zoe.py) as an oracle for the riskiest composition points:

  - training forward: SigLIP features -> projector x H^-0.5 -> masked
    scatter into <image> positions -> spatial-token embedding override ->
    prefix-LM mask -> Gemma2 -> fp32 CE (modeling_spatialvla.py:335-442);
  - the two reference mask modes (:258-306): with labels, causal triu +
    token_type_ids==0 keys unmasked (prefix-LM); without labels, the whole
    input window is bidirectional (prefill semantics);
  - greedy decode with the +1 position offset and static cache
    (:444-492) — token-identical generation;
  - padding semantics: the reference's training mask leaves right-pad keys
    attendable (pads have token_type_ids==0, :304-305); ours blocks them,
    so the assertion here is that OUR padded forward equals the reference's
    UNPADDED forward — padding is inert in this framework by design
    (documented in PARITY.md).
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from spatialvla_tpu.config import (
    Ego3DConfig,
    Gemma2Config,
    SiglipVisionConfig,
    SpatialVLAConfig,
)
from spatialvla_tpu.convert.params import spatialvla_from_state_dict
from spatialvla_tpu.models import spatialvla

IMAGE_ID, ACTION_BEGIN, N_ACTION, VOCAB = 1000, 1024, 100, 1200
N_IMG = 4  # (28/14)^2


def _install_torchvision_stub():
    """The reference imports torchvision at module level; only
    TF.normalize is on the no-zoe path. transformers must already be
    imported (it probes torchvision availability at import time)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    fn = types.ModuleType("torchvision.transforms.functional")

    def normalize(t, mean, std):
        m = torch.tensor(mean, dtype=t.dtype, device=t.device).view(-1, 1, 1)
        s = torch.tensor(std, dtype=t.dtype, device=t.device).view(-1, 1, 1)
        return (t - m) / s

    fn.normalize = normalize
    tv.transforms = tr
    tr.functional = fn
    sys.modules.update(
        {
            "torchvision": tv,
            "torchvision.transforms": tr,
            "torchvision.transforms.functional": fn,
        }
    )


@pytest.fixture(scope="module")
def ref_model():
    _install_torchvision_stub()
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")  # append: never shadow our pkgs
    from model.configuration_spatialvla import SpatialVLAConfig as RefCfg
    from model.modeling_spatialvla import SpatialVLAForConditionalGeneration

    vis = dict(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14, num_channels=3,
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
        vision_config=vis, text_config=txt, zoe_config=None,
        use_vision_zoe=False, image_token_index=IMAGE_ID, vocab_size=VOCAB,
        projection_dim=48, action_token_begin_idx=ACTION_BEGIN,
        spatial_token_num=N_ACTION, use_spatial_token=True,
        ego3d_patch_reso=2, n_freqs=8,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    return SpatialVLAForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def our_cfg():
    return SpatialVLAConfig(
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
            patch_size=14, image_size=28, projection_dim=48,
        ),
        text=Gemma2Config(
            vocab_size=VOCAB, hidden_size=48, intermediate_size=96,
            num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
            sliding_window=8, query_pre_attn_scalar=16.0,
        ),
        ego3d=Ego3DConfig(num_pos_feats=32),
        zoe=None,
        image_token_index=IMAGE_ID, spatial_token_num=N_ACTION,
        action_token_begin_idx=ACTION_BEGIN, use_spatial_token=True,
        use_vision_zoe=False,
    )


@pytest.fixture(scope="module")
def our_params(ref_model, our_cfg):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return spatialvla_from_state_dict(sd, our_cfg)


def _sample(B=2, n_text=5, n_action=6, seed=0):
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
    labels = np.where(ttype == 1, ids, -100)
    px = rng.rand(B, 3, 28, 28).astype(np.float32)
    return ids, ttype, labels, px


def _ref_forward(ref_model, ids, attn, ttype, labels, px):
    with torch.no_grad():
        out = ref_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(px),
            attention_mask=torch.tensor(attn),
            token_type_ids=torch.tensor(ttype),
            labels=None if labels is None else torch.tensor(labels),
        )
    return out


def _our_forward(our_params, our_cfg, ids, attn, ttype, labels, px):
    return spatialvla.forward(
        our_params, our_cfg, jnp.asarray(ids.astype(np.int32)),
        pixel_values=jnp.asarray(px.transpose(0, 2, 3, 1)),
        attention_mask=jnp.asarray(attn.astype(np.int32)),
        token_type_ids=jnp.asarray(ttype.astype(np.int32)),
        labels=None if labels is None else jnp.asarray(labels.astype(np.int32)),
    )


def test_training_forward_and_loss_parity(ref_model, our_cfg, our_params):
    ids, ttype, labels, px = _sample()
    attn = np.ones_like(ids)
    ref = _ref_forward(ref_model, ids, attn, ttype, labels, px)
    ours = _our_forward(our_params, our_cfg, ids, attn, ttype, labels, px)
    np.testing.assert_allclose(
        np.asarray(ours["logits"]), ref.logits.numpy(), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(float(ours["loss"]), float(ref.loss), rtol=1e-6)


def test_image_features_parity(ref_model, our_cfg, our_params):
    rng = np.random.RandomState(3)
    px = rng.rand(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref_feat = ref_model.get_image_features(torch.tensor(px), None).numpy()
    ours = np.asarray(
        spatialvla.get_image_features(
            our_params, our_cfg, jnp.asarray(px.transpose(0, 2, 3, 1)), None
        )
    )
    np.testing.assert_allclose(ours, ref_feat, atol=1e-5)


def test_padding_is_inert_vs_reference_unpadded(ref_model, our_cfg, our_params):
    """Reference training mask leaves right-pad keys attendable (pads carry
    token_type_ids==0, modeling_spatialvla.py:304-305); ours blocks them.
    The contract: our padded forward == the reference's UNPADDED forward at
    every valid position."""
    ids, ttype, labels, px = _sample(B=1, n_text=3, n_action=4, seed=7)
    T = ids.shape[1]
    ref = _ref_forward(ref_model, ids, np.ones_like(ids), ttype, labels, px)

    pad = 5
    ids_p = np.concatenate([ids, np.zeros((1, pad), np.int64)], axis=1)
    ttype_p = np.concatenate([ttype, np.zeros((1, pad), np.int64)], axis=1)
    labels_p = np.concatenate([labels, np.full((1, pad), -100)], axis=1)
    attn_p = np.concatenate(
        [np.ones((1, T), np.int64), np.zeros((1, pad), np.int64)], axis=1
    )
    ours = _our_forward(our_params, our_cfg, ids_p, attn_p, ttype_p, labels_p, px)
    np.testing.assert_allclose(
        np.asarray(ours["logits"])[:, :T], ref.logits.numpy(), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(float(ours["loss"]), float(ref.loss), rtol=1e-6)


def test_greedy_decode_token_identical(ref_model, our_cfg, our_params):
    """predict_action semantics (generate greedy, max_new_tokens, +1
    position offset, modeling_spatialvla.py:444-492) — token-identical.
    (The reference's predict_action additionally casts inputs to bf16 for
    GPU serving; parity is run in fp32 on both sides.)"""
    rng = np.random.RandomState(0)
    B, n_text, K = 2, 5, 12
    prefix = np.concatenate(
        [np.full((B, N_IMG), IMAGE_ID), rng.randint(10, 900, (B, n_text))],
        axis=1,
    ).astype(np.int64)
    px = rng.rand(B, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        gen = ref_model.generate(
            input_ids=torch.tensor(prefix),
            pixel_values=torch.tensor(px),
            attention_mask=torch.ones((B, prefix.shape[1]), dtype=torch.long),
            max_new_tokens=K, do_sample=False, use_cache=True,
        )
    ref_new = gen[:, prefix.shape[1]:].numpy()
    ours_new = np.asarray(
        spatialvla.generate_greedy(
            our_params, our_cfg, jnp.asarray(prefix.astype(np.int32)),
            pixel_values=jnp.asarray(px.transpose(0, 2, 3, 1)),
            max_new_tokens=K, cache_dtype=jnp.float32,
        )
    )
    np.testing.assert_array_equal(ours_new, ref_new)
