"""ZoeDepth JAX parity vs HF ZoeDepthForDepthEstimation (random weights,
tiny BEiT backbone, fp32, both NYU/KITTI experts)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import ZoeDepthConfig
from spatialvla_tpu.convert.zoe import zoe_from_state_dict
from spatialvla_tpu.models import zoe

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = ZoeDepthConfig(
    hidden_size=32,
    intermediate_size=64,
    num_layers=4,
    num_heads=4,
    patch_size=16,
    image_size=64,
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
def hf_model():
    bb = transformers.BeitConfig(
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        use_absolute_position_embeddings=False,
        use_relative_position_bias=True,
        layer_scale_init_value=0.1,
        out_indices=list(TINY.out_indices),
        reshape_hidden_states=False,
    )
    cfg = transformers.ZoeDepthConfig(
        backbone_config=bb,
        neck_hidden_sizes=list(TINY.neck_hidden_sizes),
        fusion_hidden_size=TINY.fusion_hidden_size,
        bottleneck_features=TINY.bottleneck_features,
        num_relative_features=TINY.num_relative_features,
        bin_embedding_dim=TINY.bin_embedding_dim,
        num_attractors=list(TINY.n_attractors),
        bin_centers_type="softplus",
        bin_configurations=[
            {"n_bins": TINY.num_bins, "min_depth": 0.001, "max_depth": 10.0, "name": "nyu"},
            {"n_bins": TINY.num_bins, "min_depth": 0.001, "max_depth": 80.0, "name": "kitti"},
        ],
        num_patch_transformer_layers=TINY.num_patch_transformer_layers,
        patch_transformer_hidden_size=TINY.patch_transformer_hidden_size,
        patch_transformer_intermediate_size=TINY.patch_transformer_intermediate_size,
        patch_transformer_num_attention_heads=TINY.patch_transformer_num_attention_heads,
        min_temp=TINY.min_temp,
        max_temp=TINY.max_temp,
    )
    torch.manual_seed(0)
    model = transformers.ZoeDepthForDepthEstimation(cfg).eval()
    # perturb every parameter so outputs are non-trivial (random HF init
    # zeroes many biases/tables -> constant depth everywhere)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn_like(p))
    return model


@pytest.fixture(scope="module")
def jx_params(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return zoe_from_state_dict(sd, TINY)


def test_forward_parity(hf_model, jx_params):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, TINY.image_size, TINY.image_size).astype(np.float32) * 0.5
    with torch.no_grad():
        out = hf_model(pixel_values=torch.tensor(x))
    ref_depth = out.predicted_depth.numpy()
    ref_logits = out.domain_logits.numpy()

    nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = zoe.forward(jx_params, TINY, nhwc)
    np.testing.assert_allclose(
        np.asarray(got["domain_logits"]), ref_logits, atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["predicted_depth"]), ref_depth, atol=1e-3, rtol=1e-3
    )


def test_expert_selection_branches(jx_params):
    rng = np.random.RandomState(1)
    nhwc = jnp.asarray(rng.randn(1, TINY.image_size, TINY.image_size, 3).astype(np.float32))
    d_nyu = zoe.forward(jx_params, TINY, nhwc, domain="nyu")["predicted_depth"]
    d_kitti = zoe.forward(jx_params, TINY, nhwc, domain="kitti")["predicted_depth"]
    assert not np.allclose(np.asarray(d_nyu), np.asarray(d_kitti))
    # dynamic vote picks one of them
    d_dyn = zoe.forward(jx_params, TINY, nhwc)["predicted_depth"]
    match_nyu = np.allclose(np.asarray(d_dyn), np.asarray(d_nyu), atol=1e-6)
    match_kitti = np.allclose(np.asarray(d_dyn), np.asarray(d_kitti), atol=1e-6)
    assert match_nyu or match_kitti


def test_predict_depth_pipeline(jx_params):
    """Full VLA depth path: raw [0,1] pixels -> pad/resize/normalize -> zoe
    -> upsample + crop to the input resolution."""
    rng = np.random.RandomState(2)
    H = W = 56
    pixels = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    depth = zoe.predict_depth(jx_params, TINY, pixels, target_hw=(H, W))
    assert depth.shape == (1, H, W)
    assert np.isfinite(np.asarray(depth)).all()
    assert (np.asarray(depth) >= 0).all()


def test_process_zoe_preprocess_parity():
    """preprocess == reference process_zoe (reflect pad 31 + bicubic resize
    align_corners=True + 0.5/0.5 normalize, modeling_spatialvla.py:99-110)."""
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    x = rng.rand(1, 3, 100, 120).astype(np.float32)
    t = torch.tensor(x)
    t = F.pad(t, (31, 31, 31, 31), mode="reflect")
    t = F.interpolate(t, size=(TINY.image_size, TINY.image_size), mode="bicubic",
                      align_corners=True)
    ref = ((t - 0.5) / 0.5).numpy()

    nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got, pad = zoe.preprocess(nhwc, TINY)
    assert pad == 31
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-4
    )


def test_precomputed_rel_bias_matches_gather(hf_model, jx_params):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    x = jnp.asarray(
        rng.randn(1, TINY.image_size, TINY.image_size, 3).astype(np.float32) * 0.5
    )
    ref = zoe.forward(jx_params, TINY, x)
    pre = zoe.precompute_rel_bias(jx_params, TINY, dtype=jnp.float32)
    assert "rel_pos_bias" in pre["backbone"]["layers"]
    assert "rel_pos_table" not in pre["backbone"]["layers"]
    got = zoe.forward(pre, TINY, x)
    np.testing.assert_allclose(
        np.asarray(got["predicted_depth"]), np.asarray(ref["predicted_depth"]),
        rtol=1e-5, atol=1e-5,
    )


def test_relative_position_index_matches_hf_exactly():
    """The cls tail-row assignment (cls->token=num-3, token->cls=num-2,
    cls->cls=num-1) must match HF generate_relative_position_index bit-for-
    bit — a swapped assignment survives the forward parity test because the
    per-row-constant part of the bias cancels in softmax."""
    from transformers.models.beit.modeling_beit import BeitRelativePositionBias

    from spatialvla_tpu.models.zoe import beit_relative_position_index

    for window in (4, 24):
        m = BeitRelativePositionBias(
            transformers.BeitConfig(image_size=window * 16, patch_size=16),
            window_size=(window, window),
        )
        want = m.generate_relative_position_index(
            torch.tensor((window, window))
        ).numpy()
        np.testing.assert_array_equal(beit_relative_position_index(window), want)
