"""Parity of the JAX SigLIP vision encoder vs HF transformers
SiglipVisionModel (random weights, fp32)."""
import numpy as np
import pytest

import jax.numpy as jnp

from spatialvla_tpu.config import SiglipVisionConfig
from spatialvla_tpu.convert import siglip_from_state_dict
from spatialvla_tpu.models import siglip

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = SiglipVisionConfig(
    hidden_size=32,
    intermediate_size=64,
    num_layers=3,
    num_heads=4,
    patch_size=14,
    image_size=56,
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.SiglipVisionConfig(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        patch_size=TINY.patch_size,
        image_size=TINY.image_size,
        hidden_act="gelu_pytorch_tanh",
        layer_norm_eps=TINY.layer_norm_eps,
        vision_use_head=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return transformers.SiglipVisionModel(cfg).eval()


def test_forward_parity(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    jx = siglip_from_state_dict(sd, TINY)

    rng = np.random.RandomState(0)
    B = 2
    imgs = rng.randn(B, 3, TINY.image_size, TINY.image_size).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(pixel_values=torch.tensor(imgs)).last_hidden_state.numpy()

    nhwc = jnp.asarray(imgs.transpose(0, 2, 3, 1))
    ours = np.asarray(siglip.forward(jx, TINY, nhwc))
    assert ours.shape == (B, TINY.num_patches, TINY.hidden_size)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_remat_matches(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    jx = siglip_from_state_dict(sd, TINY)
    rng = np.random.RandomState(1)
    nhwc = jnp.asarray(rng.randn(1, TINY.image_size, TINY.image_size, 3).astype(np.float32))
    a = np.asarray(siglip.forward(jx, TINY, nhwc))
    b = np.asarray(siglip.forward(jx, TINY, nhwc, use_remat=True))
    np.testing.assert_allclose(a, b, atol=1e-6)
