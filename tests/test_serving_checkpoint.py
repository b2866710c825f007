"""Pre-quantized serving checkpoints (SpatialVLAPolicy.save_serving /
load_serving + scripts/quantize_checkpoint.py): the packed tree round-trips
through Orbax with dtypes/structure intact and the reloaded policy decodes
token-identically — server restarts skip the bf16 load + quantize programs.
The reference serves bf16 safetensors only (/root/reference/README.md:93);
this is beyond-parity serving infrastructure."""
import os

import numpy as np
import pytest

import jax

from tests.test_hf_checkpoint import _build_reference_style_checkpoint

UNNORM = "bridge_orig/1.0.0"


@pytest.fixture(scope="module")
def quantized_policy(tmp_path_factory):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    d = tmp_path_factory.mktemp("srcq_ckpt")
    _build_reference_style_checkpoint(d)
    policy = SpatialVLAPolicy.from_hf_checkpoint(str(d), param_dtype=None)
    return policy.quantize(8, vision_bits=8)


def _image(policy, seed=7):
    rng = np.random.RandomState(seed)
    s = policy.config.vision.image_size
    return (rng.rand(s, s, 3) * 255).astype(np.uint8)


def test_save_load_serving_token_identical(quantized_policy, tmp_path):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    img = _image(quantized_policy)
    want = quantized_policy.predict(img, "pick up the cup", unnorm_key=UNNORM)

    out = tmp_path / "serving_ckpt"
    quantized_policy.save_serving(str(out))
    assert (out / "serving_config.json").exists()

    loaded = SpatialVLAPolicy.load_serving(str(out))
    assert loaded.quant_desc == {"bits": 8, "vision_bits": 8,
                                 "mlp_bits": None, "group_size": None}
    # quantized leaves survived the round-trip as quantized (no template
    # cast back to float): the LM carries int8 weight leaves
    dtypes = {np.dtype(x.dtype) for x in jax.tree_util.tree_leaves(loaded.params["lm"])}
    assert np.dtype(np.int8) in dtypes
    got = loaded.predict(img, "pick up the cup", unnorm_key=UNNORM)
    np.testing.assert_array_equal(got["action_ids"], want["action_ids"])
    np.testing.assert_allclose(got["actions"], want["actions"], rtol=0, atol=0)


def test_serving_config_restores_policy_knobs(quantized_policy, tmp_path):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    # kv_bits lives on the policy (decode-path knob), not in the tree —
    # it must survive the round-trip or a reloaded server silently serves
    # a different configuration than was quality-gated
    quantized_policy.kv_bits = 8
    try:
        out = tmp_path / "serving_kv"
        quantized_policy.save_serving(str(out))
    finally:
        # restore the module-scoped fixture even if save_serving fails —
        # a leaked kv_bits=8 would change later tests sharing the fixture
        quantized_policy.kv_bits = None
    loaded = SpatialVLAPolicy.load_serving(str(out))
    assert loaded.kv_bits == 8
    assert loaded.depth_image_size is None


def test_requantizing_a_packed_tree_raises(quantized_policy, tmp_path):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    with pytest.raises(ValueError, match="already quantized"):
        quantized_policy.quantize(8)
    out = tmp_path / "serving_rq"
    quantized_policy.save_serving(str(out))
    loaded = SpatialVLAPolicy.load_serving(str(out))
    with pytest.raises(ValueError, match="already quantized"):
        loaded.quantize(4)


def test_load_serving_rejects_non_serving_checkpoint(tmp_path):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    with pytest.raises(FileNotFoundError, match="serving_config.json"):
        SpatialVLAPolicy.load_serving(str(tmp_path))


def test_quantize_checkpoint_cli_end_to_end(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        import quantize_checkpoint
    finally:
        sys.path.pop(0)
    from spatialvla_tpu.inference import SpatialVLAPolicy

    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    _build_reference_style_checkpoint(src)
    quantize_checkpoint.main([
        "--ckpt", str(src), "--hf", "--out", str(out), "--bits", "8",
    ])
    loaded = SpatialVLAPolicy.load_serving(str(out))
    res = loaded.predict(_image(loaded), "close the drawer", unnorm_key=UNNORM)
    assert res["actions"].shape[-1] == 7
