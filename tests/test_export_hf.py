"""HF-checkpoint export round-trip: our pytree -> reference-layout state
dict -> back, bit-exact against the torch models' own state dicts, plus a
full directory export that load_hf_checkpoint re-ingests."""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from spatialvla_tpu.convert.export_hf import (
    config_to_hf,
    export_hf_checkpoint,
    spatialvla_to_state_dict,
    zoe_to_state_dict,
)
from spatialvla_tpu.convert.hf_checkpoint import config_from_hf
from spatialvla_tpu.convert.params import spatialvla_from_state_dict
from spatialvla_tpu.convert.zoe import zoe_from_state_dict

# reuse the golden fixtures: the tiny reference torch fusion model and the
# tiny HF ZoeDepth
from tests.test_vla_golden_reference import our_cfg, our_params, ref_model  # noqa: F401
from tests.test_zoe import TINY as ZOE_TINY
from tests.test_zoe import hf_model, jx_params  # noqa: F401


def _assert_state_dicts_equal(got, want, *, skip=()):
    want = {k: v for k, v in want.items() if k not in skip}
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f"missing keys: {sorted(missing)[:8]}"
    assert not extra, f"extra keys: {sorted(extra)[:8]}"
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k], np.float32),
            np.asarray(want[k], np.float32),
            err_msg=k,
        )


def test_fusion_state_dict_round_trip(ref_model, our_cfg, our_params):  # noqa: F811
    """torch sd -> our pytree (existing converter) -> export -> bit-exact."""
    want = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    got = spatialvla_to_state_dict(our_params, our_cfg)
    _assert_state_dicts_equal(got, want)


def test_zoe_state_dict_round_trip(hf_model, jx_params):  # noqa: F811
    want = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    got = zoe_to_state_dict(jx_params, ZOE_TINY, prefix="")
    _assert_state_dicts_equal(got, want)


def test_torch_model_loads_exported_state_dict(ref_model, our_cfg, our_params):  # noqa: F811
    """The reference torch model accepts the exported dict strictly and
    produces identical logits to the original weights."""
    sd = spatialvla_to_state_dict(our_params, our_cfg)
    from tests.test_vla_golden_reference import _ref_forward, _sample

    ids, ttype, labels, px = _sample(B=1, seed=3)
    attn = np.ones_like(ids)
    before = _ref_forward(ref_model, ids, attn, ttype, None, px).logits.numpy()
    ref_model.load_state_dict({k: torch.tensor(v) for k, v in sd.items()}, strict=True)
    after = _ref_forward(ref_model, ids, attn, ttype, None, px).logits.numpy()
    np.testing.assert_array_equal(before, after)


def test_config_round_trip(our_cfg):  # noqa: F811
    d = config_to_hf(our_cfg)
    back = config_from_hf(d)
    assert back.text == our_cfg.text
    assert back.vision == our_cfg.vision
    assert back.image_token_index == our_cfg.image_token_index
    assert back.spatial_token_num == our_cfg.spatial_token_num
    assert back.action_token_begin_idx == our_cfg.action_token_begin_idx
    assert back.use_vision_zoe == our_cfg.use_vision_zoe


def test_export_directory_reloads(tmp_path, ref_model, our_cfg, our_params):  # noqa: F811
    from spatialvla_tpu.convert.hf_checkpoint import load_hf_checkpoint
    from spatialvla_tpu.processor import SpatialVLAProcessor

    proc = SpatialVLAProcessor(
        None,
        image_token_id=our_cfg.image_token_index,
        action_token_begin_idx=our_cfg.action_token_begin_idx,
        image_seq_length=our_cfg.num_image_tokens,
        image_size=our_cfg.vision.image_size,
        statistics={"bridge_orig/1.0.0": {"action": {"q01": [0] * 7, "q99": [1] * 7,
                                                     "mask": [True] * 6 + [False]}}},
    )
    out = export_hf_checkpoint(our_params, our_cfg, str(tmp_path / "ckpt"), processor=proc)
    params2, cfg2, proc2 = load_hf_checkpoint(out)
    assert cfg2.text == our_cfg.text
    want = spatialvla_to_state_dict(our_params, our_cfg)
    got = spatialvla_to_state_dict(params2, cfg2)
    _assert_state_dicts_equal(got, want)
    assert "bridge_orig/1.0.0" in proc2.statistics
    cfg_json = json.load(open(f"{out}/config.json"))
    assert cfg_json["model_type"] == "spatialvla"
