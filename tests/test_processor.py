"""Processor tests: prompt layout, labels, intrinsics rescale, action
decode round-trip + unnormalization, save/load."""
import json

import numpy as np
import pytest

from spatialvla_tpu.processor import (
    ByteTokenizer,
    SpatialVLAProcessor,
    scale_intrinsics,
)

STATS = {
    "bridge_orig/1.0.0": {
        "action": {
            "q01": [-0.1, -0.2, -0.1, -0.3, -0.3, -0.3, 0.0],
            "q99": [0.1, 0.2, 0.1, 0.3, 0.3, 0.3, 1.0],
            "mask": [True, True, True, True, True, True, False],
        }
    }
}


@pytest.fixture()
def proc():
    return SpatialVLAProcessor(
        ByteTokenizer(),
        image_token_id=5000,
        action_token_begin_idx=6000,
        image_seq_length=16,
        image_size=28,
        statistics=STATS,
        action_chunk_size=4,
    )


def _img(rng):
    return (rng.rand(32, 48, 3) * 255).astype(np.uint8)


def test_prompt_layout(proc):
    rng = np.random.RandomState(0)
    out = proc(_img(rng), "pick the cube", unnorm_key="bridge_orig/1.0.0")
    ids = out["input_ids"][0]
    tok = proc.text_tokenizer
    # 16 image tokens, then BOS, then text, then newline
    assert (ids[:16] == 5000).all()
    assert ids[16] == tok.bos_id
    text_ids = tok.encode("pick the cube") + tok.encode("\n")
    np.testing.assert_array_equal(ids[17 : 17 + len(text_ids)], text_ids)
    assert out["attention_mask"].all()
    assert (out["token_type_ids"] == 0).all()  # no suffix
    assert out["pixel_values"].shape == (1, 28, 28, 3)
    assert 0.0 <= out["pixel_values"].min() and out["pixel_values"].max() <= 1.0
    assert "labels" not in out


def test_suffix_actions_and_labels(proc):
    rng = np.random.RandomState(1)
    actions = rng.uniform(-1, 1, (4, 7))
    out = proc(_img(rng), "place", suffix_actions=actions)
    ids, ttype, labels = out["input_ids"][0], out["token_type_ids"][0], out["labels"][0]
    n_suffix = 3 * 4 + 1  # 3 tokens per step * chunk + EOS
    assert ttype.sum() == n_suffix
    suffix = ids[ttype == 1]
    assert suffix[-1] == proc.text_tokenizer.eos_id
    assert (suffix[:-1] >= 6000).all()
    # labels: -100 on prefix, ids on suffix
    assert (labels[ttype == 0] == -100).all()
    np.testing.assert_array_equal(labels[ttype == 1], suffix)
    # suffix ids round-trip to actions within bin resolution
    decoded = proc.action_tokenizer.decode_global_ids(suffix[:-1].reshape(4, 3))
    re_encoded = proc.action_tokenizer.encode_to_global_ids(decoded)
    np.testing.assert_array_equal(re_encoded[:, 1:], suffix[:-1].reshape(4, 3)[:, 1:])


def test_padding_to_max_length(proc):
    rng = np.random.RandomState(2)
    out = proc([_img(rng), _img(rng)], ["a", "longer instruction"], max_length=64)
    assert out["input_ids"].shape == (2, 64)
    pad = out["attention_mask"][0] == 0
    assert pad.any()
    assert (out["input_ids"][0][pad] == proc.text_tokenizer.pad_id).all()


def test_intrinsic_rescaling():
    cfg = {"d": {"intrinsic": [[600.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], "width": 640, "height": 480}}
    K = scale_intrinsics(cfg, 224)["d"]
    np.testing.assert_allclose(K[0], [600 * 224 / 640, 0, 320 * 224 / 640])
    np.testing.assert_allclose(K[1], [0, 500 * 224 / 480, 240 * 224 / 480])
    np.testing.assert_allclose(K[2], [0, 0, 1])


def test_decode_actions_unnormalization(proc):
    rng = np.random.RandomState(3)
    actions = rng.uniform(-0.9, 0.9, (4, 7))
    actions[:, 6] = 1.0
    ids = proc.action_tokenizer.encode_to_global_ids(actions).reshape(-1)
    out = proc.decode_actions(ids, unnorm_key="bridge_orig/1.0.0")
    assert out["actions"].shape == (1, 4, 7)
    a = out["actions"][0]
    stats = STATS["bridge_orig/1.0.0"]["action"]
    q01, q99 = np.asarray(stats["q01"]), np.asarray(stats["q99"])
    # masked dims land inside [q01, q99]
    assert (a[:, :6] >= q01[:6] - 1e-9).all() and (a[:, :6] <= q99[:6] + 1e-9).all()
    # unmasked gripper dim stays normalized (== 1.0)
    np.testing.assert_allclose(a[:, 6], 1.0)


def test_save_load_round_trip(tmp_path, proc):
    proc.save(str(tmp_path))
    loaded = SpatialVLAProcessor.load(str(tmp_path), ByteTokenizer())
    assert loaded.image_token_id == proc.image_token_id
    assert loaded.action_chunk_size == proc.action_chunk_size
    np.testing.assert_allclose(
        loaded.bin_policy["translation"]["theta_bins"],
        proc.bin_policy["translation"]["theta_bins"],
    )
    rng = np.random.RandomState(4)
    a = rng.uniform(-1, 1, (2, 7))
    np.testing.assert_array_equal(
        loaded.action_tokenizer.encode(a), proc.action_tokenizer.encode(a)
    )
