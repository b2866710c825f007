"""Quality-gate artifacts (spatialvla_tpu/serve/gating.py): every serving
knob that trades model quality — int4/mixed weights, int8 KV, reduced-res
depth, quantized vision front — must carry a measured gate entry before a
server runs it. End-to-end on the fabricated tiny checkpoint: eval_quant
--gate_out writes the artifact, quantize_checkpoint --gate bakes it into
serving_config.json, serve-time enforcement passes gated knobs and refuses
ungated ones (unless --ungated). The reference's implicit quality bar is
unquantized serving (/root/reference/README.md:93)."""
import importlib.util
import json
import os

import numpy as np
import pytest

from tests.test_hf_checkpoint import _build_reference_style_checkpoint

SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- unit


def test_knob_canonicalization():
    from spatialvla_tpu.serve.gating import quality_trade_knobs

    # the measured-near-lossless default class needs no gate: bf16 or
    # int8 weight-only LM, bf16 vision, full-res depth, bf16 KV
    assert quality_trade_knobs() == {}
    assert quality_trade_knobs(bits=8) == {}
    # every quality-trade knob is canonicalized
    assert quality_trade_knobs(bits=4) == {"bits": 4}
    assert quality_trade_knobs(bits=4, group_size=128) == {
        "bits": 4, "group_size": 128}
    assert quality_trade_knobs(bits=8, mlp_bits=4) == {"mlp_bits": 4}
    # mlp_bits == bits is redundant, not a distinct config
    assert quality_trade_knobs(bits=4, mlp_bits=4) == {"bits": 4}
    assert quality_trade_knobs(vision_bits=8) == {"vision_bits": 8}
    assert quality_trade_knobs(kv_bits=8) == {"kv_bits": 8}
    assert quality_trade_knobs(depth_image_size=256) == {
        "depth_image_size": 256}


def test_check_gate_coverage():
    from spatialvla_tpu.serve.gating import check_gate

    gate = {"entries": [
        {"knobs": {"bits": 4, "vision_bits": 8}, "token_agreement": 0.97},
        {"knobs": {"vision_bits": 8}, "token_agreement": 1.0},
    ]}
    ok, _ = check_gate(gate, {})
    assert ok  # default class never needs a gate
    ok, _ = check_gate(None, {})
    assert ok
    ok, _ = check_gate(gate, {"vision_bits": 8, "bits": 4})
    assert ok  # dict equality, key order irrelevant
    ok, problems = check_gate(gate, {"bits": 4})
    assert not ok and "no gate entry" in problems[0]
    ok, problems = check_gate(None, {"kv_bits": 8})
    assert not ok


def test_gate_round_trip_and_version(tmp_path):
    from spatialvla_tpu.serve.gating import load_gate, write_gate

    p = str(tmp_path / "gate.json")
    write_gate(p, {"checkpoint": "x", "entries": []})
    gate = load_gate(p)
    assert gate["format_version"] == 1
    with open(p, "w") as f:
        json.dump({"format_version": 99}, f)
    with pytest.raises(ValueError, match="format_version"):
        load_gate(p)


# ---------------------------------------------------------- end-to-end


@pytest.fixture(scope="module")
def src_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("gate_src")
    _build_reference_style_checkpoint(d)
    return str(d)


def test_gate_end_to_end(src_ckpt, tmp_path, capsys):
    """eval_quant --gate_out -> quantize_checkpoint --gate -> load_serving
    carries the artifact -> enforce_gate passes; and serving the same
    knobs WITHOUT a gate refuses (SystemExit) unless ungated=True."""
    from spatialvla_tpu.inference import SpatialVLAPolicy
    from spatialvla_tpu.serve.gating import enforce_gate

    gate_path = str(tmp_path / "gate.json")
    _load_script("eval_quant").main([
        "--checkpoint_dir", src_ckpt, "--hf", "--n_synthetic", "2",
        "--bits", "8", "4", "--gate_out", gate_path,
    ])
    out = capsys.readouterr().out
    assert "gate artifact written" in out
    with open(gate_path) as f:
        gate = json.load(f)
    knob_sets = [e["knobs"] for e in gate["entries"]]
    # the int8 row gates the default int8 vision front; the int4 row the
    # real quality trade — exactly the knob dicts serve.py would check
    assert {"vision_bits": 8} in knob_sets
    assert {"bits": 4, "vision_bits": 8} in knob_sets

    served = str(tmp_path / "serving_int4")
    _load_script("quantize_checkpoint").main([
        "--ckpt", src_ckpt, "--hf", "--out", served,
        "--bits", "4", "--gate", gate_path,
    ])
    loaded = SpatialVLAPolicy.load_serving(served)
    assert loaded.quality_gate is not None
    msg = enforce_gate(loaded, loaded.quality_gate)
    assert "gated" in msg and "UNGATED" not in msg

    # the same configuration with no gate on record refuses...
    loaded.quality_gate = None
    with pytest.raises(SystemExit, match="refusing to serve"):
        enforce_gate(loaded, None)
    # ...unless the operator explicitly opts out
    assert "UNGATED" in enforce_gate(loaded, None, ungated=True)


def test_save_serving_rejects_non_covering_gate(src_ckpt, tmp_path):
    """A stale/mismatched gate travelling with a checkpoint is worse than
    none: save_serving refuses a gate that does not measure the baked
    knobs."""
    from spatialvla_tpu.inference import SpatialVLAPolicy

    policy = SpatialVLAPolicy.from_hf_checkpoint(
        src_ckpt, param_dtype=None
    ).quantize(4)
    gate = {"format_version": 1,
            "entries": [{"knobs": {"vision_bits": 8}}]}  # int8-only gate
    with pytest.raises(ValueError, match="does not cover"):
        policy.save_serving(str(tmp_path / "out"), quality_gate=gate)


def test_default_quality_needs_no_gate(src_ckpt, tmp_path):
    """bf16 and int8-LM-with-bf16-vision both land in the default class:
    enforce_gate passes with no artifact at all."""
    from spatialvla_tpu.inference import SpatialVLAPolicy
    from spatialvla_tpu.serve.gating import enforce_gate

    policy = SpatialVLAPolicy.from_hf_checkpoint(src_ckpt, param_dtype=None)
    assert "no gate needed" in enforce_gate(policy, None)
    policy.quantize(8, vision_bits=None)
    assert "no gate needed" in enforce_gate(policy, None)
