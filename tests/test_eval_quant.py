"""End-to-end smoke of scripts/eval_quant.py on the fabricated tiny
checkpoint: the quantization quality gate must compare bf16 vs int8 and
the reduced-resolution depth mode (NOTES_ROUND3.md: depth@N is
quality-gated through this gate, like int4) and report agreement/drift."""
import importlib.util
import os

from tests.test_hf_checkpoint import _build_reference_style_checkpoint

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "eval_quant.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("eval_quant", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_eval_quant_bits_and_depth_res(tmp_path, capsys):
    _build_reference_style_checkpoint(tmp_path)
    _load().main([
        "--checkpoint_dir", str(tmp_path), "--hf",
        "--n_synthetic", "2", "--bits", "8", "--depth_res", "32",
    ])
    out = capsys.readouterr().out
    assert "baseline (bf16): 2 obs" in out
    assert "int8: token agreement" in out
    assert "depth@32: token agreement" in out
    # drift columns parse as numbers
    for line in out.splitlines():
        if "action L1" in line:
            l1 = float(line.split("action L1")[1].split()[0])
            assert l1 >= 0.0
