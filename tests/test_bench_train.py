"""Smoke of scripts/bench_train.py (the reproducible train-step throughput
command behind the recorded envelope numbers): both the LoRA and the
full-AdamW paths must run a real step and report finite numbers."""
import importlib.util
import os

import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "bench_train.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("bench_train", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("mode", ["lora", "full", "lora_zoe"])
def test_bench_train_tiny(mode):
    """lora_zoe exercises the use_vision_zoe batch path (intrinsics ->
    ZoeDepth -> backprojection) that the flagship preset always takes —
    the r3 sweep's train tag crashed on a missing batch intrinsic that a
    zoe-less tiny run structurally cannot catch."""
    bench = _load()
    argv = [
        "--preset", "spatialvla_tiny", "--batch", "2", "--seq", "64",
        "--real_tokens", "40", "--attn", "xla", "--reps", "1", "--sets", "1",
        "--loss_chunk", "0",
    ]
    if mode == "full":
        argv.append("--full")
    if mode == "lora_zoe":
        argv.append("--zoe")
    result = bench.main(argv)
    assert result["ms_per_step"] > 0
    assert result["samples_per_sec"] > 0
    import numpy as np

    assert np.isfinite(result["loss"])
    tag = "full-AdamW" if mode == "full" else "LoRA-r32"
    assert tag in result["metric"]
