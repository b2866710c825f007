"""End-to-end CLI integration: pretrain a tiny model on the synthetic RLDS
fixture, then LoRA-finetune from its exported checkpoint."""
import json
import os

import numpy as np
import pytest

from tests.fixtures import make_bridge_like_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rlds"))
    make_bridge_like_dataset(root, img_hw=(48, 64))
    return root


def test_pretrain_then_lora_finetune(data_dir, tmp_path):
    from spatialvla_tpu.train import finetune, pretrain

    out1 = str(tmp_path / "pretrain")
    pretrain.main([
        "--data_root_dir", data_dir,
        "--mixture", "bridge",
        "--output_dir", out1,
        "--model_preset", "spatialvla_tiny",
        "--no_vision_zoe",
        "--image_size", "56",
        "--seq_len", "80",
        "--max_steps", "3",
        "--per_device_batch_size", "2",
        "--mesh_data", "1", "--mesh_fsdp", "2", "--mesh_model", "2",
        "--shuffle_buffer_size", "4",
        "--save_steps", "3",
        "--logging_steps", "1",
        "--attn_backend", "xla",
        "--learning_rate", "1e-3",
    ])
    # artifacts: processor config, ds stats, metrics, checkpoints, params
    assert os.path.exists(os.path.join(out1, "processor_config.json"))
    assert os.path.exists(os.path.join(out1, "ds_stats.json"))
    assert os.path.exists(os.path.join(out1, "config.json"))
    metrics = [
        json.loads(l) for l in open(os.path.join(out1, "metrics.jsonl"))
    ]
    assert metrics and all(np.isfinite(m["loss"]) for m in metrics)
    assert "translation_accuracy" in metrics[-1]

    out2 = str(tmp_path / "finetune")
    finetune.main([
        "--pretrained_dir", out1,
        "--data_root_dir", data_dir,
        "--mixture", "bridge",
        "--output_dir", out2,
        "--model_preset", "spatialvla_tiny",
        "--no_vision_zoe",
        "--image_size", "56",
        "--seq_len", "80",
        "--max_steps", "2",
        "--use_lora", "--lora_rank", "4",
        "--mesh_data", "1", "--mesh_fsdp", "1", "--mesh_model", "1",
        "--shuffle_buffer_size", "4",
        "--save_steps", "2",
        "--logging_steps", "1",
        "--attn_backend", "xla",
    ])
    m2 = [json.loads(l) for l in open(os.path.join(out2, "metrics.jsonl"))]
    assert m2 and np.isfinite(m2[-1]["loss"])
