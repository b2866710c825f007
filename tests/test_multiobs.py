"""Multi-view / multi-observation / depth data flow: pipeline -> batcher ->
model (reference obs handling: data/obs_transforms.py:47-113; multi-obs
collation: train/monkey_patch.py:21-75). The model's (B, k, H, W, 3) path
exists since round 1 — these tests prove real pipeline batches reach it."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvla_tpu.data import (
    FrameTransformConfig,
    InterleavedRLDSDataset,
    TrajTransformConfig,
    VLABatcher,
)
from spatialvla_tpu.processor import ByteTokenizer, SpatialVLAProcessor
from tests.fixtures import make_bridge_like_dataset

H = W = 56


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rlds_mv"))
    make_bridge_like_dataset(root, img_hw=(48, 64))
    return root


def make_processor(stats, image_seq_length=4):
    return SpatialVLAProcessor(
        ByteTokenizer(),
        image_token_id=5000,
        action_token_begin_idx=6000,
        image_seq_length=image_seq_length,
        image_size=H,
        statistics=stats,
    )


def test_multiview_frames_and_batch(data_dir):
    ds = InterleavedRLDSDataset(
        "bridge", data_dir,
        traj_config=TrajTransformConfig(forward_window_size=1),
        frame_config=FrameTransformConfig(resize_size=(H, W), augment=False,
                                          num_workers=0),
        shuffle_buffer_size=2,
        load_camera_views=("primary", "secondary"),
    )
    frame = next(ds.frames())
    assert frame["image_primary"].shape == (H, W, 3)
    assert frame["image_secondary"].shape == (H, W, 3)

    proc = make_processor(ds.statistics)
    batcher = VLABatcher(proc, batch_size=2, seq_len=64)
    batch = next(batcher.batches(ds.frames()))
    # two views -> k=2 image stack and 2 image-token blocks in the prompt
    assert batch["pixel_values"].shape == (2, 2, H, W, 3)
    n_img_tokens = int((batch["input_ids"] == 5000).sum(axis=1)[0])
    assert n_img_tokens == 2 * proc.image_seq_length


def test_multiobs_window_frames_and_batch(data_dir):
    ds = InterleavedRLDSDataset(
        "bridge", data_dir,
        traj_config=TrajTransformConfig(
            backward_window_size=1, forward_window_size=1
        ),
        frame_config=FrameTransformConfig(resize_size=(H, W), augment=False,
                                          num_workers=0),
        shuffle_buffer_size=2,
    )
    frame = next(ds.frames())
    assert frame["image_primary"].shape == (2, H, W, 3)  # obs window k=2

    proc = make_processor(ds.statistics)
    batcher = VLABatcher(proc, batch_size=2, seq_len=64)
    batch = next(batcher.batches(ds.frames()))
    assert batch["pixel_values"].shape == (2, 2, H, W, 3)


def test_multiview_batch_trains(data_dir):
    """A (B, k, ...) pipeline batch runs a real train step (finite loss)."""
    from spatialvla_tpu.config import spatialvla_tiny
    from spatialvla_tpu.models import spatialvla
    from spatialvla_tpu.train import (
        OptimizerConfig, TrainStepConfig, init_train_state, make_optimizer,
        make_train_step, trainable_mask,
    )

    cfg = spatialvla_tiny(use_vision_zoe=False)
    ds = InterleavedRLDSDataset(
        "bridge", data_dir,
        traj_config=TrajTransformConfig(forward_window_size=1),
        frame_config=FrameTransformConfig(resize_size=(56, 56), augment=False,
                                          num_workers=0),
        shuffle_buffer_size=2,
        load_camera_views=("primary", "secondary"),
    )
    proc = SpatialVLAProcessor(
        ByteTokenizer(),
        image_token_id=cfg.image_token_index,
        action_token_begin_idx=cfg.action_token_begin_idx,
        image_seq_length=cfg.num_image_tokens,
        image_size=56,
        statistics=ds.statistics,
    )
    batcher = VLABatcher(proc, batch_size=2, seq_len=96)
    batch = next(batcher.batches(ds.frames()))
    batch.pop("actions")

    params = spatialvla.init_params(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, freeze_llm_embed=True)
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=2, schedule="constant"),
        params, mask,
    )
    state = init_train_state(params, tx)
    step = make_train_step(
        cfg, tx, TrainStepConfig(use_remat=False, compute_dtype=jnp.float32)
    )
    state, metrics = jax.jit(step)(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_depth_obs_reaches_batch():
    """A decoded frame with depth_primary produces a batch['depth'] leaf
    that the train step forwards to the model's depth override."""
    proc = make_processor(
        {"x/1.0.0": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7}}}
    )
    batcher = VLABatcher(proc, batch_size=1, seq_len=64)
    frame = {
        "language_instruction": "up",
        "action": np.zeros((2, 7), np.float32),
        "image_primary": np.zeros((H, W, 3), np.uint8),
        "depth_primary": np.full((H, W), 1.5, np.float32),
        "dataset_name": "x/1.0.0",
    }
    row = batcher.encode_frame(frame)
    assert row["depth"].shape == (H, W)
    assert np.allclose(row["depth"], 1.5)
