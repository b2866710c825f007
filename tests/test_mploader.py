"""Process-sharded frame loader (data/mploader.py, VERDICT r2 #6): N worker
processes over disjoint shard subsets feeding frames through an IPC queue,
statistics reused from the parent (no per-worker statistics race)."""
import numpy as np
import pytest

from spatialvla_tpu.data.mploader import (
    ProcessShardedFrameLoader,
    compose_shard,
)
from spatialvla_tpu.data.pipeline import (
    FrameTransformConfig,
    InterleavedRLDSDataset,
    TrajTransformConfig,
)
from tests.fixtures import make_bridge_like_dataset


def test_compose_shard_disjoint_cover():
    """(rank, world) x (worker, W) covers 0..world*W-1 exactly once."""
    world, W = 3, 4
    slots = sorted(
        compose_shard((r, world), i, W)[0] for r in range(world) for i in range(W)
    )
    assert slots == list(range(world * W))
    assert all(
        compose_shard((r, world), i, W)[1] == world * W
        for r in range(world) for i in range(W)
    )


@pytest.mark.parametrize("num_workers", [1, 2])
def test_mploader_frames(tmp_path, num_workers):
    make_bridge_like_dataset(str(tmp_path), n_shards=2, episodes_per_shard=3)
    # parent-side dataset for statistics (as the pretrain CLI does)
    parent = InterleavedRLDSDataset(
        [("bridge_orig/1.0.0", 1.0)], str(tmp_path),
        traj_config=TrajTransformConfig(forward_window_size=3),
        frame_config=FrameTransformConfig(resize_size=(48, 48), augment=False),
        shuffle_buffer_size=8, seed=0,
    )
    kwargs = dict(
        mixture=[("bridge_orig/1.0.0", 1.0)],
        data_dir=str(tmp_path),
        traj_config=TrajTransformConfig(forward_window_size=3),
        frame_config=FrameTransformConfig(resize_size=(48, 48), augment=False),
        shuffle_buffer_size=8,
        seed=0,
        statistics_override=parent.statistics,
    )
    with ProcessShardedFrameLoader(kwargs, num_workers=num_workers, queue_depth=64) as loader:
        frames = []
        it = loader.frames()
        for _ in range(24):
            frames.append(next(it))
    assert len(frames) == 24
    for f in frames:
        assert f["image_primary"].shape[-3:] == (48, 48, 3)
        assert np.asarray(f["action"]).shape == (4, 7)
        assert "language_instruction" in f
    # normalization used the parent statistics: actions clipped to [-1, 1]
    acts = np.stack([np.asarray(f["action"]) for f in frames])
    assert np.abs(acts[..., :6]).max() <= 1.0 + 1e-6


def test_mploader_surfaces_worker_failure(tmp_path):
    kwargs = dict(
        mixture=[("bridge_orig/1.0.0", 1.0)],
        data_dir=str(tmp_path / "nonexistent"),
    )
    loader = ProcessShardedFrameLoader(kwargs, num_workers=1, queue_depth=8)
    try:
        with pytest.raises(RuntimeError, match="worker"):
            next(loader.frames())
    finally:
        loader.close()
