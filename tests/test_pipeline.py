"""End-to-end data pipeline tests on a synthetic bridge-like RLDS dataset:
schema parse -> episode decode -> restructure -> statistics -> traj
transforms -> interleave/shuffle/decode -> fixed-shape batches."""
import numpy as np
import pytest

from spatialvla_tpu.data.pipeline import (
    FrameTransformConfig,
    InterleavedRLDSDataset,
    RLDSDataSource,
    TrajTransformConfig,
)
from spatialvla_tpu.data.loader import VLABatcher
from spatialvla_tpu.processor import ByteTokenizer, SpatialVLAProcessor
from tests.fixtures import make_bridge_like_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rlds"))
    make_bridge_like_dataset(root)
    return root


def test_source_restructure(data_dir):
    src = RLDSDataSource("bridge_orig/1.0.0", data_dir, seed=0)
    trajs = list(src.iter_canonical())
    assert len(trajs) == 6
    t = trajs[0]
    # bridge transform drops 2 steps (first all-zero step + relabel tail)
    T = len(t["action"])
    assert T == 6
    assert t["action"].shape == (T, 7)
    assert set(t["observation"]) >= {"image_primary", "proprio", "timestep"}
    assert len(t["observation"]["image_primary"]) == T
    assert isinstance(t["observation"]["image_primary"][0], bytes)
    assert t["observation"]["proprio"].shape == (T, 8)  # EEF 6 + pad + gripper
    assert (t["task"]["language_instruction"] == "pick up the block").all()
    # gripper dim marked absolute
    assert t["absolute_action_mask"][:, 6].all()
    assert not t["absolute_action_mask"][:, :6].any()
    # gripper action binarized
    assert set(np.unique(t["action"][:, 6])) <= {0.0, 1.0}


def test_statistics(data_dir, tmp_path):
    src = RLDSDataSource("bridge_orig/1.0.0", data_dir)
    stats = src.statistics(cache_dir=str(tmp_path), force=True)
    assert stats["num_trajectories"] == 6
    assert stats["num_transitions"] == 36
    assert len(stats["action"]["q01"]) == 7
    # cache hit returns identical stats
    stats2 = src.statistics(cache_dir=str(tmp_path))
    assert stats == stats2


def test_rank_sharding(data_dir):
    s0 = RLDSDataSource("bridge_orig/1.0.0", data_dir, shard_by_rank=(0, 2))
    s1 = RLDSDataSource("bridge_orig/1.0.0", data_dir, shard_by_rank=(1, 2))
    assert len(s0.shards) == 1 and len(s1.shards) == 1
    assert s0.shards != s1.shards


def test_interleaved_frames(data_dir):
    ds = InterleavedRLDSDataset(
        [("bridge_orig/1.0.0", 1.0)],
        data_dir,
        traj_config=TrajTransformConfig(forward_window_size=3),
        frame_config=FrameTransformConfig(resize_size=(56, 56), augment=True),
        shuffle_buffer_size=8,
        seed=0,
    )
    assert len(ds) == ds.epoch_length > 0
    it = ds.frames()
    frames = [next(it) for _ in range(12)]
    f = frames[0]
    assert f["image_primary"].shape == (56, 56, 3)
    assert f["image_primary"].dtype == np.uint8
    assert f["action"].shape == (4, 7)
    assert -1.0 <= f["action"][:, :6].min() and f["action"][:, :6].max() <= 1.0
    assert f["language_instruction"] == "pick up the block"


def test_batcher_shapes(data_dir):
    ds = InterleavedRLDSDataset(
        [("bridge_orig/1.0.0", 1.0)],
        data_dir,
        frame_config=FrameTransformConfig(resize_size=(56, 56), augment=False),
        shuffle_buffer_size=4,
        seed=1,
    )
    proc = SpatialVLAProcessor(
        ByteTokenizer(),
        image_token_id=5000,
        action_token_begin_idx=6000,
        image_seq_length=16,
        image_size=56,
        statistics=ds.statistics,
        action_chunk_size=4,
    )
    batcher = VLABatcher(proc, batch_size=3, seq_len=96)
    batch = next(batcher.batches(ds.frames()))
    assert batch["input_ids"].shape == (3, 96)
    assert batch["pixel_values"].shape == (3, 56, 56, 3)
    assert batch["labels"].shape == (3, 96)
    assert batch["intrinsic"].shape == (3, 3, 3)
    assert batch["actions"].shape == (3, 4, 7)
    # 12 action tokens + eos are the only label targets
    n_targets = (batch["labels"] != -100).sum(axis=1)
    np.testing.assert_array_equal(n_targets, 13)
    # action ids are in the action block
    act_labels = batch["labels"][batch["token_type_ids"] == 1]
    act_ids = act_labels[act_labels >= 6000]
    assert len(act_ids) == 3 * 12
    assert (act_ids < 6000 + 8194).all()


def test_fit_gaussian_params(data_dir):
    """Gaussian stats fitting produces the gs_*.json schema with sane values."""
    from spatialvla_tpu.data.statistics import fit_gaussian_params

    src = RLDSDataSource("bridge_orig/1.0.0", data_dir)
    actions = np.concatenate([t["action"] for t in src.iter_canonical()])
    gs = fit_gaussian_params(actions)
    assert set(gs) == {"x", "y", "z", "theta", "phi", "r", "roll", "pitch", "yaw"}
    for v in gs.values():
        assert np.isfinite(v["mu"]) and v["sigma"] >= 0
    assert 0 <= gs["theta"]["mu"] <= np.pi
    assert 0 <= gs["r"]["mu"] <= np.sqrt(3)

    # feed the fitted stats straight into a bin policy + tokenizer
    from spatialvla_tpu.action import SpatialActionTokenizer

    tok = SpatialActionTokenizer(gs_params=gs)
    ids = tok.encode(np.clip(actions[:8], -1, 1))
    assert ids.shape == (8, 3)
