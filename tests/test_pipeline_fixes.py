"""Regression tests for the round-2 review-pass data-pipeline fixes:
full-dataset statistics under rank sharding, shuffle_buffer_size=0,
depth/RGB crop alignment, and mixed-key batch stacking."""
import itertools

import numpy as np
import pytest

from spatialvla_tpu.data import (
    FrameTransformConfig,
    InterleavedRLDSDataset,
    TrajTransformConfig,
)
from spatialvla_tpu.data.pipeline import RLDSDataSource
from tests.fixtures import make_bridge_like_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rlds"))
    make_bridge_like_dataset(root, n_shards=4, episodes_per_shard=3,
                             steps_per_episode=8, img_hw=(48, 64))
    return root


def test_statistics_identical_across_ranks(data_dir, tmp_path):
    """Normalization stats must come from the FULL dataset regardless of the
    rank's shard subset (multi-host training normalizes identically)."""
    stats = []
    for rank, world in ((0, 1), (0, 2), (1, 2)):
        src = RLDSDataSource(
            "bridge_orig/1.0.0", data_dir, shard_by_rank=(rank, world),
        )
        stats.append(src.statistics(force=True, cache_dir=str(tmp_path / f"c{rank}{world}")))
    for s in stats[1:]:
        assert s["num_transitions"] == stats[0]["num_transitions"]
        np.testing.assert_allclose(
            s["action"]["q99"], stats[0]["action"]["q99"]
        )
        np.testing.assert_allclose(
            s["action"]["q01"], stats[0]["action"]["q01"]
        )


def test_more_ranks_than_shards_streams_full_dataset(data_dir):
    """world > n_shards: every rank gets ALL shards (per-rank seed), not a
    mix of one-shard and full-dataset ranks."""
    src = RLDSDataSource(
        "bridge_orig/1.0.0", data_dir, shard_by_rank=(5, 8),
    )
    assert src.shards == src.all_shards


def test_shuffle_buffer_zero_disables_shuffling(data_dir):
    ds = InterleavedRLDSDataset(
        [("bridge_orig/1.0.0", 1.0)], data_dir,
        traj_config=TrajTransformConfig(forward_window_size=1),
        frame_config=FrameTransformConfig(resize_size=(48, 64), augment=False,
                                          num_workers=0),
        shuffle_buffer_size=0,
    )
    frames = list(itertools.islice(ds.frames(), 5))
    assert len(frames) == 5
    assert all(np.isfinite(f["action"]).all() for f in frames)


def test_depth_crop_follows_image_crop(data_dir):
    """With a random crop active, the depth override must cover the SAME
    region as the augmented RGB (Ego3D backprojection alignment). The depth
    here is a horizontal ramp, so the cropped+resized values pin the crop
    window."""
    ds = InterleavedRLDSDataset(
        [("bridge_orig/1.0.0", 1.0)], data_dir,
        traj_config=TrajTransformConfig(forward_window_size=1),
        frame_config=FrameTransformConfig(
            resize_size=(48, 64), augment=True,
            augment_kwargs={
                "augment_order": ["random_resized_crop"],
                # aggressive crop so misalignment is unmistakable
                "random_resized_crop": {"scale": (0.5, 0.5), "ratio": (1.0, 1.0)},
            },
            num_workers=0,
        ),
        shuffle_buffer_size=0,  # yield-through (a 1-frame stream must yield)
        load_depth=False,  # synthesize depth below, deterministic ramp
    )
    # grab a raw frame and run the decode path manually via the public
    # stream after injecting a ramp depth
    stream = ds._frame_stream(0)
    frame = next(stream)
    h_raw, w_raw = 40, 52
    ramp = np.tile(np.linspace(1.0, 2.0, w_raw, dtype=np.float32), (h_raw, 1))
    frame["depth_primary"] = ramp

    # run it through the real decode path: swap the stream for one that
    # yields exactly this frame
    orig = ds._frame_stream
    ds._frame_stream = lambda idx: iter([frame])
    try:
        decoded = next(ds.frames())
    finally:
        ds._frame_stream = orig

    depth = decoded["depth_primary"]
    img = decoded["image_primary"]
    assert depth.shape == img.shape[:2]
    lo, hi = float(depth.min()), float(depth.max())
    # a ~sqrt(0.5)-width crop of a [1,2] ramp spans ~0.7 of the range;
    # an uncropped resize would span ~the full [1,2]
    assert hi - lo < 0.85, (lo, hi)
    assert 1.0 - 1e-3 <= lo and hi <= 2.0 + 1e-3


def test_mixed_optional_keys_do_not_crash_batcher(data_dir):
    from spatialvla_tpu.data.loader import VLABatcher
    from spatialvla_tpu.processor import ByteTokenizer, SpatialVLAProcessor

    ds = InterleavedRLDSDataset(
        [("bridge_orig/1.0.0", 1.0)], data_dir,
        traj_config=TrajTransformConfig(forward_window_size=1),
        frame_config=FrameTransformConfig(resize_size=(48, 64), augment=False,
                                          num_workers=0),
        shuffle_buffer_size=1,
    )
    proc = SpatialVLAProcessor(
        ByteTokenizer(), image_token_id=1000, action_token_begin_idx=1024,
        image_seq_length=12, image_size=48, statistics=ds.statistics,
    )
    batcher = VLABatcher(proc, batch_size=4, seq_len=80)

    def frames_with_partial_depth():
        for i, f in enumerate(ds.frames()):
            if i % 2 == 0:  # alternate depth presence within one batch
                f = dict(f)
                f["depth_primary"] = np.ones((48, 64), np.float32)
            yield f

    batch = next(batcher.batches(frames_with_partial_depth()))
    assert "depth" not in batch  # dropped for the mixed batch, no crash
    assert batch["input_ids"].shape[0] == 4


def test_predict_batch_mixed_lengths_matches_single(tmp_path):
    """predict_batch with right-padded mixed-length prompts must produce the
    SAME action ids as per-sample predict (pad keys masked, positions from
    the mask, last-valid-token readout)."""
    from tests.test_hf_checkpoint import _build_reference_style_checkpoint
    from spatialvla_tpu.inference import SpatialVLAPolicy

    _build_reference_style_checkpoint(tmp_path)
    policy = SpatialVLAPolicy.from_hf_checkpoint(str(tmp_path), param_dtype=None)
    rng = np.random.RandomState(2)
    images = [(rng.rand(64, 80, 3) * 255).astype(np.uint8) for _ in range(2)]
    instructions = ["pick", "pick up the small green block on the left"]

    singles = [
        policy.predict(im, txt, unnorm_key="bridge_orig/1.0.0")
        for im, txt in zip(images, instructions)
    ]
    batch = policy.predict_batch(images, instructions, unnorm_key="bridge_orig/1.0.0")
    for i, single in enumerate(singles):
        np.testing.assert_array_equal(
            batch["action_ids"][i], single["action_ids"], err_msg=f"row {i}"
        )
