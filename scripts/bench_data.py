#!/usr/bin/env python
"""Input-pipeline throughput benchmark (target: >2k frames/sec/host,
BASELINE.md). Measures the native loader + transforms + decode/augment on a
synthetic bridge-like dataset (or a real dataset dir if given)."""
import argparse
import itertools
import tempfile
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root_dir", default=None)
    p.add_argument("--dataset", default="bridge_orig/1.0.0")
    p.add_argument("--n_frames", type=int, default=2000)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--no_augment", action="store_true")
    p.add_argument(
        "--stream_only", action="store_true",
        help="measure the serial frame stream (sampling + shuffle + traj "
        "transforms, no decode) — this is the GIL-bound part that caps "
        "multi-core scaling of the full pipeline",
    )
    p.add_argument(
        "--workers", type=int, default=0,
        help=">0 measures the process-sharded loader (data/mploader.py) "
        "with N worker processes instead of the in-process pipeline",
    )
    args = p.parse_args()

    from spatialvla_tpu.data import (
        FrameTransformConfig,
        InterleavedRLDSDataset,
        TrajTransformConfig,
    )

    root = args.data_root_dir
    if root is None:
        import sys
        sys.path.insert(0, "tests")
        from fixtures import make_bridge_like_dataset

        tmp = tempfile.mkdtemp()
        make_bridge_like_dataset(
            tmp, n_shards=4, episodes_per_shard=16, steps_per_episode=32,
            img_hw=(256, 320),
        )
        root = tmp

    ds = InterleavedRLDSDataset(
        [(args.dataset, 1.0)], root,
        traj_config=TrajTransformConfig(forward_window_size=3),
        frame_config=FrameTransformConfig(
            resize_size=(args.image_size, args.image_size),
            augment=not args.no_augment,
        ),
        shuffle_buffer_size=256,
    )
    if args.stream_only:
        import numpy as np

        rng = np.random.default_rng(0)
        streams = [ds._frame_stream(i) for i in range(len(ds.sources))]
        buffer = []

        def undecoded():
            n, cap = len(streams), ds.shuffle_buffer_size
            while True:
                idxs = rng.choice(n, size=1024, p=ds.sample_weights)
                swaps = rng.integers(0, max(cap, 1), size=1024)
                for idx, swap in zip(idxs.tolist(), swaps.tolist()):
                    try:
                        frame = next(streams[idx])
                    except StopIteration:
                        continue
                    if len(buffer) < cap:
                        buffer.append(frame)
                        continue
                    out, buffer[swap] = buffer[swap], frame
                    yield out

        it = undecoded()
        loader = None
    elif args.workers > 0:
        from spatialvla_tpu.data.mploader import ProcessShardedFrameLoader

        loader = ProcessShardedFrameLoader(
            dict(
                mixture=[(args.dataset, 1.0)],
                data_dir=root,
                traj_config=TrajTransformConfig(forward_window_size=3),
                frame_config=FrameTransformConfig(
                    resize_size=(args.image_size, args.image_size),
                    augment=not args.no_augment,
                ),
                shuffle_buffer_size=256,
                statistics_override=ds.statistics,
            ),
            num_workers=args.workers,
        )
        it = loader.frames()
    else:
        it = ds.frames()
        loader = None
    next(it)  # warm
    t0 = time.perf_counter()
    for _ in itertools.islice(it, args.n_frames):
        pass
    dt = time.perf_counter() - t0
    tag = (
        "stream only, no decode" if args.stream_only
        else f"{args.workers} worker processes" if args.workers > 0
        else "single process"
    )
    print(f"{args.n_frames / dt:.1f} frames/sec ({tag})")
    if loader is not None:
        loader.close()


if __name__ == "__main__":
    main()
