"""Synthetic RLDS/TFDS dataset fixtures (bridge_orig-like schema)."""
import io
import json
import os

import numpy as np

from spatialvla_tpu.data import example_proto, tfrecord


def _feature_tensor(dtype, dims):
    return {
        "pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
        "tensor": {"shape": {"dimensions": [str(d) for d in dims]}, "dtype": dtype},
    }


def _feature_image(h, w):
    return {
        "pythonClassName": "tensorflow_datasets.core.features.image_feature.Image",
        "image": {
            "shape": {"dimensions": [str(h), str(w), "3"]},
            "dtype": "uint8",
            "encodingFormat": "jpeg",
        },
    }


def _feature_text():
    return {
        "pythonClassName": "tensorflow_datasets.core.features.text_feature.Text",
        "text": {},
    }


def _fdict(features):
    return {
        "pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
        "featuresDict": {"features": features},
    }


def bridge_like_features_json(img_hw=(48, 64)):
    h, w = img_hw
    steps = _fdict(
        {
            "observation": _fdict(
                {
                    "image_0": _feature_image(h, w),
                    "image_1": _feature_image(h, w),
                    "state": _feature_tensor("float32", [7]),
                }
            ),
            "action": _feature_tensor("float32", [7]),
            "language_instruction": _feature_text(),
            "is_terminal": _feature_tensor("bool", []),
        }
    )
    return _fdict(
        {
            "steps": {
                "pythonClassName": "tensorflow_datasets.core.features.dataset_feature.Dataset",
                "sequence": {"feature": steps},
            },
            "episode_metadata": _fdict({"file_path": _feature_text()}),
        }
    )


def _jpeg(rng, h, w):
    from PIL import Image

    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def make_bridge_like_dataset(
    root, name="bridge_orig/1.0.0", n_shards=2, episodes_per_shard=3,
    steps_per_episode=8, img_hw=(48, 64), seed=0, instruction=b"pick up the block",
):
    """Writes a TFDS-layout dataset dir; returns (data_dir, dataset_dir)."""
    rng = np.random.RandomState(seed)
    h, w = img_hw
    ds_dir = os.path.join(root, name)
    os.makedirs(ds_dir, exist_ok=True)
    with open(os.path.join(ds_dir, "features.json"), "w") as f:
        json.dump(bridge_like_features_json(img_hw), f)

    total = n_shards * episodes_per_shard
    info = {
        "name": name.split("/")[0],
        "version": name.split("/")[1],
        "splits": [
            {
                "name": "train",
                "shardLengths": [str(episodes_per_shard)] * n_shards,
            }
        ],
    }
    with open(os.path.join(ds_dir, "dataset_info.json"), "w") as f:
        json.dump(info, f)

    base = name.split("/")[0]
    for s in range(n_shards):
        records = []
        for _ in range(episodes_per_shard):
            T = steps_per_episode
            # smooth state trajectory; action = deltas + gripper
            state = np.cumsum(rng.randn(T, 7).astype(np.float32) * 0.02, axis=0)
            state[:, 6] = (rng.rand(T) > 0.5).astype(np.float32)
            action = rng.randn(T, 7).astype(np.float32) * 0.05
            action[:, 6] = rng.choice([0.0, 1.0], T)
            feats = {
                "steps/observation/image_0": [_jpeg(rng, h, w) for _ in range(T)],
                "steps/observation/image_1": [_jpeg(rng, h, w) for _ in range(T)],
                "steps/observation/state": state.reshape(-1).tolist(),
                "steps/action": action.reshape(-1).tolist(),
                "steps/language_instruction": [instruction] * T,
                "steps/is_terminal": [0] * (T - 1) + [1],
                "episode_metadata/file_path": [b"/synthetic"],
            }
            records.append(example_proto.serialize_example(feats))
        shard = os.path.join(
            ds_dir, f"{base}-train.tfrecord-{s:05d}-of-{n_shards:05d}"
        )
        tfrecord.write_records(shard, records)
    return root, ds_dir
