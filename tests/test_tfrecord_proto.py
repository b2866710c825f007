"""TFRecord container + tf.Example codec parity vs TensorFlow."""
import numpy as np
import pytest

from spatialvla_tpu.data import example_proto, tfrecord

tf = pytest.importorskip("tensorflow")


def test_crc_matches_tf_writer(tmp_path):
    """Records written by tf.io.TFRecordWriter parse back (with CRC check)."""
    path = str(tmp_path / "tf_written.tfrecord")
    payloads = [b"hello", b"", b"x" * 1000, np.random.RandomState(0).bytes(257)]
    with tf.io.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    got = list(tfrecord.read_records(path, verify_crc=True))
    assert got == payloads


def test_our_writer_readable_by_tf(tmp_path):
    path = str(tmp_path / "ours.tfrecord")
    payloads = [b"abc", b"d" * 129]
    tfrecord.write_records(path, payloads)
    ds = tf.data.TFRecordDataset(path)
    got = [r.numpy() for r in ds]
    assert got == payloads
    assert tfrecord.count_records(path) == 2


def _tf_example(features):
    f = {}
    for k, v in features.items():
        if isinstance(v[0], bytes):
            f[k] = tf.train.Feature(bytes_list=tf.train.BytesList(value=v))
        elif isinstance(v[0], int):
            f[k] = tf.train.Feature(int64_list=tf.train.Int64List(value=v))
        else:
            f[k] = tf.train.Feature(float_list=tf.train.FloatList(value=v))
    return tf.train.Example(features=tf.train.Features(feature=f)).SerializeToString()


FEATURES = {
    "steps/observation/image": [b"\xff\xd8jpegdata", b"more"],
    "steps/action": [0.25, -1.5, 3.0, 1e-8],
    "steps/is_terminal": [0, 1, -7, 2**40],
    "episode_metadata/file_path": [b"/data/ep0"],
}


def test_parse_example_parity():
    payload = _tf_example(FEATURES)
    got = example_proto.parse_example(payload)
    assert got["steps/observation/image"] == FEATURES["steps/observation/image"]
    np.testing.assert_allclose(got["steps/action"], FEATURES["steps/action"], rtol=1e-7)
    assert got["steps/is_terminal"] == FEATURES["steps/is_terminal"]
    assert got["episode_metadata/file_path"] == FEATURES["episode_metadata/file_path"]


def test_serialize_example_readable_by_tf():
    payload = example_proto.serialize_example(FEATURES)
    ex = tf.train.Example()
    ex.ParseFromString(payload)
    f = ex.features.feature
    assert list(f["steps/observation/image"].bytes_list.value) == FEATURES["steps/observation/image"]
    np.testing.assert_allclose(
        list(f["steps/action"].float_list.value), FEATURES["steps/action"], rtol=1e-7
    )
    assert list(f["steps/is_terminal"].int64_list.value) == FEATURES["steps/is_terminal"]


def test_round_trip_ours():
    payload = example_proto.serialize_example(FEATURES)
    got = example_proto.parse_example(payload)
    assert got["steps/is_terminal"] == FEATURES["steps/is_terminal"]
    assert got["steps/observation/image"] == FEATURES["steps/observation/image"]
