"""Native (C++) data loader vs pure-Python parity."""
import numpy as np
import pytest

from spatialvla_tpu.data import example_proto, native, tfrecord


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable")
    return True


def test_iter_records_matches_python(tmp_path, lib_ok):
    rng = np.random.RandomState(0)
    all_payloads = []
    paths = []
    for s in range(3):
        payloads = [rng.bytes(rng.randint(1, 500)) for _ in range(10)]
        p = str(tmp_path / f"shard{s}.tfrecord")
        tfrecord.write_records(p, payloads)
        paths.append(p)
        all_payloads.extend(payloads)
    got = list(native.iter_records(paths, n_threads=2, verify_crc=True))
    # threaded interleave may reorder across shards; compare as multisets
    assert sorted(got) == sorted(all_payloads)
    assert len(got) == 30


def test_parse_example_parity(lib_ok):
    features = {
        "steps/action": [0.5, -1.25, 3.5],
        "steps/observation/image": [b"\x01\x02", b"xyz"],
        "steps/discount": [7, -3, 2**40],
    }
    payload = example_proto.serialize_example(features)
    got = native.parse_example(payload)
    np.testing.assert_allclose(got["steps/action"], features["steps/action"])
    assert got["steps/observation/image"] == features["steps/observation/image"]
    np.testing.assert_array_equal(got["steps/discount"], features["steps/discount"])

    sel = native.parse_example_keys(payload, ["steps/action"])
    np.testing.assert_allclose(sel["steps/action"], features["steps/action"])


def test_decode_jpeg_resize(lib_ok):
    from PIL import Image
    import io

    rng = np.random.RandomState(1)
    img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    jpeg = buf.getvalue()

    out = native.decode_jpeg_resize(jpeg, 32, 48)
    assert out.shape == (32, 48, 3)
    # compare against PIL decode + box resize (loose: different filters)
    ref = np.asarray(
        Image.open(io.BytesIO(jpeg)).convert("RGB").resize((48, 32), Image.BOX)
    )
    err = np.abs(out.astype(np.int32) - ref.astype(np.int32)).mean()
    assert err < 12.0, err


def test_crc32c_known_vector(lib_ok):
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    import ctypes

    lib = native._load()
    lib.rlds_crc32c.restype = ctypes.c_uint32
    data = (ctypes.c_uint8 * 32)()
    assert lib.rlds_crc32c(data, 32) == 0x8A9136AA
    assert tfrecord.crc32c(bytes(32)) == 0x8A9136AA
