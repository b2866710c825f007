"""Native fused augment (csrc rlds_augment) vs the pure-Python ops, applied
with IDENTICAL parameters. Guards the photometric semantics the C++ path
must share with data/augment.py (post-brightness contrast mean, pre-HSV
clipping, Rec.601 saturation) — regression test for two real divergences
found in review."""
import numpy as np
import pytest

from spatialvla_tpu.data import native
from spatialvla_tpu.data.augment import (
    _resize_bilinear,
    _hsv_to_rgb,
    _rgb_to_hsv,
)

pytestmark = pytest.mark.skipif(
    not native.available() or not hasattr(native._load(), "rlds_augment"),
    reason="native augment unavailable",
)


def _py_chain(img, crop, b_delta, c_factor, s_factor, h_delta):
    """The Python photometric chain with explicit params (the order of
    data/augment.py's DEFAULT augment_order: crop, brightness, contrast,
    saturation, hue)."""
    cy, cx, ch, cw = crop
    out = img[cy : cy + ch, cx : cx + cw].astype(np.float32)
    if (ch, cw) != img.shape[:2]:
        out = _resize_bilinear(out, img.shape[0], img.shape[1])
    out = out + np.float32(b_delta)
    mean = out.mean(axis=(0, 1), keepdims=True)
    out = (out - mean) * np.float32(c_factor) + mean
    gray = (0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2])[..., None]
    out = gray + (out - gray) * np.float32(s_factor)
    if h_delta != 0.0:
        img01 = np.clip(out, 0, 255) * np.float32(1 / 255.0)
        h, s, v = _rgb_to_hsv(img01)
        h = (h + np.float32(h_delta)) % 1.0
        out = _hsv_to_rgb(h, s, v) * np.float32(255.0)
    return np.clip(out, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("b_delta,c_factor,s_factor,h_delta", [
    (0.0, 1.0, 1.0, 0.0),          # identity
    (37.0, 1.0, 1.0, 0.0),         # brightness only
    (37.0, 1.17, 1.0, 0.0),        # brightness THEN contrast (mean coupling)
    (-28.0, 0.83, 1.15, 0.0),      # + saturation
    (42.0, 1.2, 0.9, 0.04),        # + hue (pre-HSV clip matters: bright px)
    (0.0, 1.0, 1.0, -0.05),        # hue only
])
def test_photometric_parity_full_frame(b_delta, c_factor, s_factor, h_delta):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
    H, W = img.shape[:2]
    crop = (0, 0, H, W)  # identity crop isolates the photometric chain
    got = native.augment_native(img, crop, b_delta, c_factor, s_factor, h_delta)
    assert got is not None
    want = _py_chain(img, crop, b_delta, c_factor, s_factor, h_delta)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # fast-math build + float op-order: allow 2 u8 LSB
    assert diff.max() <= 2, f"max diff {diff.max()} at {np.unravel_index(diff.argmax(), diff.shape)}"


def test_photometric_parity_with_crop():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    crop = (4, 6, 30, 44)
    got = native.augment_native(img, crop, 20.0, 1.1, 0.9, 0.0)
    assert got is not None
    want = _py_chain(img, crop, 20.0, 1.1, 0.9, 0.0)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # resize conventions may differ by interpolation-boundary handling;
    # compare loosely away from hard edges
    assert np.median(diff) <= 1
    assert (diff <= 3).mean() > 0.97, (diff.max(), (diff > 3).mean())
