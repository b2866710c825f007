"""Image augmentations, NumPy (host CPU), matching the reference's fixed
augmentation recipe (data/dataset.py:84-101): random_resized_crop with
scale [0.9, 0.9] / ratio [1, 1], brightness 0.2, contrast [0.8, 1.2],
saturation [0.8, 1.2], hue 0.05, applied in that order, with a shared seed
across camera views of a frame (obs_transforms.py:17-44; padding images are
skipped upstream)."""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

DEFAULT_AUGMENT_KWARGS = {
    "random_resized_crop": {"scale": [0.9, 0.9], "ratio": [1.0, 1.0]},
    "random_brightness": [0.2],
    "random_contrast": [0.8, 1.2],
    "random_saturation": [0.8, 1.2],
    "random_hue": [0.05],
    "augment_order": [
        "random_resized_crop",
        "random_brightness",
        "random_contrast",
        "random_saturation",
        "random_hue",
    ],
}


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Simple bilinear resize (align_corners=False semantics)."""
    H, W = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * H / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * W / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    a = img[y0][:, x0].astype(np.float32)
    b = img[y0][:, x1].astype(np.float32)
    c = img[y1][:, x0].astype(np.float32)
    d = img[y1][:, x1].astype(np.float32)
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def random_resized_crop(img, rng, scale=(0.9, 0.9), ratio=(1.0, 1.0)):
    H, W = img.shape[:2]
    area = H * W
    s = rng.uniform(scale[0], scale[1])
    r = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
    ch = int(round(np.sqrt(area * s / r)))
    cw = int(round(np.sqrt(area * s * r)))
    ch, cw = min(ch, H), min(cw, W)
    y = rng.integers(0, H - ch + 1)
    x = rng.integers(0, W - cw + 1)
    crop = img[y : y + ch, x : x + cw]
    return _resize_bilinear(crop, H, W)


def random_brightness(img, rng, max_delta=0.2):
    delta = rng.uniform(-max_delta, max_delta) * 255.0
    return img.astype(np.float32) + delta


def random_contrast(img, rng, lo=0.8, hi=1.2):
    f = rng.uniform(lo, hi)
    mean = img.mean(axis=(0, 1), keepdims=True)
    return (img.astype(np.float32) - mean) * f + mean


def _rgb_to_hsv(img):
    img = img.astype(np.float32) / 255.0
    mx = img.max(-1)
    mn = img.min(-1)
    diff = mx - mn + 1e-8
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    h = np.zeros_like(mx)
    mask = mx == r
    h[mask] = ((g - b) / diff)[mask] % 6
    mask = mx == g
    h[mask] = ((b - r) / diff + 2)[mask]
    mask = mx == b
    h[mask] = ((r - g) / diff + 4)[mask]
    h = h / 6.0
    s = np.where(mx > 0, diff / (mx + 1e-8), 0.0)
    return np.stack([h, s, mx], -1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = np.floor(h).astype(int) % 6
    f = h - np.floor(h)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([r, g, b], -1) * 255.0


def random_saturation(img, rng, lo=0.8, hi=1.2):
    f = rng.uniform(lo, hi)
    hsv = _rgb_to_hsv(np.clip(img, 0, 255).astype(np.uint8))
    hsv[..., 1] = np.clip(hsv[..., 1] * f, 0, 1)
    return _hsv_to_rgb(hsv)


def random_hue(img, rng, max_delta=0.05):
    delta = rng.uniform(-max_delta, max_delta)
    hsv = _rgb_to_hsv(np.clip(img, 0, 255).astype(np.uint8))
    hsv[..., 0] = (hsv[..., 0] + delta) % 1.0
    return _hsv_to_rgb(hsv)


def augment_image(
    img: np.ndarray,
    rng: np.random.Generator,
    kwargs: Optional[Dict] = None,
) -> np.ndarray:
    """uint8 (H, W, 3) -> uint8 (H, W, 3) with the configured augmentations."""
    kwargs = kwargs or DEFAULT_AUGMENT_KWARGS
    out = img.astype(np.float32)
    for op in kwargs.get("augment_order", []):
        if op == "random_resized_crop" and "random_resized_crop" in kwargs:
            cfg = kwargs["random_resized_crop"]
            out = random_resized_crop(
                np.clip(out, 0, 255), rng,
                scale=cfg.get("scale", (0.9, 0.9)), ratio=cfg.get("ratio", (1.0, 1.0)),
            )
        elif op == "random_brightness" and "random_brightness" in kwargs:
            out = random_brightness(out, rng, *kwargs["random_brightness"])
        elif op == "random_contrast" and "random_contrast" in kwargs:
            out = random_contrast(out, rng, *kwargs["random_contrast"])
        elif op == "random_saturation" and "random_saturation" in kwargs:
            out = random_saturation(out, rng, *kwargs["random_saturation"])
        elif op == "random_hue" and "random_hue" in kwargs:
            out = random_hue(out, rng, *kwargs["random_hue"])
    return np.clip(out, 0, 255).astype(np.uint8)
