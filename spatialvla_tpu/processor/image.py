"""Host-side image preprocessing for standalone inference.

The reference uses SiglipImageProcessor with do_normalize=False
(spatialvla_pretrain.py:366): bicubic resize to (224, 224) + rescale to
[0, 1]; SigLIP mean/std normalization happens *inside the model* so the raw
pixels can also feed the depth branch (modeling_spatialvla.py:308-315).

Batched training data goes through the tf.data pipeline instead
(spatialvla_tpu.data); this module is for the predict_action /
single-image serving path.
"""
from __future__ import annotations

import numpy as np


def resize_image_u8(image, size: int = 224):
    """PIL bicubic resize to (size, size, 3) uint8 — the exact-u8 source of
    the f32 pixels (pixel_values == u8 / 255 bitwise) — or None when PIL is
    unavailable (the jax bicubic fallback lands off the u8/255 grid).

    Serving ships this u8 form over the wire at 4x fewer bytes than f32 and
    rescales on-device with the same /255 divide (split_engine._put_pixels);
    exposing it here saves the engine re-deriving it per request (rint +
    full-array equality compare, ~2 ms of host time per submit that
    serialized the 16-client resubmission burst under the GIL)."""
    try:
        from PIL import Image
    except ImportError:
        return None
    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image).astype(np.uint8))
    return np.asarray(
        image.convert("RGB").resize((size, size), Image.BICUBIC),
        dtype=np.uint8,
    )


def preprocess_image(image, size: int = 224) -> np.ndarray:
    """PIL image / (H, W, 3) uint8 array -> (size, size, 3) float32 in [0,1],
    NHWC (no normalization)."""
    u8 = resize_image_u8(image, size)
    if u8 is not None:
        return u8.astype(np.float32) / 255.0
    # PIL-free fallback: jax.image bicubic
    import jax
    import jax.numpy as jnp

    arr = jnp.asarray(np.asarray(image), dtype=jnp.float32)
    arr = jax.image.resize(arr, (size, size, 3), method="bicubic")
    return np.asarray(jnp.clip(arr, 0, 255)) / 255.0


def preprocess_images(images, size: int = 224) -> np.ndarray:
    """List of images -> (B, size, size, 3) float32 batch."""
    return np.stack([preprocess_image(im, size) for im in images])


def preprocess_images_u8(images, size: int = 224):
    """List of images -> (B, size, size, 3) uint8 batch whose /255 equals
    preprocess_images bitwise, or None on the PIL-free fallback path."""
    out = []
    for im in images:
        u8 = resize_image_u8(im, size)
        if u8 is None:
            return None
        out.append(u8)
    return np.stack(out)
