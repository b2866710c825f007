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


def preprocess_image(image, size: int = 224) -> np.ndarray:
    """PIL image / (H, W, 3) uint8 array -> (size, size, 3) float32 in [0,1],
    NHWC (no normalization)."""
    try:
        from PIL import Image

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image).astype(np.uint8))
        image = image.convert("RGB").resize((size, size), Image.BICUBIC)
        arr = np.asarray(image, dtype=np.float32)
    except ImportError:  # PIL-free fallback: jax.image bicubic
        import jax
        import jax.numpy as jnp

        arr = jnp.asarray(np.asarray(image), dtype=jnp.float32)
        arr = jax.image.resize(arr, (size, size, 3), method="bicubic")
        arr = np.asarray(jnp.clip(arr, 0, 255))
    return arr / 255.0


def preprocess_images(images, size: int = 224) -> np.ndarray:
    """List of images -> (B, size, size, 3) float32 batch."""
    return np.stack([preprocess_image(im, size) for im in images])
