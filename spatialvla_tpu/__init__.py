"""spatialvla_tpu: a TPU-native (JAX/XLA/Pallas/pjit) vision-language-action
framework with the capabilities of SpatialVLA (RSS 2025).

Layers:
    config          typed configs + presets
    action          spatial action tokenizer (grids, bin policies)
    models          pure-functional JAX modules (SigLIP, Gemma2, Ego3D, Zoe, fusion)
    ops             Pallas TPU kernels (flash attention w/ softcap+GQA+SWA)
    parallel        device mesh / sharding rules ("communication backend")
    processor       prompt building, image preprocessing, action decoding
    data            RLDS/OXE host-side input pipeline
    train           pjit train step, LoRA, checkpoints, metrics
    convert         HF safetensors -> parameter pytrees
"""

__version__ = "0.1.0"

from . import config
from .config import (
    Ego3DConfig,
    Gemma2Config,
    SiglipVisionConfig,
    SpatialVLAConfig,
    ZoeDepthConfig,
    spatialvla_4b,
    spatialvla_tiny,
)
