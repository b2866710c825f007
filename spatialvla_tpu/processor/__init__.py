from .image import preprocess_image, preprocess_images
from .processor import IGNORE_INDEX, SpatialVLAProcessor, scale_intrinsics
from .text_tokenizer import (
    ByteTokenizer,
    HFTokenizerAdapter,
    TextTokenizer,
    load_text_tokenizer,
)

__all__ = [
    "IGNORE_INDEX",
    "ByteTokenizer",
    "HFTokenizerAdapter",
    "SpatialVLAProcessor",
    "TextTokenizer",
    "load_text_tokenizer",
    "preprocess_image",
    "preprocess_images",
    "scale_intrinsics",
]
