from .image import preprocess_image, preprocess_images
from .processor import IGNORE_INDEX, SpatialVLAProcessor, scale_intrinsics
from .text_tokenizer import ByteTokenizer, HFTokenizerAdapter, TextTokenizer

__all__ = [
    "IGNORE_INDEX",
    "ByteTokenizer",
    "HFTokenizerAdapter",
    "SpatialVLAProcessor",
    "TextTokenizer",
    "preprocess_image",
    "preprocess_images",
    "scale_intrinsics",
]
