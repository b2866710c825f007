"""Text tokenizer protocol + adapters.

The framework's processor works purely in id space (prompt ids are composed
directly — no "<ACTION00123>"-string round trip like the reference's
processing_spatialvla.py:118-124, which is a known hot-path wart). Any
tokenizer satisfying this small protocol plugs in:

  - encode(text) -> list[int]           (no BOS/EOS added)
  - bos_id / eos_id / pad_id / newline_id properties

`HFTokenizerAdapter` wraps a HuggingFace GemmaTokenizer for use with real
PaliGemma2 checkpoints; `ByteTokenizer` is a self-contained fallback for
tests and offline use.
"""
from __future__ import annotations

from typing import List, Protocol, Sequence


class TextTokenizer(Protocol):
    def encode(self, text: str) -> List[int]: ...

    @property
    def bos_id(self) -> int: ...

    @property
    def eos_id(self) -> int: ...

    @property
    def pad_id(self) -> int: ...


class ByteTokenizer:
    """UTF-8 byte-level tokenizer with reserved control ids.

    id layout: 0 = pad, 1 = bos, 2 = eos, 3..258 = bytes 0..255.
    Deterministic and dependency-free; used by tests and as an offline
    stand-in when no Gemma sentencepiece model is on disk."""

    vocab_size = 259

    def encode(self, text: str) -> List[int]:
        return [3 + b for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int]) -> str:
        return bytes(i - 3 for i in ids if i >= 3).decode("utf-8", errors="replace")

    @property
    def bos_id(self) -> int:
        return 1

    @property
    def eos_id(self) -> int:
        return 2

    @property
    def pad_id(self) -> int:
        return 0


class HFTokenizerAdapter:
    """Wraps a HuggingFace (Gemma/PaliGemma) tokenizer."""

    def __init__(self, tokenizer):
        self.tok = tokenizer

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def decode(self, ids) -> str:
        return self.tok.decode(ids)

    @property
    def bos_id(self) -> int:
        return self.tok.bos_token_id

    @property
    def eos_id(self) -> int:
        return self.tok.eos_token_id

    @property
    def pad_id(self) -> int:
        return self.tok.pad_token_id if self.tok.pad_token_id is not None else 0
