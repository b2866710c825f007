"""Frame stream -> fixed-shape model batches.

Replaces the reference's per-sample processor call + HF collator
(data/dataset.py:121-154, monkey_patch.py:21-75): samples are tokenized in
id space and right-padded to one static sequence length so every training
step reuses a single compiled XLA program.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from ..processor import IGNORE_INDEX, SpatialVLAProcessor


class VLABatcher:
    def __init__(
        self,
        processor: SpatialVLAProcessor,
        *,
        batch_size: int,
        seq_len: int,
        default_prompt: str = "What action should the robot take to {}?",
    ):
        self.proc = processor
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.default_prompt = default_prompt

    def encode_frame(self, frame: Dict) -> Dict[str, np.ndarray]:
        instruction = frame.get("language_instruction", "")
        if isinstance(instruction, bytes):
            instruction = instruction.decode("utf-8")
        text = self.default_prompt.format(instruction) if "{}" in self.default_prompt else instruction
        tok = self.proc.text_tokenizer
        prefix = self.proc.build_prompt_ids(text)
        actions = np.asarray(frame["action"], dtype=np.float64)
        suffix = (
            self.proc.action_tokenizer.encode_to_global_ids(actions).reshape(-1).tolist()
            + [tok.eos_id]
        )
        T = self.seq_len
        ids = np.full((T,), tok.pad_id, dtype=np.int32)
        attn = np.zeros((T,), dtype=np.int32)
        ttype = np.zeros((T,), dtype=np.int32)
        n = min(len(prefix) + len(suffix), T)
        seq = (prefix + suffix)[:T]
        ids[:n] = seq
        attn[:n] = 1
        ttype[min(len(prefix), T) : n] = 1
        labels = np.where(ttype == 0, IGNORE_INDEX, ids)
        img = np.asarray(frame["image_primary"], dtype=np.float32) / 255.0
        K = self.proc.intrinsic_for(frame.get("dataset_name"))
        return {
            "input_ids": ids,
            "attention_mask": attn,
            "token_type_ids": ttype,
            "labels": labels,
            "pixel_values": img,
            "intrinsic": K,
            "actions": np.asarray(frame["action"], dtype=np.float32),
        }

    def batches(self, frames: Iterator[Dict]) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            rows = []
            for _ in range(self.batch_size):
                try:
                    rows.append(self.encode_frame(next(frames)))
                except StopIteration:
                    return
            yield {
                k: np.stack([r[k] for r in rows]) for k in rows[0].keys()
            }
