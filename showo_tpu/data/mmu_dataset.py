"""Show-o2 MMU instruction dataset (show-o2/datasets/mmu_dataset.py).

LLaVA-OneVision-style conversations with the qwen chat template, <image>
splice -> [boi][img_pad x N][eoi], per-turn label masking of questions
(format_multi_sequence_und_qwen2_5, :95-156).
"""

from __future__ import annotations

import copy
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from showo_tpu.utils.image import image_transform
from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)

IGNORE_INDEX = -100
DEFAULT_SYSTEM_PROMPT = ("system\nYou are a helpful assistant.<|im_end|>")


def format_multi_sequence_und_qwen2_5(
    sources: List[List[int]], targets: List[List[int]], *,
    bos_id: int, eos_id: int, boi_id: int, eoi_id: int, pad_id: int,
    img_pad_id: int, img_id: int, num_image_tokens: int, max_seq_len: int,
    system_prompt_ids: Optional[List[int]] = None,
    role_a: Optional[List[int]] = None, role_b: Optional[List[int]] = None,
    ignore_question: bool = True, pretraining: bool = False,
):
    """Numpy port of mmu_dataset.py:95-156; returns the 5-tuple of
    fixed-shape buffers."""
    text_tokens: List[int] = []
    text_labels: List[int] = []
    modality_positions: List[Tuple[int, int]] = []

    cur_len = 1  # bos
    for source_ids, target_ids in zip(sources, targets):
        source_ids = list(source_ids)
        if not pretraining:
            source_ids = list(role_a) + source_ids + [eos_id] + list(role_b)
            if cur_len == 1:
                source_ids = list(system_prompt_ids) + source_ids
        if img_id in source_ids:
            i = source_ids.index(img_id)
            source_ids = (source_ids[:i] + [boi_id]
                          + [img_pad_id] * num_image_tokens + [eoi_id]
                          + source_ids[i + 1:])
            modality_positions.append((cur_len + i + 1, num_image_tokens))
        text_tokens.extend(source_ids + list(target_ids))
        if ignore_question:
            text_labels.extend([IGNORE_INDEX] * len(source_ids)
                               + copy.deepcopy(list(target_ids)))
        else:
            text_labels.extend(copy.deepcopy(source_ids + list(target_ids)))
        cur_len = len(text_tokens) + 1

    text_labels = [IGNORE_INDEX] + text_labels
    text_tokens = [bos_id] + text_tokens
    text_labels = (text_labels + [IGNORE_INDEX] * (max_seq_len - len(text_labels)))[:max_seq_len]
    text_tokens = (text_tokens + [pad_id] * (max_seq_len - len(text_tokens)))[:max_seq_len]
    tokens = np.asarray(text_tokens, np.int64)
    labels = np.asarray(text_labels, np.int64)

    if not modality_positions:
        modality_positions = [(0, 0)]
    mp = np.asarray(modality_positions, np.int64)
    tm = ((tokens != img_pad_id) & (tokens != pad_id)).astype(np.int64)
    im = (tokens == img_pad_id).astype(np.int64)
    return tokens, labels, mp, tm, im


class MMUDataset:
    """Conversation JSON records {"image": ..., "conversations": [...]}."""

    def __init__(self, json_path: str, image_root: str, tokenizer,
                 showo_token_ids: Dict[str, int], resolution: int = 432,
                 num_image_tokens: int = 730, max_seq_len: int = 1024,
                 stage: str = "tuning"):
        with open(json_path) as f:
            self.records = json.load(f)
        self.image_root = image_root
        self.tokenizer = tokenizer
        self.ids = showo_token_ids
        self.resolution = resolution
        self.num_image_tokens = num_image_tokens
        self.max_seq_len = max_seq_len
        self.pretraining = stage.startswith("pre-training")
        self._sys = self._tok(DEFAULT_SYSTEM_PROMPT)[:100]
        self._role_a = self._tok("\n<|im_start|>user\n")
        self._role_b = self._tok("\n<|im_start|>assistant\n")

    def _tok(self, text: str) -> List[int]:
        try:
            ids = self.tokenizer(text, add_special_tokens=False)["input_ids"]
        except TypeError:
            ids = self.tokenizer(text)["input_ids"]
        if ids and isinstance(ids[0], list):
            ids = ids[0]
        return list(ids)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx: int):
        from PIL import Image

        rec = self.records[idx % len(self.records)]
        conv = rec["conversations"]
        sources, targets = [], []
        img_marker = self.ids.get("img_id", -1)
        for turn in conv:
            # splice the <image> marker token id between text parts
            out: List[int] = []
            for part in turn["value"].split("<image>"):
                if out:
                    out.append(img_marker)
                out.extend(self._tok(part))
            if turn["from"] == "human":
                sources.append(out)
            else:
                targets.append(out)
        # pair up
        n = min(len(sources), len(targets))
        tokens, labels, mp, tm, im = format_multi_sequence_und_qwen2_5(
            sources[:n], targets[:n],
            bos_id=self.ids["bos_id"], eos_id=self.ids["eos_id"],
            boi_id=self.ids["boi_id"], eoi_id=self.ids["eoi_id"],
            pad_id=self.ids["pad_id"], img_pad_id=self.ids["img_pad_id"],
            img_id=img_marker, num_image_tokens=self.num_image_tokens,
            max_seq_len=self.max_seq_len, system_prompt_ids=self._sys,
            role_a=self._role_a, role_b=self._role_b,
            pretraining=self.pretraining)

        out = {"text_tokens": tokens, "text_labels": labels,
               "modality_positions": mp, "text_masks": tm, "image_masks": im,
               "data_type": "mmu"}
        if "image" in rec:
            img = Image.open(os.path.join(self.image_root,
                                          rec["image"])).convert("RGB")
            out["images"] = image_transform(img, self.resolution)
        return out

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
