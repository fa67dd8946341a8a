"""LLaVA instruction-conversation preprocessing (llava/llava_data_vq_unified.py).

Implements the Phi-1.5 conversation template ("USER: ... ASSISTANT: ...",
separator two-style with sep2 = eos-marker) and per-round label masking of
the instruction spans (preprocess_v0, :37-124), including the
tokenization-mismatch guard that voids the whole target.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

IGNORE_INDEX = -100
DEFAULT_IMAGE_TOKEN = "<image>"
SYSTEM_PROMPT = ("A chat between a curious user and an artificial "
                 "intelligence assistant. The assistant gives helpful, "
                 "detailed, and polite answers to the user's questions.")
SEP = " "
SEP2 = "<|endoftext|>"
ROLES = ("USER", "ASSISTANT")


def build_conversation(source: List[Dict[str, str]]) -> str:
    """Phi-1.5 two-style prompt: 'USER: x ASSISTANT: y<|endoftext|>...'."""
    role_map = {"human": ROLES[0], "gpt": ROLES[1]}
    if role_map.get(source[0]["from"]) != ROLES[0]:
        source = source[1:]
    parts = []
    for j, sentence in enumerate(source):
        role = role_map[sentence["from"]]
        value = sentence["value"].replace(DEFAULT_IMAGE_TOKEN, "").strip()
        if role == ROLES[0]:
            parts.append(f"{role}: {value}{SEP}")
        else:
            parts.append(f"{role}: {value}{SEP2}")
    return "".join(parts).strip()


def preprocess_conversation(source: List[Dict[str, str]], tokenizer,
                            max_length: int = 2048):
    """Returns (input_ids, labels, input_ids_system) numpy arrays.

    Masking parity with preprocess_v0: per round (split on sep2), the
    instruction span through ' ASSISTANT: ' is ignored; on tokenizer
    round-trip mismatch the whole target is voided.
    """
    conversation = build_conversation(source)
    ids = tokenizer([conversation])["input_ids"][0][:max_length]
    target = np.asarray(ids, np.int64).copy()

    sep = SEP + ROLES[1] + ": "
    total_len = len(ids)
    rounds = conversation.split(SEP2)
    cur_len = 0
    for rou in rounds:
        if rou == "":
            break
        parts = rou.split(sep)
        if len(parts) != 2:
            break
        instruction = parts[0] + sep
        round_len = len(tokenizer([rou])["input_ids"][0]) + 1  # + eos
        instruction_len = len(tokenizer([instruction])["input_ids"][0]) - 1
        target[cur_len:cur_len + instruction_len] = IGNORE_INDEX
        cur_len += round_len
    target[cur_len:] = IGNORE_INDEX
    if cur_len < max_length and cur_len != total_len:
        target[:] = IGNORE_INDEX  # tokenization mismatch guard

    sys_ids = np.asarray(tokenizer([SYSTEM_PROMPT])["input_ids"][0], np.int64)
    return np.asarray(ids, np.int64), target, sys_ids


class LLaVADataset:
    """Conversation JSON + image folder -> instruct samples
    ({image, input_ids, labels, input_ids_system})."""

    def __init__(self, json_path: str, image_root: str, tokenizer,
                 resolution: int = 256, max_length: int = 2048):
        with open(json_path) as f:
            self.records = json.load(f)
        self.records = [r for r in self.records if "image" in r]
        self.image_root = image_root
        self.tokenizer = tokenizer
        self.resolution = resolution
        self.max_length = max_length

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx: int):
        from PIL import Image

        from showo_tpu.utils.image import image_transform

        rec = self.records[idx % len(self.records)]
        img = Image.open(os.path.join(self.image_root, rec["image"])).convert("RGB")
        ids, labels, sys_ids = preprocess_conversation(
            rec["conversations"], self.tokenizer, self.max_length)
        return {"image": image_transform(img, self.resolution),
                "input_ids": ids, "labels": labels,
                "input_ids_system": sys_ids}

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def preprocess_plain(source: List[Dict[str, str]], tokenizer,
                     eos_id: Optional[int] = None, sep: str = "\n"):
    """Pretrain 'plain'-template captioning pair
    (llava/llava_pretrain_data.py:32-55): the human turn is emptied, the
    caption + sep is the target, any tokens from the (empty) prompt are
    label-masked.  Returns (input_ids, labels) numpy arrays."""
    assert len(source) == 2
    caption = source[1]["value"].replace(DEFAULT_IMAGE_TOKEN, "").strip()
    if eos_id is None:
        eos_id = getattr(tokenizer, "eos_token_id", 0)
    ids = list(tokenizer("" + caption + sep)["input_ids"]) + [eos_id]
    labels = list(ids)
    prompt_len = len(tokenizer("")["input_ids"])
    for i in range(min(prompt_len, len(labels))):
        labels[i] = IGNORE_INDEX
    return np.asarray(ids, np.int64), np.asarray(labels, np.int64)


class LLaVAPretrainDataset(LLaVADataset):
    """CC3M-style captioning pretrain set (llava/llava_pretrain_data.py):
    same json layout as instruct data but every record is one
    (empty prompt, caption) pair under the plain template."""

    def __getitem__(self, idx: int):
        from PIL import Image

        from showo_tpu.utils.image import image_transform

        rec = self.records[idx % len(self.records)]
        img = Image.open(os.path.join(self.image_root,
                                      rec["image"])).convert("RGB")
        ids, labels = preprocess_plain(rec["conversations"], self.tokenizer)
        return {"image": image_transform(img, self.resolution),
                "input_ids": ids[:self.max_length],
                "labels": labels[:self.max_length]}
