"""VIST interleaved storytelling dataset (show-o2/datasets/vist_dataset.py).

Records {"images": [...], "sentences": [...]} -> interleaved sequences via
format_interleaved_sequence with per-image modality tuples and (0,0)
padding to max_num_images.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from showo_tpu.show_o2.formats import format_interleaved_sequence
from showo_tpu.utils.image import image_transform
from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class VISTDataset:
    def __init__(self, json_path: str, image_root: str, tokenizer,
                 showo_token_ids: Dict[str, int], resolution: int = 432,
                 num_image_tokens: int = 730, max_seq_len: int = 5120,
                 max_num_images: int = 5):
        with open(json_path) as f:
            self.records = json.load(f)
        self.image_root = image_root
        self.tokenizer = tokenizer
        self.ids = showo_token_ids
        self.resolution = resolution
        self.num_image_tokens = num_image_tokens
        self.max_seq_len = max_seq_len
        self.max_num_images = max_num_images

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
        sentences = rec["sentences"][: self.max_num_images]
        image_paths = rec["images"][: self.max_num_images]

        text_token_list = [self._tok(s) for s in sentences]
        image_list = ["img"] * len(image_paths)

        tokens, labels, mp, tm, im = format_interleaved_sequence(
            image_list, text_token_list,
            self.ids["bos_id"], self.ids["eos_id"], self.ids["boi_id"],
            self.ids["eoi_id"], self.ids["pad_id"], self.ids["img_pad_id"],
            self.num_image_tokens, self.max_seq_len, self.max_num_images)

        imgs = []
        for p in image_paths:
            img = Image.open(os.path.join(self.image_root, p)).convert("RGB")
            imgs.append(image_transform(img, self.resolution))
        while len(imgs) < self.max_num_images:
            imgs.append(np.zeros_like(imgs[0]))

        return {"text_tokens": tokens, "text_labels": labels,
                "modality_positions": mp, "text_masks": tm,
                "image_masks": im, "images": np.stack(imgs),
                "data_type": "interleaved"}

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
