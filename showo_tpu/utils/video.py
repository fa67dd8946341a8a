"""Host-side video loading (show-o2/utils.py:236-253 ``load_video``
equivalent, without the decord C++ dependency).

Supports frame directories, GIFs, and anything PIL can iterate; uniform
frame sampling to ``num_frames``.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from showo_tpu.utils.image import image_transform


def _uniform_indices(total: int, num_frames: int) -> List[int]:
    if total <= 0:
        return []
    return [round(i * (total - 1) / max(num_frames - 1, 1))
            for i in range(num_frames)]


def load_video(path: str, num_frames: int = 9, resolution: int = 432
               ) -> np.ndarray:
    """Returns [T, H, W, 3] float32 in [-1, 1] with T = num_frames."""
    from PIL import Image, ImageSequence

    frames: List = []
    if os.path.isdir(path):
        files = sorted(f for f in os.listdir(path)
                       if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
        idxs = _uniform_indices(len(files), num_frames)
        for i in idxs:
            frames.append(Image.open(os.path.join(path, files[i])).convert("RGB"))
    else:
        with Image.open(path) as img:
            all_frames = [f.convert("RGB")
                          for f in ImageSequence.Iterator(img)]
        idxs = _uniform_indices(len(all_frames), num_frames)
        frames = [all_frames[i] for i in idxs]
    if not frames:
        raise ValueError(f"no frames found in {path}")
    while len(frames) < num_frames:
        frames.append(frames[-1])
    return np.stack([image_transform(f, resolution) for f in frames])
