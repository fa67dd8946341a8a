"""NSFW safety-check hook (show-o2/inference_t2i.py:92-93, 201-208 uses
StableDiffusionSafetyChecker).

diffusers is not a baked dependency, so the checker is gated: when a
local CLIP safety-checker checkpoint + diffusers are available it runs,
otherwise this is an explicit no-op pass-through that reports images as
safe.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class SafetyChecker:
    def __init__(self, checkpoint_path: str | None = None):
        self._checker = None
        if checkpoint_path:
            try:
                from diffusers.pipelines.stable_diffusion.safety_checker import (
                    StableDiffusionSafetyChecker)
                from transformers import CLIPImageProcessor

                self._checker = StableDiffusionSafetyChecker.from_pretrained(
                    checkpoint_path)
                self._processor = CLIPImageProcessor()
            except Exception as e:
                logger.warning("safety checker unavailable (%s); disabled", e)

    def __call__(self, images_nhwc: np.ndarray
                 ) -> Tuple[np.ndarray, List[bool]]:
        """Returns (possibly black-boxed images, has_nsfw flags)."""
        if self._checker is None:
            return images_nhwc, [False] * len(images_nhwc)
        import torch

        x01 = np.clip((images_nhwc + 1.0) / 2.0, 0, 1)
        inputs = self._processor(list((x01 * 255).astype(np.uint8)),
                                 return_tensors="pt")
        checked, flags = self._checker(
            images=torch.tensor(x01.transpose(0, 3, 1, 2)),
            clip_input=inputs.pixel_values)
        out = np.asarray(checked).transpose(0, 2, 3, 1) * 2.0 - 1.0
        return out, list(flags)
