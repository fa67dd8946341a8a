"""Host-side image IO/preprocessing (PIL + numpy), feeding device arrays.

image_transform matches training/data.py / inference entries: bicubic
resize to `resolution` on the short side, center crop, scale to [-1, 1].
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def image_transform(img, resolution: int = 256, normalize: bool = True) -> np.ndarray:
    """PIL image -> [H, W, C] float32 (NHWC, [-1, 1])."""
    w, h = img.size
    scale = resolution / min(w, h)
    nw, nh = round(w * scale), round(h * scale)
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - resolution) // 2
    top = (nh - resolution) // 2
    img = img.crop((left, top, left + resolution, top + resolution))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if normalize:
        arr = arr * 2.0 - 1.0
    return arr


CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_image_transform(img, image_size: int = 336) -> np.ndarray:
    """CLIPImageProcessor.preprocess equivalent (inference_mmu.py:75,94):
    shortest-edge bicubic resize, center crop, CLIP mean/std normalize."""
    w, h = img.size
    scale = image_size / min(w, h)
    nw, nh = round(w * scale), round(h * scale)
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - image_size) // 2
    top = (nh - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    x = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return ((x - np.asarray(CLIP_MEAN, np.float32))
            / np.asarray(CLIP_STD, np.float32))


def to_pil_images(batch_nhwc: np.ndarray):
    """[-1,1] NHWC floats -> list of PIL images."""
    x = np.clip((np.asarray(batch_nhwc) + 1.0) / 2.0, 0.0, 1.0) * 255.0
    x = x.astype(np.uint8)
    return [Image.fromarray(im) for im in x]


def bicubic_resize_mask(mask_hw: np.ndarray, size: int) -> np.ndarray:
    """Downsample a [H, W] mask bicubically and binarize at 0.5
    (inference_t2i.py:103-109)."""
    import jax
    import jax.numpy as jnp

    m = jax.image.resize(jnp.asarray(mask_hw, jnp.float32), (size, size),
                         method="bicubic")
    return np.asarray((m >= 0.5).astype(np.int32))
