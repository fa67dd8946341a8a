"""ctypes binding for the native JPEG batch decoder (native/imgdec.cpp).

``decode_batch(buffers, resolution)`` decodes a list of JPEG byte strings
in a C++ thread pool to a normalized [-1, 1] NHWC float32 array; entries
the native path can't handle (non-JPEG) fall back to PIL bicubic.

Note: the native resize is bilinear (PIL path is bicubic); intended as a
throughput fast path for training data loading.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libimgdec.so"))
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except Exception as e:
            logger.warning("native imgdec build failed (%s); PIL only", e)
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.imgdec_batch.restype = ctypes.c_int64
        lib.imgdec_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
        _lib = lib
    except OSError as e:
        logger.warning("native imgdec load failed (%s); PIL only", e)
        _lib = False
    return _lib


def _pil_decode(buf: bytes, resolution: int) -> Optional[np.ndarray]:
    import io

    from PIL import Image

    from showo_tpu.utils.image import image_transform

    try:
        return image_transform(Image.open(io.BytesIO(buf)).convert("RGB"),
                               resolution)
    except Exception:
        return None


def decode_batch(buffers: List[bytes], resolution: int,
                 num_threads: int = 4) -> Tuple[np.ndarray, List[bool]]:
    """Returns ([N, res, res, 3] float32 in [-1,1], per-item validity)."""
    n = len(buffers)
    out = np.zeros((n, resolution, resolution, 3), np.float32)
    valid = [False] * n
    lib = _load_lib()
    todo = list(range(n))
    if lib:
        bufs = (ctypes.c_char_p * n)(*buffers)
        lens = (ctypes.c_int64 * n)(*[len(b) for b in buffers])
        ok = (ctypes.c_uint8 * n)()
        lib.imgdec_batch(bufs, lens, n, resolution,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         ok, num_threads)
        todo = [i for i in range(n) if not ok[i]]
        for i in range(n):
            valid[i] = bool(ok[i])
    for i in todo:  # PIL fallback (PNG/webp/corrupt)
        dec = _pil_decode(buffers[i], resolution)
        if dec is not None:
            out[i] = dec
            valid[i] = True
    return out, valid
