"""ctypes binding for the native tar-shard reader (native/tario.cpp).

Builds libtario.so on first use (g++), falls back to Python tarfile when
the toolchain is unavailable.  Used by the tar-shard pipeline for fast
member indexing + parallel batched reads.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtario.so"))
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
            logger.warning("native tario build failed (%s); using tarfile", e)
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tario_index.restype = ctypes.c_void_p
        lib.tario_index.argtypes = [ctypes.c_char_p]
        lib.tario_count.restype = ctypes.c_int64
        lib.tario_count.argtypes = [ctypes.c_void_p]
        lib.tario_name.restype = ctypes.c_char_p
        lib.tario_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tario_size.restype = ctypes.c_int64
        lib.tario_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tario_offset.restype = ctypes.c_int64
        lib.tario_offset.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tario_free.argtypes = [ctypes.c_void_p]
        lib.tario_read.restype = ctypes.c_int64
        lib.tario_read.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
        _lib = lib
    except OSError as e:
        logger.warning("native tario load failed (%s); using tarfile", e)
        _lib = False
    return _lib


class TarIndex:
    """Member table of one tar shard, native-backed when available."""

    def __init__(self, path: str):
        self.path = path
        lib = _load_lib()
        self.native = bool(lib)
        if self.native:
            self._lib = lib
            self._handle = lib.tario_index(path.encode())
            if not self._handle:
                raise IOError(f"tario_index failed for {path}")
            n = lib.tario_count(self._handle)
            self.names = [lib.tario_name(self._handle, i).decode()
                          for i in range(n)]
            self.sizes = [lib.tario_size(self._handle, i) for i in range(n)]
        else:
            import tarfile

            self._members: List = []
            with tarfile.open(path) as tf:
                for m in tf.getmembers():
                    if m.isfile():
                        self._members.append((m.name, m.offset_data, m.size))
            self.names = [m[0] for m in self._members]
            self.sizes = [m[2] for m in self._members]

    def __len__(self):
        return len(self.names)

    def read(self, indices: List[int], num_threads: int = 4) -> List[bytes]:
        """Batched member reads (parallel pread in the native path)."""
        if self.native:
            idx_arr = (ctypes.c_int64 * len(indices))(*indices)
            total = sum(self.sizes[i] for i in indices)
            out = ctypes.create_string_buffer(total)
            offs = (ctypes.c_int64 * len(indices))()
            got = self._lib.tario_read(self.path.encode(), self._handle,
                                       idx_arr, len(indices), out, total,
                                       offs, num_threads)
            if got < 0:
                raise IOError(f"tario_read failed for {self.path}")
            res = []
            for i, gi in enumerate(indices):
                start = offs[i]
                res.append(out.raw[start:start + self.sizes[gi]])
            return res
        with open(self.path, "rb") as f:
            res = []
            for i in indices:
                f.seek(self._members[i][1])
                res.append(f.read(self._members[i][2]))
            return res

    def __del__(self):
        if getattr(self, "native", False) and getattr(self, "_handle", None):
            try:
                self._lib.tario_free(self._handle)
            except Exception:
                pass
