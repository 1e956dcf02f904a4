"""ctypes loader for the native host-data-path kernels.

Builds ``libm2mixer_native.so`` on first use when a C++ toolchain is
available (the image ships g++); falls back to None so the pure-numpy path
keeps everything working without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libm2mixer_native.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on demand; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.project_words.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.cbf_scatter.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def project_words_native(token_rows: np.ndarray, word_offsets: np.ndarray,
                         feature_size: int, window: int) -> Optional[np.ndarray]:
    """Fused per-word min-reduce + Bloom scatter + window concat.

    token_rows: (total_tokens, num_hashes) int32; word_offsets: (n_words+1,)
    int64. Returns (n_words, (2w+1)*feature_size) float32, or None when the
    native library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    token_rows = np.ascontiguousarray(token_rows, np.int32)
    word_offsets = np.ascontiguousarray(word_offsets, np.int64)
    n_words = len(word_offsets) - 1
    out = np.empty((n_words, (2 * window + 1) * feature_size), np.float32)
    lib.project_words(
        token_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        word_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_words, token_rows.shape[1] if token_rows.size else 64,
        feature_size, window,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
