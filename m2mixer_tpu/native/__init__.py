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
_IMAGEIO_SO = os.path.join(_DIR, "libm2mixer_imageio.so")
_lib = None
_tried = False
_imageio_lib = None
_imageio_tried = False


def _build(target: str) -> bool:
    """Build one specific .so (targets are independent, so a missing system
    lib for one kernel never takes the other down)."""
    try:
        subprocess.run(["make", "-C", _DIR, os.path.basename(target)],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(target)
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
    if not os.path.exists(_SO) and not _build(_SO):
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


def load_imageio() -> Optional[ctypes.CDLL]:
    """The native image decode/resize library (imageio.cpp), building it on
    demand; None when g++/libjpeg/libpng are unavailable."""
    global _imageio_lib, _imageio_tried
    if _imageio_lib is not None:
        return _imageio_lib
    if _imageio_tried:
        return None
    _imageio_tried = True
    if not os.path.exists(_IMAGEIO_SO) and not _build(_IMAGEIO_SO):
        return None
    try:
        lib = ctypes.CDLL(_IMAGEIO_SO)
    except OSError:
        return None
    lib.m2m_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.m2m_load_image.restype = ctypes.c_int
    lib.m2m_load_images.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    lib.m2m_load_images.restype = ctypes.c_int
    _imageio_lib = lib
    return lib


def load_image_native(path: str, size, normalize: bool = True) -> Optional[np.ndarray]:
    """Decode+bicubic-resize+ToTensor(+ImageNet-normalize) one JPEG/PNG via
    the C++ kernel. ``size`` is (H, W) and required (the no-resize path goes
    through PIL). Returns a (3, H, W) float32 array, or None so the caller
    falls back to PIL (library unavailable, unsupported container, decode
    error)."""
    lib = load_imageio()
    if lib is None or size is None:
        return None
    h, w = int(size[0]), int(size[1])
    out = np.empty((3, h, w), np.float32)
    rc = lib.m2m_load_image(
        str(path).encode(), h, w, int(bool(normalize)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def load_images_native(paths, size, normalize: bool = True,
                       nthreads: Optional[int] = None):
    """Threaded batch loader: (N, 3, H, W) float32 plus a per-image failure
    mask (True where the caller must re-load via PIL). Returns (None, None)
    when the library is unavailable."""
    lib = load_imageio()
    if lib is None or size is None:
        return None, None
    n = len(paths)
    h, w = int(size[0]), int(size[1])
    out = np.empty((n, 3, h, w), np.float32)
    status = np.zeros((n,), np.int32)
    if n:
        encoded = [str(p).encode() for p in paths]
        arr = (ctypes.c_char_p * n)(*encoded)
        lib.m2m_load_images(
            arr, n, h, w, int(bool(normalize)),
            int(nthreads if nthreads else (os.cpu_count() or 1)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
    return out, status.astype(bool)


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
