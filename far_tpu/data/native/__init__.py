"""ctypes bindings for the native preprocessing library.

Builds libfar_preprocess.so from preprocess.cpp on first import if
needed (g++ is part of the toolchain); every entry point has a pure
numpy fallback so the package works without a compiler too.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libfar_preprocess.so"
_SRC = _DIR / "preprocess.cpp"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() and not _build():
        raise OSError("native preprocess library unavailable")
    lib = ctypes.CDLL(str(_SO))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.far_resize_bilinear_u8.argtypes = [
        u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.far_gray_normalize.argtypes = [
        u8p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.far_normalize_u8.argtypes = [u8p, f32p, ctypes.c_int64]
    lib.far_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def resize_bilinear_u8(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear-resize (H, W[, C]) or (N, H, W, C) uint8 images."""
    lib = _load()
    squeeze_c = img.ndim == 2
    if squeeze_c:
        img = img[..., None]
    squeeze_n = img.ndim == 3
    if squeeze_n:
        img = img[None]
    img = np.ascontiguousarray(img, np.uint8)
    n, h, w, c = img.shape
    out = np.empty((n, out_h, out_w, c), np.uint8)
    lib.far_resize_bilinear_u8(img, out, n, h, w, c, out_h, out_w)
    if squeeze_n:
        out = out[0]
    if squeeze_c:
        out = out[..., 0]
    return out


def gray_normalize(img: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) or (H, W, 3) uint8 RGB -> float32 gray in [0, 1]."""
    lib = _load()
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    img = np.ascontiguousarray(img, np.uint8)
    n, h, w, _ = img.shape
    out = np.empty((n, h, w), np.float32)
    lib.far_gray_normalize(img, out, n, h, w)
    return out[0] if squeeze else out


def normalize_u8(img: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty(img.shape, np.float32)
    lib.far_normalize_u8(img, out, img.size)
    return out
