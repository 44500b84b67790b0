"""ctypes bindings for the native fastimage library (native/fastimage.cpp).

Builds on demand with g++ if the shared object is missing; every entry point
has a pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastimage.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64, u8p, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)
    lib.resize_bilinear_u8.argtypes = [u8p, i64, i64, i64, i64, u8p, i64, i64]
    lib.make_grid_u8.argtypes = [u8p, i64, i64, i64, i64, i64, i64,
                                 ctypes.c_uint8, u8p, i64, i64]
    lib.normalize_u8_f32.argtypes = [u8p, i64, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear_u8(img: np.ndarray, out_size: int) -> np.ndarray | None:
    """[N,H,W,C] uint8 → [N,out,out,C] uint8, PIL-triangle-filter semantics."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    n, h, w, c = img.shape
    out = np.empty((n, out_size, out_size, c), np.uint8)
    lib.resize_bilinear_u8(_u8p(img), n, h, w, c, _u8p(out), out_size, out_size)
    return out


def make_grid_u8(img: np.ndarray, ncol: int, padding: int = 2,
                 pad_value: int = 0) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    n, h, w, c = img.shape
    nrow = (n + ncol - 1) // ncol
    gh = nrow * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    out = np.empty((gh, gw, c), np.uint8)
    lib.make_grid_u8(_u8p(img), n, h, w, c, ncol, padding, pad_value,
                     _u8p(out), gh, gw)
    return out
