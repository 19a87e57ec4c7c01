"""ctypes bindings for the native host-I/O runtime (native/repas_io.cpp).

Provides the fast path for PNG decode (single + threaded batch) used by
the replay backend / data loader; falls back to PIL transparently when the
shared library hasn't been built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[Path]:
    root = Path(__file__).resolve().parents[2]
    for cand in (root / "native/librepas_io.so",
                 Path(__file__).parent / "librepas_io.so"):
        if cand.exists():
            return cand
    return None


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.repas_png_info.restype = ctypes.c_int
        lib.repas_png_info.argtypes = [ctypes.c_char_p] + \
            [ctypes.POINTER(ctypes.c_int)] * 4
        lib.repas_png_decode.restype = ctypes.c_int
        lib.repas_png_decode.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.repas_png_decode_batch.restype = None
        lib.repas_png_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_long, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return load_library() is not None


def png_info(path) -> Optional[tuple[int, int, int, int]]:
    lib = load_library()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    r = lib.repas_png_info(str(path).encode(), ctypes.byref(w),
                           ctypes.byref(h), ctypes.byref(c), ctypes.byref(b))
    if r != 0:
        return None
    return w.value, h.value, c.value, b.value


def read_png(path) -> Optional[np.ndarray]:
    """Decode a PNG natively. Returns uint8 (H,W[,C]) or uint16 (H,W), or
    None when the codec can't handle the file (caller falls back)."""
    lib = load_library()
    if lib is None:
        return None
    info = png_info(path)
    if info is None:
        return None
    w, h, c, bits = info
    dtype = np.uint16 if bits == 16 else np.uint8
    out = np.empty((h, w, c) if c > 1 else (h, w), dtype=dtype)
    r = lib.repas_png_decode(str(path).encode(),
                             out.ctypes.data_as(ctypes.c_void_p))
    if r != 0:
        return None
    if c == 2:  # gray+alpha: drop alpha
        return np.ascontiguousarray(out[..., 0])
    if c == 4:  # rgba -> rgb
        return np.ascontiguousarray(out[..., :3])
    return out


def read_png_batch(paths: Sequence, n_threads: int = 0
                   ) -> Optional[np.ndarray]:
    """Threaded batch decode of same-shape PNGs -> (N,H,W[,C]) array."""
    lib = load_library()
    if lib is None or not paths:
        return None
    info = png_info(paths[0])
    if info is None:
        return None
    w, h, c, bits = info
    dtype = np.uint16 if bits == 16 else np.uint8
    n = len(paths)
    shape = (n, h, w, c) if c > 1 else (n, h, w)
    out = np.empty(shape, dtype=dtype)
    frame_bytes = out.strides[0]
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    statuses = (ctypes.c_int * n)()
    lib.repas_png_decode_batch(arr, n, out.ctypes.data_as(ctypes.c_void_p),
                               frame_bytes, statuses, n_threads)
    if any(statuses[i] != 0 for i in range(n)):
        return None
    # same channel normalization as read_png: drop gray-alpha / rgba alpha
    if c == 2:
        return np.ascontiguousarray(out[..., 0])
    if c == 4:
        return np.ascontiguousarray(out[..., :3])
    return out
