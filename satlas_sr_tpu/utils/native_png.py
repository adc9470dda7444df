"""ctypes bindings for the native libpng decode/encode library.

Built from native/pngio.cpp into satlas_sr_tpu/utils/_pngio.so (see
native/build.sh). Mirrors the role torchvision's C++ PNG decoder plays for the
reference's dataloader workers (SURVEY.md §2.10 row (b)) — decode happens
outside the GIL so Python-side prefetch threads overlap with TPU compute.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_pngio.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.pngio_read.restype = ctypes.c_int
        lib.pngio_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.pngio_free.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "pngio_read_many"):
            lib.pngio_read_many.restype = ctypes.c_int
            lib.pngio_read_many.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
        lib.pngio_write.restype = ctypes.c_int
        lib.pngio_write.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        if hasattr(lib, "pngio_decode"):
            lib.pngio_decode.restype = ctypes.c_int
            lib.pngio_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.pngio_encode.restype = ctypes.c_int
            lib.pngio_encode.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_size_t),
            ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def read_png(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    buf = ctypes.c_void_p()
    rc = lib.pngio_read(path.encode(), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c), ctypes.byref(buf))
    if rc != 0:
        return None
    try:
        n = h.value * w.value * c.value
        arr = np.ctypeslib.as_array(
            ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)), shape=(n,)
        ).copy()
    finally:
        lib.pngio_free(buf)
    return arr.reshape(h.value, w.value, c.value)


def read_png_many(paths, n_threads: int = 0):
    """Decode many PNGs in ONE native call on a C++ thread pool.

    Returns a list of HWC uint8 arrays (None per failed file), or None if the
    native library (or the batched entry point) is unavailable. One
    Python->C transition per BATCH — the per-file ctypes/thread overhead of
    driving pngio_read from Python threads disappears.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "pngio_read_many"):
        return None
    n = len(paths)
    if n == 0:
        return []
    if n_threads <= 0:
        n_threads = min(8, max(2, (os.cpu_count() or 1) * 2))
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cs = (ctypes.c_int * n)()
    bufs = (ctypes.c_void_p * n)()
    rcs = (ctypes.c_int * n)()
    lib.pngio_read_many(c_paths, n, hs, ws, cs, bufs, rcs, n_threads)
    out = []
    for i in range(n):
        if rcs[i] != 0 or not bufs[i]:
            out.append(None)
            continue
        try:
            sz = hs[i] * ws[i] * cs[i]
            arr = np.ctypeslib.as_array(
                ctypes.cast(bufs[i], ctypes.POINTER(ctypes.c_uint8)), shape=(sz,)
            ).copy()
        finally:
            lib.pngio_free(bufs[i])
        out.append(arr.reshape(hs[i], ws[i], cs[i]))
    return out


class ImageTooLarge(ValueError):
    """Decode refused: the PNG header announces more than max_pixels pixels."""


def decode_png_bytes(data: bytes, max_pixels: int = 0) -> Optional[np.ndarray]:
    """Decode in-memory PNG bytes to an HWC uint8 array, GIL-free.

    Serving hot path (satlas_sr_tpu/serve.py). Returns None when the native
    library is unavailable or the bytes fail to decode (callers fall back to
    PIL). Raises ImageTooLarge — checked from the header BEFORE pixel data is
    decompressed — when max_pixels > 0 is exceeded; that is a request error,
    not a codec gap, so it must NOT fall through to a second decode."""
    lib = _load()
    if lib is None or not hasattr(lib, "pngio_decode"):
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    buf = ctypes.c_void_p()
    rc = lib.pngio_decode(data, len(data), max_pixels, ctypes.byref(h),
                          ctypes.byref(w), ctypes.byref(c), ctypes.byref(buf))
    if rc == 6:
        raise ImageTooLarge(
            f"image ({w.value}, {h.value}) exceeds {max_pixels} pixel limit")
    if rc != 0 or not buf:
        return None
    try:
        n = h.value * w.value * c.value
        arr = np.ctypeslib.as_array(
            ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)), shape=(n,)
        ).copy()
    finally:
        lib.pngio_free(buf)
    return arr.reshape(h.value, w.value, c.value)


def encode_png_bytes(img: np.ndarray, level: int = 1) -> Optional[bytes]:
    """Encode an HWC uint8 array to PNG bytes in memory, GIL-free.

    `level` is the zlib level; 1 matches write_png's throughput-over-ratio
    default. Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "pngio_encode"):
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    buf = ctypes.c_void_p()
    n = ctypes.c_size_t()
    rc = lib.pngio_encode(img.ctypes.data_as(ctypes.c_void_p), h, w, c, level,
                          ctypes.byref(buf), ctypes.byref(n))
    if rc != 0 or not buf:
        return None
    try:
        return ctypes.string_at(buf, n.value)
    finally:
        lib.pngio_free(buf)


def write_png(path: str, img: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    rc = lib.pngio_write(path.encode(), img.ctypes.data_as(ctypes.c_void_p), h, w, c)
    return rc == 0
