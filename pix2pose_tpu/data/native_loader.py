"""ctypes binding for the native bopio loader (native/bopio.cpp).

Parallel PNG decoding on a C++ thread pool — the framework's native host
runtime for data loading (replacing the reference's 6-process Python
generator pool, SURVEY.md §2.4). Compiles on first use via the Makefile and
silently falls back to PIL if no toolchain is available, so nothing above
this layer has to care.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbopio.so")

_lib = None
_lib_tried = False


def _load_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bopio_png_info.argtypes = [
            ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 4
        lib.bopio_png_info.restype = ctypes.c_int
        lib.bopio_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        lib.bopio_decode_png.restype = ctypes.c_int
        lib.bopio_decode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.bopio_decode_png_batch.restype = ctypes.c_int
        lib.bopio_load_npy.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.bopio_load_npy.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def png_info(path: str):
    """(h, w, channels, bitdepth) or None."""
    lib = _load_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    if lib.bopio_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(c), ctypes.byref(b)) != 0:
        return None
    return h.value, w.value, c.value, b.value


def load_png(path: str) -> np.ndarray:
    """Decode one PNG natively; PIL fallback."""
    lib = _load_lib()
    info = png_info(path) if lib is not None else None
    if info is None:
        from PIL import Image

        return np.asarray(Image.open(path))
    h, w, c, bd = info
    dtype = np.uint16 if bd == 16 else np.uint8
    out = np.empty((h, w, c) if c > 1 else (h, w), dtype)
    rc = lib.bopio_decode_png(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.nbytes)
    if rc != 0:
        from PIL import Image

        return np.asarray(Image.open(path))
    return out


def load_png_batch(paths) -> list:
    """Decode many PNGs in parallel on the native thread pool; ordered
    results. PIL fallback when the library is unavailable."""
    lib = _load_lib()
    if lib is None:
        return [load_png(p) for p in paths]
    outs = []
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * len(paths))()
    lens = (ctypes.c_int64 * len(paths))()
    cpaths = (ctypes.c_char_p * len(paths))()
    rcs = (ctypes.c_int * len(paths))()
    for i, p in enumerate(paths):
        info = png_info(p)
        if info is None:
            return [load_png(q) for q in paths]
        h, w, c, bd = info
        dtype = np.uint16 if bd == 16 else np.uint8
        arr = np.empty((h, w, c) if c > 1 else (h, w), dtype)
        outs.append(arr)
        ptrs[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        lens[i] = arr.nbytes
        cpaths[i] = p.encode()
    fails = lib.bopio_decode_png_batch(cpaths, ptrs, lens, rcs,
                                       len(paths))
    if fails:
        return [load_png(p) if rcs[i] != 0 else outs[i]
                for i, p in enumerate(paths)]
    return outs


_NPY_DTYPES = {1: np.uint8, 2: np.uint16, 4: np.float32, 8: np.float64}


def load_npy(path: str) -> np.ndarray:
    """NPY via the native parser; np.load fallback."""
    lib = _load_lib()
    if lib is None:
        return np.load(path)
    shape = (ctypes.c_int64 * 4)(-1, -1, -1, -1)
    ndim = ctypes.c_int()
    code = ctypes.c_int()
    rc = lib.bopio_load_npy(path.encode(), shape, ctypes.byref(ndim),
                            ctypes.byref(code), None, 0)
    if rc != 0:
        return np.load(path)
    nbytes = shape[3]
    shp = tuple(shape[i] for i in range(ndim.value))
    out = np.empty(shp, _NPY_DTYPES[code.value])
    assert out.nbytes == nbytes, (out.nbytes, nbytes)
    shape2 = (ctypes.c_int64 * 4)(-1, -1, -1, -1)
    rc = lib.bopio_load_npy(
        path.encode(), shape2, ctypes.byref(ndim), ctypes.byref(code),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes)
    if rc != 0:
        return np.load(path)
    return out
