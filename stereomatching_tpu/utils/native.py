"""ctypes binding for the native I/O library (native/stereo_io.cpp).

The native library is optional: every entry point here returns None /
raises ImportError cleanly when ``native/libstereo_io.so`` has not been
built (``make -C native``), and imageio.py falls back to its pure-Python
implementations, which are the executable spec the native code must
byte-match (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libstereo_io.so"),
    os.path.join(os.path.dirname(__file__), "libstereo_io.so"),
)

_IMTYPE_CODE = {"binary": 0, "gray_int": 2}

_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    for path in _LIB_PATHS:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(os.path.abspath(path))
            except OSError:
                continue
            lib.stereo_png_info.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.stereo_png_read_gray.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ]
            lib.stereo_png_write_gray.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.stereo_ppm_size_bound.argtypes = [ctypes.c_int32, ctypes.c_int32]
            lib.stereo_ppm_size_bound.restype = ctypes.c_int64
            lib.stereo_ppm_render.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ]
            if hasattr(lib, "stereo_ppm_render_float"):
                lib.stereo_ppm_render_float.argtypes = [
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int64),
                ]
            _lib = lib
            return _lib
    return None


def available() -> bool:
    return _load() is not None


def png_read_gray(data: bytes) -> Optional[np.ndarray]:
    """Decode 8-bit grayscale PNG bytes -> uint8 [H, W], or None if the
    native lib is absent.  Raises ValueError on malformed input (same
    conditions as the Python spec)."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ctype = ctypes.c_int32()
    rc = lib.stereo_png_info(data, len(data), ctypes.byref(w),
                             ctypes.byref(h), ctypes.byref(ctype))
    if rc != 0:
        raise ValueError("not a PNG file")
    if ctype.value != 0:
        raise ValueError(
            "wrong number of channels (image must be grayscale, "
            f"color type 0, got {ctype.value})"
        )
    out = np.empty((h.value, w.value), dtype=np.uint8)
    rc = lib.stereo_png_read_gray(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w.value, h.value,
    )
    if rc == -2:
        raise ValueError("only 8-bit non-interlaced grayscale supported")
    if rc != 0:
        raise ValueError(f"PNG decode failed (code {rc})")
    return out


def png_write_gray(pixels: np.ndarray) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = pixels.shape
    cap = ctypes.c_int64(64 + h * (w + 1) * 2 + 1024)
    out = np.empty(cap.value, dtype=np.uint8)
    rc = lib.stereo_png_write_gray(
        pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.byref(cap),
    )
    if rc != 0:
        raise ValueError(f"PNG encode failed (code {rc})")
    return out[: cap.value].tobytes()


def ppm_render(data: np.ndarray, imtype_name: str) -> Optional[bytes]:
    """Render the BINARY / GRAY_FLOAT / GRAY_INT PPM mappings natively;
    returns None for a missing lib or out-of-contract inputs (caller
    falls back to the Python spec)."""
    lib = _load()
    if lib is None:
        return None
    if imtype_name == "gray_float":
        if not hasattr(lib, "stereo_ppm_render_float"):
            return None
        arr = np.ascontiguousarray(data, dtype=np.float64)
        h, w = arr.shape
        cap = ctypes.c_int64(lib.stereo_ppm_size_bound(w, h))
        out = np.empty(cap.value, dtype=np.uint8)
        rc = lib.stereo_ppm_render_float(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(cap),
        )
        if rc == -5:  # values outside [0, 1): Python handles long digits
            return None
        if rc != 0:
            raise ValueError(f"PPM render failed (code {rc})")
        return out[: cap.value].tobytes()
    if imtype_name not in _IMTYPE_CODE:
        return None
    arr = np.ascontiguousarray(data, dtype=np.int64)
    h, w = arr.shape
    cap = ctypes.c_int64(lib.stereo_ppm_size_bound(w, h))
    out = np.empty(cap.value, dtype=np.uint8)
    rc = lib.stereo_ppm_render(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), w, h,
        _IMTYPE_CODE[imtype_name],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.byref(cap),
    )
    if rc != 0:
        raise ValueError(f"PPM render failed (code {rc})")
    return out[: cap.value].tobytes()
