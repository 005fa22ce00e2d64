"""ctypes bindings for the native (C++) host pixel pipeline.

Builds `libpixelops.so` from dtt/data/_native/pixelops.cpp on first use
(g++ + libjpeg, both baked into the image) and exposes:

  decode_resize_normalize(jpeg_bytes, cfg, flip) -> (canvas, scale)
  resize_normalize(img_u8_bgr, cfg, flip)        -> (canvas, scale)

Falls back to None handles if the toolchain is missing; callers keep the
cv2/numpy path as fallback (dtt/data/transforms.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "_native", "pixelops.cpp")
_SO = os.path.join(_DIR, "_native", "libpixelops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-ljpeg", "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.decode_resize_normalize.restype = ctypes.c_int
        lib.decode_resize_normalize.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.resize_normalize_u8.restype = ctypes.c_int
        lib.resize_normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize_normalize(jpeg_bytes: bytes, cfg, flip: bool = False):
    """JPEG bytes -> (float32 canvas (H, W, 3) BGR mean-subtracted, scale).

    `cfg` is an InputConfig. Raises ValueError on decode failure.
    """
    lib = get_lib()
    assert lib is not None, "native pixelops unavailable"
    canvas = np.zeros((cfg.canvas_height, cfg.canvas_width, 3), np.float32)
    mean = np.asarray(cfg.pixel_means, np.float32)
    scale = ctypes.c_float(0.0)
    rc = lib.decode_resize_normalize(
        jpeg_bytes, len(jpeg_bytes),
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cfg.canvas_height, cfg.canvas_width,
        ctypes.c_float(float(cfg.target_short_side)),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(bool(flip)), ctypes.byref(scale))
    if rc != 0:
        raise ValueError(f"jpeg decode failed (rc={rc})")
    return canvas, float(scale.value)


def resize_normalize(img_u8_bgr: np.ndarray, cfg, flip: bool = False):
    """uint8 BGR HWC -> (float32 canvas, scale)."""
    lib = get_lib()
    assert lib is not None, "native pixelops unavailable"
    img = np.ascontiguousarray(img_u8_bgr, np.uint8)
    h, w = img.shape[:2]
    canvas = np.zeros((cfg.canvas_height, cfg.canvas_width, 3), np.float32)
    mean = np.asarray(cfg.pixel_means, np.float32)
    scale = ctypes.c_float(0.0)
    rc = lib.resize_normalize_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cfg.canvas_height, cfg.canvas_width,
        ctypes.c_float(float(cfg.target_short_side)),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(bool(flip)), ctypes.byref(scale))
    if rc != 0:
        raise ValueError(f"resize failed (rc={rc})")
    return canvas, float(scale.value)
