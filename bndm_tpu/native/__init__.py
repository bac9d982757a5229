"""Native (C++) host-side kernels, built on demand and loaded via ctypes.

No pybind11 in this image, so the binding layer is plain ``extern "C"`` +
ctypes; the build is a single g++ invocation cached next to the package.
Every consumer has a pure-Python fallback — the native path is a throughput
optimization for the host data plane, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastimage.cpp")
# keep the built artifact out of the package namespace (a .so inside the
# package dir would be picked up as a broken extension module)
_LIB_PATH = os.path.join(_HERE, "_build", "fastimage.so")

_lib = None
_tried = False


def _build():
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        tmp_out = os.path.join(td, "_fastimage.so")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", tmp_out],
            check=True, capture_output=True,
        )
        os.replace(tmp_out, _LIB_PATH)


def get_fastimage():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.transform_u8_to_chw_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.transform_u8_to_chw_f32.restype = None
        lib.transform_u8_to_chw_f32_v2.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.transform_u8_to_chw_f32_v2.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def fast_transform(img_u8_hwc, res, hflip=False, crop_top=-1, crop_left=-1):
    """uint8 HWC image -> float32 CHW in [0,1] via the native kernel
    (resize shorter side to ``res``, crop at (crop_top, crop_left) — -1/-1
    means center crop — optional hflip).
    Returns None when the native library is unavailable."""
    lib = get_fastimage()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_u8_hwc, dtype=np.uint8)
    h, w, c = img.shape
    out = np.empty((c, res, res), np.float32)
    lib.transform_u8_to_chw_f32_v2(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c, res, int(bool(hflip)), int(crop_top), int(crop_left),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
