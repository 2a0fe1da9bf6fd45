"""ctypes binding for the native detection kernels (sep_native.cpp).

Compiles the shared library on first use with g++; falls back to the
scipy implementations if no toolchain is present.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_DIR, "sep_native.cpp")
_SO = os.path.join(_DIR, "libsepnative.so")
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.cc_label_8.restype = ctypes.c_int32
        lib.cc_label_8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.background_cells.restype = None
        lib.background_cells.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available():
    return _load() is not None


def label(mask):
    """8-connected labeling via the C++ core. mask: (H, W) bool.
    Returns (labels int32 (H, W), n)."""
    lib = _load()
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    H, W = m.shape
    labels = np.zeros((H, W), dtype=np.int32)
    n = lib.cc_label_8(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       H, W,
                       labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels, int(n)


def background_cells(data, bh, bw, sigclip=3.0, maxiter=5):
    """Per-cell (mode, rms) mesh via the C++ core."""
    lib = _load()
    d = np.ascontiguousarray(data, dtype=np.float64)
    H, W = d.shape
    nh, nw = (H + bh - 1) // bh, (W + bw - 1) // bw
    back = np.zeros((nh, nw))
    rms = np.zeros((nh, nw))
    lib.background_cells(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), H, W, bh, bw,
        sigclip, maxiter,
        back.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return back, rms
