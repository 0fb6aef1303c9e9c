"""Host-native (C++) components, loaded via ctypes.

The reference delegates all host-side hot loops to library kernels
(scipy/cv2); its one genuinely hot *Python* loop is the greedy radius NMS in
the offline feature cacher (reference models/features/opencv/base.py:161-182).
This package holds the C++ equivalents, compiled on first use with the
system toolchain (g++ -O3 -shared) and cached next to the sources. Every
entry point is gated: when the toolchain or the compiled library is
unavailable, callers fall back to the pure-Python/scipy implementations, so
the framework has no hard native dependency.

No pybind11 in this environment — the C ABI + ctypes is the binding layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libopenglue_host.so")
_SOURCES = [os.path.join(_HERE, "nms.cpp")]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    """Compile the shared library; True on success."""
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        *_SOURCES, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120, cwd=_HERE
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _stale() -> bool:
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(os.path.getmtime(s) > lib_mtime for s in _SOURCES)


def load() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use; None when unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or _stale():
                if not _build():
                    _load_failed = True
                    return None
            lib = ctypes.CDLL(_LIB_PATH)
            lib.og_nms_radius.restype = ctypes.c_int
            lib.og_nms_radius.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            _lib = lib
        except OSError:
            _load_failed = True
            return None
    return _lib


def available() -> bool:
    return load() is not None


def nms_keypoints_native(
    kpts: np.ndarray, responses: np.ndarray, radius: float
) -> Optional[np.ndarray]:
    """Greedy radius-NMS keep mask via the C++ grid kernel.

    Same semantics as features.opencv_features.nms_keypoints (the scipy
    path); returns None when the native library is unavailable so callers
    can fall back.
    """
    lib = load()
    if lib is None:
        return None
    kpts = np.ascontiguousarray(kpts, dtype=np.float32)
    responses = np.ascontiguousarray(responses, dtype=np.float32)
    n = kpts.shape[0]
    if kpts.shape != (n, 2) or responses.shape != (n,):
        raise ValueError(f"bad shapes: kpts {kpts.shape}, responses {responses.shape}")
    keep = np.zeros(n, dtype=np.uint8)
    ret = lib.og_nms_radius(
        kpts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        responses.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        float(radius),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if ret < 0:
        # Degenerate grid (tiny radius over a huge extent, non-finite
        # coordinates) or allocation failure — report "unavailable" so the
        # caller takes the scipy path instead of aborting.
        return None
    return keep.astype(bool)
