"""ctypes bindings for the native host kernels, with transparent build.

If the shared library is missing it is compiled on first import (g++ is in
the image); numpy fallbacks live at the call sites (ops/fps.py,
data/preprocess.py, utils/metrics.py) so the framework works without a
toolchain too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "liblidiff_native.so")
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-s", "-C", _DIR], check=True,
                           capture_output=True, timeout=300)
        except Exception as e:
            raise NativeUnavailable(f"native build failed: {e}") from e
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    lib.lidiff_fps.argtypes = [f32p, i64, i64, i64p]
    lib.lidiff_voxel_unique.argtypes = [f32p, i64, ctypes.c_double, i64p]
    lib.lidiff_voxel_unique.restype = i64
    lib.lidiff_viewpoint_filter.argtypes = [f32p, i64, f32p, i64,
                                            ctypes.c_double, u8p]
    lib.lidiff_nn_dist.argtypes = [f32p, i64, f32p, i64, ctypes.c_double,
                                   f32p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def fps_native(points: np.ndarray, k: int) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    out = np.empty(min(k, len(pts)), np.int64)
    lib.lidiff_fps(pts, len(pts), len(out), out)
    return out


def voxel_unique_native(points: np.ndarray, voxel: float) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    out = np.empty(len(pts), np.int64)
    n = lib.lidiff_voxel_unique(pts, len(pts), float(voxel), out)
    return out[:n]


def viewpoint_filter_native(full: np.ndarray, part: np.ndarray,
                            voxel: float = 10.0) -> np.ndarray:
    lib = _load()
    f = np.ascontiguousarray(full[:, :3], np.float32)
    p = np.ascontiguousarray(part[:, :3], np.float32)
    out = np.empty(len(f), np.uint8)
    lib.lidiff_viewpoint_filter(f, len(f), p, len(p), float(voxel), out)
    return out.astype(bool)


def nn_dist_native(a: np.ndarray, b: np.ndarray,
                   cell: float = 0.5) -> np.ndarray:
    lib = _load()
    aa = np.ascontiguousarray(a[:, :3], np.float32)
    bb = np.ascontiguousarray(b[:, :3], np.float32)
    out = np.empty(len(aa), np.float32)
    lib.lidiff_nn_dist(aa, len(aa), bb, len(bb), float(cell), out)
    return out
