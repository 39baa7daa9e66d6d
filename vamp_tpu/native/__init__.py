"""Native host-runtime components (C++ via ctypes).

Compiled on first use into native/build/ and cached; every consumer has a
numpy fallback, so the package works without a toolchain — the native path
is the production-speed one (CAPT builds ~100x faster than the numpy port).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_BUILD = _DIR / "build"
_LIB_PATH = _BUILD / "libcapt_native.so"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = _DIR / "capt_native.cc"
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
            _BUILD.mkdir(exist_ok=True)
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-std=c++17", str(src), "-o", str(_LIB_PATH),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.capt_build_start.restype = ctypes.c_void_p
        lib.capt_build_start.argtypes = [
            f32p, ctypes.c_uint32, ctypes.c_float, ctypes.c_float, u32p, u32p,
        ]
        lib.capt_build_finish.restype = None
        lib.capt_build_finish.argtypes = [
            ctypes.c_void_p, f32p, f32p, f32p, ctypes.c_uint32,
        ]
        lib.filter_pointcloud_native.restype = ctypes.c_uint32
        lib.filter_pointcloud_native.argtypes = [
            f32p, ctypes.c_uint32, ctypes.c_float, ctypes.c_float,
            f32p, f32p, f32p, ctypes.c_int, f32p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_capt_build(points: np.ndarray, r_max: float, r_point: float):
    """Returns (tests, leaf_points, leaf_aabb, nlog2) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    nlog2 = ctypes.c_uint32()
    max_aff = ctypes.c_uint32()
    handle = lib.capt_build_start(
        pts, n, ctypes.c_float(r_max), ctypes.c_float(r_point),
        ctypes.byref(nlog2), ctypes.byref(max_aff),
    )
    if not handle:
        return None
    n_pad = 1 << nlog2.value
    tests = np.empty(max(n_pad - 1, 1), np.float32)
    leaf_points = np.empty((n_pad, max_aff.value, 3), np.float32)
    leaf_aabb = np.empty((n_pad, 2, 3), np.float32)
    lib.capt_build_finish(handle, tests, leaf_points, leaf_aabb, max_aff.value)
    return tests, leaf_points, leaf_aabb, nlog2.value


def native_filter_pointcloud(
    points: np.ndarray,
    min_dist: float,
    max_range: float,
    origin,
    workcell_min,
    workcell_max,
    cull: bool,
):
    """Returns filtered points (M, 3) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(pts)
    m = lib.filter_pointcloud_native(
        pts, len(pts), ctypes.c_float(min_dist), ctypes.c_float(max_range),
        np.ascontiguousarray(origin, np.float32),
        np.ascontiguousarray(workcell_min, np.float32),
        np.ascontiguousarray(workcell_max, np.float32),
        int(cull), out,
    )
    return out[:m].copy()
