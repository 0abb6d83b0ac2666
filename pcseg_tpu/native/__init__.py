"""ctypes loader for the native host-ops library (with auto-build).

Builds ``libpcseg_hostops.so`` from hostops.cc on first use (g++ -O3) into
a cache dir; falls back silently if no toolchain is available — callers
must handle ``load_hostops() is None`` (models/boundary.py keeps NumPy
fallbacks for every native op).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

_LIB = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src],
            check=True, capture_output=True)
        return True
    except Exception:  # noqa: BLE001 - no toolchain / failed build
        return False


def load_hostops() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the host-ops library; None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "hostops.cc")
    cache = os.environ.get(
        "PCSEG_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "pcseg_native"))
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, "libpcseg_hostops.so")
    if not os.path.exists(lib_path) \
            or os.path.getmtime(lib_path) < os.path.getmtime(src):
        if not _build(src, lib_path):
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.pcseg_moore_trace.restype = ctypes.c_int64
    lib.pcseg_moore_trace.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.pcseg_flood_outside.restype = None
    lib.pcseg_flood_outside.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.pcseg_convex_hull_2d.restype = ctypes.c_int64
    lib.pcseg_convex_hull_2d.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.pcseg_mean_shift_grid.restype = ctypes.c_int32
    lib.pcseg_mean_shift_grid.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    lib.pcseg_cluster_unorganized.restype = ctypes.c_int32
    lib.pcseg_cluster_unorganized.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32, ctypes.c_float,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.pcseg_mean_shift_points.restype = ctypes.c_int32
    lib.pcseg_mean_shift_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return _LIB
