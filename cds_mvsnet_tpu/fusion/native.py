"""ctypes driver for the native (C++) fusibile-equivalent fusion library.

Builds ``native/fusion/fusion.cc`` on first use (g++, no external deps) and
exposes :func:`fuse_depth_maps_native`. This is the TPU-framework counterpart
of the reference's external fusibile binary + gipuma.py conversion layer
(SURVEY §2.1 native component #1) — same capability, no process boundary and
no .dmb interchange files.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["build_native_fusion", "fuse_depth_maps_native", "native_available"]

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "fusion" / "fusion.cc"
_LIB_DIR = _REPO_ROOT / "native" / "build"
_LIB = _LIB_DIR / "libcds_fusion.so"
_lib_handle = None


def build_native_fusion(force: bool = False) -> Path:
    if _LIB.exists() and not force and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    _LIB_DIR.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
         str(_SRC), "-o", str(_LIB)],
        check=True,
    )
    return _LIB


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _load():
    global _lib_handle
    if _lib_handle is None:
        lib = ctypes.CDLL(str(build_native_fusion()))
        lib.fuse_depth_maps.restype = ctypes.c_longlong
        lib.fuse_depth_maps.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # depths
            ctypes.POINTER(ctypes.c_float),   # cams
            ctypes.POINTER(ctypes.c_ubyte),   # colors
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # V, H, W
            ctypes.c_float, ctypes.c_int, ctypes.c_int,  # disp, num_cons, threads
            ctypes.POINTER(ctypes.c_float),   # out_points
            ctypes.POINTER(ctypes.c_ubyte),   # out_colors
            ctypes.c_longlong,                # max_points
        ]
        _lib_handle = lib
    return _lib_handle


def fuse_depth_maps_native(
    depths: np.ndarray,     # (V, H, W) float32, 0 = filtered out
    cams: np.ndarray,       # (V, 2, 4, 4) float32
    colors: np.ndarray,     # (V, H, W, 3) uint8
    disp_thresh: float = 0.2,
    num_consistent: int = 3,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse a whole scan's depth maps -> (points (N,3), colors (N,3))."""
    lib = _load()
    depths = np.ascontiguousarray(depths, dtype=np.float32)
    cams = np.ascontiguousarray(cams, dtype=np.float32)
    colors = np.ascontiguousarray(colors, dtype=np.uint8)
    V, H, W = depths.shape
    max_points = V * H * W
    out_pts = np.empty((max_points, 3), dtype=np.float32)
    out_cols = np.empty((max_points, 3), dtype=np.uint8)
    n = lib.fuse_depth_maps(
        depths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cams.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        V, H, W,
        ctypes.c_float(disp_thresh), num_consistent, n_threads,
        out_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_cols.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        max_points,
    )
    return out_pts[:n].copy(), out_cols[:n].copy()
