"""Native (C++) runtime components, bound via ctypes.

The compute path is JAX/Pallas on TPU; the host-side runtime pieces that
the reference implements natively (CUDA/C++ submodules, SURVEY.md §2.10)
get C++ equivalents here where Python is genuinely the bottleneck. First
component: the COLMAP binary parser (reference walks points3D.bin with a
per-record Python struct loop, field_construction/scene/
colmap_loader.py:126-246).

The shared library is compiled lazily with g++ on first use and cached
next to the source; every entry point degrades to the pure-Python
implementation if no toolchain is available, so the package works
without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "colmap_parse.cpp")
_LIB_PATH = os.path.join(_HERE, "_colmap_parse.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load the native library; None if
    unavailable (no g++, read-only install, ...)."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            stale = (not os.path.exists(_LIB_PATH) or
                     os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC))
            if stale and not _build():
                _lib_failed = True
                return None
            lib = ctypes.CDLL(_LIB_PATH)
            lib.colmap_count.restype = ctypes.c_longlong
            lib.colmap_count.argtypes = [ctypes.c_char_p]
            lib.colmap_read_points3d.restype = ctypes.c_longlong
            lib.colmap_read_points3d.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_longlong]
            lib.colmap_read_images.restype = ctypes.c_longlong
            lib.colmap_read_images.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_longlong, ctypes.c_longlong]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def read_points3d_binary(path: str
                         ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]]:
    """points3D.bin -> (xyz [n,3] f64, rgb [n,3] u8->f64, err [n,1]).
    Returns None if the native library is unavailable or parsing fails
    (caller falls back to the Python parser)."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.colmap_count(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    got = lib.colmap_read_points3d(
        path.encode(), xyz.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p),
        err.ctypes.data_as(ctypes.c_void_p), n)
    if got != n:
        return None
    return xyz, rgb.astype(np.float64), err.reshape(-1, 1)


NAME_CAP = 512


def read_images_binary(path: str):
    """images.bin -> dict {id: (qvec, tvec, camera_id, name)} or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.colmap_count(path.encode())
    if n < 0:
        return None
    ids = np.empty((n,), np.int32)
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_ids = np.empty((n,), np.int32)
    names = np.zeros((n, NAME_CAP), np.uint8)
    got = lib.colmap_read_images(
        path.encode(), ids.ctypes.data_as(ctypes.c_void_p),
        qvec.ctypes.data_as(ctypes.c_void_p),
        tvec.ctypes.data_as(ctypes.c_void_p),
        cam_ids.ctypes.data_as(ctypes.c_void_p),
        names.ctypes.data_as(ctypes.c_void_p), NAME_CAP, n)
    if got != n:
        return None
    out = {}
    for i in range(n):
        name = bytes(names[i]).rstrip(b"\x00").decode("utf-8", "replace")
        out[int(ids[i])] = (qvec[i].copy(), tvec[i].copy(),
                            int(cam_ids[i]), name)
    return out
