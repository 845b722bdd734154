"""Native (C++) host-side preprocessing, loaded via ctypes.

Builds softmac_native.so from preprocess.cpp on first use (g++ -O2); every
entry point has a pure-Python fallback so the framework works without a
toolchain."""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "softmac_native.so"
_LIB = None


def _build():
    src = _DIR / "preprocess.cpp"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        if not _SO.exists() or _SO.stat().st_mtime < (_DIR / "preprocess.cpp").stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.softmac_process_faces.restype = ctypes.c_int
        lib.softmac_parse_obj.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def process_faces_native(faces: np.ndarray, n_neighbors: int = 200):
    """C++ face-adjacency BFS; returns (neighbors, dirs) or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    F = faces.shape[0]
    neighbors = np.empty((F, n_neighbors), np.int32)
    dirs = np.empty((F, n_neighbors), np.int8)
    rc = lib.softmac_process_faces(
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(F), ctypes.c_int(n_neighbors),
        neighbors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    if rc != 0:
        return None
    return neighbors, dirs


def load_obj_native(path):
    """C++ OBJ parser; returns (verts, faces) or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.softmac_parse_obj(str(path).encode(), None, None,
                               ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0:
        return None
    verts = np.empty((nv.value, 3), np.float64)
    faces = np.empty((nf.value, 3), np.int32)
    rc = lib.softmac_parse_obj(
        str(path).encode(),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0:
        return None
    return verts, faces
