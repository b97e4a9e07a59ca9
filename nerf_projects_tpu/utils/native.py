"""ctypes loader for the native host ops (csrc/native_ops.cpp).

Compiles the shared library on first use (g++ -O3 -shared, cached next to
the source); every entry point has a pure-Python fallback so the package
works without a toolchain. `available()` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc", "native_ops.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libnative_ops.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.octree_leaf_geometry.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.median_cut.restype = ctypes.c_int64
            lib.median_cut.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.build_neighbor_links.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def octree_leaf_geometry(child: np.ndarray):
    """child [N, 2, 2, 2] int32 -> (depth [N,8], corner [N,8,3],
    size [N,8], is_leaf [N,8]) per-cell geometry; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    child = np.ascontiguousarray(child.reshape(-1, 8), np.int32)
    n = child.shape[0]
    depth = np.empty((n, 8), np.int32)
    corner = np.empty((n, 8, 3), np.float64)
    size = np.empty((n, 8), np.float64)
    is_leaf = np.empty((n, 8), np.uint8)
    lib.octree_leaf_geometry(
        _ptr(child, ctypes.c_int32), n,
        _ptr(depth, ctypes.c_int32), _ptr(corner, ctypes.c_double),
        _ptr(size, ctypes.c_double), _ptr(is_leaf, ctypes.c_uint8),
    )
    return depth, corner, size, is_leaf.astype(bool)


def median_cut(vectors: np.ndarray, n_colors: int):
    """Native median-cut; returns (palette fp16, ids) or None."""
    lib = _load()
    if lib is None:
        return None
    vectors = np.ascontiguousarray(vectors, np.float32)
    n, c = vectors.shape
    ids = np.empty(n, np.int32)
    palette = np.zeros((n_colors, c), np.float32)
    k = lib.median_cut(
        _ptr(vectors, ctypes.c_float), n, c, n_colors,
        _ptr(ids, ctypes.c_int32), _ptr(palette, ctypes.c_float),
    )
    k = max(int(k), 1)
    id_dtype = np.uint16 if k <= 65536 else np.uint32
    return palette[:k].astype(np.float16), ids.astype(id_dtype)


def build_neighbor_links(links: np.ndarray, cap: int):
    lib = _load()
    if lib is None:
        return None
    links = np.ascontiguousarray(links, np.int32)
    X, Y, Z = links.shape
    nbr = np.empty((cap, 3), np.int32)
    lib.build_neighbor_links(
        _ptr(links, ctypes.c_int32), X, Y, Z, _ptr(nbr, ctypes.c_int32), cap
    )
    return nbr
