"""ctypes bindings for the native host-side grid analytics (sphgrid.cpp).

Compiles lazily with g++ on first use (cached as libsphgrid.so next to the
source); every entry point has a pure-numpy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sphgrid.cpp")
_LIB = os.path.join(_DIR, "libsphgrid.so")

_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-o", _LIB, _SRC,
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.sphgrid_capacity.restype = ctypes.c_int
        lib.sphgrid_capacity.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sphgrid_fps.restype = None
        lib.sphgrid_fps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sphgrid_cell_hash.restype = None
        lib.sphgrid_cell_hash.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def capacity(
    x: np.ndarray,
    h: float,
    dims,
    period: Optional[np.ndarray] = None,
) -> Optional[Tuple[int, int]]:
    """Exact (max_cell_occupancy, max_neighbor_count), or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    dims_arr = np.ascontiguousarray(
        np.broadcast_to(np.asarray(dims, np.int32), (d,))
    )
    p_arr = None
    p_ptr = ctypes.POINTER(ctypes.c_float)()
    if period is not None:
        p_arr = np.ascontiguousarray(
            np.broadcast_to(np.asarray(period, np.float32), (d,))
        )
        p_ptr = _fptr(p_arr)
    occ = ctypes.c_int32()
    nbrs = ctypes.c_int32()
    rc = lib.sphgrid_capacity(
        _fptr(x), n, d, ctypes.c_float(h), _iptr(dims_arr), p_ptr,
        ctypes.byref(occ), ctypes.byref(nbrs),
    )
    if rc != 0:
        return None
    return int(occ.value), int(nbrs.value)


def fps(x: np.ndarray, m: int, start: int = 0) -> Optional[np.ndarray]:
    """Greedy farthest-point sampling indices, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    out = np.empty(m, np.int32)
    lib.sphgrid_fps(_fptr(x), n, d, m, start, _iptr(out))
    return out


def cell_hash(x: np.ndarray, h: float, dims) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    dims_arr = np.ascontiguousarray(
        np.broadcast_to(np.asarray(dims, np.int32), (d,))
    )
    out = np.empty(n, np.int32)
    lib.sphgrid_cell_hash(_fptr(x), n, d, ctypes.c_float(h), _iptr(dims_arr),
                          _iptr(out))
    return out
