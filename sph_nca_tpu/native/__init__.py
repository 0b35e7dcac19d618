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

_HUGE_MIN = 16 << 20  # bytes; below this plain numpy allocation is fine


def _alloc(shape, dtype, zero: bool = False) -> np.ndarray:
    """Big-buffer allocator: anonymous mmap + MADV_HUGEPAGE.

    Two wins over np.empty/np.zeros for the multi-GB table outputs on
    this host (THP is madvise-mode, so plain malloc pages never get
    huge pages): (a) 2 MB faults instead of 4 KB through the measured
    fresh-page write collapse (~45 MB/s after churn, RESULTS.md round
    3), and (b) anonymous mmap pages arrive kernel-zeroed, so
    ``zero=True`` costs nothing instead of a memset pass."""
    dt = np.dtype(dtype)
    nbytes = int(np.prod(np.asarray(shape, np.int64))) * dt.itemsize
    if nbytes < _HUGE_MIN:
        return np.zeros(shape, dt) if zero else np.empty(shape, dt)
    import mmap as _mmap

    mm = _mmap.mmap(-1, nbytes)
    try:
        mm.madvise(_mmap.MADV_HUGEPAGE)
    except (AttributeError, OSError):
        pass
    return np.frombuffer(mm, dt).reshape(shape)


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
        lib.sphgrid_true_pairs.restype = ctypes.c_int64
        lib.sphgrid_true_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sphgrid_band_cols.restype = None
        lib.sphgrid_band_cols.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sphgrid_fill_band_bf16.restype = None
        lib.sphgrid_fill_band_bf16.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
        ]
        lib.sphgrid_accum_table.restype = None
        lib.sphgrid_accum_table.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.sphgrid_fill_cast_bf16.restype = None
        lib.sphgrid_fill_cast_bf16.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
        ]
        lib.sphgrid_cast_bf16_gsum.restype = None
        lib.sphgrid_cast_bf16_gsum.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.sphgrid_far_groups.restype = ctypes.c_int64
        lib.sphgrid_far_groups.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sphgrid_far_meta.restype = None
        lib.sphgrid_far_meta.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int32),
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


def true_pairs(
    x: np.ndarray, h: float, period: Optional[np.ndarray] = None,
    with_sums: bool = False,
):
    """All true SPH pairs |r| < h of rank-ordered positions (incl. self;
    periodic pairs once per contributing image) — the native form of
    ops/bands._true_pairs. Returns (pi, pj, dx [E, D] f32, d2 [E] f32 —
    build-side bytes matter on this churn-sensitive host; ~1e-7
    relative quantization, far below the bf16 tables') or None if the
    native library is unavailable / grid degenerate."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float64)
    n, d = x.shape
    p_ptr = ctypes.POINTER(ctypes.c_double)()
    if period is not None:
        p_arr = np.ascontiguousarray(
            np.broadcast_to(np.asarray(period, np.float64), (d,))
        )
        p_ptr = p_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    xp = x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    # one enumeration in the common case: allocate for ~33 neighbors per
    # point (our geometries sit near ~30 at kernel-support packing) and
    # only re-run if the exact count overflows the guess — the scan
    # itself dominates, so avoiding the count-only pass halves the cost
    cap = 33 * n + 1024
    w6sum = _alloc(n, np.float64) if with_sums else None
    nbr = _alloc(n, np.int32) if with_sums else None
    wp = (w6sum.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
          if with_sums else ctypes.POINTER(ctypes.c_double)())
    np_ = _iptr(nbr) if with_sums else ctypes.POINTER(ctypes.c_int32)()
    while True:
        pi = _alloc(cap, np.int32)
        pj = _alloc(cap, np.int32)
        dx = _alloc((cap, d), np.float32)
        d2 = _alloc(cap, np.float32)
        e = lib.sphgrid_true_pairs(
            xp, n, d, ctypes.c_double(h), p_ptr, cap, _iptr(pi), _iptr(pj),
            _fptr(dx), _fptr(d2), wp, np_,
        )
        if e < 0:
            return None
        if e <= cap:
            if with_sums:
                return pi[:e], pj[:e], dx[:e], d2[:e], w6sum, nbr
            return pi[:e], pj[:e], dx[:e], d2[:e]
        cap = e


def band_cols(pi: np.ndarray, pj: np.ndarray, p: int,
              nb: int) -> Optional[np.ndarray]:
    """Per-pair band-window column (slot*P + pj%P; -1 = far pair), or
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pi = np.ascontiguousarray(pi, np.int32)
    pj = np.ascontiguousarray(pj, np.int32)
    out = np.empty(len(pi), np.int32)
    lib.sphgrid_band_cols(_iptr(pi), _iptr(pj), len(pi), p, nb, _iptr(out))
    return out


def fill_band_bf16(pi, band_col, pairs, v, h, nrows, p):
    """Band-table fill + bf16 quantize + gsum row sums driven directly
    by the (pi-sorted) pair arrays — no selection arrays. band_col < 0
    marks far pairs (skipped). Returns (bf16 [nrows, 3P, (d+1)P], gs)
    or None."""
    lib = _load()
    if lib is None:
        return None
    import ml_dtypes

    _, pj, dx, d2 = pairs
    d = dx.shape[1]
    pi = np.ascontiguousarray(pi, np.int32)
    band_col = np.ascontiguousarray(band_col, np.int32)
    pj = np.ascontiguousarray(pj, np.int32)
    dx = np.ascontiguousarray(dx, np.float32)
    d2 = np.ascontiguousarray(d2, np.float32)
    v = np.ascontiguousarray(v, np.float64)
    cc = (d + 1) * p
    out = _alloc((nrows, 3 * p, cc), np.uint16)
    gs = _alloc((nrows, cc), np.float32, zero=True)
    lib.sphgrid_fill_band_bf16(
        _iptr(pi), _iptr(band_col), len(pi), _fptr(dx), _fptr(d2),
        _iptr(pj), v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(h), d, p, nrows,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), _fptr(gs),
    )
    return out.view(ml_dtypes.bfloat16), gs


def accum_table(
    rows: np.ndarray, cols: np.ndarray, ri: np.ndarray, mdv: np.ndarray,
    w6v: np.ndarray, nrows: int, wcols: int, p: int,
) -> Optional[np.ndarray]:
    """Accumulate pair weights into a fresh f32 table
    [nrows, wcols, (d+1)*P] (ops/bands.fill_table layout), or None."""
    lib = _load()
    if lib is None:
        return None
    e, d = mdv.shape
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    ri = np.ascontiguousarray(ri, np.int32)
    mdv = np.ascontiguousarray(mdv, np.float64)
    w6v = np.ascontiguousarray(w6v, np.float64)
    tab = _alloc((nrows, wcols, (d + 1) * p), np.float32, zero=True)
    lib.sphgrid_accum_table(
        _iptr(rows), _iptr(cols), _iptr(ri),
        mdv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        w6v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        e, d, p, wcols, _fptr(tab),
    )
    return tab


def fill_cast_bf16(
    rows: np.ndarray, cols: np.ndarray, ri: np.ndarray, psel, pairs,
    v: np.ndarray, h: float, nrows: int, wcols: int, p: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fused table fill + bf16 quantize + quantized row sums from RAW
    pair data (pair weights computed in C++, never materialized in
    Python). ``pairs`` = (pi, pj, dx, d2) from true_pairs (dx/d2 in
    f32 — quantization ~1e-7 relative, far below the bf16 tables');
    ``psel``
    indexes into them (None = all, aligned with rows/cols/ri); rows
    must be non-decreasing. Returns (bf16 table [nrows, wcols,
    (d+1)*p], gs [nrows, (d+1)*p] f32) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    import ml_dtypes

    _, pj, dx, d2 = pairs
    e = len(rows)
    d = dx.shape[1]
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    ri = np.ascontiguousarray(ri, np.int32)
    pj = np.ascontiguousarray(pj, np.int32)
    dx = np.ascontiguousarray(dx, np.float32)
    d2 = np.ascontiguousarray(d2, np.float32)
    v = np.ascontiguousarray(v, np.float64)
    psel_ptr = ctypes.POINTER(ctypes.c_int64)()
    if psel is not None:
        psel = np.ascontiguousarray(psel, np.int64)
        assert len(psel) == e
        psel_ptr = psel.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    cc = (d + 1) * p
    out = _alloc((nrows, wcols, cc), np.uint16)
    gs = _alloc((nrows, cc), np.float32, zero=True)
    lib.sphgrid_fill_cast_bf16(
        _iptr(rows), _iptr(cols), _iptr(ri), psel_ptr, e,
        _fptr(dx), _fptr(d2), _iptr(pj),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(h), d, p, wcols, nrows,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), _fptr(gs),
    )
    return out.view(ml_dtypes.bfloat16), gs


def far_groups(pi, pj, band_col, e_far_cap, p, g, nb):
    """Phase A of the far structure: per-block distinct far group ids
    (ascending, np.unique order) + counts, via a single linear pass with
    block-local dedup (the pairs are pi-sorted). Returns
    (grp_count [nb] i32, offsets [nb+1] i64, groups_flat [total] i32)
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pi = np.ascontiguousarray(pi, np.int32)
    pj = np.ascontiguousarray(pj, np.int32)
    band_col = np.ascontiguousarray(band_col, np.int32)
    grp_count = np.empty(nb, np.int32)
    offsets = np.empty(nb + 1, np.int64)
    flat = _alloc(max(int(e_far_cap), 1), np.int32)
    total = lib.sphgrid_far_groups(
        _iptr(pi), _iptr(pj), _iptr(band_col), len(pi), p, g, nb,
        _iptr(grp_count),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _iptr(flat),
    )
    return grp_count, offsets, flat[:total]


def far_meta(pi, pj, band_col, p, g, nb, grp_count, offsets, groups_flat,
             cuts):
    """Phase C of the far structure: per-block bucket/row assignment and
    per-pair (bucket, row, col) for the far-table fills, in one linear
    pass (replaces the per-bucket searchsorted/repeat/cumsum numpy
    chains). Returns (block_bucket i8 [nb], block_row i32 [nb],
    bucket_nblocks i64 [T], bucket_npairs i64 [T], pair_bucket i8 [e],
    pair_row i32 [e], pair_col i32 [e]) or None."""
    lib = _load()
    if lib is None:
        return None
    pi = np.ascontiguousarray(pi, np.int32)
    pj = np.ascontiguousarray(pj, np.int32)
    band_col = np.ascontiguousarray(band_col, np.int32)
    grp_count = np.ascontiguousarray(grp_count, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    groups_flat = np.ascontiguousarray(groups_flat, np.int32)
    cuts = np.ascontiguousarray(cuts, np.int64)
    T = len(cuts)
    e = len(pi)
    block_bucket = np.empty(nb, np.int8)
    block_row = np.empty(nb, np.int32)
    bucket_nblocks = np.empty(T, np.int64)
    bucket_npairs = np.empty(T, np.int64)
    pair_bucket = _alloc(e, np.int8)
    pair_row = _alloc(e, np.int32)
    pair_col = _alloc(e, np.int32)
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    i8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
    lib.sphgrid_far_meta(
        _iptr(pi), _iptr(pj), _iptr(band_col), e, p, g, nb,
        _iptr(grp_count), i64p(offsets), _iptr(groups_flat),
        i64p(cuts), T,
        i8p(block_bucket), _iptr(block_row),
        i64p(bucket_nblocks), i64p(bucket_npairs),
        i8p(pair_bucket), _iptr(pair_row), _iptr(pair_col),
    )
    return (block_bucket, block_row, bucket_nblocks, bucket_npairs,
            pair_bucket, pair_row, pair_col)


def cast_bf16_gsum(
    tab: np.ndarray, with_gsum: bool = True
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """Round-to-nearest-even f32 -> bfloat16 cast of a table
    [nrows, wrows, cc]; optionally also the f32 sum of the QUANTIZED
    values over the window-row axis ([nrows, cc] — the gsum self-term).
    Returns (bf16 array via ml_dtypes view, gs or None), or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    import ml_dtypes

    tab = np.ascontiguousarray(tab, np.float32)
    nrows, wrows, cc = tab.shape
    dst = _alloc(tab.shape, np.uint16)
    gs = (_alloc((nrows, cc), np.float32, zero=True)
          if with_gsum else None)
    lib.sphgrid_cast_bf16_gsum(
        _fptr(tab), dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        nrows, wrows, cc,
        _fptr(gs) if with_gsum else ctypes.POINTER(ctypes.c_float)(),
    )
    return dst.view(ml_dtypes.bfloat16), gs


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
