"""ctypes bindings to the native host-side setup library (native/permon_host.cpp).

The reference's setup machinery (PetscSF gluing assembly, matrix conversions)
is native C; these are our C++ counterparts for large-scale assembly, with
the pure-numpy implementations in :mod:`permon_tpu.feti.assembly` as
reference/fallback.  The library is built on demand with g++ (no external
dependencies) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpermon_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

GLUING_CODES = {"nonred": 0, "full": 1, "orth": 2}


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "permon_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "permon_host.cpp")
    stale = (
        not os.path.exists(_SO_PATH)
        or (os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))
    )
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.permon_gluing_bound.restype = ctypes.c_int64
    lib.permon_gluing_bound.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32]
    lib.permon_build_gluing.restype = ctypes.c_int64
    lib.permon_build_gluing.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, i64p, ctypes.c_int64, i64p, i64p, f64p, i64p,
    ]
    lib.permon_pack_extension.restype = ctypes.c_int64
    lib.permon_pack_extension.argtypes = [
        i64p, i64p, f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, i32p, i32p, f64p,
    ]
    lib.permon_csr_to_ell.restype = ctypes.c_int64
    lib.permon_csr_to_ell.argtypes = [i64p, i64p, f64p, ctypes.c_int64, i32p, f64p]
    lib.permon_leaf_partners.restype = ctypes.c_int64
    lib.permon_leaf_partners.argtypes = [
        i32p, f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, f64p,
    ]
    if hasattr(lib, "permon_sell_schedule"):
        lib.permon_sell_schedule.restype = ctypes.c_int64
        lib.permon_sell_schedule.argtypes = [
            i64p, i64p, f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p, i32p, f64p,
        ]
    _lib = lib
    return _lib


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def build_gluing_native(l2g: np.ndarray, gluing: str = "nonred", scale: bool = True,
                        exclude=None):
    """Native gluing assembly; returns (rows, cols, vals, n_rows) or None if
    the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    l2g = np.ascontiguousarray(l2g, dtype=np.int64)
    ns, nl = l2g.shape
    n_global = int(l2g.max()) + 1
    code = GLUING_CODES[gluing]
    bound = lib.permon_gluing_bound(_ptr(l2g, ctypes.c_int64), ns, nl, n_global, code)
    rows = np.empty(bound, dtype=np.int64)
    cols = np.empty(bound, dtype=np.int64)
    vals = np.empty(bound, dtype=np.float64)
    nr = np.zeros(1, dtype=np.int64)
    excl = np.ascontiguousarray(np.sort(np.asarray(exclude, dtype=np.int64))) if exclude is not None and len(exclude) else None
    nnz = lib.permon_build_gluing(
        _ptr(l2g, ctypes.c_int64), ns, nl, n_global, code, int(scale),
        _ptr(excl, ctypes.c_int64) if excl is not None else None,
        0 if excl is None else len(excl),
        _ptr(rows, ctypes.c_int64), _ptr(cols, ctypes.c_int64),
        _ptr(vals, ctypes.c_double), _ptr(nr, ctypes.c_int64),
    )
    return rows[:nnz], cols[:nnz], vals[:nnz], int(nr[0])


def pack_extension_native(rows, cols, vals, m: int, ns: int, nl: int):
    """Native per-subdomain extension packing; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    k = lib.permon_pack_extension(
        _ptr(rows, ctypes.c_int64), _ptr(cols, ctypes.c_int64),
        _ptr(vals, ctypes.c_double), len(rows), m, ns, nl, None, None, None,
    )
    r = np.empty((ns, k), dtype=np.int32)
    c = np.empty((ns, k), dtype=np.int32)
    v = np.empty((ns, k), dtype=np.float64)
    lib.permon_pack_extension(
        _ptr(rows, ctypes.c_int64), _ptr(cols, ctypes.c_int64),
        _ptr(vals, ctypes.c_double), len(rows), m, ns, nl,
        _ptr(r, ctypes.c_int32), _ptr(c, ctypes.c_int32), _ptr(v, ctypes.c_double),
    )
    return r, c, v


def csr_to_ell_native(a):
    """Native CSR -> padded ELL conversion; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(a.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(a.indices, dtype=np.int64)
    data = np.ascontiguousarray(a.data, dtype=np.float64)
    m = a.shape[0]
    k = lib.permon_csr_to_ell(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        _ptr(data, ctypes.c_double), m, None, None,
    )
    cols = np.empty((m, k), dtype=np.int32)
    vals = np.empty((m, k), dtype=np.float64)
    lib.permon_csr_to_ell(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        _ptr(data, ctypes.c_double), m, _ptr(cols, ctypes.c_int32),
        _ptr(vals, ctypes.c_double),
    )
    return cols, vals


def sell_schedule_native(indptr, indices, data, m: int, ntiles: int,
                         win: int = 1024):
    """Native SELL round scheduler (core/sell.py setup); returns
    (wstart, tid, S, C, V) or None if the library is unavailable.
    ``win`` = source-window element count (multiple of 1024)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "permon_sell_schedule"):
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.float64)
    nr = int(lib.permon_sell_schedule(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        _ptr(data, ctypes.c_double), m, ntiles, win,
        None, None, None, None, None,
    ))
    wstart = np.empty(nr, dtype=np.int32)
    tid = np.empty(nr, dtype=np.int32)
    S = np.empty((nr, 8, 128), dtype=np.int32)
    C = np.empty((nr, 8, 128), dtype=np.int32)
    V = np.empty((nr, 8, 128), dtype=np.float64)
    lib.permon_sell_schedule(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        _ptr(data, ctypes.c_double), m, ntiles, win,
        _ptr(wstart, ctypes.c_int32), _ptr(tid, ctypes.c_int32),
        _ptr(S, ctypes.c_int32), _ptr(C, ctypes.c_int32),
        _ptr(V, ctypes.c_double),
    )
    return wstart, tid, S, C, V


def leaf_partners_native(rows: np.ndarray, vals: np.ndarray, m: int):
    """Native leaf-space partner map (feti/leaf.py setup); returns
    (partners (deg_max-1, ns*k) int32, weights (ns, k)) or None."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    ns, k = rows.shape
    deg_max = int(lib.permon_leaf_partners(
        _ptr(rows, ctypes.c_int32), _ptr(vals, ctypes.c_double),
        ns, k, m, None, None,
    ))
    # allocate at least one partner row: the C entry point early-returns on a
    # null partners pointer (query mode) and would leave weights unfilled
    partners = np.empty((max(deg_max - 1, 1), ns * k), dtype=np.int32)
    weights = np.empty(ns * k, dtype=np.float64)
    lib.permon_leaf_partners(
        _ptr(rows, ctypes.c_int32), _ptr(vals, ctypes.c_double), ns, k, m,
        _ptr(partners, ctypes.c_int32), _ptr(weights, ctypes.c_double),
    )
    return partners[: deg_max - 1], weights.reshape(ns, k)
