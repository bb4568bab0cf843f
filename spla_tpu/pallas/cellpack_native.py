"""ctypes loader for the native cell packer (``native/cellpack.cpp``).

Compiled on first use like the mtx parser (see ``spla_tpu.io``); returns
None when no toolchain is available so callers fall back to the numpy
packer.  The host in production is a single-core VM — the O(n) C++
greedy packer is ~20x faster than the vectorized numpy multi-pass
pipeline there.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_LIB_TRIED = False


def _native_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "cellpack.cpp"))
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libcellpack.so"))
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.cellpack_run.restype = ctypes.c_void_p
        lib.cellpack_run.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.cellpack_n_tiles.restype = ctypes.c_int64
        lib.cellpack_n_tiles.argtypes = [ctypes.c_void_p]
        for name, ct in (
            ("cellpack_vals", ctypes.c_float),
            ("cellpack_pk", ctypes.c_int32),
            ("cellpack_route", ctypes.c_int8),
            ("cellpack_rb", ctypes.c_int32),
            ("cellpack_wb", ctypes.c_int32),
            ("cellpack_first", ctypes.c_int32),
            ("cellpack_invl", ctypes.c_int8),
        ):
            getattr(lib, name).restype = ctypes.POINTER(ct)
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.cellpack_release.restype = None
        lib.cellpack_release.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_pack(m, n, cw, rows, cols, vals, mode=0):
    """Returns (n_tiles, t_vals, t_pk, t_route, rb, wb, first[, invl])
    numpy arrays (copies — the native handle is released before returning)
    or None.  mode 0 = PLUS packing; mode 1 = monoid packing (adds the
    inverse-lane table for the VPU compare-select scatter)."""
    lib = _native_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    nnz = rows.size
    h = lib.cellpack_run(
        nnz, m, n, cw,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), mode,
    )
    if not h:
        return None
    try:
        nt = lib.cellpack_n_tiles(h)
        cwr = cw // 128
        t_vals = np.ctypeslib.as_array(lib.cellpack_vals(h), shape=(nt, 8, 128)).copy()
        t_pk = np.ctypeslib.as_array(lib.cellpack_pk(h), shape=(nt, 8, 128)).copy()
        t_route = np.ctypeslib.as_array(
            lib.cellpack_route(h), shape=(nt, cwr, 128)
        ).copy()
        rb = np.ctypeslib.as_array(lib.cellpack_rb(h), shape=(nt,)).copy()
        wb = np.ctypeslib.as_array(lib.cellpack_wb(h), shape=(nt,)).copy()
        first = np.ctypeslib.as_array(lib.cellpack_first(h), shape=(nt,)).copy()
        if mode == 1:
            invl = np.ctypeslib.as_array(
                lib.cellpack_invl(h), shape=(nt, 8, 128)
            ).copy()
            return nt, t_vals, t_pk, t_route, rb, wb, first, invl
        return nt, t_vals, t_pk, t_route, rb, wb, first
    finally:
        lib.cellpack_release(h)
