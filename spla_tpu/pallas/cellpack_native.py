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
    try:
        # key the binary on the SOURCE CONTENT, not mtime: a stale or
        # foreign-arch .so (e.g. from a copied checkout) must never load
        import hashlib

        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:12]
        so = os.path.abspath(os.path.join(_NATIVE_DIR, f"libcellpack-{tag}.so"))
        if not os.path.exists(so):
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
        lib.cellpack_run2.restype = ctypes.c_void_p
        lib.cellpack_run2.argtypes = lib.cellpack_run.argtypes + [ctypes.c_int64]
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
            ("cellpack_stab", ctypes.c_int8),
            ("cellpack_fused", ctypes.c_int32),
        ):
            getattr(lib, name).restype = ctypes.POINTER(ct)
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.cellpack_release.restype = None
        lib.cellpack_release.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


_CACHE_MIN_NNZ = 4_000_000  # below this, packing is faster than disk IO


def _cache_dir():
    d = os.environ.get("SPLA_CACHE_DIR")
    if d is None:
        d = os.path.join(os.path.expanduser("~"), ".cache", "spla_tpu")
    return d


# bump when the PACKING POLICY changes (same layout, different slot
# assignment): stale cached packs are valid but slower
_PACK_VERSION = 3


def _cache_key(m, n, cw, rows, cols, vals, mode, batch=1):
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(np.asarray([m, n, cw, mode, batch, _PACK_VERSION],
                        np.int64).tobytes())
    h.update(rows.tobytes())
    h.update(cols.tobytes())
    h.update(vals.tobytes())
    return h.hexdigest()


def _cache_names(mode):
    if mode in (3, 4, 5, 6, 7):
        return ["nt", "fused", "rb", "wb"]
    names = ["nt", "t_vals", "t_pk", "t_route", "rb", "wb", "first"]
    if mode >= 1:
        names.append("invl")
    if mode == 2:
        names.append("stab")
    return names


def _cache_load(path, mode):
    try:
        with np.load(path) as z:
            out = [int(z["nt"])] + [z[k] for k in _cache_names(mode)[1:]]
        return tuple(out)
    except Exception:
        return None


def _cache_store(path, packed, mode):
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".{os.getpid()}.tmp"
        with open(tmp, "wb") as f:  # file object: numpy won't append .npz
            np.savez(f, **dict(zip(_cache_names(mode), packed)))
        os.replace(tmp, path)
    except Exception:
        pass


def native_pack(m, n, cw, rows, cols, vals, mode=0, batch=1):
    """Returns (n_tiles, t_vals, t_pk, t_route, rb, wb, first[, invl])
    numpy arrays (copies — the native handle is released before returning)
    or None.  mode 0 = PLUS packing; mode 1 = monoid packing (adds the
    inverse-lane table for the VPU compare-select scatter).

    Big matrices are persisted to disk (``SPLA_CACHE_DIR``, default
    ``~/.cache/spla_tpu``) keyed by a content hash, amortizing the
    one-time pack across processes (the 1-core host needs ~15 s for 33M
    edges; the reference re-converts per process too, but its CSR build
    is cheap — ours is the analog of a tuned device format)."""
    lib = _native_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    nnz = rows.size
    cache_path = None
    if nnz >= _CACHE_MIN_NNZ and not os.environ.get("SPLA_NO_PACK_CACHE"):
        key = _cache_key(m, n, cw, rows, cols, vals, mode, batch)
        cache_path = os.path.join(_cache_dir(), f"cellpack-{key}.npz")
        if os.path.exists(cache_path):
            hit = _cache_load(cache_path, mode)
            if hit is not None:
                return hit
    h = lib.cellpack_run2(
        nnz, m, n, cw,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), mode, batch,
    )
    if not h:
        return None
    try:
        nt = lib.cellpack_n_tiles(h)
        cwr = cw // 128
        if mode in (3, 4, 5, 6, 7):
            if mode == 6:  # oct-shared S-table: 120-row OCT blocks
                fshape = (nt // 8, 120, 128)
            elif mode in (5, 7):  # pair-shared S-table: 40-row PAIR blocks
                fshape = (nt // 2, 40, 128)
            else:
                fshape = (nt, 28 if mode == 3 else 29, 128)
            fused = np.ctypeslib.as_array(
                lib.cellpack_fused(h), shape=fshape
            ).copy()
            rb = np.ctypeslib.as_array(lib.cellpack_rb(h), shape=(nt,)).copy()
            wb = np.ctypeslib.as_array(lib.cellpack_wb(h), shape=(nt,)).copy()
            out = (nt, fused, rb, wb)
            if cache_path is not None:
                _cache_store(cache_path, out, mode)
            return out
        t_vals = np.ctypeslib.as_array(lib.cellpack_vals(h), shape=(nt, 8, 128)).copy()
        t_pk = np.ctypeslib.as_array(lib.cellpack_pk(h), shape=(nt, 8, 128)).copy()
        t_route = np.ctypeslib.as_array(
            lib.cellpack_route(h), shape=(nt, cwr, 128)
        ).copy()
        rb = np.ctypeslib.as_array(lib.cellpack_rb(h), shape=(nt,)).copy()
        wb = np.ctypeslib.as_array(lib.cellpack_wb(h), shape=(nt,)).copy()
        first = np.ctypeslib.as_array(lib.cellpack_first(h), shape=(nt,)).copy()
        if mode == 2:
            invl = np.ctypeslib.as_array(
                lib.cellpack_invl(h), shape=(nt, 8, 128)
            ).copy()
            stab = np.ctypeslib.as_array(
                lib.cellpack_stab(h), shape=(nt, 64, 128)
            ).copy()
            out = (nt, t_vals, t_pk, t_route, rb, wb, first, invl, stab)
        elif mode == 1:
            invl = np.ctypeslib.as_array(
                lib.cellpack_invl(h), shape=(nt, 8, 128)
            ).copy()
            out = (nt, t_vals, t_pk, t_route, rb, wb, first, invl)
        else:
            out = (nt, t_vals, t_pk, t_route, rb, wb, first)
        if cache_path is not None:
            _cache_store(cache_path, out, mode)
        return out
    finally:
        lib.cellpack_release(h)


# ---------------------------------------------------------------------------
# class-balancing relabel (native/classbal.cpp): joint l/lane vector
# scheduling that shrinks the per-cell class-load maxima the fused packs
# quantize into padding.  Within-block permutation: packs of the
# relabeled matrix serve chained iterations with zero apply-time cost.
# ---------------------------------------------------------------------------

_CB_LIB = None
_CB_TRIED = False


def _classbal_lib():
    global _CB_LIB, _CB_TRIED
    if _CB_TRIED:
        return _CB_LIB
    _CB_TRIED = True
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "classbal.cpp"))
    try:
        import hashlib

        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:12]
        so = os.path.abspath(os.path.join(_NATIVE_DIR,
                                          f"libclassbal-{tag}.so"))
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
                 "-o", so],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.classbal_run.restype = ctypes.c_int32
        lib.classbal_run.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_uint64,
            ctypes.c_int32,
        ]
        _CB_LIB = lib
    except Exception:
        _CB_LIB = None
    return _CB_LIB


def class_relabel(m, n, cw, rows, cols, d=16, seed=1, passes=2):
    """new_of_old[v] permutation balancing the fused layout's l/lane
    class loads (square matrices); None without the native helper.
    Disk-cached alongside the pack cache (content-keyed)."""
    lib = _classbal_lib()
    if lib is None or m != n:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    cache_path = None
    if rows.shape[0] >= (1 << 22):
        import hashlib

        h = hashlib.sha256()
        for part in (np.int64([m, n, cw, d, seed, passes]), rows, cols):
            h.update(np.ascontiguousarray(part).tobytes())
        cache_path = os.path.join(_cache_dir(),
                                  f"classbal-{h.hexdigest()[:20]}.npy")
        if os.path.exists(cache_path):
            got = np.load(cache_path)
            if got.shape[0] == m:
                return got
    out = np.empty(m, np.int32)
    rc = lib.classbal_run(
        m, n, cw, rows.shape[0],
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(d), ctypes.c_uint64(seed),
        ctypes.c_int32(passes),
    )
    if rc != 0:
        return None
    if cache_path is not None:
        try:
            np.save(cache_path, out)
        except OSError:  # pragma: no cover - cache dir full/readonly
            pass
    return out
