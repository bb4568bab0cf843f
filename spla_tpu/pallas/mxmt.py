"""Pallas masked-mxmT (SpGEMM-T) intersection kernel.

TPU-native replacement for the reference's masked SpGEMM GPU kernel
(``src/opencl/cl_mxmT_masked.hpp:1-166``, ``kernels/mxmT_masked.cl``):
R[i,j] = select(mask[i,j]) * sum_k op_mul(A[i,k], B[j,k]).

The reference walks a sorted-list intersection per mask entry with
per-thread random access.  A TPU has none, so the intersection is
re-expressed as a *stream* (see ``native/pairpack.cpp``): each mask entry
splits into range-pruned (A-chunk x B-chunk) jobs of <= 8 sorted entries
per side; the kernel evaluates 128 jobs per grid step with dense
all-pairs compare-FMA on the VPU — zero gathers, pure HBM streaming.

Two entry points:

* :func:`pallas_mxmT_reduce` — fused PLUS-reduction of all products
  (triangle counting, the op's only reference use in algorithms).
* :func:`pallas_mxmT_rvals` — per-mask-entry values via a per-job
  partial + XLA segment fold (materializing mxmT_masked).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "build_pair_jobs",
    "pairs_available",
    "get_fused_jobs",
    "pallas_mxmT_reduce",
    "pallas_mxmT_job_partials",
]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_LIB_TRIED = False


def _native_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "pairpack.cpp"))
    try:
        import hashlib

        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:12]
        so = os.path.abspath(os.path.join(_NATIVE_DIR, f"libpairpack-{tag}.so"))
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.pairpack_run.restype = ctypes.c_void_p
        lib.pairpack_run.argtypes = [
            ctypes.c_int64, i32p, i32p, i32p, i32p, f32p, i32p, i32p, f32p,
        ]
        for name in ("pairpack_n_jobs", "pairpack_n_jobs_real"):
            getattr(lib, name).restype = ctypes.c_int64
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        for name, ct in (
            ("pairpack_ac", ctypes.c_int32), ("pairpack_av", ctypes.c_float),
            ("pairpack_bc", ctypes.c_int32), ("pairpack_bv", ctypes.c_float),
            ("pairpack_seg", ctypes.c_int32),
        ):
            getattr(lib, name).restype = ctypes.POINTER(ct)
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.pairpack_release.restype = None
        lib.pairpack_release.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def pairs_available() -> bool:
    return _native_lib() is not None


# device-resident fused job streams, cached on the mask-owner's values
# array (dies with it) — rebuilding + re-uploading jobs per call costs
# seconds while the kernel itself runs in milliseconds
from ..formats import WeakIdCache  # noqa: E402

_JOB_CACHE = WeakIdCache()
_JOB_DISK_MIN = 2_000_000  # mask entries; below this the build is fast


def _jobs_disk_path(mrow, mcol, a_indptr, a_cols, a_vals,
                    b_indptr, b_cols, b_vals):
    import hashlib
    from .cellpack_native import _cache_dir

    h = hashlib.blake2b(digest_size=16)
    for a in (mrow, mcol, a_indptr, a_cols, a_vals, b_indptr, b_cols,
              b_vals):  # STRUCTURE included: values alone collide for
        h.update(np.asarray(a).tobytes())  # struct_only all-ones masks
    return os.path.join(_cache_dir(), f"pairjobs-{h.hexdigest()}.npz")


def get_fused_jobs(cache_key, mrow, mcol, a_indptr, a_cols, a_vals,
                   b_indptr, b_cols, b_vals, tag=()):
    """(fused_device_array, seg, n_jobs_real, n_jobs) with the host build
    and device upload cached on ``cache_key`` (a jax.Array whose lifetime
    bounds the cache entry); None without the native job builder."""
    full_tag = ("jobs",) + tuple(tag)
    if _JOB_CACHE.contains(cache_key, full_tag):
        return _JOB_CACHE.get(cache_key, full_tag)
    entry = None
    jobs = None
    disk = None
    if mrow.size >= _JOB_DISK_MIN and not os.environ.get("SPLA_NO_PACK_CACHE"):
        disk = _jobs_disk_path(mrow, mcol, a_indptr, a_cols, a_vals,
                               b_indptr, b_cols, b_vals)
        if os.path.exists(disk):
            try:
                with np.load(disk) as z:
                    jobs = (z["ac"], z["av"], z["bc"], z["bv"], z["seg"],
                            int(z["njr"]))
            except Exception:
                jobs = None
    if jobs is None:
        jobs = build_pair_jobs(mrow, mcol, a_indptr, a_cols, a_vals,
                               b_indptr, b_cols, b_vals)
        if jobs is not None and disk is not None:
            try:
                os.makedirs(os.path.dirname(disk), exist_ok=True)
                tmp = disk + f".{os.getpid()}.tmp"
                with open(tmp, "wb") as f:
                    np.savez(f, ac=jobs[0], av=jobs[1], bc=jobs[2],
                             bv=jobs[3], seg=jobs[4], njr=jobs[5])
                os.replace(tmp, disk)
            except Exception:
                pass
    if jobs is not None:
        ac, av, bc, bv, seg, njr = jobs
        fused, _ = _fuse_jobs(ac, av, bc, bv)
        entry = (jnp.asarray(fused), seg, njr, ac.shape[0])
    _JOB_CACHE.put(cache_key, entry, full_tag)
    return entry


def build_pair_jobs(mrow, mcol, a_indptr, a_cols, a_vals,
                    b_indptr, b_cols, b_vals):
    """Host job build.  Returns (ac, av, bc, bv, seg, n_jobs_real) with
    jobs padded to a multiple of 128, or None without a toolchain.
    A/B cols must be sorted within rows; the mask entry list must be
    pre-filtered by the select op."""
    lib = _native_lib()
    if lib is None:
        return None
    mrow = np.ascontiguousarray(mrow, np.int32)
    mcol = np.ascontiguousarray(mcol, np.int32)
    a_indptr = np.ascontiguousarray(a_indptr, np.int32)
    a_cols = np.ascontiguousarray(a_cols, np.int32)
    a_vals = np.ascontiguousarray(a_vals, np.float32)
    b_indptr = np.ascontiguousarray(b_indptr, np.int32)
    b_cols = np.ascontiguousarray(b_cols, np.int32)
    b_vals = np.ascontiguousarray(b_vals, np.float32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    h = lib.pairpack_run(
        mrow.size,
        mrow.ctypes.data_as(i32p), mcol.ctypes.data_as(i32p),
        a_indptr.ctypes.data_as(i32p), a_cols.ctypes.data_as(i32p),
        a_vals.ctypes.data_as(f32p),
        b_indptr.ctypes.data_as(i32p), b_cols.ctypes.data_as(i32p),
        b_vals.ctypes.data_as(f32p),
    )
    if not h:
        return None
    try:
        nj = lib.pairpack_n_jobs(h)
        njr = lib.pairpack_n_jobs_real(h)
        ac = np.ctypeslib.as_array(lib.pairpack_ac(h), shape=(nj, 8)).copy()
        av = np.ctypeslib.as_array(lib.pairpack_av(h), shape=(nj, 8)).copy()
        bc = np.ctypeslib.as_array(lib.pairpack_bc(h), shape=(nj, 8)).copy()
        bv = np.ctypeslib.as_array(lib.pairpack_bv(h), shape=(nj, 8)).copy()
        seg = np.ctypeslib.as_array(lib.pairpack_seg(h), shape=(nj,)).copy()
        return ac, av, bc, bv, seg, int(njr)
    finally:
        lib.pairpack_release(h)


def _should_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


MXMT_K = 8  # job tiles per grid step (amortizes the ~190 ns step cost)


def _job_tiles(arr8):
    """[J, 8] job-major -> [J//128, 8, 128] tile-major (lane = job)."""
    j = arr8.shape[0]
    return np.ascontiguousarray(
        arr8.reshape(j // 128, 128, 8).transpose(0, 2, 1)
    )


def _fuse_jobs(ac, av, bc, bv):
    """Fuse the four [J, 8] job arrays into ONE [J//128, 32, 128] int32
    block (rows 0-7 ac, 8-15 av bits, 16-23 bc, 24-31 bv bits) padded to
    MXMT_K tiles per grid step — one aligned DMA per step instead of four
    (the same fix that took the SpMV kernel from 105 to 56 ns/tile)."""
    j = ac.shape[0]
    nt = j // 128
    ntp = -(-nt // MXMT_K) * MXMT_K
    fused = np.empty((ntp, 32, 128), np.int32)
    fused[:, 0:8] = np.full((ntp, 8, 128), -1, np.int32)   # pad: sentinels
    fused[:, 16:24] = np.full((ntp, 8, 128), -2, np.int32)
    fused[:, 8:16] = 0
    fused[:, 24:32] = 0
    fused[:nt, 0:8] = _job_tiles(ac)
    fused[:nt, 8:16] = _job_tiles(av).view(np.int32)
    fused[:nt, 16:24] = _job_tiles(bc)
    fused[:nt, 24:32] = _job_tiles(bv).view(np.int32)
    return fused, nt


def _make_reduce_kernel(op_mul):
    from jax import lax

    def kernel(f_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(MXMT_K):
            ac = f_ref[j, 0:8]
            av = lax.bitcast_convert_type(f_ref[j, 8:16], jnp.float32)
            bc = f_ref[j, 16:24]
            bv = lax.bitcast_convert_type(f_ref[j, 24:32], jnp.float32)
            for p in range(8):  # all-pairs compare-FMA (sentinels never hit)
                hit = jnp.broadcast_to(ac[p][None, :], (8, 128)) == bc
                prod = op_mul(jnp.broadcast_to(av[p][None, :], (8, 128)), bv)
                acc = acc + jnp.where(hit, prod, 0.0)
        out_ref[:] += acc

    return kernel


def _make_partials_kernel(op_mul, op_add, identity):
    from jax import lax

    def kernel(f_ref, out_ref):
        ident = jnp.float32(identity)
        for j in range(MXMT_K):
            ac = f_ref[j, 0:8]
            av = lax.bitcast_convert_type(f_ref[j, 8:16], jnp.float32)
            bc = f_ref[j, 16:24]
            bv = lax.bitcast_convert_type(f_ref[j, 24:32], jnp.float32)
            acc = jnp.full((8, 128), ident, jnp.float32)
            for p in range(8):
                hit = jnp.broadcast_to(ac[p][None, :], (8, 128)) == bc
                prod = op_mul(jnp.broadcast_to(av[p][None, :], (8, 128)), bv)
                acc = op_add(acc, jnp.where(hit, prod, ident))
            # per-job partial = column fold (jobs are lanes)
            red = acc[0:4]
            red = op_add(red, acc[4:8])
            red = op_add(red[0:2], red[2:4])
            out_ref[0, j, :] = op_add(red[0], red[1])

    return kernel


@partial(jax.jit, static_argnames=("op_mul",))
def _reduce_call(fused, op_mul):
    nb = fused.shape[0] // MXMT_K
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((MXMT_K, 32, 128), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    # returns the (8,128) lane-partial block; the caller sums it on host
    # in f64 (each lane partial stays < 2^24 so integer counts are exact,
    # but the grand total may not be)
    return pl.pallas_call(
        _make_reduce_kernel(op_mul),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=_should_interpret(),
    )(fused)


@partial(jax.jit, static_argnames=("op_mul", "op_add", "identity"))
def _partials_call(fused, op_mul, op_add=jnp.add, identity=0.0):
    nt = fused.shape[0]
    nb = nt // MXMT_K
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((MXMT_K, 32, 128), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, MXMT_K, 128), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_partials_kernel(op_mul, op_add, float(identity)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, MXMT_K, 128), jnp.float32),
        interpret=_should_interpret(),
    )(fused)
    return out.reshape(-1)  # per-job partials, job order


def _default_mul(a, b):
    return a * b


def pallas_mxmT_reduce(mrow, mcol, a_indptr, a_cols, a_vals,
                       b_indptr, b_cols, b_vals, op_mul=None,
                       cache_key=None, tag=()) -> float:
    """sum over mask entries (i,j) of sum_k op_mul(A[i,k], B[j,k]) —
    the fused (mxmT_masked -> m_reduce(PLUS)) path (triangle counting,
    reference ``src/algorithm.cpp:380-414``).  Host arrays in, float out.
    Returns None without the native job builder.  ``cache_key`` (a
    jax.Array) caches the built+uploaded job stream across calls."""
    if cache_key is not None:
        entry = get_fused_jobs(cache_key, mrow, mcol, a_indptr, a_cols,
                               a_vals, b_indptr, b_cols, b_vals, tag=tag)
        if entry is None:
            return None
        fused_dev = entry[0]
    else:
        jobs = build_pair_jobs(mrow, mcol, a_indptr, a_cols, a_vals,
                               b_indptr, b_cols, b_vals)
        if jobs is None:
            return None
        ac, av, bc, bv, _seg, _njr = jobs
        fused, _ = _fuse_jobs(ac, av, bc, bv)
        fused_dev = jnp.asarray(fused)
    mul = _default_mul if op_mul is None else getattr(op_mul, "fn", op_mul)
    out = _reduce_call(fused_dev, mul)
    return float(np.asarray(out).astype(np.float64).sum())


def pallas_mxmT_job_partials(mrow, mcol, a_indptr, a_cols, a_vals,
                             b_indptr, b_cols, b_vals, op_mul=None,
                             op_add=None, identity=0.0,
                             cache_key=None, tag=()):
    """Per-mask-entry raw partials: returns (job_partials [J], seg [J],
    n_jobs_real) for an XLA segment fold into R values, or None.  op_add
    must be an associative/commutative monoid with the given identity
    (default PLUS/0); a mask entry's value = fold over its jobs'
    partials.  Sentinel-padded job slots contribute identity.
    ``cache_key`` caches the built+uploaded job stream across calls."""
    if cache_key is not None:
        entry = get_fused_jobs(cache_key, mrow, mcol, a_indptr, a_cols,
                               a_vals, b_indptr, b_cols, b_vals, tag=tag)
        if entry is None:
            return None
        fused_dev, seg, njr, n_jobs = entry
    else:
        jobs = build_pair_jobs(mrow, mcol, a_indptr, a_cols, a_vals,
                               b_indptr, b_cols, b_vals)
        if jobs is None:
            return None
        ac, av, bc, bv, seg, njr = jobs
        fused, _ = _fuse_jobs(ac, av, bc, bv)
        fused_dev = jnp.asarray(fused)
        n_jobs = ac.shape[0]
    mul = _default_mul if op_mul is None else getattr(op_mul, "fn", op_mul)
    add = jnp.add if op_add is None else getattr(op_add, "fn", op_add)
    partials = _partials_call(fused_dev, mul, add, float(identity))
    partials = partials[:n_jobs]  # drop batch-padding jobs
    return partials, seg, njr
