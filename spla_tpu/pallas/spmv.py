"""Pallas TPU masked-SpMV kernel — the framework's hot path.

Replaces the reference's OpenCL SpMV kernels (``kernels/mxv.cl:44-81``
pull row-per-subgroup, ``kernels/vxm.cl:30-95`` push
count/collect/sort/reduce pipeline) with a design built around what the
TPU TensorCore is actually fast at.  Measured on v5e (this toolchain):
XLA's general gather/scatter runs ~0.07 G-ops/s (scalar, serialized),
while Mosaic's lane shuffle (``take_along_axis`` along lanes over a
128-wide window) runs >10 G-lookups/s and the MXU runs dense f32
matmuls at tens of TFLOP/s.  So the kernel uses ONLY:

* dense DMA streams for the (value, packed-index) entry arrays,
* the whole input vector resident in VMEM (128 MiB on v5e — up to ~30M
  f32 elements), windows of 128 selected per sublane-row via dynamic
  slices,
* the 128-lane shuffle for the column gather within a window,
* a *factorized one-hot MXU scatter-reduce* for the row accumulation:
  for each 128-entry sublane row with target rows ``r = g*128 + l``
  (within a 16384-row block), ``acc[g, l] += A_g^T · diag(p) · B_l``
  where ``A_g[k, :] = onehot(g_k)`` and ``B_l[k, :] = onehot(l_k)`` —
  a dense 128x128x128 ``dot_general`` per sublane row.  This turns the
  scatter (which the TensorCore cannot do at all) into MXU work.

Supported semirings: any elementwise ``op_mul`` with ``op_add = PLUS``
(f32 accumulation).  BFS's BOR over {0,1} reduces to PLUS + ``> 0``;
triangle counts are exact in f32 below 2^24.  Other monoids (MIN/MAX)
fall back to the XLA path for now.

Entry layout ("windowed CSC-in-row-blocks", host-preprocessed once per
matrix and cached): entries are grouped by 16384-row block, sorted by
column within the block, and packed into 128-entry sublane rows that
never span a 128-column window; each sublane row carries its window
base.  Padding slots have their valid bit clear.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..containers import CsrMatrix

__all__ = [
    "WindowedSpmv",
    "build_windowed_spmv",
    "windowed_spmv_apply",
    "pallas_spmv_fn",
]

ROW_BLOCK = 16384  # 128 g-groups x 128 lanes
CHUNK = 32  # sublane rows per grid step (4096 entries)
VALID_BIT = 1 << 23


@dataclass(frozen=True)
class WindowedSpmv:
    """Preprocessed kernel operand (host-built, device-resident)."""

    m: int  # output rows
    n: int  # input length
    n_row_blocks: int
    n_chunks: int
    vals: jax.Array  # [n_chunks, CHUNK, 128] f32
    packed: jax.Array  # [n_chunks, CHUNK, 128] int32: cl | g<<8 | l<<16 | valid<<23
    wbase: jax.Array  # [n_chunks, 8, 128] int32; sublane s at [c, s%8, s//8]
    rb_of_chunk: jax.Array  # [n_chunks] int32
    is_first: jax.Array  # [n_chunks] int32 (1 = first chunk of its row block)
    slots: int  # total padded slots (for padding-ratio reporting)
    nnz: int


jax.tree_util.register_dataclass(
    WindowedSpmv,
    data_fields=["vals", "packed", "wbase", "rb_of_chunk", "is_first"],
    meta_fields=["m", "n", "n_row_blocks", "n_chunks", "slots", "nnz"],
)


def build_windowed_spmv(A: CsrMatrix) -> WindowedSpmv:
    """Host-side preprocessing: CSR -> windowed layout (vectorized numpy)."""
    m, n = A.shape
    nnz = int(np.asarray(A.nnz))
    rows = np.asarray(A.row_ids)[:nnz].astype(np.int64)
    cols = np.asarray(A.cols)[:nnz].astype(np.int64)
    vals = np.asarray(A.values)[:nnz]

    n_rb = max((m + ROW_BLOCK - 1) // ROW_BLOCK, 1)
    rb = rows // ROW_BLOCK
    order = np.lexsort((cols, rb))
    rows, cols, vals, rb = rows[order], cols[order], vals[order], rb[order]

    # runs of identical (row block, 128-col window)
    nw = (n + 127) // 128
    key = rb * nw + (cols // 128)
    change = np.empty(nnz, bool)
    if nnz:
        change[0] = True
        change[1:] = key[1:] != key[:-1]
    run_id = np.cumsum(change) - 1
    run_start_pos = np.nonzero(change)[0]
    pos_in_run = np.arange(nnz) - run_start_pos[run_id] if nnz else np.zeros(0, np.int64)

    # sublane rows: 128 entries of one run
    sub_key = run_id * (1 << 24) + pos_in_run // 128
    sub_change = np.empty(nnz, bool)
    if nnz:
        sub_change[0] = True
        sub_change[1:] = sub_key[1:] != sub_key[:-1]
    sub_id = np.cumsum(sub_change) - 1
    lane = (pos_in_run % 128).astype(np.int64)
    n_sub = int(sub_id[-1] + 1) if nnz else 0

    sub_pos = np.nonzero(sub_change)[0]
    sub_rb = rb[sub_pos] if nnz else np.zeros(0, np.int64)
    sub_wbase = (cols[sub_pos] // 128).astype(np.int32) if nnz else np.zeros(0, np.int32)

    # pad sublane-row count per row block to a CHUNK multiple
    counts = np.bincount(sub_rb, minlength=n_rb)
    padded = np.maximum(((counts + CHUNK - 1) // CHUNK) * CHUNK, CHUNK)
    offsets = np.concatenate([[0], np.cumsum(padded)])
    total_sub = int(offsets[-1])
    n_chunks = total_sub // CHUNK

    # rank of each sublane row within its row block (sub rows sorted by rb)
    rb_first_sub = np.searchsorted(sub_rb, np.arange(n_rb))
    sub_rank = np.arange(n_sub) - rb_first_sub[sub_rb]
    sub_final = offsets[sub_rb] + sub_rank  # final padded index per sublane row

    vals_out = np.zeros((total_sub, 128), np.float32)
    packed_out = np.zeros((total_sub, 128), np.int32)
    wbase_out = np.zeros(total_sub, np.int32)
    wbase_out[sub_final] = sub_wbase

    slot_row = sub_final[sub_id]
    local = rows - rb * ROW_BLOCK
    g = (local // 128).astype(np.int32)
    lo = (local % 128).astype(np.int32)
    cl = (cols % 128).astype(np.int32)
    vals_out[slot_row, lane] = vals.astype(np.float32)
    packed_out[slot_row, lane] = cl | (g << 8) | (lo << 16) | VALID_BIT

    # chunk metadata
    chunk_rb = np.repeat(
        np.arange(n_rb, dtype=np.int32), (padded // CHUNK).astype(np.int64)
    )
    is_first = np.zeros(n_chunks, np.int32)
    first_pos = np.concatenate([[0], np.cumsum(padded // CHUNK)])[:-1]
    is_first[first_pos] = 1

    return WindowedSpmv(
        m=m,
        n=n,
        n_row_blocks=n_rb,
        n_chunks=n_chunks,
        vals=jnp.asarray(vals_out.reshape(n_chunks, CHUNK, 128)),
        packed=jnp.asarray(packed_out.reshape(n_chunks, CHUNK, 128)),
        wbase=jnp.asarray(_pack_wbase(wbase_out, n_chunks)),
        rb_of_chunk=jnp.asarray(chunk_rb),
        is_first=jnp.asarray(is_first),
        slots=total_sub * 128,
        nnz=nnz,
    )


def _pack_wbase(wbase_flat, n_chunks):
    import numpy as _np

    out = _np.zeros((n_chunks, 8, 128), _np.int32)
    w = wbase_flat.reshape(n_chunks, CHUNK)
    s = _np.arange(CHUNK)
    out[:, s % 8, s // 8] = w
    return out


def _make_kernel(op_mul, precision):
    def kernel(rb_ref, first_ref, wbase_ref, x_ref, vals_ref, packed_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(first_ref[c] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        win_rows = [
            x_ref[pl.ds(wbase_ref[0, s % 8, s // 8], 1), :] for s in range(CHUNK)
        ]
        win = jnp.concatenate(win_rows, axis=0)  # (CHUNK,128)
        pk = packed_ref[0]
        cl = pk & 0x7F
        y = jnp.take_along_axis(win, cl, axis=1)
        p = op_mul(vals_ref[0], y)
        valid = (pk & VALID_BIT) != 0
        p = jnp.where(valid, p, 0.0)
        g = (pk >> 8) & 0x7F
        l = (pk >> 16) & 0x7F

        acc = jnp.zeros((128, 128), jnp.float32)
        iota_s = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        for s in range(CHUNK):
            gs = jnp.broadcast_to(g[s][None, :], (128, 128))
            ls = jnp.broadcast_to(l[s][None, :], (128, 128))
            ps = jnp.broadcast_to(p[s][None, :], (128, 128))
            A = (gs == iota_s).astype(jnp.float32)
            PB = jnp.where(ls == iota_s, ps, 0.0)
            acc = acc + lax.dot_general(
                A,
                PB,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        out_ref[:] += acc

    return kernel


@partial(jax.jit, static_argnames=("op_mul", "precision"))
def windowed_spmv_apply(fmt: WindowedSpmv, x, op_mul=None, precision="highest"):
    """r = A @ x over (op_mul, PLUS); x is the dense input vector [n]."""
    mul = op_mul if op_mul is not None else (lambda a, b: a * b)
    nw = (fmt.n + 127) // 128
    x2d = jnp.pad(x, (0, nw * 128 - fmt.n)).reshape(nw, 128)
    prec = (
        lax.Precision.HIGHEST if precision == "highest" else lax.Precision.DEFAULT
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(fmt.n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda c, rb, fi: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, 128), lambda c, rb, fi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, CHUNK, 128), lambda c, rb, fi: (c, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, CHUNK, 128), lambda c, rb, fi: (c, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 128, 128), lambda c, rb, fi: (rb[c], 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _make_kernel(mul, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((fmt.n_row_blocks, 128, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=_should_interpret(),
    )(fmt.rb_of_chunk, fmt.is_first, fmt.wbase, x2d, fmt.vals, fmt.packed)
    return out.reshape(-1)[: fmt.m]


def _should_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


# -- integration with the generic op layer ---------------------------------

_FORMAT_CACHE: dict = {}


def get_windowed_format(A: CsrMatrix) -> WindowedSpmv:
    key = id(A.values)
    fmt = _FORMAT_CACHE.get(key)
    if fmt is None:
        fmt = build_windowed_spmv(A)
        _FORMAT_CACHE[key] = fmt
    return fmt


def pallas_spmv_fn(A: CsrMatrix, op_mul, op_add, init):
    """Return f(A, x) using the Pallas kernel when the semiring is
    supported (PLUS accumulation, f32), else None."""
    if getattr(op_add, "scatter", None) != "add":
        return None
    if A.values.dtype != jnp.float32:
        return None
    fmt = get_windowed_format(A)
    init_f = jnp.float32(np.asarray(init) if not hasattr(init, "value") else np.asarray(init.value))

    def fn(_A, x, fmt=fmt):
        r = windowed_spmv_apply(fmt, x, op_mul=None)
        return r + init_f

    if op_mul is not None and getattr(op_mul, "name", "MULT") != "MULT":
        def fn(_A, x, fmt=fmt):  # noqa: F811 - generalized multiply
            r = windowed_spmv_apply(fmt, x, op_mul=op_mul.fn)
            return r + init_f

    return fn
