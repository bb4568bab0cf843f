"""Matrix element-wise ops, reductions, transpose, extraction, Kronecker.

Functional equivalents of the reference matrix suite
(``src/cpu/cpu_m_*.hpp``, ``cpu_kron.hpp``; OpenCL ``cl_m_reduce.hpp``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..containers import CooMatrix, CsrMatrix, DenseVec, Scalar, SparseVec
from ..formats import coo_to_csr, csr_to_coo
from ..utils.search import rowwise_find
from ..utils.segments import segment_fold

__all__ = [
    "m_eadd",
    "m_emult",
    "m_reduce",
    "m_reduce_by_row",
    "m_reduce_by_column",
    "m_transpose",
    "m_extract_row",
    "m_extract_column",
    "kron",
]


def _scalar(x, dtype):
    if isinstance(x, Scalar):
        return jnp.asarray(x.value, dtype)
    return jnp.asarray(x, dtype=dtype)


def _as_coo(x) -> CooMatrix:
    if isinstance(x, CsrMatrix):
        return csr_to_coo(x)
    return x


def _compact_coo(shape, rows, cols, vals, keep, cap, fill, out_capacity=None):
    """Compact kept entries (already sorted row-major) into a CooMatrix."""
    m, n = shape
    out_cap = out_capacity if out_capacity is not None else cap
    (pos,) = jnp.nonzero(keep, size=out_cap, fill_value=cap)
    posc = jnp.clip(pos, 0, cap - 1)
    ok = pos < cap
    return CooMatrix(
        shape=shape,
        rows=jnp.where(ok, rows[posc], m).astype(jnp.int32),
        cols=jnp.where(ok, cols[posc], 0).astype(jnp.int32),
        values=jnp.where(ok, vals[posc], fill),
        nnz=jnp.sum(keep).astype(jnp.int32),
        fill=jnp.asarray(fill),
    )


def _merge_ewise(a, b, op, union: bool, out_capacity=None):
    """Sorted 2-key merge of two COO matrices.

    union=True → eadd (unmatched entries appear as-is, reference
    ``cpu_m_eadd.hpp``); union=False → emult (intersection only,
    ``cpu_m_emult.hpp``).  Both drop result values == r.fill like the
    reference."""
    a = _as_coo(a)
    b = _as_coo(b)
    m, n = a.shape
    cap = a.capacity + b.capacity
    rows = jnp.concatenate([a.rows, b.rows]).astype(jnp.int32)
    cols = jnp.concatenate([a.cols, b.cols]).astype(jnp.int32)
    vals = jnp.concatenate([a.values, b.values])
    src = jnp.concatenate(
        [jnp.zeros(a.capacity, jnp.int32), jnp.ones(b.capacity, jnp.int32)]
    )
    valid = jnp.concatenate([a.valid_mask(), b.valid_mask()])
    rows = jnp.where(valid, rows, m)
    cols = jnp.where(valid, cols, n)
    rows, cols, src, vals = lax.sort((rows, cols, src, vals), num_keys=3)
    is_valid = rows < m
    nxt_same = jnp.concatenate(
        [(rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1]), jnp.zeros((1,), jnp.bool_)]
    )
    prv_same = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_), (rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1])]
    )
    nxt_val = jnp.concatenate([vals[1:], vals[:1]])
    pair = nxt_same & (src == 0) & is_valid
    fill = op(a.fill, b.fill)
    if union:
        combined = jnp.where(pair, op(vals, nxt_val), vals)
        keep = is_valid & ~prv_same
    else:
        combined = op(vals, nxt_val)
        keep = pair
    # reference drops results equal to the output fill value
    keep = keep & (combined != fill)
    coo = _compact_coo((m, n), rows, cols, combined, keep, cap, fill, out_capacity)
    return coo_to_csr(coo)


@partial(jax.jit, static_argnames=("op", "out_capacity"))
def m_eadd(a, b, op, out_capacity=None) -> CsrMatrix:
    """R = A (+) B union merge (reference exec_m_eadd).  NOTE the reference
    emits *unmatched* entries unchanged (no op against fill, unlike
    v_eadd) and drops results == fill — ``cpu_m_eadd.hpp:88-150``."""
    return _merge_ewise(a, b, op, union=True, out_capacity=out_capacity)


@partial(jax.jit, static_argnames=("op", "out_capacity"))
def m_emult(a, b, op, out_capacity=None) -> CsrMatrix:
    """R = A (*) B intersection merge (reference exec_m_emult)."""
    return _merge_ewise(a, b, op, union=False, out_capacity=out_capacity)


@partial(jax.jit, static_argnames=("op_reduce",))
def m_reduce(init, M, op_reduce) -> Scalar:
    """Scalar reduction over all stored values (reference exec_m_reduce,
    ``cpu_m_reduce.hpp``, OpenCL ``cl_m_reduce.hpp:76-85``)."""
    init_a = _scalar(init, M.values.dtype)
    vals = M.values
    out, _ = segment_fold(
        vals, jnp.zeros(vals.shape, jnp.int32), M.valid_mask(), 1, op_reduce, init_a
    )
    return Scalar(out[0])


@partial(jax.jit, static_argnames=("op_reduce",))
def m_reduce_by_row(M, op_reduce, init) -> DenseVec:
    """r[i] = fold over row i (reference exec_m_reduce_by_row)."""
    m, n = M.shape
    init_a = _scalar(init, M.values.dtype)
    coo = _as_coo(M)
    out, _ = segment_fold(
        coo.values, coo.rows, coo.valid_mask(), m, op_reduce, init_a, sorted_ids=True
    )
    return DenseVec(out, init_a)


@partial(jax.jit, static_argnames=("op_reduce",))
def m_reduce_by_column(M, op_reduce, init) -> DenseVec:
    """r[j] = fold over column j (reference exec_m_reduce_by_column).
    Column ids are unsorted in CSR order → sorted generic path or scatter."""
    m, n = M.shape
    init_a = _scalar(init, M.values.dtype)
    coo = _as_coo(M)
    cols = jnp.where(coo.valid_mask(), coo.cols, n)
    out, _ = segment_fold(
        coo.values, cols, coo.valid_mask(), n, op_reduce, init_a, sorted_ids=False
    )
    return DenseVec(out, init_a)


@partial(jax.jit, static_argnames=("op_apply",))
def m_transpose(M, op_apply) -> CsrMatrix:
    """R = op_apply(M^T) (reference exec_m_transpose, ``cpu_m_transpose.hpp``).
    Device-side: sort entries by (col, row)."""
    coo = _as_coo(M)
    m, n = coo.shape
    rows = jnp.where(coo.valid_mask(), coo.rows, m)
    cols = jnp.where(coo.valid_mask(), coo.cols, n)
    c, r, v = lax.sort((cols, rows, coo.values), num_keys=2)
    new_rows = jnp.where(c < n, c, n).astype(jnp.int32)
    new_cols = jnp.where(c < n, r, 0).astype(jnp.int32)
    new_vals = jnp.where(c < n, op_apply(v), coo.fill)
    out = CooMatrix(
        shape=(n, m),
        rows=new_rows,
        cols=new_cols,
        values=new_vals,
        nnz=coo.nnz,
        fill=coo.fill,
    )
    return coo_to_csr(out)


@partial(jax.jit, static_argnames=("op_apply", "out_capacity"))
def m_extract_row(M: CsrMatrix, index, op_apply, out_capacity: int | None = None) -> SparseVec:
    """r = op_apply(M[index, :]) as a sparse vector (reference
    exec_m_extract_row, ``cpu_m_extract_row.hpp``)."""
    m, n = M.shape
    cap = out_capacity if out_capacity is not None else n
    index = jnp.asarray(index, jnp.int32)
    lo = M.indptr[index]
    hi = M.indptr[index + 1]
    k = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.clip(lo + k, 0, M.capacity - 1)
    ok = (lo + k) < hi
    idx = jnp.where(ok, M.cols[pos], n).astype(jnp.int32)
    vals = jnp.where(ok, op_apply(M.values[pos]), M.fill)
    return SparseVec(
        n=n, indices=idx, values=vals,
        nnz=jnp.minimum(hi - lo, cap).astype(jnp.int32),  # clamp to capacity
        fill=M.fill,
    )


@partial(jax.jit, static_argnames=("op_apply", "out_capacity"))
def m_extract_column(M: CsrMatrix, index, op_apply, out_capacity: int | None = None) -> SparseVec:
    """r = op_apply(M[:, index]) as a sparse vector (reference
    exec_m_extract_column — per-row lower_bound,
    ``cpu_m_extract_column.hpp``)."""
    m, n = M.shape
    cap = out_capacity if out_capacity is not None else m
    index = jnp.asarray(index, jnp.int32)
    keys = jnp.full((m,), index, jnp.int32)
    pos, found = rowwise_find(M.cols, M.indptr[:-1], M.indptr[1:], keys)
    # row windows [indptr[i], indptr[i+1]) only cover real entries, but
    # guard against pad overlap anyway
    found = found & (pos < jnp.broadcast_to(M.nnz, pos.shape))
    (ridx,) = jnp.nonzero(found, size=cap, fill_value=m)
    posg = pos[jnp.clip(ridx, 0, m - 1)]
    vals = jnp.where(
        ridx < m, op_apply(M.values[jnp.clip(posg, 0, M.capacity - 1)]), M.fill
    )
    return SparseVec(
        n=m,
        indices=ridx.astype(jnp.int32),
        values=vals,
        nnz=jnp.minimum(jnp.sum(found), cap).astype(jnp.int32),
        fill=M.fill,
    )


@partial(jax.jit, static_argnames=("op_mul", "out_capacity"))
def kron(A, B, op_mul, out_capacity: int | None = None) -> CsrMatrix:
    """R = A (x) B Kronecker product (reference exec_kron,
    ``cpu_kron.hpp:70-108``)."""
    a = _as_coo(A)
    b = _as_coo(B)
    am, an = a.shape
    bm, bn = b.shape
    m, n = am * bm, an * bn
    cap = a.capacity * b.capacity
    av = a.valid_mask()
    bv = b.valid_mask()
    # outer-product expansion: slot t = p * bcap + q
    ar = jnp.repeat(a.rows, b.capacity)
    ac = jnp.repeat(a.cols, b.capacity)
    ax = jnp.repeat(a.values, b.capacity)
    apv = jnp.repeat(av, b.capacity)
    br = jnp.tile(b.rows, a.capacity)
    bc = jnp.tile(b.cols, a.capacity)
    bx = jnp.tile(b.values, a.capacity)
    bpv = jnp.tile(bv, a.capacity)
    valid = apv & bpv
    rows = jnp.where(valid, ar * bm + br, m).astype(jnp.int32)
    cols = jnp.where(valid, ac * bn + bc, n).astype(jnp.int32)
    vals = op_mul(ax, bx)
    rows, cols, vals = lax.sort((rows, cols, vals), num_keys=2)
    fill = op_mul(a.fill, b.fill)
    coo = _compact_coo(
        (m, n), rows, cols, vals, rows < m, cap, fill, out_capacity
    )
    return coo_to_csr(coo)
