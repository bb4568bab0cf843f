"""Element-wise / map / reduce / assign vector ops.

Functional equivalents of the reference CPU+CL vector suite
(``src/cpu/cpu_v_*.hpp``, ``src/opencl/cl_v_*.hpp``): v_eadd, v_emult,
v_eadd_fdb (feedback — SSSP convergence), v_assign_masked, v_map,
v_reduce, v_count_mf.  Sparse paths use sorted-merge semantics identical
to the reference (including applying the op against the *other* operand's
fill value on non-matching entries — ``cpu_v_eadd.hpp`` spNsp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..containers import DenseVec, Scalar, SparseVec
from ..utils.segments import segment_fold

__all__ = [
    "v_eadd",
    "v_emult",
    "v_map",
    "v_reduce",
    "v_count_mf",
    "v_assign_masked",
    "v_eadd_fdb",
]


def _scalar(x, dtype):
    if isinstance(x, Scalar):
        return jnp.asarray(x.value, dtype)
    return jnp.asarray(x, dtype=dtype)


def _merge_union(u: SparseVec, v: SparseVec, op):
    """Sorted union merge of two sparse vectors; returns compacted arrays.

    Mirrors reference ``cpu_v_eadd.hpp:88-140``: matched indices combine
    op(u_x, v_x); unmatched combine against the other's fill value.
    """
    n = u.n
    cap = u.capacity + v.capacity
    idx = jnp.concatenate([u.indices, v.indices]).astype(jnp.int32)
    val = jnp.concatenate([u.values, v.values])
    src = jnp.concatenate(
        [jnp.zeros(u.capacity, jnp.int32), jnp.ones(v.capacity, jnp.int32)]
    )
    valid = jnp.concatenate([u.valid_mask(), v.valid_mask()])
    idx = jnp.where(valid, idx, n)
    idx, src, val, valid = lax.sort((idx, src, val, valid), num_keys=2)

    nxt_same = jnp.concatenate([idx[1:] == idx[:-1], jnp.zeros((1,), jnp.bool_)])
    nxt_val = jnp.concatenate([val[1:], val[:1]])
    # u-entry matched by v-entry right after it (indices unique per input)
    pair = nxt_same & (src == 0) & (idx < n)
    combined = jnp.where(
        pair,
        op(val, nxt_val),
        jnp.where(src == 0, op(val, v.fill), op(u.fill, val)),
    )
    prv_same = jnp.concatenate([jnp.zeros((1,), jnp.bool_), idx[1:] == idx[:-1]])
    keep = valid & (idx < n) & ~prv_same  # drop the second of each pair
    return idx, combined, keep, cap


def _compact(idx, vals, keep, n, cap, fill):
    (pos,) = jnp.nonzero(keep, size=cap, fill_value=cap)
    posc = jnp.clip(pos, 0, cap - 1)
    out_idx = jnp.where(pos < cap, idx[posc], n).astype(jnp.int32)
    out_val = jnp.where(pos < cap, vals[posc], fill)
    nnz = jnp.sum(keep).astype(jnp.int32)
    return SparseVec(n=n, indices=out_idx, values=out_val, nnz=nnz, fill=fill)


@partial(jax.jit, static_argnames=("op",))
def v_eadd(u, v, op):
    """r = u (+) v element-wise union (reference exec_v_eadd,
    ``include/spla/exec.hpp:381-401``)."""
    if isinstance(u, DenseVec) and isinstance(v, DenseVec):
        # dense path applies op on every slot (cpu_v_eadd dnNdn)
        return DenseVec(op(u.values, v.values), op(u.fill, v.fill))
    u = _as_sparse(u)
    v = _as_sparse(v)
    idx, combined, keep, cap = _merge_union(u, v, op)
    return _compact(idx, combined, keep, u.n, cap, op(u.fill, v.fill))


@partial(jax.jit, static_argnames=("op",))
def v_emult(u, v, op):
    """r = u (*) v element-wise intersection (reference exec_v_emult;
    sparse path keeps only matched indices — ``cpu_v_emult.hpp``)."""
    if isinstance(u, DenseVec) and isinstance(v, DenseVec):
        return DenseVec(op(u.values, v.values), op(u.fill, v.fill))
    u = _as_sparse(u)
    v = _as_sparse(v)
    n = u.n
    cap = u.capacity + v.capacity
    idx = jnp.concatenate([u.indices, v.indices]).astype(jnp.int32)
    val = jnp.concatenate([u.values, v.values])
    src = jnp.concatenate(
        [jnp.zeros(u.capacity, jnp.int32), jnp.ones(v.capacity, jnp.int32)]
    )
    valid = jnp.concatenate([u.valid_mask(), v.valid_mask()])
    idx = jnp.where(valid, idx, n)
    idx, src, val = lax.sort((idx, src, val), num_keys=2)
    nxt_same = jnp.concatenate([idx[1:] == idx[:-1], jnp.zeros((1,), jnp.bool_)])
    nxt_val = jnp.concatenate([val[1:], val[:1]])
    pair = nxt_same & (src == 0) & (idx < n)
    combined = op(val, nxt_val)
    return _compact(idx, combined, pair, n, cap, op(u.fill, v.fill))


def _as_sparse(x) -> SparseVec:
    if isinstance(x, SparseVec):
        return x
    from ..formats import dense_to_sparse_vec

    return dense_to_sparse_vec(x)


@partial(jax.jit, static_argnames=("op",))
def v_map(v, op):
    """r = op(v) per stored entry (reference exec_v_map)."""
    if isinstance(v, DenseVec):
        return DenseVec(op(v.values), v.fill)
    return SparseVec(
        n=v.n, indices=v.indices, values=op(v.values), nnz=v.nnz, fill=v.fill
    )


@partial(jax.jit, static_argnames=("op_reduce", "stored_only"))
def v_reduce(init, v, op_reduce, stored_only: bool = False) -> Scalar:
    """r = fold(op, init, stored values of v) (reference exec_v_reduce).

    Dense path folds over ALL n slots like the reference dense kernel
    (``cpu_v_reduce.hpp`` execute_dn) — with ``fill != identity`` and a
    non-idempotent op the fill slots therefore CONTRIBUTE, diverging
    from the sparse path.  ``stored_only=True`` folds only slots
    ``!= fill`` (the sparse-path semantics) for callers that need the two
    paths to agree."""
    if isinstance(v, DenseVec):
        vals = v.values
        valid = v.stored_mask() if stored_only \
            else jnp.ones(vals.shape, jnp.bool_)
    else:
        vals = v.values
        valid = v.valid_mask()
    init_a = _scalar(init, vals.dtype)
    out, _ = segment_fold(
        vals, jnp.zeros(vals.shape, jnp.int32), valid, 1, op_reduce, init_a
    )
    return Scalar(out[0])


@jax.jit
def v_count_mf(v) -> Scalar:
    """Count meaningful (stored) entries (reference exec_v_count_mf,
    ``include/spla/exec.hpp:497-519``; dense counts != fill_value)."""
    if isinstance(v, DenseVec):
        return Scalar(jnp.sum(v.stored_mask()).astype(jnp.uint32))
    return Scalar(v.nnz.astype(jnp.uint32))


@partial(jax.jit, static_argnames=("op_assign", "op_select"))
def v_assign_masked(r: DenseVec, mask, value, op_assign, op_select) -> DenseVec:
    """r[i] = op_assign(r[i], value) where select(mask[i]) (reference
    exec_v_assign_masked, ``cpu_v_assign.hpp``).  Sparse masks test stored
    entries only (sp2dn path); dense masks test every slot."""
    val = _scalar(value, r.values.dtype)
    if isinstance(mask, SparseVec):
        sel_sparse = op_select(mask.values) & mask.valid_mask()
        sel = (
            jnp.zeros((r.n + 1,), jnp.bool_)
            .at[mask.indices]
            .set(sel_sparse, mode="drop")[: r.n]
        )
    else:
        sel = op_select(mask.values)
    new_vals = jnp.where(sel, op_assign(r.values, val), r.values)
    return DenseVec(new_vals, r.fill)


@partial(jax.jit, static_argnames=("op",))
def v_eadd_fdb(r: DenseVec, v, op):
    """Element-wise add with *feedback*: r' = op(r, v); fdb gets entries
    whose value changed (reference exec_v_eadd_fdb,
    ``cpu_v_eadd_fdb.hpp`` — drives SSSP convergence).

    Returns ``(r', fdb)``; fdb is sparse when v is sparse, else dense with
    v's fill at unchanged slots."""
    if isinstance(v, SparseVec):
        sel = (
            jnp.zeros((r.n + 1,), jnp.bool_)
            .at[v.indices]
            .set(v.valid_mask(), mode="drop")[: r.n]
        )
        base = jnp.full((r.n + 1,), v.fill, dtype=r.values.dtype)
        vv = base.at[v.indices].set(
            jnp.where(v.valid_mask(), v.values, v.fill), mode="drop"
        )[: r.n]
        new_vals = jnp.where(sel, op(r.values, vv), r.values)
        changed = sel & (new_vals != r.values)
        cap = v.capacity
        (idx,) = jnp.nonzero(changed, size=cap, fill_value=r.n)
        fvals = jnp.where(
            idx < r.n, new_vals[jnp.clip(idx, 0, r.n - 1)], v.fill
        )
        fdb = SparseVec(
            n=r.n,
            indices=idx.astype(jnp.int32),
            values=fvals,
            nnz=jnp.sum(changed).astype(jnp.int32),
            fill=v.fill,
        )
        return DenseVec(new_vals, r.fill), fdb
    new_vals = op(r.values, v.values)
    changed = new_vals != r.values
    fdb = DenseVec(jnp.where(changed, new_vals, v.fill), v.fill)
    return DenseVec(new_vals, r.fill), fdb
