"""Distributed Pallas SpMV: per-shard cell formats under shard_map.

The scaling recipe from BASELINE.json's north star: block-row partition
per chip, dense halo vectors all-gathered over ICI, and the single-chip
fused Pallas kernel (``spla_tpu.pallas.spmv``) as the per-shard compute
— collectives ride XLA, the kernel rides Mosaic, and the convergence
loops stay on device.

Each shard gets its own host-packed fused cell layout of its row block
(rows local, columns global over the padded gather frame); shards are
padded with inert tiles to a common tile count so ``shard_map`` sees
equal shapes (zero-filled fused rows have the valid bit clear, so their
scatter delta is the identity — a no-op on the resident output).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..containers import CsrMatrix
from ..pallas.spmv import (
    FUSED_K,
    FusedCellSpmv,
    build_fused_cell_spmv_arrays,
    fused_cell_spmv_apply,
)

__all__ = [
    "ShardedCellSpmv",
    "shard_cell_spmv",
    "shard_cell_spmv_split",
    "dist_pagerank_pallas",
    "dist_bfs_pallas",
    "dist_sssp_pallas",
    "dist_pagerank_pallas_overlap",
    "dist_bfs_pallas_overlap",
    "dist_sssp_pallas_overlap",
]


@dataclass(frozen=True)
class ShardedCellSpmv:
    """Per-shard fused cell layouts stacked on a leading shard axis."""

    m: int  # global rows
    n: int  # global cols (= n_shards * mloc for square operators)
    mloc: int
    n_shards: int
    cw: int
    n_tiles: int  # per shard (padded to max, multiple of FUSED_K)
    n_row_blocks: int  # per shard
    fused: jax.Array  # [S, T//2, 56|40, 128] int32 (layout 1 or 4)
    rb_of_tile: jax.Array  # [S, T]
    wb_of_batch: jax.Array  # [S, T // FUSED_K]
    layout: int = 1
    # frame width the per-shard kernel addresses: n_shards*mloc for the
    # gathered frame (default), mloc for DIAGONAL split formats
    n_frame: int = 0


jax.tree_util.register_dataclass(
    ShardedCellSpmv,
    data_fields=["fused", "rb_of_tile", "wb_of_batch"],
    meta_fields=["m", "n", "mloc", "n_shards", "cw", "n_tiles",
                 "n_row_blocks", "layout", "n_frame"],
)


def _pack_shards(parts, mloc, n_frame, cw, m, n, n_shards, mesh, axis):
    """Pack per-shard (rows_local, cols, vals) triples into one stacked
    ShardedCellSpmv (shards padded with inert tiles to a common tile
    count); None when any shard fails to pack."""
    fmts = []
    for rows_l, cols_l, vals_l in parts:
        f = build_fused_cell_spmv_arrays(
            mloc, n_frame, rows_l.astype(np.int32), cols_l.astype(np.int32),
            vals_l.astype(np.float32), cw=cw,
        )
        if f is None:
            return None
        fmts.append(f)

    T = max(f.n_tiles for f in fmts)  # each a multiple of FUSED_K already

    def padded(get, fill, dtype, pad_last=False):
        out = []
        for f in fmts:
            a = np.asarray(get(f))
            want = {"fused": T // 2, "rb": T, "wb": T // FUSED_K}[
                "fused" if a.ndim == 3 else ("rb" if a.shape[0] == f.n_tiles
                                             else "wb")]
            if a.shape[0] < want:
                fv = a[-1] if pad_last else fill
                pad = np.full((want - a.shape[0],) + a.shape[1:], fv, dtype)
                a = np.concatenate([a, pad])
            out.append(a)
        return jnp.asarray(np.stack(out))

    if len({f.layout for f in fmts}) != 1:
        return None  # mixed per-shard layouts: unreachable with one packer
    sc = ShardedCellSpmv(
        m=m, n=n, mloc=mloc, n_shards=n_shards, cw=cw, n_tiles=T,
        n_row_blocks=fmts[0].n_row_blocks, layout=fmts[0].layout,
        n_frame=n_frame,
        # inert pad blocks: narrow layouts use 0 (valid bit clear);
        # WIDE layouts have no valid flag — all-0xFF blocks read S-code
        # 63 (absent) everywhere instead
        fused=padded(lambda f: f.fused,
                     -1 if fmts[0].layout in (8, 9) else 0, np.int32),
        rb_of_tile=padded(lambda f: f.rb_of_tile, 0, np.int32),
        # pad batches repeat the LAST window index so their x-block DMA
        # is elided (index unchanged between grid steps)
        wb_of_batch=padded(lambda f: f.wb_of_batch, 0, np.int32,
                           pad_last=True),
    )
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis))
        sc = jax.tree_util.tree_map(lambda a: jax.device_put(a, shard), sc)
    return sc


def shard_cell_spmv(
    A: CsrMatrix, n_shards: int, mesh: Mesh | None = None,
    cw: int | None = 16384, axis: str = "d", values=None,
) -> ShardedCellSpmv | None:
    """Host-side: block-row partition + per-shard fused cell packing.

    ``values`` optionally overrides A's values (e.g. all-ones pattern for
    structural BFS).  Returns None when the native packer is unavailable.
    """
    from ..formats import host_coo

    m, n = A.shape
    mloc = (m + n_shards - 1) // n_shards
    rows, cols, vals = host_coo(A)
    if values is not None:
        vals = np.broadcast_to(values, vals.shape).astype(np.float32)

    n_pad = n_shards * mloc  # the all-gather frame: global ids unchanged
    if cw is None:
        # resolve the narrow-vs-wide choice ONCE from global stats so all
        # shards pack the same layout (the kernel requires it)
        from ..pallas.spmv import _auto_cw

        cw = _auto_cw(mloc, n_pad, max(rows.size // max(n_shards, 1), 1),
                      values is not None)
    parts = []
    for s in range(n_shards):
        lo, hi = s * mloc, min((s + 1) * mloc, m)
        sel = (rows >= lo) & (rows < hi)
        parts.append((rows[sel] - lo, cols[sel], vals[sel]))
    return _pack_shards(parts, mloc, n_pad, cw, m, n, n_shards, mesh, axis)


def shard_cell_spmv_split(
    A: CsrMatrix, n_shards: int, mesh: Mesh | None = None,
    cw: int | None = 16384, axis: str = "d", values=None,
):
    """Diag/off-diag split sharding for comm/compute OVERLAP (r4 verdict
    item 6): per shard, rows are packed as TWO fused formats — the
    DIAGONAL block (columns within the shard's own row range, applied to
    the local vector with no communication) and the OFF-DIAGONAL block
    (remote columns over the gathered frame).  The overlapped loops
    compute the diagonal apply while the all-gather is in flight (XLA
    async collectives), hiding comm behind ~deg_local/deg of the flops.

    Returns ``(diag, off)`` ShardedCellSpmv pair or None.
    """
    from ..formats import host_coo

    m, n = A.shape
    mloc = (m + n_shards - 1) // n_shards
    rows, cols, vals = host_coo(A)
    if values is not None:
        vals = np.broadcast_to(values, vals.shape).astype(np.float32)
    n_pad = n_shards * mloc
    if cw is None:
        from ..pallas.spmv import _auto_cw

        cw = _auto_cw(mloc, n_pad, max(rows.size // max(n_shards, 1), 1),
                      values is not None)
    parts_d, parts_o = [], []
    for s in range(n_shards):
        lo, hi = s * mloc, min((s + 1) * mloc, m)
        sel = (rows >= lo) & (rows < hi)
        r_l, c_l, v_l = rows[sel] - lo, cols[sel], vals[sel]
        on_diag = (c_l >= lo) & (c_l < hi)
        parts_d.append((r_l[on_diag], c_l[on_diag] - lo, v_l[on_diag]))
        parts_o.append((r_l[~on_diag], c_l[~on_diag], v_l[~on_diag]))
    # diagonal formats address the LOCAL vector (frame = mloc); the
    # off-diagonal formats address the gathered frame as before
    diag = _pack_shards(parts_d, mloc, mloc, min(cw, _cw_for(mloc)),
                        m, n, n_shards, mesh, axis)
    off = _pack_shards(parts_o, mloc, n_pad, cw, m, n, n_shards, mesh, axis)
    if diag is None or off is None:
        return None
    return diag, off


def _cw_for(width):
    """Largest legal window width not exceeding the frame (packer needs a
    power of two in [1024, 32768])."""
    c = 1024
    while c * 2 <= min(width, 32768):
        c *= 2
    return c


# hashable static metadata for jit: (m, mloc, n_shards, cw, n_tiles, n_rb)
def _meta(sc: ShardedCellSpmv):
    frame = sc.n_frame or sc.n_shards * sc.mloc
    return (sc.m, sc.mloc, sc.n_shards, sc.cw, sc.n_tiles, sc.n_row_blocks,
            sc.layout, frame)


def _local_fmt(meta, arrs) -> FusedCellSpmv:
    m, mloc, n_shards, cw, n_tiles, n_rb, layout = meta[:7]
    frame = meta[7] if len(meta) > 7 else n_shards * mloc
    fused, rb, wb = arrs
    return FusedCellSpmv(
        m=mloc, n=frame, cw=cw,
        n_row_blocks=n_rb, n_tiles=n_tiles,
        fused=fused[0], rb_of_tile=rb[0], wb_of_batch=wb[0],
        slots=n_tiles * 1024, nnz=0, layout=layout,
    )


_ARRS = ("fused", "rb_of_tile", "wb_of_batch")


def _arrs(sc):
    return tuple(getattr(sc, k) for k in _ARRS)


def _mult(av, xv):
    return av * xv


def _minplus(av, xv):
    return xv + av


def _structural(av, xv):
    return xv


@partial(jax.jit, static_argnames=("mesh", "axis", "meta"))
def _dist_pr_pallas(mesh, arrs, alpha, eps, meta, axis):
    def step(*arrs):
        fmt = _local_fmt(meta, arrs)
        my = lax.axis_index(axis)
        n, mloc = meta[0], meta[1]
        gids = my * mloc + jnp.arange(mloc, dtype=jnp.int32)
        live = gids < n
        addition = (1.0 - alpha) / n
        p0 = jnp.where(live, jnp.full((mloc,), 1.0 / n, jnp.float32), 0.0)

        def cond(state):
            # iteration cap: f32 error can plateau above a tiny eps forever
            return (state[1] > eps) & (state[2] < 10_000)

        def body(state):
            p_prev, _, it = state
            p_full = lax.all_gather(p_prev, axis, tiled=True)
            ap = fused_cell_spmv_apply(
                fmt, p_full, op_mul=_mult, op_add=jnp.add, identity=0.0
            )
            p = jnp.where(live, ap + addition, 0.0)
            err2 = lax.psum(jnp.sum((p - p_prev) ** 2), axis)
            return (p, jnp.sqrt(err2), it + 1)

        p, _, _ = lax.while_loop(
            cond, body, (p0, jnp.float32(eps) + 0.1, jnp.int32(0))
        )
        return p[None]

    f = jax.shard_map(step, mesh=mesh, in_specs=(P(axis),) * 3,
                      out_specs=P(axis), check_vma=False)
    return f(*arrs)


def dist_pagerank_pallas(mesh: Mesh, sc: ShardedCellSpmv, alpha, eps, axis="d"):
    """Distributed PageRank with the Pallas kernel per shard; p returned
    row-sharded [S, mloc]."""
    return _dist_pr_pallas(
        mesh, _arrs(sc), jnp.float32(alpha), jnp.float32(eps), _meta(sc), axis
    )


def _sparse_exchange_f01(front, my, mloc, cap, axis):
    """f32 0/1 frontier -> gathered f32 0/1 frame via a capped index
    all-gather (the dist_ops exchange in the kernel's dense-float
    encoding)."""
    n_pad_axis = lax.axis_size(axis) * mloc
    (idx,) = jnp.nonzero(front > 0, size=cap, fill_value=mloc)
    gidx = jnp.where(idx < mloc, my * mloc + idx.astype(jnp.int32),
                     n_pad_axis)
    all_idx = lax.all_gather(gidx.astype(jnp.int32), axis, tiled=True)
    return (
        jnp.zeros((n_pad_axis + 1,), jnp.float32)
        .at[all_idx]
        .set(1.0, mode="drop")[:n_pad_axis]
    )


@partial(jax.jit, static_argnames=("mesh", "axis", "meta", "cap"))
def _dist_bfs_pallas(mesh, arrs, source, meta, axis, cap):
    def step(*arrs):
        fmt = _local_fmt(meta, arrs)
        my = lax.axis_index(axis)
        mloc = meta[1]
        gids = my * mloc + jnp.arange(mloc, dtype=jnp.int32)
        v0 = jnp.zeros((mloc,), jnp.int32)
        front0 = jnp.where(gids == source, 1.0, 0.0)

        def cond(state):
            return (state[3] > 0) & (state[2] < jnp.int32(meta[0] + 2))

        def body(state):
            v, front, depth, _ = state
            v = jnp.where(front > 0, depth, v)
            if cap > 0:
                # capped-sparse halo exchange (see dist_ops): uniform
                # pmax predicate keeps all chips on one branch
                maxcnt = lax.pmax(
                    jnp.sum(front > 0).astype(jnp.int32), axis)
                front_full = lax.cond(
                    maxcnt <= cap,
                    lambda f: _sparse_exchange_f01(f, my, mloc, cap, axis),
                    lambda f: lax.all_gather(f, axis, tiled=True),
                    front,
                )
            else:
                front_full = lax.all_gather(front, axis, tiled=True)
            hits = fused_cell_spmv_apply(
                fmt, front_full, op_mul=_structural, op_add=jnp.maximum,
                identity=0.0, skip_inactive=True,
            )
            front_new = jnp.where((hits > 0) & (v == 0), 1.0, 0.0)
            count = lax.psum(jnp.sum(front_new), axis)
            return (v, front_new, depth + 1, count)

        v, _, _, _ = lax.while_loop(
            cond, body, (v0, front0, jnp.int32(1), jnp.float32(1))
        )
        return v[None]

    f = jax.shard_map(step, mesh=mesh, in_specs=(P(axis),) * 3,
                      out_specs=P(axis), check_vma=False)
    return f(*arrs)


def dist_bfs_pallas(mesh: Mesh, sc: ShardedCellSpmv, source, axis="d",
                    frontier_cap: int | None = None):
    """Distributed BFS (structural max-or) with the Pallas kernel per
    shard; depth vector row-sharded.  Frontiers exchange via the
    capped-sparse index gather (None = mloc/16, 0 = always dense)."""
    if frontier_cap is None:
        frontier_cap = max(sc.mloc // 16, 32)
    return _dist_bfs_pallas(
        mesh, _arrs(sc), jnp.asarray(source, jnp.int32), _meta(sc), axis,
        frontier_cap,
    )


def _sparse_exchange_vals(v, changed, my, mloc, cap, axis, fill):
    """(f32[mloc], bool[mloc]) -> f32[S*mloc] carrying only the <= cap
    CHANGED values per shard; untouched slots arrive as ``fill`` (the
    min-plus absorbing input)."""
    n_pad_axis = lax.axis_size(axis) * mloc
    (idx,) = jnp.nonzero(changed, size=cap, fill_value=mloc)
    live = idx < mloc
    gidx = jnp.where(live, my * mloc + idx.astype(jnp.int32), n_pad_axis)
    gval = jnp.where(live, v[jnp.clip(idx, 0, mloc - 1)], fill)
    all_idx = lax.all_gather(gidx.astype(jnp.int32), axis, tiled=True)
    all_val = lax.all_gather(gval, axis, tiled=True)
    return (
        jnp.full((n_pad_axis + 1,), fill)
        .at[all_idx]
        .set(all_val, mode="drop")[:n_pad_axis]
    )


@partial(jax.jit, static_argnames=("mesh", "axis", "meta", "cap"))
def _dist_sssp_pallas(mesh, arrs, source, meta, axis, cap):
    def step(*arrs):
        fmt = _local_fmt(meta, arrs)
        my = lax.axis_index(axis)
        mloc = meta[1]
        inf = jnp.float32(jnp.inf)
        gids = my * mloc + jnp.arange(mloc, dtype=jnp.int32)
        v0 = jnp.where(gids == source, 0.0, inf)
        ch0 = gids == source

        def cond(state):
            return (state[2] > 0) & (state[3] < jnp.int32(4 * meta[0] + 2))

        def body(state):
            v, changed, _, it = state
            # the feedback vector IS the sparse payload: unchanged
            # entries arrive as +inf (min-plus absorbing), so only
            # changed (index, value) pairs need to move
            if cap > 0:
                maxcnt = lax.pmax(
                    jnp.sum(changed).astype(jnp.int32), axis)
                v_full = lax.cond(
                    maxcnt <= cap,
                    lambda vv, ch: _sparse_exchange_vals(
                        vv, ch, my, mloc, cap, axis, inf),
                    lambda vv, ch: jnp.where(
                        lax.all_gather(ch, axis, tiled=True),
                        lax.all_gather(vv, axis, tiled=True), inf),
                    v, changed,
                )
            else:
                v_full = jnp.where(
                    lax.all_gather(changed, axis, tiled=True),
                    lax.all_gather(v, axis, tiled=True), inf)
            frontier = fused_cell_spmv_apply(
                fmt, v_full, op_mul=_minplus, op_add=jnp.minimum,
                identity=float("inf"), skip_inactive=True,
            )
            new_v = jnp.minimum(v, frontier)
            ch = new_v != v
            count = lax.psum(jnp.sum(ch).astype(jnp.int32), axis)
            return (new_v, ch, count, it + 1)

        v, _, _, _ = lax.while_loop(
            cond, body, (v0, ch0, jnp.int32(1), jnp.int32(0)))
        return v[None]

    f = jax.shard_map(step, mesh=mesh, in_specs=(P(axis),) * 3,
                      out_specs=P(axis), check_vma=False)
    return f(*arrs)


def dist_sssp_pallas(mesh: Mesh, sc: ShardedCellSpmv, source, axis="d",
                     frontier_cap: int | None = None):
    """Distributed SSSP (min-plus) with the Pallas kernel per shard; the
    changed-entry feedback exchanges via the capped-sparse (index, value)
    gather (None = mloc/16, 0 = dense)."""
    if frontier_cap is None:
        frontier_cap = max(sc.mloc // 16, 32)
    return _dist_sssp_pallas(
        mesh, _arrs(sc), jnp.asarray(source, jnp.int32), _meta(sc), axis,
        frontier_cap,
    )


# ---------------------------------------------------------------------------
# Comm/compute OVERLAP variants (r4 verdict item 6).  The diagonal block
# depends only on the LOCAL vector, so XLA's async collectives run the
# all-gather while the diagonal Pallas apply executes; the off-diagonal
# apply consumes the gathered frame when it lands.  On a row-sharded
# uniform graph ~1/S of the nnz is diagonal at S shards — but the
# all-gather cost is per-BYTE of vector, not nnz, so at scale (mloc large,
# deg moderate) the diagonal apply alone usually covers the gather
# (see bench_scaling.py's projection rows).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mesh", "axis", "d_meta", "o_meta"))
def _dist_pr_pallas_overlap(mesh, d_arrs, o_arrs, alpha, eps, d_meta,
                            o_meta, axis):
    def step(*arrs):
        d_fmt = _local_fmt(d_meta, arrs[:3])
        o_fmt = _local_fmt(o_meta, arrs[3:])
        my = lax.axis_index(axis)
        n, mloc = d_meta[0], d_meta[1]
        gids = my * mloc + jnp.arange(mloc, dtype=jnp.int32)
        live = gids < n
        addition = (1.0 - alpha) / n
        p0 = jnp.where(live, jnp.full((mloc,), 1.0 / n, jnp.float32), 0.0)

        def cond(state):
            return (state[1] > eps) & (state[2] < 10_000)

        def body(state):
            p_prev, _, it = state
            # start the gather, then issue the gather-independent
            # diagonal apply: XLA overlaps the collective with it
            p_full = lax.all_gather(p_prev, axis, tiled=True)
            ap_d = fused_cell_spmv_apply(
                d_fmt, p_prev, op_mul=_mult, op_add=jnp.add, identity=0.0)
            ap_o = fused_cell_spmv_apply(
                o_fmt, p_full, op_mul=_mult, op_add=jnp.add, identity=0.0)
            p = jnp.where(live, ap_d + ap_o + addition, 0.0)
            err2 = lax.psum(jnp.sum((p - p_prev) ** 2), axis)
            return (p, jnp.sqrt(err2), it + 1)

        p, _, _ = lax.while_loop(
            cond, body, (p0, jnp.float32(eps) + 0.1, jnp.int32(0)))
        return p[None]

    f = jax.shard_map(step, mesh=mesh, in_specs=(P(axis),) * 6,
                      out_specs=P(axis), check_vma=False)
    return f(*d_arrs, *o_arrs)


def dist_pagerank_pallas_overlap(mesh: Mesh, diag: ShardedCellSpmv,
                                 off: ShardedCellSpmv, alpha, eps,
                                 axis="d"):
    """Distributed PageRank, Pallas per-shard kernels, diagonal apply
    overlapped with the frame all-gather (build the pair with
    :func:`shard_cell_spmv_split`)."""
    return _dist_pr_pallas_overlap(
        mesh, _arrs(diag), _arrs(off), jnp.float32(alpha),
        jnp.float32(eps), _meta(diag), _meta(off), axis)


@partial(jax.jit, static_argnames=("mesh", "axis", "d_meta", "o_meta",
                                   "cap"))
def _dist_bfs_pallas_overlap(mesh, d_arrs, o_arrs, source, d_meta, o_meta,
                             axis, cap):
    def step(*arrs):
        d_fmt = _local_fmt(d_meta, arrs[:3])
        o_fmt = _local_fmt(o_meta, arrs[3:])
        my = lax.axis_index(axis)
        mloc = d_meta[1]
        gids = my * mloc + jnp.arange(mloc, dtype=jnp.int32)
        v0 = jnp.zeros((mloc,), jnp.int32)
        front0 = jnp.where(gids == source, 1.0, 0.0)

        def cond(state):
            return (state[3] > 0) & (state[2] < jnp.int32(d_meta[0] + 2))

        def body(state):
            v, front, depth, _ = state
            v = jnp.where(front > 0, depth, v)
            if cap > 0:
                maxcnt = lax.pmax(
                    jnp.sum(front > 0).astype(jnp.int32), axis)
                front_full = lax.cond(
                    maxcnt <= cap,
                    lambda f: _sparse_exchange_f01(f, my, mloc, cap, axis),
                    lambda f: lax.all_gather(f, axis, tiled=True),
                    front,
                )
            else:
                front_full = lax.all_gather(front, axis, tiled=True)
            # diagonal traversal overlaps the exchange
            hits_d = fused_cell_spmv_apply(
                d_fmt, front, op_mul=_structural, op_add=jnp.maximum,
                identity=0.0, skip_inactive=True)
            hits_o = fused_cell_spmv_apply(
                o_fmt, front_full, op_mul=_structural, op_add=jnp.maximum,
                identity=0.0, skip_inactive=True)
            hits = jnp.maximum(hits_d, hits_o)
            front_new = jnp.where((hits > 0) & (v == 0), 1.0, 0.0)
            count = lax.psum(jnp.sum(front_new), axis)
            return (v, front_new, depth + 1, count)

        v, _, _, _ = lax.while_loop(
            cond, body, (v0, front0, jnp.int32(1), jnp.float32(1)))
        return v[None]

    f = jax.shard_map(step, mesh=mesh, in_specs=(P(axis),) * 6,
                      out_specs=P(axis), check_vma=False)
    return f(*d_arrs, *o_arrs)


def dist_bfs_pallas_overlap(mesh: Mesh, diag: ShardedCellSpmv,
                            off: ShardedCellSpmv, source, axis="d",
                            frontier_cap: int | None = None):
    """Distributed BFS with the diagonal traversal overlapped against the
    frontier exchange (capped-sparse, dense past the cap)."""
    if frontier_cap is None:
        frontier_cap = max(diag.mloc // 16, 32)
    return _dist_bfs_pallas_overlap(
        mesh, _arrs(diag), _arrs(off), jnp.asarray(source, jnp.int32),
        _meta(diag), _meta(off), axis, frontier_cap)


@partial(jax.jit, static_argnames=("mesh", "axis", "d_meta", "o_meta",
                                   "cap"))
def _dist_sssp_pallas_overlap(mesh, d_arrs, o_arrs, source, d_meta, o_meta,
                              axis, cap):
    def step(*arrs):
        d_fmt = _local_fmt(d_meta, arrs[:3])
        o_fmt = _local_fmt(o_meta, arrs[3:])
        my = lax.axis_index(axis)
        mloc = d_meta[1]
        inf = jnp.float32(jnp.inf)
        gids = my * mloc + jnp.arange(mloc, dtype=jnp.int32)
        v0 = jnp.where(gids == source, 0.0, inf)
        ch0 = gids == source

        def cond(state):
            return (state[2] > 0) & (state[3] < jnp.int32(4 * d_meta[0] + 2))

        def body(state):
            v, changed, _, it = state
            v_feed = jnp.where(changed, v, inf)
            if cap > 0:
                maxcnt = lax.pmax(jnp.sum(changed).astype(jnp.int32), axis)
                v_full = lax.cond(
                    maxcnt <= cap,
                    lambda vv, ch: _sparse_exchange_vals(
                        vv, ch, my, mloc, cap, axis, inf),
                    lambda vv, ch: jnp.where(
                        lax.all_gather(ch, axis, tiled=True),
                        lax.all_gather(vv, axis, tiled=True), inf),
                    v, changed,
                )
            else:
                v_full = jnp.where(
                    lax.all_gather(changed, axis, tiled=True),
                    lax.all_gather(v, axis, tiled=True), inf)
            # diagonal relaxation overlaps the exchange
            f_d = fused_cell_spmv_apply(
                d_fmt, v_feed, op_mul=_minplus, op_add=jnp.minimum,
                identity=float("inf"), skip_inactive=True)
            f_o = fused_cell_spmv_apply(
                o_fmt, v_full, op_mul=_minplus, op_add=jnp.minimum,
                identity=float("inf"), skip_inactive=True)
            new_v = jnp.minimum(v, jnp.minimum(f_d, f_o))
            ch = new_v != v
            count = lax.psum(jnp.sum(ch).astype(jnp.int32), axis)
            return (new_v, ch, count, it + 1)

        v, _, _, _ = lax.while_loop(
            cond, body, (v0, ch0, jnp.int32(1), jnp.int32(0)))
        return v[None]

    f = jax.shard_map(step, mesh=mesh, in_specs=(P(axis),) * 6,
                      out_specs=P(axis), check_vma=False)
    return f(*d_arrs, *o_arrs)


def dist_sssp_pallas_overlap(mesh: Mesh, diag: ShardedCellSpmv,
                             off: ShardedCellSpmv, source, axis="d",
                             frontier_cap: int | None = None):
    """Distributed SSSP with the diagonal relaxation overlapped against
    the feedback exchange."""
    if frontier_cap is None:
        frontier_cap = max(diag.mloc // 16, 32)
    return _dist_sssp_pallas_overlap(
        mesh, _arrs(diag), _arrs(off), jnp.asarray(source, jnp.int32),
        _meta(diag), _meta(off), axis, frontier_cap)
