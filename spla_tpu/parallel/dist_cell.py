"""Distributed Pallas SpMV: per-shard cell formats under shard_map.

The scaling recipe from BASELINE.json's north star: block-row partition
per chip, dense halo vectors all-gathered over ICI, and the single-chip
Pallas monoid kernel (``spla_tpu.pallas.spmv``) as the per-shard compute
— collectives ride XLA, the kernel rides Mosaic, and the convergence
loops stay on device.

Each shard gets its own host-packed cell layout of its row block (rows
local, columns global over the padded gather frame); shards are padded
with inert tiles to a common tile count so ``shard_map`` sees equal
shapes.
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
    MonoidCellSpmv,
    build_monoid_cell_spmv_arrays,
)

__all__ = [
    "ShardedCellSpmv",
    "shard_cell_spmv",
    "dist_pagerank_pallas",
    "dist_bfs_pallas",
    "dist_sssp_pallas",
]


@dataclass(frozen=True)
class ShardedCellSpmv:
    """Per-shard monoid cell layouts stacked on a leading shard axis."""

    m: int  # global rows
    n: int  # global cols (= n_shards * mloc for square operators)
    mloc: int
    n_shards: int
    cw: int
    n_tiles: int  # per shard (padded to max)
    n_row_blocks: int  # per shard
    vals: jax.Array  # [S, T, 8, 128]
    packed: jax.Array  # [S, T, 8, 128]
    route: jax.Array  # [S, T, cw//128, 128]
    invl: jax.Array  # [S, T, 8, 128]
    rb_of_tile: jax.Array  # [S, T]
    wb_of_tile: jax.Array  # [S, T]
    is_first: jax.Array  # [S, T]


jax.tree_util.register_dataclass(
    ShardedCellSpmv,
    data_fields=["vals", "packed", "route", "invl", "rb_of_tile",
                 "wb_of_tile", "is_first"],
    meta_fields=["m", "n", "mloc", "n_shards", "cw", "n_tiles", "n_row_blocks"],
)


def shard_cell_spmv(
    A: CsrMatrix, n_shards: int, mesh: Mesh | None = None,
    cw: int = 16384, axis: str = "d", values=None,
) -> ShardedCellSpmv | None:
    """Host-side: block-row partition + per-shard monoid cell packing.

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
    fmts = []
    for s in range(n_shards):
        lo, hi = s * mloc, min((s + 1) * mloc, m)
        sel = (rows >= lo) & (rows < hi)
        f = build_monoid_cell_spmv_arrays(
            mloc, n_pad, (rows[sel] - lo).astype(np.int32),
            cols[sel].astype(np.int32), vals[sel].astype(np.float32), cw=cw,
        )
        if f is None:
            return None
        fmts.append(f)

    T = max(f.n_tiles for f in fmts)

    def padded(get, fill, dtype, pad_last=False):
        out = []
        for f in fmts:
            a = np.asarray(get(f))
            if a.shape[0] < T:
                fv = a[-1] if pad_last else fill
                pad = np.full((T - a.shape[0],) + a.shape[1:], fv, dtype)
                a = np.concatenate([a, pad])
            out.append(a)
        return jnp.asarray(np.stack(out))

    cwr = cw // 128
    sc = ShardedCellSpmv(
        m=m, n=n, mloc=mloc, n_shards=n_shards, cw=cw, n_tiles=T,
        n_row_blocks=fmts[0].n_row_blocks,
        vals=padded(lambda f: f.vals, 0, np.float32),
        packed=padded(lambda f: f.packed, 0, np.int32),  # valid bits clear
        route=padded(lambda f: f.route, 0, np.int8),
        invl=padded(lambda f: f.invl, 0, np.int8),
        # pad tiles must repeat the LAST tile's (rb, wb): the Pallas output
        # pipeline requires each output block be visited by CONSECUTIVE grid
        # steps only — rb=0 pads after later row blocks would overwrite row
        # block 0 with a stale accumulator on real hardware
        rb_of_tile=padded(lambda f: f.rb_of_tile, 0, np.int32, pad_last=True),
        wb_of_tile=padded(lambda f: f.wb_of_tile, 0, np.int32, pad_last=True),
        is_first=padded(lambda f: f.is_first, 0, np.int32),
    )
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis))
        sc = jax.tree_util.tree_map(lambda a: jax.device_put(a, shard), sc)
    return sc


# hashable static metadata for jit: (m, mloc, n_shards, cw, n_tiles, n_rb)
def _meta(sc: ShardedCellSpmv):
    return (sc.m, sc.mloc, sc.n_shards, sc.cw, sc.n_tiles, sc.n_row_blocks)


def _local_fmt(meta, arrs) -> MonoidCellSpmv:
    m, mloc, n_shards, cw, n_tiles, n_rb = meta
    vals, packed, route, invl, rb, wb, first = arrs
    return MonoidCellSpmv(
        m=mloc, n=n_shards * mloc, cw=cw,
        n_row_blocks=n_rb, n_tiles=n_tiles,
        vals=vals[0], packed=packed[0], route=route[0], invl=invl[0],
        rb_of_tile=rb[0], wb_of_tile=wb[0], is_first=first[0],
        slots=n_tiles * 1024, nnz=0,
    )


_ARRS = ("vals", "packed", "route", "invl", "rb_of_tile", "wb_of_tile", "is_first")


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
        from ..pallas.spmv import monoid_cell_spmv_apply

        fmt = _local_fmt(meta, arrs)
        my = lax.axis_index(axis)
        n, mloc = meta[0], meta[1]
        gids = my * mloc + jnp.arange(mloc, dtype=jnp.int32)
        live = gids < n
        addition = (1.0 - alpha) / n
        p0 = jnp.where(live, jnp.full((mloc,), 1.0 / n, jnp.float32), 0.0)

        def cond(state):
            return state[1] > eps

        def body(state):
            p_prev, _ = state
            p_full = lax.all_gather(p_prev, axis, tiled=True)
            ap = monoid_cell_spmv_apply(
                fmt, p_full, op_mul=_mult, op_add=jnp.add, identity=0.0
            )
            p = jnp.where(live, ap + addition, 0.0)
            err2 = lax.psum(jnp.sum((p - p_prev) ** 2), axis)
            return (p, jnp.sqrt(err2))

        p, _ = lax.while_loop(cond, body, (p0, jnp.float32(eps) + 0.1))
        return p[None]

    f = jax.shard_map(step, mesh=mesh, in_specs=(P(axis),) * 7,
                      out_specs=P(axis), check_vma=False)
    return f(*arrs)


def dist_pagerank_pallas(mesh: Mesh, sc: ShardedCellSpmv, alpha, eps, axis="d"):
    """Distributed PageRank with the Pallas kernel per shard; p returned
    row-sharded [S, mloc]."""
    return _dist_pr_pallas(
        mesh, _arrs(sc), jnp.float32(alpha), jnp.float32(eps), _meta(sc), axis
    )


@partial(jax.jit, static_argnames=("mesh", "axis", "meta"))
def _dist_bfs_pallas(mesh, arrs, source, meta, axis):
    def step(*arrs):
        from ..pallas.spmv import monoid_cell_spmv_apply

        fmt = _local_fmt(meta, arrs)
        my = lax.axis_index(axis)
        mloc = meta[1]
        gids = my * mloc + jnp.arange(mloc, dtype=jnp.int32)
        v0 = jnp.zeros((mloc,), jnp.int32)
        front0 = jnp.where(gids == source, 1.0, 0.0)

        def cond(state):
            return state[3] > 0

        def body(state):
            v, front, depth, _ = state
            v = jnp.where(front > 0, depth, v)
            front_full = lax.all_gather(front, axis, tiled=True)
            hits = monoid_cell_spmv_apply(
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

    f = jax.shard_map(step, mesh=mesh, in_specs=(P(axis),) * 7,
                      out_specs=P(axis), check_vma=False)
    return f(*arrs)


def dist_bfs_pallas(mesh: Mesh, sc: ShardedCellSpmv, source, axis="d"):
    """Distributed BFS (structural max-or) with the Pallas kernel per
    shard; depth vector row-sharded."""
    return _dist_bfs_pallas(
        mesh, _arrs(sc), jnp.asarray(source, jnp.int32), _meta(sc), axis
    )


@partial(jax.jit, static_argnames=("mesh", "axis", "meta"))
def _dist_sssp_pallas(mesh, arrs, source, meta, axis):
    def step(*arrs):
        from ..pallas.spmv import monoid_cell_spmv_apply

        fmt = _local_fmt(meta, arrs)
        my = lax.axis_index(axis)
        mloc = meta[1]
        inf = jnp.float32(jnp.inf)
        gids = my * mloc + jnp.arange(mloc, dtype=jnp.int32)
        v0 = jnp.where(gids == source, 0.0, inf)

        def cond(state):
            return state[1] > 0

        def body(state):
            v, _ = state
            v_full = lax.all_gather(v, axis, tiled=True)
            frontier = monoid_cell_spmv_apply(
                fmt, v_full, op_mul=_minplus, op_add=jnp.minimum,
                identity=float("inf"), skip_inactive=True,
            )
            new_v = jnp.minimum(v, frontier)
            changed = lax.psum(jnp.sum(new_v != v).astype(jnp.int32), axis)
            return (new_v, changed)

        v, _ = lax.while_loop(cond, body, (v0, jnp.int32(1)))
        return v[None]

    f = jax.shard_map(step, mesh=mesh, in_specs=(P(axis),) * 7,
                      out_specs=P(axis), check_vma=False)
    return f(*arrs)


def dist_sssp_pallas(mesh: Mesh, sc: ShardedCellSpmv, source, axis="d"):
    """Distributed SSSP (min-plus) with the Pallas kernel per shard."""
    return _dist_sssp_pallas(
        mesh, _arrs(sc), jnp.asarray(source, jnp.int32), _meta(sc), axis
    )
