"""Decompose the road_big_bfs 0.78 ms/level floor (r4 verdict item 7).

Measures, at the 9.4M-vertex Morton-grid scale, per-level cost of:
  - the adaptive traversal alone (sparse-grid path, tiny frontier),
  - the fused level update alone,
  - both chained (the production loop body),
against the state-traffic roofline (arrays touched / 516 GB/s measured
stream ceiling).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from spla_tpu import formats as F  # noqa: E402


def t(label, fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)
    return best


def morton_grid(side):
    """Exact replica of bench_suite's road_big grid (rank-compacted
    Morton codes)."""
    import scipy.sparse as sp

    def morton_b(x, y):
        def spread(v):
            v = (v | (v << 16)) & 0x0000FFFF0000FFFF
            v = (v | (v << 8)) & 0x00FF00FF00FF00FF
            v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
            v = (v | (v << 2)) & 0x3333333333333333
            v = (v | (v << 1)) & 0x5555555555555555
            return v
        return spread(x) | (spread(y) << 1)

    xsb, ysb = np.meshgrid(np.arange(side, dtype=np.int64),
                           np.arange(side, dtype=np.int64), indexing="ij")
    rows_b, cols_b = [], []
    for dx, dy in ((1, 0), (0, 1)):
        x2 = xsb[: side - dx, : side - dy]
        y2 = ysb[: side - dx, : side - dy]
        a_ = morton_b(x2.ravel(), y2.ravel())
        b_ = morton_b((x2 + dx).ravel(), (y2 + dy).ravel())
        rows_b += [a_, b_]
        cols_b += [b_, a_]
    rrb = np.concatenate(rows_b)
    ccb = np.concatenate(cols_b)
    uniq = np.unique(rrb)
    rrb = np.searchsorted(uniq, rrb).astype(np.int32)
    ccb = np.searchsorted(uniq, ccb).astype(np.int32)
    g = side * side
    return sp.csr_matrix((np.ones(rrb.size, np.float32), (rrb, ccb)),
                         shape=(g, g))


def main():
    side = 3072  # 9.4M vertices (bench_suite road_big)
    A = morton_grid(side)
    n = A.shape[0]
    print(f"n={n} nnz={A.nnz}", flush=True)
    Ac = F.csr_from_scipy(A.astype(np.int32))
    from spla_tpu.pallas.spmv import (
        bfs_level_update,
        fused_spmv2d_adaptive,
        get_best_monoid_format,
    )
    from spla_tpu.algorithms import _structural_or

    fmt, _ = get_best_monoid_format(Ac, structural=True)
    print("fmt: layout", fmt.layout, "cw", fmt.cw, "tiles", fmt.n_tiles,
          "n_rb", fmt.n_row_blocks, flush=True)
    cwr = fmt.cw // 128
    nwr = (fmt.n + fmt.cw - 1) // fmt.cw * cwr
    nwc = nwr // cwr
    R = fmt.n_row_blocks * 128
    print(f"state arrays: {R}x128 x4B = {R*128*4/1e6:.1f} MB each",
          flush=True)

    v0 = jnp.zeros((R, 128), jnp.int32)
    front0 = jnp.zeros((R, 128), jnp.float32).at[0, 0].set(1.0)
    act0 = jnp.any(front0[:nwr].reshape(nwc, cwr * 128) > 0,
                   axis=1).astype(jnp.int32)

    K = 40

    @jax.jit
    def chain_trav(fmt, front, act, k):
        def body(i, carry):
            front, act = carry
            hits = fused_spmv2d_adaptive(
                fmt, front[:nwr], op_mul=_structural_or,
                op_add=jnp.maximum, identity=0.0,
                front_factor=jnp.float32(0.1), act=act)
            return (front + hits[:R] * 0 + (i * 0) * 1e-9, act)

        return lax.fori_loop(0, k, body, (front, act))

    def run_trav():
        f, a = chain_trav(fmt, front0, act0, K)
        np.asarray(jnp.sum(f))

    dt = t(f"adaptive traversal x{K} (tiny frontier)", run_trav) / K
    print(f"  -> {dt*1e3:.3f} ms/level", flush=True)

    @jax.jit
    def chain_update(fmt, v, front, k):
        hits = front * 2.0

        def body(i, carry):
            v, front, act, cnt = carry
            v2, f2, a2, c2 = bfs_level_update(fmt, hits, v, front, i + 1)
            return (v2, f2, a2, cnt + c2)

        return lax.fori_loop(0, k, body,
                             (v, front, act0, jnp.float32(0)))

    def run_update():
        v, f, a, c = chain_update(fmt, v0, front0, K)
        np.asarray(c)

    dt = t(f"level update x{K}", run_update) / K
    print(f"  -> {dt*1e3:.3f} ms/level", flush=True)

    @jax.jit
    def chain_both(fmt, v, front, act, k):
        def body(i, carry):
            v, front, act = carry
            hits = fused_spmv2d_adaptive(
                fmt, front[:nwr], op_mul=_structural_or,
                op_add=jnp.maximum, identity=0.0,
                front_factor=jnp.float32(0.1), act=act)
            v2, f2, a2, _ = bfs_level_update(fmt, hits, v, front, i + 1)
            return (v2, f2, a2)

        return lax.fori_loop(0, k, body, (v, front, act))

    def run_both():
        v, f, a = chain_both(fmt, v0, front0, act0, K)
        np.asarray(jnp.sum(v))

    dt = t(f"traversal + update x{K}", run_both) / K
    print(f"  -> {dt*1e3:.3f} ms/level (production body)", flush=True)

    mb = R * 128 * 4 / 1e6
    print(f"roofline: update touches ~5 arrays x {mb:.0f} MB = "
          f"{5*mb/516:.3f} ms; traversal hits write+front read = "
          f"{2*mb/516:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
