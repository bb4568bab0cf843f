"""Real-hardware test lane: compiled Pallas kernels on an actual TPU.

Run with ``SPLA_TEST_TPU=1 python -m pytest tests/test_tpu_hw.py -q`` —
skipped entirely otherwise (the default suite runs the same kernels in
interpret mode on CPU; this lane is the reference analog of the gtest
mains compiled against a real OpenCL device, tests/test_common.hpp:66-89).
Shapes are kept small; most wall time is remote kernel compilation.
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPLA_TEST_TPU")
    or jax.devices()[0].platform not in ("tpu", "axon"),
    reason="hardware lane: set SPLA_TEST_TPU=1 with a real TPU attached",
)


def _graph(n=20000, deg=8, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n, n * deg // 2, dtype=np.int32)
    c = rng.integers(0, n, n * deg // 2, dtype=np.int32)
    keep = r != c
    A = sp.coo_matrix((np.ones(keep.sum(), np.float32), (r[keep], c[keep])),
                      shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float32).tocsr()
    A.sort_indices()
    return A


def test_fused_spmv_hw():
    from spla_tpu.pallas.spmv import (
        build_fused_cell_spmv_arrays, fused_cell_spmv_apply)

    A = _graph()
    coo = A.tocoo()
    fmt = build_fused_cell_spmv_arrays(
        A.shape[0], A.shape[1], coo.row.astype(np.int32),
        coo.col.astype(np.int32), coo.data)
    assert fmt is not None
    x = np.random.default_rng(1).random(A.shape[1], dtype=np.float32)
    r = np.asarray(fused_cell_spmv_apply(
        fmt, jnp.asarray(x), op_mul=lambda a, b: a * b, op_add=jnp.add,
        identity=0.0))
    ref = A @ x
    assert np.abs(r - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5


def test_adaptive_sparse_frontier_hw():
    from spla_tpu.pallas.spmv import (
        build_fused_cell_spmv_arrays, fused_cell_spmv_apply_adaptive)

    A = _graph(seed=2)
    coo = A.tocoo()
    fmt = build_fused_cell_spmv_arrays(
        A.shape[0], A.shape[1], coo.row.astype(np.int32),
        coo.col.astype(np.int32), coo.data)
    x = np.zeros(A.shape[1], np.float32)
    x[50:80] = 1.0
    r = np.asarray(fused_cell_spmv_apply_adaptive(
        fmt, jnp.asarray(x), op_mul=lambda a, b: a * b, op_add=jnp.add,
        identity=0.0, front_factor=jnp.float32(1.0)))
    np.testing.assert_allclose(r, A @ x, rtol=1e-5, atol=1e-5)


def test_mxmT_reduce_hw():
    from spla_tpu.pallas.mxmt import pairs_available, pallas_mxmT_reduce

    if not pairs_available():
        pytest.skip("no native toolchain")
    A = _graph(n=4000, deg=10, seed=3)
    coo = A.tocoo()
    r = pallas_mxmT_reduce(coo.row, coo.col, A.indptr, A.indices, A.data,
                           A.indptr, A.indices, A.data)
    ref = (A @ A.T).multiply(A).sum()
    assert abs(r - ref) < 0.5


def test_streaming_level_update_hw(monkeypatch):
    # compiled (not interpreted) run of the chunked level-update grid
    # variant that big graphs (> BFS_UPDATE_MAX_RB row blocks) take;
    # forced on a small graph exactly like the CPU oracle test
    # (tests/test_pallas.py::test_streaming_level_update_vs_oracle)
    from spla_tpu.pallas import spmv as SP
    from spla_tpu.algorithms import _bfs_kernel_pallas

    monkeypatch.setattr(SP, "RESIDENT_VMEM", 0)
    monkeypatch.setattr(SP, "BFS_UPDATE_MAX_RB", 0)
    monkeypatch.setattr(SP, "LEVEL_UPDATE_CHUNK", 128)
    A = _graph(n=21000, deg=3, seed=5)
    coo = A.tocoo()
    fmt = SP.build_fused_cell_spmv_arrays(
        A.shape[0], A.shape[1], coo.row.astype(np.int32),
        coo.col.astype(np.int32), np.ones(coo.nnz, np.float32),
        cw=1024, pattern=True)
    lev = np.asarray(_bfs_kernel_pallas(fmt, jnp.int32(3)))
    import scipy.sparse.csgraph as cg
    ref = cg.shortest_path(A, method="D", unweighted=True, indices=3)
    finite = np.isfinite(ref)
    assert np.all(lev[finite] == ref[finite] + 1)
    assert np.all(lev[~finite] == 0)


def test_bfs_sssp_hw():
    from spla_tpu import algorithms as alg
    from spla_tpu import formats as F

    A = _graph(n=6000, deg=6, seed=4)
    Ac = F.csr_from_scipy(A)
    lev = np.asarray(alg.bfs(Ac, 0).values)
    import scipy.sparse.csgraph as cg
    ref = cg.shortest_path(A, method="D", unweighted=True, indices=0)
    finite = np.isfinite(ref)
    assert np.all(lev[finite] == ref[finite] + 1)
    assert np.all(lev[~finite] == 0)
    dist = np.asarray(alg.sssp(Ac, 0).values)
    refd = cg.dijkstra(A, indices=0)
    np.testing.assert_allclose(dist[finite], refd[finite], rtol=1e-5)


def test_op_layer_dispatch_hw():
    """Public-op dispatcher parity (reference dispatcher.cpp:42-85): on
    TPU, ``ops.mxv_masked`` / ``ops.vxm_masked`` execute the Pallas fused
    kernel and match the XLA reference path."""
    from spla_tpu import formats as F
    from spla_tpu import op as OP
    from spla_tpu.types import FLOAT
    from spla_tpu.containers import DenseVec, SparseVec
    from spla_tpu.ops import spmv as S

    A = _graph(n=8000, deg=8, seed=5)
    rng = np.random.default_rng(7)
    A.data[:] = rng.random(A.nnz, np.float32)
    Ac = F.csr_from_scipy(A)
    At = F.csr_transpose_host(Ac)
    MULT = OP.lookup("MULT", FLOAT)
    PLUS = OP.lookup("PLUS", FLOAT)
    MIN = OP.lookup("MIN", FLOAT)
    GEZ = OP.lookup("GEZERO", FLOAT)
    n = A.shape[0]
    x = DenseVec(jnp.asarray(rng.random(n, np.float32)), jnp.float32(0))
    mask = DenseVec(
        jnp.asarray((rng.random(n) > 0.25).astype(np.float32)), jnp.float32(0)
    )

    before = dict(S.DISPATCH_STATS)
    r = S.mxv_masked(mask, Ac, x, MULT, PLUS, GEZ, 0.0)
    assert S.DISPATCH_STATS["mxv_pallas"] == before["mxv_pallas"] + 1
    ref = S._mxv_masked_xla(mask, Ac, x, MULT, PLUS, GEZ, 0.0)
    np.testing.assert_allclose(
        np.asarray(r.values), np.asarray(ref.values), rtol=2e-5, atol=1e-5
    )

    idx = np.sort(rng.choice(n, 200, replace=False)).astype(np.int32)
    sv = SparseVec(
        n=n, indices=jnp.asarray(idx),
        values=jnp.asarray(rng.random(200, np.float32)),
        nnz=jnp.int32(200), fill=jnp.float32(0),
    )
    before = dict(S.DISPATCH_STATS)
    rv = S.vxm_masked(mask, sv, At, MULT, PLUS, GEZ, 0.0)
    assert S.DISPATCH_STATS["vxm_pallas"] == before["vxm_pallas"] + 1
    rr = S._vxm_masked_xla(mask, sv, At, MULT, PLUS, GEZ, 0.0)
    k, kr = int(np.asarray(rv.nnz)), int(np.asarray(rr.nnz))
    assert k == kr
    np.testing.assert_array_equal(
        np.asarray(rv.indices)[:k], np.asarray(rr.indices)[:kr]
    )
    np.testing.assert_allclose(
        np.asarray(rv.values)[:k], np.asarray(rr.values)[:kr],
        rtol=2e-5, atol=1e-5,
    )

    # min-plus (SSSP semiring) through the same public entry
    w = DenseVec(jnp.asarray(rng.random(n, np.float32) + 0.5), jnp.float32(jnp.inf))
    before = dict(S.DISPATCH_STATS)
    rm = S.vxm_masked(mask, w, At, PLUS, MIN, GEZ, float("inf"))
    assert S.DISPATCH_STATS["vxm_pallas"] == before["vxm_pallas"] + 1
    rmr = S._vxm_masked_xla(mask, w, At, PLUS, MIN, GEZ, float("inf"))
    k = int(np.asarray(rm.nnz))
    assert k == int(np.asarray(rmr.nnz))
    np.testing.assert_allclose(
        np.asarray(rm.values)[:k], np.asarray(rmr.values)[:k],
        rtol=2e-5, atol=1e-5,
    )


def test_facade_dispatch_hw():
    """Matrix.mxv / Vector.vxm (the pyspla-parity surface) reach the
    Pallas kernel end to end on TPU."""
    from spla_tpu import facade as fc
    from spla_tpu.ops import spmv as S

    A = _graph(n=5000, deg=6, seed=8)
    coo = A.tocoo()
    M = fc.Matrix.from_lists(
        coo.row.tolist(), coo.col.tolist(), coo.data.tolist(),
        shape=A.shape, dtype=fc.FLOAT,
    )
    v = fc.Vector.dense(A.shape[1], fc.FLOAT, 1.0)
    mask = fc.Vector.dense(A.shape[0], fc.FLOAT, 1.0)
    before = dict(S.DISPATCH_STATS)
    r = M.mxv(mask, v, fc.FLOAT.MULT, fc.FLOAT.PLUS, fc.FLOAT.GEZERO)
    assert S.DISPATCH_STATS["mxv_pallas"] == before["mxv_pallas"] + 1
    ref = A @ np.ones(A.shape[1], np.float32)
    np.testing.assert_allclose(r.to_numpy(), ref, rtol=2e-5, atol=1e-5)


def test_int_native_spmv_hw():
    """Int-native kernel: int32 min-plus EXACT far past the old 2^24
    f32-embedding gate (round-4; VERDICT r3 item 6)."""
    from spla_tpu import formats as F
    from spla_tpu import op as OP
    from spla_tpu.types import INT
    from spla_tpu.pallas.spmv import pallas_spmv_fn_int

    rng = np.random.default_rng(11)
    m = n = 6000
    nnz = 40000
    rows = np.sort(rng.integers(0, m, nnz)).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.integers(1, 1 << 28, nnz).astype(np.int32)
    A = F.csr_from_entries((m, n), rows, cols, vals, dtype=np.int32)
    fn = pallas_spmv_fn_int(A, OP.lookup("PLUS", INT),
                            OP.lookup("MIN", INT), (1 << 31) - 1)
    assert fn is not None
    x = rng.integers(0, 1 << 28, n).astype(np.int32)
    r = np.asarray(fn(A, jnp.asarray(x)))
    nnz_a = int(np.asarray(A.nnz))
    ar = np.asarray(A.row_ids)[:nnz_a]
    ac = np.asarray(A.cols)[:nnz_a]
    av = np.asarray(A.values)[:nnz_a].astype(np.int64)
    prod = (av + x[ac].astype(np.int64)).astype(np.int32)
    ref = np.full(m, (1 << 31) - 1, np.int64)
    np.minimum.at(ref, ar, prod)
    np.testing.assert_array_equal(r.astype(np.int64), ref)


def test_balanced_dispatch_skewed_hw():
    """Skewed graph through the public op layer: dispatch picks the
    hub-split + relabeled format and stays exact."""
    from spla_tpu import formats as F
    from spla_tpu import op as OP
    from spla_tpu.types import FLOAT
    from spla_tpu.containers import DenseVec
    from spla_tpu.ops import spmv as S
    from spla_tpu.pallas.spmv import is_skewed

    rng = np.random.default_rng(13)
    n = 20000
    deg = np.minimum(rng.zipf(2.1, n) * 8, n // 8).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int32), deg)
    cols = rng.integers(0, n, rows.size, dtype=np.int32)
    vals = rng.random(rows.size, np.float32)
    A = F.csr_from_entries((n, n), rows, cols, vals, dtype=np.float32)
    assert is_skewed(A)
    x = DenseVec(jnp.asarray(rng.random(n, np.float32)), jnp.float32(0))
    mask = DenseVec(jnp.asarray(np.ones(n, np.float32)), jnp.float32(0))
    MULT = OP.lookup("MULT", FLOAT)
    PLUS = OP.lookup("PLUS", FLOAT)
    GEZ = OP.lookup("GEZERO", FLOAT)
    before = dict(S.DISPATCH_STATS)
    r = S.mxv_masked(mask, A, x, MULT, PLUS, GEZ, 0.0)
    assert S.DISPATCH_STATS["mxv_pallas"] == before["mxv_pallas"] + 1
    ref = S._mxv_masked_xla(mask, A, x, MULT, PLUS, GEZ, 0.0)
    np.testing.assert_allclose(
        np.asarray(r.values), np.asarray(ref.values), rtol=3e-5, atol=3e-5
    )


def test_pr_skewed_hub_split_hw():
    """PageRank on a hub graph runs the hub-split (balanced) format with
    the per-step alias fold and matches the XLA reference."""
    from spla_tpu import algorithms as alg
    from spla_tpu import formats as F
    from spla_tpu.pallas.spmv import is_skewed

    rng = np.random.default_rng(17)
    n = 20000
    deg = np.minimum(rng.zipf(2.1, n) * 8, n // 8).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int32), deg)
    cols = rng.integers(0, n, rows.size, dtype=np.int32)
    A = sp.coo_matrix((np.ones(rows.size, np.float32), (rows, cols)),
                      shape=(n, n)).tocsr()
    A.sum_duplicates()
    outdeg = np.asarray(A.sum(axis=0)).ravel()
    outdeg[outdeg == 0] = 1
    Ap = F.csr_from_scipy(A.multiply(0.85 / outdeg).tocsr().astype(np.float32))
    assert is_skewed(Ap)
    p = np.asarray(alg.pr(Ap, 0.85, 1e-6).values)
    # XLA reference on the same matrix
    from spla_tpu.algorithms import _pr_kernel
    import jax.numpy as jnp2

    pref = np.asarray(_pr_kernel(Ap, jnp2.float32(0.85), jnp2.float32(1e-6)))
    np.testing.assert_allclose(p, pref, rtol=1e-4, atol=1e-7)


def test_bfs_sssp_skewed_balanced_hw():
    """BFS and SSSP on a hub graph run the hub-split structural/value
    formats (plain per-level applies + alias folds) and match oracles."""
    from spla_tpu import algorithms as alg
    from spla_tpu import formats as F

    rng = np.random.default_rng(23)
    n = 20000
    deg = np.minimum(rng.zipf(2.1, n) * 8, n // 8).astype(np.int64)
    r = np.repeat(np.arange(n, dtype=np.int32), deg)
    c = rng.integers(0, n, r.size, dtype=np.int32)
    keep = r != c
    w = rng.uniform(0.1, 2.0, keep.sum()).astype(np.float32)
    A = sp.coo_matrix((w, (r[keep], c[keep])), shape=(n, n))
    A = A.maximum(A.T).tocsr()  # undirected, weighted
    Ac = F.csr_from_scipy(A)
    from spla_tpu.pallas.spmv import is_skewed

    assert is_skewed(Ac)
    lev = np.asarray(alg.bfs(Ac, 0, At=Ac).values)
    import scipy.sparse.csgraph as cg

    ref = cg.shortest_path(A, method="D", unweighted=True, indices=0)
    fin = np.isfinite(ref)
    assert np.all(lev[fin] == ref[fin] + 1)
    assert np.all(lev[~fin] == 0)
    dist = np.asarray(alg.sssp(Ac, 0, At=Ac).values)
    refd = cg.dijkstra(A, indices=0)
    np.testing.assert_allclose(dist[fin], refd[fin], rtol=1e-5)
