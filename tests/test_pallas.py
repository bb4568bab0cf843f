"""Pallas SpMV kernel tests — interpret mode on CPU (same-test-both-
backends strategy, SURVEY §4: interpret-mode Pallas is the CPU stand-in
for the TPU kernel)."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from spla_tpu import formats as F
from spla_tpu.pallas.spmv import build_cell_spmv, cell_spmv_apply

# The heaviest interpret-mode cases (resident mega-kernels, oct/pair
# layout sweeps, 2D traversal loops) push the default suite past 10
# minutes on a 1-core host; they run only with SPLA_TEST_SLOW=1 (the hw
# lane exercises the same kernels compiled, tests/test_tpu_hw.py).
slow = pytest.mark.skipif(
    not os.environ.get("SPLA_TEST_SLOW"),
    reason="slow interpret-mode case: set SPLA_TEST_SLOW=1",
)


@pytest.mark.parametrize(
    "m,n,density,seed",
    [(300, 250, 0.05, 1), (5000, 4000, 0.002, 2), (129, 128, 0.3, 3), (64, 64, 0.5, 4)],
)
@pytest.mark.parametrize("mode", ["f32", "bf16x3"])
def test_cell_spmv_vs_scipy(m, n, density, seed, mode):
    a = sp.random(m, n, density=density, random_state=seed, dtype=np.float32)
    A = F.csr_from_scipy(a)
    fmt = build_cell_spmv(A, cw=1024)
    x = np.random.default_rng(seed).random(n, dtype=np.float32)
    r = np.asarray(cell_spmv_apply(fmt, jnp.asarray(x), scatter_mode=mode))
    np.testing.assert_allclose(r, a @ x, rtol=1e-4, atol=1e-5)


def test_cell_spmv_exactness_modes_agree():
    # the bf16 3-split covers all 24 f32 mantissa bits: vs a float64 oracle
    # its error must match the plain-f32 path's (same roundoff class; only
    # the summation order differs)
    a = sp.random(500, 500, density=0.02, random_state=9, dtype=np.float32)
    a.data = (a.data * 1000 - 500).astype(np.float32)
    A = F.csr_from_scipy(a)
    fmt = build_cell_spmv(A, cw=1024)
    x = (np.random.default_rng(9).random(500, dtype=np.float32) * 7 - 3).astype(
        np.float32
    )
    ref = a.astype(np.float64) @ x.astype(np.float64)
    scale = np.abs(a).sum(axis=1).A.ravel() * np.abs(x).max() + 1.0
    r32 = np.asarray(cell_spmv_apply(fmt, jnp.asarray(x), scatter_mode="f32"))
    rbf = np.asarray(cell_spmv_apply(fmt, jnp.asarray(x), scatter_mode="bf16x3"))
    err32 = np.abs(r32 - ref) / scale
    errbf = np.abs(rbf - ref) / scale
    assert err32.max() < 1e-6
    assert errbf.max() < 1e-6  # f32-class accuracy, NOT bf16-class (~1e-2)


def test_cell_spmv_empty_rows():
    a = sp.csr_matrix((np.ones(2, np.float32), ([0, 5], [3, 1])), shape=(10, 8))
    fmt = build_cell_spmv(F.csr_from_scipy(a), cw=1024)
    x = np.arange(8, dtype=np.float32)
    r = np.asarray(cell_spmv_apply(fmt, jnp.asarray(x)))
    np.testing.assert_allclose(r, a @ x)


def test_cell_spmv_empty_matrix():
    a = sp.csr_matrix((10, 8), dtype=np.float32)
    fmt = build_cell_spmv(F.csr_from_scipy(a), cw=1024)
    r = np.asarray(cell_spmv_apply(fmt, jnp.arange(8, dtype=jnp.float32)))
    np.testing.assert_allclose(r, np.zeros(10))


def test_cell_spmv_generalized_mul():
    # op_mul other than MULT: (a + x) with PLUS accumulation
    a = sp.random(100, 100, density=0.1, random_state=5, dtype=np.float32)
    fmt = build_cell_spmv(F.csr_from_scipy(a), cw=1024)
    x = np.random.default_rng(5).random(100, dtype=np.float32)
    r = np.asarray(
        cell_spmv_apply(fmt, jnp.asarray(x), op_mul=lambda av, xv: av + xv)
    )
    d = a.toarray()
    mask = d != 0
    exp = ((d + x[None, :]) * mask).sum(1)
    np.testing.assert_allclose(r, exp, rtol=1e-4, atol=1e-5)


def test_cell_spmv_routing_conflicts():
    # dense band: many distinct columns share (lane, window-row) slots,
    # exercising the conflict-repair packing rounds
    n = 600
    d = np.zeros((n, n), np.float32)
    for k in range(-3, 4):
        d += np.diag(np.full(n - abs(k), 1.0 + abs(k), np.float32), k)
    a = sp.csr_matrix(d)
    fmt = build_cell_spmv(F.csr_from_scipy(a), cw=1024)
    x = np.random.default_rng(2).random(n, dtype=np.float32)
    r = np.asarray(cell_spmv_apply(fmt, jnp.asarray(x)))
    np.testing.assert_allclose(r, d @ x, rtol=1e-4, atol=1e-4)


def test_padding_ratio_reasonable():
    rng = np.random.default_rng(0)
    n, deg = 1 << 14, 32
    nnz = n * deg
    a = sp.csr_matrix(
        (rng.random(nnz, dtype=np.float32),
         (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
        shape=(n, n),
    )
    a.sum_duplicates()
    fmt = build_cell_spmv(F.csr_from_scipy(a), cw=1024)
    assert fmt.slots / fmt.nnz < 1.6  # dense-ish cells at this density


def test_numpy_packer_fallback(monkeypatch):
    # force the numpy multi-pass packer and check it agrees with scipy
    import spla_tpu.pallas.spmv as S

    monkeypatch.setattr(
        "spla_tpu.pallas.cellpack_native.native_pack", lambda *a, **k: None
    )
    a = sp.random(400, 300, density=0.04, random_state=6, dtype=np.float32)
    fmt = build_cell_spmv(F.csr_from_scipy(a), cw=1024)
    x = np.random.default_rng(6).random(300, dtype=np.float32)
    r = np.asarray(cell_spmv_apply(fmt, jnp.asarray(x)))
    np.testing.assert_allclose(r, a @ x, rtol=1e-4, atol=1e-5)


def test_native_packer_padding():
    from spla_tpu.pallas.cellpack_native import _native_lib

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    n, deg = 1 << 14, 32
    nnz = n * deg
    a = sp.csr_matrix(
        (rng.random(nnz, dtype=np.float32),
         (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
        shape=(n, n),
    )
    a.sum_duplicates()
    fmt = build_cell_spmv(F.csr_from_scipy(a), cw=2048)
    assert fmt.slots / fmt.nnz < 1.35
    x = np.random.default_rng(1).random(n, dtype=np.float32)
    r = np.asarray(cell_spmv_apply(fmt, jnp.asarray(x)))
    np.testing.assert_allclose(r, a @ x, rtol=1e-3, atol=1e-3)


def test_monoid_cell_spmv_minplus():
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (
        build_monoid_cell_spmv_arrays,
        monoid_cell_spmv_apply,
    )

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(4)
    n = 700
    a = sp.random(n, n, density=0.03, random_state=4, dtype=np.float32)
    a.data = (a.data * 5 + 0.1).astype(np.float32)
    coo = a.tocoo()
    fmt = build_monoid_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32), coo.data,
        cw=1024,
    )
    assert fmt is not None
    x = rng.random(n, dtype=np.float32) * 3
    r = np.asarray(
        monoid_cell_spmv_apply(
            fmt, jnp.asarray(x),
            op_mul=lambda av, xv: av + xv,
            op_add=jnp.minimum,
            identity=np.inf,
        )
    )
    d = a.toarray()
    ref = np.where(
        (d != 0).any(axis=1),
        np.where(d != 0, d + x[None, :], np.inf).min(axis=1),
        np.inf,
    )
    np.testing.assert_allclose(r, ref, rtol=1e-5, atol=1e-5)


def test_monoid_cell_spmv_max():
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (
        build_monoid_cell_spmv_arrays,
        monoid_cell_spmv_apply,
    )

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    n = 300
    a = sp.random(n, n, density=0.05, random_state=8, dtype=np.float32)
    coo = a.tocoo()
    fmt = build_monoid_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32), coo.data,
        cw=1024,
    )
    x = np.random.default_rng(8).random(n, dtype=np.float32)
    r = np.asarray(
        monoid_cell_spmv_apply(
            fmt, jnp.asarray(x),
            op_mul=lambda av, xv: av * xv,
            op_add=jnp.maximum,
            identity=-np.inf,
        )
    )
    d = a.toarray()
    ref = np.where(
        (d != 0).any(axis=1),
        np.where(d != 0, d * x[None, :], -np.inf).max(axis=1),
        -np.inf,
    )
    np.testing.assert_allclose(r, ref, rtol=1e-5, atol=1e-5)


@slow
def test_monoid_packing_dense_cells():
    # rank-within-l dealing order: dense cells must pack near the
    # ceil(max_l/8) floor, not explode the probe ring (was 102x)
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import build_monoid_cell_spmv_arrays

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    d = np.ones((300, 300), np.float32)
    coo = sp.coo_matrix(d)
    fmt = build_monoid_cell_spmv_arrays(
        300, 300, coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data, cw=1024,
    )
    assert fmt.slots / fmt.nnz < 1.6


def test_s_cell_spmv_plus_times():
    # S-table scatter (round-2 kernel): plus-times vs scipy
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import build_s_cell_spmv_arrays, s_cell_spmv_apply

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    n = 900
    a = sp.random(n, n, density=0.02, random_state=11, dtype=np.float32)
    coo = a.tocoo()
    fmt = build_s_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32), coo.data,
        cw=1024,
    )
    assert fmt is not None
    x = rng.random(n, dtype=np.float32)
    r = np.asarray(
        s_cell_spmv_apply(
            fmt, jnp.asarray(x),
            op_mul=lambda av, xv: av * xv, op_add=jnp.add, identity=0.0,
        )
    )
    np.testing.assert_allclose(r, a @ x, rtol=1e-5, atol=1e-5)


def test_s_cell_spmv_minplus():
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import build_s_cell_spmv_arrays, s_cell_spmv_apply

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(12)
    n = 700
    a = sp.random(n, n, density=0.03, random_state=12, dtype=np.float32)
    a.data = (a.data * 5 + 0.1).astype(np.float32)
    coo = a.tocoo()
    fmt = build_s_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32), coo.data,
        cw=1024,
    )
    x = rng.random(n, dtype=np.float32) * 3
    r = np.asarray(
        s_cell_spmv_apply(
            fmt, jnp.asarray(x),
            op_mul=lambda av, xv: av + xv, op_add=jnp.minimum,
            identity=np.inf,
        )
    )
    d = a.toarray()
    ref = np.where(
        (d != 0).any(axis=1),
        np.where(d != 0, d + x[None, :], np.inf).min(axis=1),
        np.inf,
    )
    np.testing.assert_allclose(r, ref, rtol=1e-5, atol=1e-5)


@slow
def test_s_cell_spmv_duplicate_heavy_rows():
    # rows with many in-window entries exercise the one-entry-per-row-per-
    # tile constraint (entries must spread across tiles, none dropped)
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import build_s_cell_spmv_arrays, s_cell_spmv_apply

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(13)
    n = 256
    # one very heavy row + uniform background, all inside ONE window
    rows = np.concatenate([np.zeros(200, np.int32),
                           rng.integers(0, n, 500).astype(np.int32)])
    cols = np.concatenate([rng.choice(n, 200, replace=False).astype(np.int32),
                           rng.integers(0, n, 500).astype(np.int32)])
    vals = rng.random(700).astype(np.float32) + 0.5
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    a.sum_duplicates()
    coo = a.tocoo()
    fmt = build_s_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data.astype(np.float32), cw=1024,
    )
    x = rng.random(n, dtype=np.float32)
    r = np.asarray(
        s_cell_spmv_apply(
            fmt, jnp.asarray(x),
            op_mul=lambda av, xv: av * xv, op_add=jnp.add, identity=0.0,
        )
    )
    np.testing.assert_allclose(r, a @ x, rtol=1e-4, atol=1e-4)


@slow
def test_s_cell_spmv_skip_inactive():
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import build_s_cell_spmv_arrays, s_cell_spmv_apply

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    n = 2048
    a = sp.random(n, n, density=0.004, random_state=5, dtype=np.float32)
    coo = a.tocoo()
    fmt = build_s_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32), coo.data,
        cw=1024,
    )
    x = np.zeros(n, np.float32)
    x[37] = 2.0  # single-entry frontier: most windows inactive
    r = np.asarray(
        s_cell_spmv_apply(
            fmt, jnp.asarray(x),
            op_mul=lambda av, xv: av * xv, op_add=jnp.add, identity=0.0,
            skip_inactive=True,
        )
    )
    np.testing.assert_allclose(r, a @ x, rtol=1e-5, atol=1e-6)


def test_pallas_mxmt_reduce_vs_dense():
    # mask-parallel intersection kernel vs dense oracle
    from spla_tpu.pallas.mxmt import pairs_available, pallas_mxmT_reduce

    if not pairs_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(21)
    n = 300
    a = sp.random(n, n, density=0.05, random_state=21, dtype=np.float32)
    a = a.tocsr(); a.sort_indices()
    b = sp.random(n, n, density=0.06, random_state=22, dtype=np.float32)
    b = b.tocsr(); b.sort_indices()
    mask = sp.random(n, n, density=0.04, random_state=23, dtype=np.float32)
    mcoo = mask.tocoo()
    r = pallas_mxmT_reduce(
        mcoo.row.astype(np.int32), mcoo.col.astype(np.int32),
        a.indptr.astype(np.int32), a.indices.astype(np.int32),
        a.data.astype(np.float32),
        b.indptr.astype(np.int32), b.indices.astype(np.int32),
        b.data.astype(np.float32),
    )
    dense = (a.toarray() @ b.toarray().T)
    want = float(dense[mcoo.row, mcoo.col].sum())
    np.testing.assert_allclose(r, want, rtol=1e-4)


def test_pallas_mxmt_reduce_triangles():
    # exact triangle counts vs the sequential oracle
    from spla_tpu.algorithms import tc_naive
    from spla_tpu.pallas.mxmt import pairs_available, pallas_mxmT_reduce

    if not pairs_available():
        pytest.skip("no native toolchain")
    n = 400
    g = sp.random(n, n, density=0.03, random_state=31, dtype=np.float32)
    g = ((g + g.T) > 0).astype(np.float32)
    g.setdiag(0)
    g.eliminate_zeros()
    g = g.tocsr(); g.sort_indices()
    coo = g.tocoo()
    ones = np.ones_like(g.data, np.float32)
    r = pallas_mxmT_reduce(
        coo.row.astype(np.int32), coo.col.astype(np.int32),
        g.indptr.astype(np.int32), g.indices.astype(np.int32), ones,
        g.indptr.astype(np.int32), g.indices.astype(np.int32), ones,
    )
    adj = [list(g.indices[g.indptr[i]:g.indptr[i + 1]]) for i in range(n)]
    assert int(round(r)) == tc_naive(adj)


def test_pallas_mxmt_heavy_rows():
    # rows much longer than the chunk size K=8 exercise the staircase
    from spla_tpu.pallas.mxmt import pairs_available, pallas_mxmT_reduce

    if not pairs_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(41)
    n = 200
    d = (rng.random((n, n)) < 0.4).astype(np.float32)  # deg ~80 >> 8
    a = sp.csr_matrix(d)
    a.sort_indices()
    mcoo = sp.csr_matrix(d).tocoo()
    r = pallas_mxmT_reduce(
        mcoo.row.astype(np.int32), mcoo.col.astype(np.int32),
        a.indptr.astype(np.int32), a.indices.astype(np.int32),
        a.data.astype(np.float32),
        a.indptr.astype(np.int32), a.indices.astype(np.int32),
        a.data.astype(np.float32),
    )
    dd = d @ d.T
    want = float(dd[mcoo.row, mcoo.col].sum())
    np.testing.assert_allclose(r, want, rtol=1e-4)


def test_pallas_mxmt_job_partials_segments():
    from spla_tpu.pallas.mxmt import pairs_available, pallas_mxmT_job_partials

    if not pairs_available():
        pytest.skip("no native toolchain")
    n = 150
    a = sp.random(n, n, density=0.08, random_state=51, dtype=np.float32)
    a = a.tocsr(); a.sort_indices()
    mcoo = sp.random(n, n, density=0.05, random_state=52).tocoo()
    out = pallas_mxmT_job_partials(
        mcoo.row.astype(np.int32), mcoo.col.astype(np.int32),
        a.indptr.astype(np.int32), a.indices.astype(np.int32),
        a.data.astype(np.float32),
        a.indptr.astype(np.int32), a.indices.astype(np.int32),
        a.data.astype(np.float32),
    )
    partials, seg, njr = out
    r_vals = np.zeros(mcoo.nnz, np.float64)
    np.add.at(r_vals, seg[:njr], np.asarray(partials)[:njr])
    dense = a.toarray() @ a.toarray().T
    want = dense[mcoo.row, mcoo.col]
    np.testing.assert_allclose(r_vals, want, rtol=1e-4, atol=1e-5)


# -- fused routeless kernel (round-2 redesign) ------------------------------


def _fused_fmt(a, cw=1024):
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import build_fused_cell_spmv_arrays

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    coo = a.tocoo()
    return build_fused_cell_spmv_arrays(
        a.shape[0], a.shape[1], coo.row.astype(np.int32),
        coo.col.astype(np.int32), coo.data.astype(np.float32), cw=cw,
    )


def test_fused_cell_spmv_plus_times():
    from spla_tpu.pallas.spmv import fused_cell_spmv_apply

    rng = np.random.default_rng(21)
    n = 900
    a = sp.random(n, n, density=0.02, random_state=21, dtype=np.float32)
    fmt = _fused_fmt(a)
    assert fmt is not None and fmt.n_tiles % 16 == 0
    x = rng.random(n, dtype=np.float32)
    r = np.asarray(
        fused_cell_spmv_apply(
            fmt, jnp.asarray(x),
            op_mul=lambda av, xv: av * xv, op_add=jnp.add, identity=0.0,
        )
    )
    np.testing.assert_allclose(r, a @ x, rtol=1e-5, atol=1e-5)


def test_fused_cell_spmv_minplus_inf_fill():
    from spla_tpu.pallas.spmv import fused_cell_spmv_apply

    rng = np.random.default_rng(22)
    n = 700
    a = sp.random(n, n, density=0.03, random_state=22, dtype=np.float32)
    a.data = (a.data * 5 + 0.1).astype(np.float32)
    fmt = _fused_fmt(a)
    x = rng.random(n, dtype=np.float32) * 3
    r = np.asarray(
        fused_cell_spmv_apply(
            fmt, jnp.asarray(x),
            op_mul=lambda av, xv: av + xv, op_add=jnp.minimum,
            identity=np.inf,
        )
    )
    d = a.toarray()
    ref = np.where(
        (d != 0).any(axis=1),
        np.where(d != 0, d + x[None, :], np.inf).min(axis=1),
        np.inf,
    )
    np.testing.assert_allclose(r, ref, rtol=1e-5, atol=1e-5)


@slow
def test_fused_cell_spmv_heavy_rows_and_window_pad():
    # a few rows with hundreds of same-window entries exercise the
    # one-entry-per-row-per-tile constraint; n not a multiple of cw
    # exercises the identity padding of the last window
    from spla_tpu.pallas.spmv import fused_cell_spmv_apply

    rng = np.random.default_rng(23)
    n = 2100
    rows = np.concatenate([
        np.full(400, 7, np.int32),
        np.full(300, 1900, np.int32),
        rng.integers(0, n, 3000).astype(np.int32),
    ])
    cols = rng.integers(0, n, rows.size).astype(np.int32)
    key = rows.astype(np.int64) * n + cols
    _, keep = np.unique(key, return_index=True)
    rows, cols = rows[keep], cols[keep]
    vals = rng.random(rows.size, dtype=np.float32)
    a = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    fmt = _fused_fmt(a)
    x = rng.random(n, dtype=np.float32)
    from spla_tpu.pallas.spmv import fused_cell_spmv_apply as ap
    r = np.asarray(ap(fmt, jnp.asarray(x), op_mul=lambda av, xv: av * xv,
                      op_add=jnp.add, identity=0.0))
    np.testing.assert_allclose(r, a @ x, rtol=1e-5, atol=1e-5)


@slow
def test_fused_cell_spmv_skip_inactive():
    from spla_tpu.pallas.spmv import fused_cell_spmv_apply

    rng = np.random.default_rng(24)
    n = 3000
    a = sp.random(n, n, density=0.01, random_state=24, dtype=np.float32)
    fmt = _fused_fmt(a)
    x = np.zeros(n, np.float32)
    x[:700] = rng.random(700, dtype=np.float32)  # only window 0 active
    r = np.asarray(
        fused_cell_spmv_apply(
            fmt, jnp.asarray(x),
            op_mul=lambda av, xv: av * xv, op_add=jnp.add, identity=0.0,
            skip_inactive=True,
        )
    )
    np.testing.assert_allclose(r, a @ x, rtol=1e-5, atol=1e-5)


def test_best_monoid_format_prefers_fused():
    from spla_tpu import formats as F2
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import FusedCellSpmv, get_best_monoid_format

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    a = sp.random(600, 600, density=0.02, random_state=25, dtype=np.float32)
    A = F2.csr_from_scipy(a)
    fmt, ap = get_best_monoid_format(A)
    assert isinstance(fmt, FusedCellSpmv)


def test_fused_pattern_layout_structural():
    # layout 3: value rows elided; traversal over the pattern
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (
        build_fused_cell_spmv_arrays, fused_cell_spmv_apply,
        fused_cell_spmv_apply_adaptive)

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(41)
    n = 1500
    a = sp.random(n, n, density=0.01, random_state=41, dtype=np.float32)
    coo = a.tocoo()
    fmt = build_fused_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        np.ones_like(coo.data), cw=1024, pattern=True)
    assert fmt is not None and fmt.layout == 5  # pattern PAIR layout
    fmt3 = build_fused_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        np.ones_like(coo.data), cw=1024, pattern=True, paired=False)
    assert fmt3 is not None and fmt3.layout == 3
    front = (rng.random(n) < 0.05).astype(np.float32)
    hits = np.asarray(fused_cell_spmv_apply(
        fmt, jnp.asarray(front), op_mul=lambda av, xv: xv,
        op_add=jnp.maximum, identity=0.0))
    ref = ((a.tocsr() @ front) > 0).astype(np.float32)
    np.testing.assert_array_equal(hits > 0, ref > 0)
    # sparse-frontier adaptive path on the pattern layout
    front2 = np.zeros(n, np.float32)
    front2[7] = 1.0
    hits2 = np.asarray(fused_cell_spmv_apply_adaptive(
        fmt, jnp.asarray(front2), op_mul=lambda av, xv: xv,
        op_add=jnp.maximum, identity=0.0, front_factor=jnp.float32(1.0)))
    ref2 = ((a.tocsr() @ front2) > 0).astype(np.float32)
    np.testing.assert_array_equal(hits2 > 0, ref2 > 0)


@slow
def test_bfs_sssp_pallas_2d_loops_vs_oracle():
    # the TPU-path level loops (2D-layout state + adaptive kernel) are
    # gated on platform in bfs()/sssp(); drive the kernels directly in
    # interpret mode against scipy oracles
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import build_fused_cell_spmv_arrays
    from spla_tpu.algorithms import _bfs_kernel_pallas, _sssp_kernel_pallas

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(77)
    n = 900
    r = rng.integers(0, n, 2500).astype(np.int32)
    c = rng.integers(0, n, 2500).astype(np.int32)
    keep = r != c
    a = sp.coo_matrix((rng.uniform(0.1, 2.0, keep.sum()).astype(np.float32),
                       (r[keep], c[keep])), shape=(n, n))
    a = a.maximum(a.T).tocsr()
    a.sum_duplicates()
    coo = a.tocoo()
    fmt_pat = build_fused_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        np.ones(coo.nnz, np.float32), cw=1024, pattern=True)
    lev = np.asarray(_bfs_kernel_pallas(fmt_pat, jnp.int32(0)))
    import scipy.sparse.csgraph as cg
    ref = cg.shortest_path(a, method="D", unweighted=True, indices=0)
    finite = np.isfinite(ref)
    assert np.all(lev[finite] == ref[finite] + 1)
    assert np.all(lev[~finite] == 0)

    fmt_w = build_fused_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data, cw=1024)
    dist = np.asarray(_sssp_kernel_pallas(fmt_w, jnp.int32(0)))
    refd = cg.dijkstra(a, indices=0)
    np.testing.assert_allclose(dist[finite], refd[finite], rtol=1e-5)
    assert np.all(np.isinf(dist[~finite]))


@slow
def test_fused_pair_layouts_match_flat():
    # layouts 4/5 (pair-shared S-table) vs layout 1/3 and scipy, incl. a
    # MIN monoid and the sparse-frontier adaptive path
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (
        build_fused_cell_spmv_arrays, fused_cell_spmv_apply,
        fused_cell_spmv_apply_adaptive)

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    m, n = 2300, 1700
    a = sp.random(m, n, density=0.02, random_state=7, dtype=np.float32)
    coo = a.tocoo()
    rows = coo.row.astype(np.int32)
    cols = coo.col.astype(np.int32)
    x = rng.random(n, dtype=np.float32)
    f4 = build_fused_cell_spmv_arrays(m, n, rows, cols, coo.data, cw=1024,
                                      paired=True)
    f1 = build_fused_cell_spmv_arrays(m, n, rows, cols, coo.data, cw=1024,
                                      paired=False)
    assert f4.layout == 4 and f1.layout == 1
    out4 = np.asarray(fused_cell_spmv_apply(
        f4, jnp.asarray(x), op_mul=lambda a_, b_: a_ * b_, op_add=jnp.add,
        identity=0.0))
    ref = a.tocsr() @ x
    np.testing.assert_allclose(out4, ref, rtol=2e-5, atol=2e-5)
    # MIN-plus semiring (SSSP step semantics)
    inf = np.float32(3.0e38)
    xp = rng.random(n, dtype=np.float32)
    o_min4 = np.asarray(fused_cell_spmv_apply(
        f4, jnp.asarray(xp), op_mul=lambda a_, b_: a_ + b_,
        op_add=jnp.minimum, identity=inf))
    o_min1 = np.asarray(fused_cell_spmv_apply(
        f1, jnp.asarray(xp), op_mul=lambda a_, b_: a_ + b_,
        op_add=jnp.minimum, identity=inf))
    np.testing.assert_array_equal(o_min4, o_min1)  # same reduce: bitwise
    # sparse adaptive path, single-vertex frontier
    x2 = np.zeros(n, np.float32)
    x2[13] = 1.0
    h4 = np.asarray(fused_cell_spmv_apply_adaptive(
        f4, jnp.asarray(x2), op_mul=lambda a_, b_: b_, op_add=jnp.maximum,
        identity=0.0, front_factor=jnp.float32(1.0)))
    ref2 = ((a.tocsr() @ x2) != 0).astype(np.float32)
    np.testing.assert_array_equal(h4 > 0, ref2 > 0)


def test_pair_pack_invariants_roundtrip():
    # unpack the PAIR layout word-by-word and recover the exact COO
    # multiset — pins the packer's bit surgery (including the depth-1
    # repair relocations: erase + re-emit must leave no stale words)
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import build_fused_cell_spmv_arrays

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    m, n, nnz = 2100, 1900, 24000
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    # force duplicate (row, col) coordinates: exercises the per-pair
    # (g, l) claim and the repair's claim transfers
    rows[:300] = rows[300:600]
    cols[:300] = cols[300:600]
    vals = rng.random(nnz, dtype=np.float32) + 0.5
    cw = 1024
    fmt = build_fused_cell_spmv_arrays(m, n, rows, cols, vals, cw=cw,
                                       paired=True)
    assert fmt.layout == 4
    f = np.asarray(fmt.fused)  # [pairs, 40, 128] int32
    rb = np.asarray(fmt.rb_of_tile)
    wb = np.asarray(fmt.wb_of_batch)
    from spla_tpu.pallas.spmv import FUSED_K
    got = []
    for pid in range(f.shape[0]):
        blk = f[pid]
        w_of = wb[(2 * pid) // FUSED_K]
        for g in range(128):
            sw = blk[24 + (g >> 3)]
            code = (sw >> (4 * (g & 7))) & 0xF
            for l in np.nonzero(code != 0xF)[0]:
                c = int(code[l])
                h, sub = c >> 3, c & 7
                ho = h * 12
                lane = (blk[ho + 10 + (sub >> 2), l] >> (8 * (sub & 3))) & 0xFF
                wbyte = (blk[ho + 8 + (sub >> 2), lane] >> (8 * (sub & 3))) & 0xFF
                assert wbyte & 0x80, "stab points at an invalid slot"
                col = int(w_of) * cw + (wbyte & 0x7F) * 128 + int(lane)
                row = int(rb[2 * pid + h]) * 16384 + g * 128 + int(l)
                val = np.int32(blk[ho + sub, lane]).view(np.float32)
                got.append((row, col, float(val)))
    assert len(got) == nnz
    want = sorted(zip(rows.tolist(), cols.tolist(),
                      [float(v) for v in vals]))
    assert sorted(got) == want


@slow
def test_resident_traversal_kernels_vs_oracle():
    # the fully-resident whole-traversal kernels (BFS pattern pairs,
    # SSSP value pairs) must trigger for VMEM-sized graphs and match
    # the scipy oracles exactly (reference semantics:
    # src/algorithm.cpp:86-117 BFS, :158-229 SSSP feedback)
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (build_fused_cell_spmv_arrays,
                                      bfs_resident, sssp_resident)

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    import scipy.sparse.csgraph as cg

    rng = np.random.default_rng(123)
    n = 700
    r = rng.integers(0, n, 2000).astype(np.int32)
    c = rng.integers(0, n, 2000).astype(np.int32)
    keep = r != c
    a = sp.coo_matrix((rng.uniform(0.1, 2.0, keep.sum()).astype(np.float32),
                       (r[keep], c[keep])), shape=(n, n))
    a = a.maximum(a.T).tocsr()
    a.sum_duplicates()
    coo = a.tocoo()

    fmt_p = build_fused_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        np.ones(coo.nnz, np.float32), cw=1024, pattern=True)
    v = bfs_resident(fmt_p, jnp.int32(0))
    assert v is not None, "resident gate must pass for a VMEM-sized graph"
    lev = np.asarray(v).reshape(-1)[:n]
    ref = cg.shortest_path(a, method="D", unweighted=True, indices=0)
    finite = np.isfinite(ref)
    assert np.all(lev[finite] == ref[finite] + 1)
    assert np.all(lev[~finite] == 0)

    fmt_w = build_fused_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data, cw=1024)
    d = sssp_resident(fmt_w, jnp.int32(0))
    assert d is not None
    dist = np.asarray(d).reshape(-1)[:n]
    refd = cg.dijkstra(a, indices=0)
    np.testing.assert_allclose(dist[finite], refd[finite], rtol=1e-5)
    assert np.all(np.isinf(dist[~finite]))


@slow
def test_resident_multiword_activity_bitmask():
    # > 24 windows forces multiple packed activity words (bit indexing
    # across word boundaries in the resident kernels' carry)
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (build_fused_cell_spmv_arrays,
                                      bfs_resident)

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    import scipy.sparse.csgraph as cg

    rng = np.random.default_rng(42)
    n = 20000  # 2 row blocks -> R=256, cw=1024 -> 32 windows = 2 words
    r = rng.integers(0, n, 30000).astype(np.int32)
    c = rng.integers(0, n, 30000).astype(np.int32)
    keep = r != c
    a = sp.coo_matrix((np.ones(int(keep.sum()), np.float32),
                       (r[keep], c[keep])), shape=(n, n))
    a = a.maximum(a.T).tocsr()
    a.sum_duplicates()
    coo = a.tocoo()
    fmt = build_fused_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        np.ones(coo.nnz, np.float32), cw=1024, pattern=True)
    v = bfs_resident(fmt, jnp.int32(17))
    assert v is not None
    cwr = fmt.cw // 128
    assert (fmt.n_row_blocks * 128) // cwr > 24  # really multi-word
    lev = np.asarray(v).reshape(-1)[:n]
    ref = cg.shortest_path(a, method="D", unweighted=True, indices=17)
    finite = np.isfinite(ref)
    assert np.all(lev[finite] == ref[finite] + 1)
    assert np.all(lev[~finite] == 0)


@slow
def test_streaming_level_update_vs_oracle(monkeypatch):
    # force the chunked/streaming level-update grid variant (normally
    # only for > BFS_UPDATE_MAX_RB row blocks, i.e. > 4.2M vertices) on
    # a small graph: multi-step count accumulation + row masking
    from spla_tpu.pallas import spmv as SP
    from spla_tpu.algorithms import _bfs_kernel_pallas, _sssp_kernel_pallas

    if SP.get_cell_format is None or __import__(
            "spla_tpu.pallas.cellpack_native",
            fromlist=["_native_lib"])._native_lib() is None:
        pytest.skip("no native toolchain")
    monkeypatch.setattr(SP, "RESIDENT_VMEM", 0)  # defeat resident gate
    monkeypatch.setattr(SP, "BFS_UPDATE_MAX_RB", 0)
    monkeypatch.setattr(SP, "LEVEL_UPDATE_CHUNK", 128)

    import scipy.sparse.csgraph as cg

    rng = np.random.default_rng(31)
    n = 21000  # R = 256 rows -> 2 streaming chunks of 128
    r = rng.integers(0, n, 32000).astype(np.int32)
    c = rng.integers(0, n, 32000).astype(np.int32)
    keep = r != c
    a = sp.coo_matrix((rng.uniform(0.1, 2.0, int(keep.sum())).astype(
        np.float32), (r[keep], c[keep])), shape=(n, n))
    a = a.maximum(a.T).tocsr()
    a.sum_duplicates()
    coo = a.tocoo()
    fmt_p = SP.build_fused_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        np.ones(coo.nnz, np.float32), cw=1024, pattern=True)
    lev = np.asarray(_bfs_kernel_pallas(fmt_p, jnp.int32(3)))
    ref = cg.shortest_path(a, method="D", unweighted=True, indices=3)
    finite = np.isfinite(ref)
    assert np.all(lev[finite] == ref[finite] + 1)
    assert np.all(lev[~finite] == 0)

    fmt_w = SP.build_fused_cell_spmv_arrays(
        n, n, coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data, cw=1024)
    dist = np.asarray(_sssp_kernel_pallas(fmt_w, jnp.int32(3)))
    refd = cg.dijkstra(a, indices=3)
    np.testing.assert_allclose(dist[finite], refd[finite], rtol=1e-5)
    assert np.all(np.isinf(dist[~finite]))


@slow
def test_oct_pack_invariants_roundtrip():
    # unpack the OCT layout (packer mode 6: eight tiles share one 6-bit
    # S-table stored as nibbles + two bit planes) word-by-word and
    # recover the exact COO multiset
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import build_fused_cell_spmv_arrays

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(13)
    m, n, nnz = 2100, 1900, 24000
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    rows[:300] = rows[300:600]
    cols[:300] = cols[300:600]
    vals = rng.random(nnz, dtype=np.float32) + 0.5
    cw = 1024
    fmt = build_fused_cell_spmv_arrays(m, n, rows, cols, vals, cw=cw,
                                       oct=True)
    assert fmt.layout == 6
    f = np.asarray(fmt.fused)  # [octs, 120, 128] int32
    rb = np.asarray(fmt.rb_of_tile)
    wb = np.asarray(fmt.wb_of_batch)
    from spla_tpu.pallas.spmv import FUSED_K
    got = []
    for pid in range(f.shape[0]):
        blk = f[pid]
        w_of = wb[(8 * pid) // FUSED_K]
        for g in range(128):
            nib = (blk[96 + (g >> 3)] >> (4 * (g & 7))) & 0xF
            b4 = (blk[112 + (g >> 5)] >> (g & 31)) & 1
            b5 = (blk[116 + (g >> 5)] >> (g & 31)) & 1
            code = nib | (b4 << 4) | (b5 << 5)
            for l in np.nonzero(code != 63)[0]:
                c = int(code[l])
                h, sub = c >> 3, c & 7
                ho = h * 12
                lane = (blk[ho + 10 + (sub >> 2), l] >> (8 * (sub & 3))) & 0xFF
                wbyte = (blk[ho + 8 + (sub >> 2), lane] >> (8 * (sub & 3))) & 0xFF
                assert wbyte & 0x80, "S-table points at an invalid slot"
                col = int(w_of) * cw + (wbyte & 0x7F) * 128 + int(lane)
                row = int(rb[8 * pid + h]) * 16384 + g * 128 + int(l)
                val = np.int32(blk[ho + sub, lane]).view(np.float32)
                got.append((row, col, float(val)))
    assert len(got) == nnz
    want = sorted(zip(rows.tolist(), cols.tolist(),
                      [float(v) for v in vals]))
    assert sorted(got) == want


@pytest.mark.parametrize("pattern", [False, True])
def test_oct_layout_spmv_vs_oracle(pattern):
    # kernel layouts 6 (valued oct) / 7 (pattern oct) against the dense
    # oracle, PLUS and MIN monoids
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (build_fused_cell_spmv_arrays,
                                      fused_cell_spmv_apply)

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    m, n, nnz = 40000, 30000, 300000
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.random(nnz, dtype=np.float32) + 0.5
    x = rng.random(n, dtype=np.float32) + 0.5
    fmt = build_fused_cell_spmv_arrays(m, n, rows, cols, vals, cw=2048,
                                       pattern=pattern, oct=True)
    assert fmt.layout == (7 if pattern else 6)
    ev = np.ones_like(vals) if pattern else vals
    out = np.asarray(fused_cell_spmv_apply(
        fmt, jnp.asarray(x), op_mul=lambda a, b: a * b, op_add=jnp.add,
        identity=0.0))
    ref = np.zeros(m, np.float32)
    np.add.at(ref, rows, ev * x[cols])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    outm = np.asarray(fused_cell_spmv_apply(
        fmt, jnp.asarray(x), op_mul=lambda a, b: a + b,
        op_add=jnp.minimum, identity=np.inf))
    refm = np.full(m, np.inf, np.float32)
    np.minimum.at(refm, rows, ev + x[cols])
    assert np.array_equal(outm, refm)


def test_wide_pair_layout_spmv_vs_oracle():
    # WIDE pair layouts (packer mode 7, cw = 32768: 8-bit w byte, no
    # valid flag) against the dense oracle, PLUS and MIN monoids,
    # valued and pattern variants
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (build_fused_cell_spmv_arrays,
                                      fused_cell_spmv_apply)

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(17)
    m, n, nnz = 50000, 70000, 400000
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    rows[:200] = rows[200:400]  # duplicate coordinates
    cols[:200] = cols[200:400]
    vals = rng.random(nnz, dtype=np.float32) + 0.5
    x = rng.random(n, dtype=np.float32) + 0.5
    for pattern in (False, True):
        fmt = build_fused_cell_spmv_arrays(m, n, rows, cols, vals,
                                           cw=32768, pattern=pattern)
        assert fmt.layout == (9 if pattern else 8)
        ev = np.ones_like(vals) if pattern else vals
        out = np.asarray(fused_cell_spmv_apply(
            fmt, jnp.asarray(x), op_mul=lambda a, b: a * b,
            op_add=jnp.add, identity=0.0))
        ref = np.zeros(m, np.float32)
        np.add.at(ref, rows, ev * x[cols])
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
        outm = np.asarray(fused_cell_spmv_apply(
            fmt, jnp.asarray(x), op_mul=lambda a, b: a + b,
            op_add=jnp.minimum, identity=np.inf))
        refm = np.full(m, np.inf, np.float32)
        np.minimum.at(refm, rows, ev + x[cols])
        assert np.array_equal(outm, refm)


def test_auto_cw_policy():
    from spla_tpu.pallas.spmv import _auto_cw

    # small graph (resident-eligible): narrow regardless of density
    assert _auto_cw(1 << 20, 1 << 20, (1 << 20) * 3, False) == 16384
    # big sparse graph: wide
    assert _auto_cw(1 << 23, 1 << 23, (1 << 23) * 4, False) == 32768
    # big dense graph (cells >= 1024 entries): narrow
    assert _auto_cw(1 << 21, 1 << 21, (1 << 21) * 16, False) == 16384


@slow
def test_manual_dma_apply_matches_pipelined():
    # the manual double-buffered kernel (fused array in HBM, explicit
    # async copies) must match the pipelined grid kernel bitwise, for
    # both narrow and wide pair layouts
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (build_fused_cell_spmv_arrays,
                                      fused_cell_spmv_apply,
                                      fused_cell_spmv_apply_manual)

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(23)
    # small sizes: this runs the manual kernel's emulated DMAs in
    # interpret mode, which is ~10^4x slower than hardware — the
    # round-2 sizes (40000/300000) took tens of minutes on the 1-core CI
    m, n, nnz = 16384, 40000, 60000
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.random(nnz, dtype=np.float32) + 0.5
    x = jnp.asarray(rng.random(n, dtype=np.float32))
    for cw in (16384, 32768):
        fmt = build_fused_cell_spmv_arrays(m, n, rows, cols, vals, cw=cw)
        a = np.asarray(fused_cell_spmv_apply(
            fmt, x, op_mul=lambda u, v: u * v, op_add=jnp.add,
            identity=0.0))
        b = np.asarray(fused_cell_spmv_apply_manual(
            fmt, x, op_mul=lambda u, v: u * v, op_add=jnp.add,
            identity=0.0))
        assert np.array_equal(a, b)
        am = np.asarray(fused_cell_spmv_apply(
            fmt, x, op_mul=lambda u, v: u + v, op_add=jnp.minimum,
            identity=np.inf))
        bm = np.asarray(fused_cell_spmv_apply_manual(
            fmt, x, op_mul=lambda u, v: u + v, op_add=jnp.minimum,
            identity=np.inf))
        assert np.array_equal(am, bm)


def test_fused_bf16a_layouts_vs_rounded_oracle():
    # layouts 10/11 (bf16-A values merged into one 8-row block): must
    # match scipy with the SAME round-to-nearest-even applied to the
    # values; x / products / accumulation stay f32
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import (
        build_fused_cell_spmv_arrays, fused_cell_spmv_apply)

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(13)
    m, n = 2100, 1900
    a = sp.random(m, n, density=0.02, random_state=13, dtype=np.float32)
    coo = a.tocoo()
    rows = coo.row.astype(np.int32)
    cols = coo.col.astype(np.int32)
    x = (rng.random(n, dtype=np.float32) + 0.25).astype(np.float32)

    u = coo.data.view(np.uint32)
    rounded = (((u + np.uint32(0x7FFF) + ((u >> 16) & 1))
                & np.uint32(0xFFFF0000)).view(np.float32))
    ref = sp.csr_matrix((rounded, (rows, cols)), shape=(m, n)) @ x

    for cw, want_layout in ((1024, 10), (32768, 11)):
        fmt = build_fused_cell_spmv_arrays(
            m, n, rows, cols, coo.data, cw=cw, values_bf16=True)
        assert fmt is not None and fmt.layout == want_layout
        out = np.asarray(fused_cell_spmv_apply(
            fmt, jnp.asarray(x), op_mul=lambda a_, b_: a_ * b_,
            op_add=jnp.add, identity=0.0))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # min-plus over bf16-rounded weights (SSSP-class semiring)
    inf = np.float32(3.0e38)
    fmt = build_fused_cell_spmv_arrays(
        m, n, rows, cols, coo.data, cw=1024, values_bf16=True)
    o = np.asarray(fused_cell_spmv_apply(
        fmt, jnp.asarray(x), op_mul=lambda a_, b_: a_ + b_,
        op_add=jnp.minimum, identity=inf))
    A = sp.csr_matrix((rounded, (rows, cols)), shape=(m, n))
    refm = np.full(m, inf, np.float32)
    Ac = A.tocoo()
    np.minimum.at(refm, Ac.row, Ac.data.astype(np.float32) + x[Ac.col])
    got_rows = np.unique(Ac.row)
    np.testing.assert_allclose(o[got_rows], refm[got_rows], rtol=1e-6)

    # misuse guards
    with pytest.raises(ValueError):
        build_fused_cell_spmv_arrays(m, n, rows, cols, coo.data,
                                     cw=1024, pattern=True,
                                     values_bf16=True)


def test_split_hub_columns_invariants():
    """Host-side hub-split invariants (fast; kernel-level correctness of
    alias formats is covered by the @slow test below and the hw lane)."""
    from spla_tpu.pallas.spmv import _split_hub_columns

    rng = np.random.default_rng(0)
    n = 500
    cols = np.concatenate([
        np.full(300, 7, np.int32),  # hub
        rng.integers(0, n, 400).astype(np.int32),
    ])
    new_cols, n_ext, alias_src = _split_hub_columns(cols, n, 64)
    assert n_ext > n and alias_src is not None
    assert n_ext - n == alias_src.shape[0]
    # every alias maps back to a real column; clone loads near-even
    assert np.all((alias_src >= 0) & (alias_src < n))
    deg_ext = np.bincount(new_cols, minlength=n_ext)
    assert deg_ext.max() <= 64
    # per-source totals preserved
    src_of = np.concatenate([np.arange(n), alias_src])
    total = np.bincount(src_of[new_cols], minlength=n)
    np.testing.assert_array_equal(total, np.bincount(cols, minlength=n))
    # light columns untouched
    light = np.setdiff1d(np.arange(n), [7])
    np.testing.assert_array_equal(
        np.bincount(cols, minlength=n)[light], total[light]
    )


@slow
def test_fused_hub_split_reorder_matches_scipy():
    """Alias formats (row+col hub split + relabeling) produce exact
    results through fused_cell_spmv_apply with alias_combine."""
    from spla_tpu.pallas.spmv import (
        build_fused_cell_spmv_arrays, fused_cell_spmv_apply)

    rng = np.random.default_rng(1)
    m = n = 400
    rows = np.concatenate([np.full(600, 5, np.int32),
                           rng.integers(0, m, 700).astype(np.int32)])
    cols = np.concatenate([rng.integers(0, n, 600).astype(np.int32),
                           np.full(700, 9, np.int32)])
    vals = rng.random(rows.size).astype(np.float32)
    srt = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[srt], cols[srt], vals[srt]
    fmt = build_fused_cell_spmv_arrays(m, n, rows, cols, vals,
                                       split_hubs=64, reorder=True)
    assert fmt.alias_src is not None and fmt.row_alias_src is not None
    x = rng.random(n).astype(np.float32)
    ref = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)) @ x
    r = np.asarray(fused_cell_spmv_apply(
        fmt, jnp.asarray(x), op_mul=lambda a, b: a * b, op_add=jnp.add,
        identity=0.0, alias_combine="add"))
    np.testing.assert_allclose(r, ref, rtol=1e-5, atol=1e-5)


def test_int_native_format_builds():
    """values_int packs int32 bit patterns verbatim (host-side check;
    kernel exactness past 2^24 runs in the hw lane / @slow)."""
    from spla_tpu.pallas.spmv import build_fused_cell_spmv_arrays

    rng = np.random.default_rng(2)
    m = n = 300
    rows = np.sort(rng.integers(0, m, 900)).astype(np.int32)
    cols = rng.integers(0, n, 900).astype(np.int32)
    vals = rng.integers(1, 1 << 30, 900).astype(np.int32)
    fmt = build_fused_cell_spmv_arrays(m, n, rows, cols, vals,
                                       values_int=True)
    if fmt is None:
        pytest.skip("no native packer")
    assert fmt.vdtype == "i32"


def test_split_hub_columns_fuzz():
    """Property fuzz of the splitter across degree shapes (host-only):
    mass conservation per source, degree bound, id-space bijection."""
    from spla_tpu.pallas.spmv import _split_hub_columns

    rng = np.random.default_rng(9)
    cases = [
        rng.integers(0, 50, 2000),                      # uniform-ish
        np.repeat(np.arange(40), rng.integers(1, 400, 40)),  # clustered
        np.full(777, 3),                                # single mega hub
        np.concatenate([np.zeros(1, int), rng.integers(0, 9, 64)]),
        rng.integers(0, 5, 1),                          # single entry
    ]
    for k, base in enumerate(cases):
        cols = np.asarray(base, np.int64)
        n = int(cols.max()) + 1 + int(rng.integers(0, 5))
        for thresh in (8, 32, 301):
            new_cols, n_ext, alias_src = _split_hub_columns(cols, n, thresh)
            if alias_src is None:
                assert n_ext == n
                np.testing.assert_array_equal(new_cols, cols)
                continue
            assert n_ext == n + alias_src.shape[0]
            assert new_cols.min() >= 0 and new_cols.max() < n_ext
            deg_ext = np.bincount(new_cols, minlength=n_ext)
            assert deg_ext.max() <= thresh, (k, thresh)
            src_of = np.concatenate(
                [np.arange(n), np.asarray(alias_src)])
            total = np.bincount(src_of[new_cols], minlength=n)
            np.testing.assert_array_equal(
                total, np.bincount(cols, minlength=n), err_msg=str((k, thresh))
            )


def _skewed_csr(m=1024, seed=11):
    """Small matrix that trips ``is_skewed`` (hub row + hub column);
    kept tiny — these run the alias-fold kernels in interpret mode."""
    rng = np.random.default_rng(seed)
    rows = np.concatenate([np.full(400, 17, np.int32),
                           rng.integers(0, m, 900).astype(np.int32)])
    cols = np.concatenate([rng.integers(0, m, 400).astype(np.int32),
                           np.full(900, 23, np.int32)])
    vals = rng.random(rows.size).astype(np.float32)
    a = sp.coo_matrix((vals, (rows, cols)), shape=(m, m)).tocsr()
    a.sum_duplicates()
    return a


def test_pack_budget_abort_on_skewed_unsplit():
    """r4 verdict item 2: an UNSPLIT pack of a hub graph aborts from the
    degree-histogram padding estimate in well under a second — no call
    path may silently burn minutes of host packing (the r3 catastrophic
    case: pad 216 / 489 s).  Reference analog: the dispatcher never picks
    a registration that cannot run well (dispatcher.cpp:42-85)."""
    import time

    from spla_tpu.pallas import spmv as P

    rng = np.random.default_rng(3)
    m = n = 20000
    rows = np.concatenate([np.full(15000, 17, np.int32),
                           rng.integers(0, m, 5000).astype(np.int32)])
    cols = np.concatenate([rng.integers(0, n, 15000).astype(np.int32),
                           np.full(5000, 23, np.int32)])
    vals = np.ones(rows.size, np.float32)
    srt = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[srt], cols[srt], vals[srt]
    t0 = time.perf_counter()
    fmt = P.build_fused_cell_spmv_arrays(m, n, rows, cols, vals)
    dt = time.perf_counter() - t0
    assert fmt is None
    assert dt < 1.0, f"budget abort took {dt:.2f}s"
    assert P.LAST_BUILD_PROFILE.get("pack_abort_est_pad", 0) > 24
    # the estimator skips (returns 1.0 fast) on uniform degree profiles
    ur = np.sort(rng.integers(0, m, 30000)).astype(np.int32)
    uc = rng.integers(0, n, 30000).astype(np.int32)
    assert P._estimate_pack_padding(m, n, 16384, ur, uc, 30000) == 1.0


@slow
def test_best_monoid_format_skewed_routes_balanced():
    """get_best_monoid_format on a skewed matrix returns the hub-split
    balanced format + an apply that infers the alias fold from op_add —
    never an unsplit pack (r4 verdict item 2)."""
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import get_best_monoid_format, is_skewed

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    a = _skewed_csr()
    A = F.csr_from_scipy(a)
    assert is_skewed(A)
    fmt, ap = get_best_monoid_format(A)
    assert fmt is not None
    assert fmt.row_alias_src is not None or fmt.alias_src is not None
    x = np.random.default_rng(5).random(a.shape[1], dtype=np.float32)
    r = np.asarray(ap(fmt, jnp.asarray(x), op_mul=lambda av, xv: av * xv,
                      op_add=jnp.add, identity=0.0))
    np.testing.assert_allclose(r, a @ x, rtol=1e-4, atol=1e-5)
    # structural variant (the vxm stored-ness pass)
    fmtS, apS = get_best_monoid_format(A, structural=True)
    assert fmtS is not None
    assert fmtS.row_alias_src is not None or fmtS.alias_src is not None
    front = (np.random.default_rng(6).random(a.shape[1]) < 0.1)
    hits = np.asarray(apS(fmtS, jnp.asarray(front.astype(np.float32)),
                          op_mul=lambda av, xv: av * xv,
                          op_add=jnp.maximum, identity=0.0)) > 0
    ref = np.asarray((a @ front.astype(np.float32)) > 0).ravel()
    np.testing.assert_array_equal(hits, ref)


def test_skewed_vxm_public_dispatch(monkeypatch):
    """Public vxm_masked on a skewed matrix dispatches Pallas with the
    hub-split formats (r4 verdict item 2 'done when') and matches the
    XLA reference path exactly on indices, tolerance on values."""
    from spla_tpu import op
    from spla_tpu.containers import DenseVec, SparseVec
    from spla_tpu.ops import spmv as S
    from spla_tpu.pallas.cellpack_native import _native_lib
    from spla_tpu.pallas.spmv import is_skewed

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    monkeypatch.setenv("SPLA_FORCE_PALLAS_DISPATCH", "1")
    a = _skewed_csr(seed=12)
    At = F.csr_from_scipy(a)  # treat as M^T directly
    assert is_skewed(At)
    n = a.shape[0]
    rng = np.random.default_rng(7)
    MULT, PLUS, GEZ = op.MULT_FLOAT, op.PLUS_FLOAT, op.GEZERO_FLOAT
    mask = DenseVec(jnp.asarray((rng.random(n) > 0.2).astype(np.float32)),
                    jnp.float32(0))
    idx = np.sort(rng.choice(n, 100, replace=False)).astype(np.int32)
    sv = SparseVec(n=n, indices=jnp.asarray(idx),
                   values=jnp.asarray(rng.random(100, np.float32)),
                   nnz=jnp.int32(100), fill=jnp.float32(0))
    before = dict(S.DISPATCH_STATS)
    rv = S.vxm_masked(mask, sv, At, MULT, PLUS, GEZ, 0.0)
    assert S.DISPATCH_STATS["vxm_pallas"] == before["vxm_pallas"] + 1
    rr = S._vxm_masked_xla(mask, sv, At, MULT, PLUS, GEZ, 0.0)
    k, kr = int(np.asarray(rv.nnz)), int(np.asarray(rr.nnz))
    assert k == kr
    np.testing.assert_array_equal(np.asarray(rv.indices)[:k],
                                  np.asarray(rr.indices)[:kr])
    np.testing.assert_allclose(np.asarray(rv.values)[:k],
                               np.asarray(rr.values)[:kr],
                               rtol=2e-4, atol=1e-5)


def test_class_relabel_pack_matches_scipy():
    """Class-balancing relabel (native/classbal.cpp): bijection, within-
    block invariant, and the relabeled pack computes P A P^T exactly
    (y_orig = y_bal[perm], x_bal[perm] = x)."""
    from spla_tpu.pallas.cellpack_native import _classbal_lib, class_relabel
    from spla_tpu.pallas.spmv import (
        build_fused_cell_spmv_arrays,
        fused_cell_spmv_apply,
    )

    if _classbal_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(31)
    n = 4096  # single (tail) 16384-block: exercises capacity clamping
    a = sp.random(n, n, density=16 / n, random_state=5, dtype=np.float32)
    a = (a + a.T).tocoo()
    rows = a.row.astype(np.int32)
    cols = a.col.astype(np.int32)
    vals = a.data.astype(np.float32)
    perm = class_relabel(n, n, 1024, rows, cols, d=16, passes=2)
    assert perm is not None
    assert np.unique(perm).size == n  # bijection
    assert perm.max() < n
    r2, c2 = perm[rows], perm[cols]
    srt = np.argsort(r2, kind="stable")
    fmt = build_fused_cell_spmv_arrays(n, n, r2[srt], c2[srt], vals[srt],
                                       cw=1024)
    assert fmt is not None
    x = rng.random(n, dtype=np.float32)
    x_bal = np.zeros(n, np.float32)
    x_bal[perm] = x
    y_bal = np.asarray(fused_cell_spmv_apply(
        fmt, jnp.asarray(x_bal), op_mul=lambda a_, x_: a_ * x_,
        op_add=jnp.add, identity=0.0))
    ref = a.tocsr() @ x
    np.testing.assert_allclose(y_bal[perm], ref, rtol=1e-4, atol=1e-5)


def test_bfs_level_update_auto_sparse_equals_full(monkeypatch):
    """Chunk-sparse level update (r4 verdict item 7): the gathered-slab
    XLA branch produces identical (v', front', act, count) to the full
    streaming kernel, and the carried front-chunk activity is exact."""
    import spla_tpu.pallas.spmv as SP
    from spla_tpu.pallas.cellpack_native import _native_lib

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    monkeypatch.setattr(SP, "BFS_UPDATE_MAX_RB", 0)
    monkeypatch.setattr(SP, "LEVEL_UPDATE_CHUNK", 128)
    rng = np.random.default_rng(17)
    m = 5 * 16384  # 5 row blocks -> R = 640 rows, 5 chunks of 128
    from spla_tpu.pallas.spmv import build_fused_cell_spmv_arrays

    # direct index sampling (sp.random at this shape is pathologically
    # slow in this scipy build)
    rows_g = np.sort(rng.integers(0, m, 200_000)).astype(np.int32)
    cols_g = rng.integers(0, m, 200_000).astype(np.int32)
    fmt = build_fused_cell_spmv_arrays(
        m, m, rows_g, cols_g,
        np.ones(rows_g.size, np.float32), cw=1024, pattern=True)
    assert fmt is not None
    R = fmt.n_row_blocks * 128
    n_ch = R // 128

    v = np.zeros((R, 128), np.int32)
    v[0, :5] = 1
    front = np.zeros((R, 128), np.float32)
    front[0, 2] = 1.0
    hits = np.zeros((R, 128), np.float32)
    hits[0, 3:40] = 1.0
    hits[3 * 128 + 7, :16] = 1.0  # second active chunk
    fc = np.zeros(n_ch, bool)
    fc[0] = True
    depth = jnp.int32(4)

    def run():
        return SP.bfs_level_update_auto(
            fmt, jnp.asarray(hits), jnp.asarray(v), jnp.asarray(front),
            depth, jnp.asarray(fc))

    v2, f2, act, cnt, fc2 = run()  # sparse branch (2 chunks <= CAP)

    # numpy reference semantics
    v_ref = np.where(front > 0, 4, v)
    f_ref = ((hits > 0) & (v_ref == 0)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(v2), v_ref)
    np.testing.assert_array_equal(np.asarray(f2), f_ref)
    assert float(cnt) == f_ref.sum()
    fc_ref = f_ref.reshape(n_ch, -1).any(axis=1)
    np.testing.assert_array_equal(np.asarray(fc2), fc_ref)
    cwr = fmt.cw // 128
    nwr = (fmt.n + fmt.cw - 1) // fmt.cw * cwr
    nwc = nwr // cwr
    act_ref = (f_ref[:nwr].reshape(nwc, -1) > 0).any(axis=1)
    np.testing.assert_array_equal(np.asarray(act)[:nwc] > 0, act_ref)

    # force the FULL branch (every chunk active) and compare semantics
    hits_all = rng.random((R, 128)).astype(np.float32) < 0.01
    v3, f3, act3, cnt3, fc3 = SP.bfs_level_update_auto(
        fmt, jnp.asarray(hits_all.astype(np.float32)), jnp.asarray(v),
        jnp.asarray(front), depth, jnp.asarray(fc))
    f3_ref = ((hits_all > 0) & (v_ref == 0)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(f3), f3_ref)
    assert float(cnt3) == f3_ref.sum()


def test_sssp_level_update_auto_sparse_equals_full(monkeypatch):
    """SSSP chunk-sparse update: slab branch == full kernel semantics,
    including feedback reset to +inf on previously-active chunks."""
    import spla_tpu.pallas.spmv as SP
    from spla_tpu.pallas.cellpack_native import _native_lib

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    monkeypatch.setattr(SP, "BFS_UPDATE_MAX_RB", 0)
    monkeypatch.setattr(SP, "LEVEL_UPDATE_CHUNK", 128)
    rng = np.random.default_rng(19)
    m = 5 * 16384
    from spla_tpu.pallas.spmv import build_fused_cell_spmv_arrays

    rows_g = np.sort(rng.integers(0, m, 150_000)).astype(np.int32)
    cols_g = rng.integers(0, m, 150_000).astype(np.int32)
    fmt = build_fused_cell_spmv_arrays(
        m, m, rows_g, cols_g, rng.random(150_000).astype(np.float32),
        cw=1024)
    assert fmt is not None
    R = fmt.n_row_blocks * 128
    n_ch = R // 128

    inf = np.float32(np.inf)
    v = np.full((R, 128), inf, np.float32)
    v[0, :40] = rng.random(40).astype(np.float32) * 4
    hits = np.full((R, 128), inf, np.float32)
    hits[0, :40] = rng.random(40).astype(np.float32) * 4  # some improve
    hits[2 * 128 + 5, :8] = 0.5  # second active chunk
    fc = np.zeros(n_ch, bool)
    fc[0] = True

    v2, fdb, act, cnt, fc2 = SP.sssp_level_update_auto(
        fmt, jnp.asarray(hits), jnp.asarray(v), jnp.asarray(fc))

    v_ref = np.minimum(v, hits)
    ch_ref = v_ref < v
    fdb_ref = np.where(ch_ref, v_ref, inf)
    np.testing.assert_array_equal(np.asarray(v2), v_ref)
    np.testing.assert_array_equal(np.asarray(fdb), fdb_ref)
    assert float(cnt) == ch_ref.sum()
    np.testing.assert_array_equal(
        np.asarray(fc2), ch_ref.reshape(n_ch, -1).any(axis=1))
    cwr = fmt.cw // 128
    nwr = (fmt.n + fmt.cw - 1) // fmt.cw * cwr
    nwc = nwr // cwr
    act_ref = np.isfinite(fdb_ref[:nwr].reshape(nwc, -1)).any(axis=1)
    np.testing.assert_array_equal(np.asarray(act)[:nwc] > 0, act_ref)

    # full branch (many active chunks): same semantics
    hits_all = np.where(rng.random((R, 128)) < 0.01,
                        np.float32(0.25), inf)
    v3, fdb3, act3, cnt3, fc3 = SP.sssp_level_update_auto(
        fmt, jnp.asarray(hits_all), jnp.asarray(v), jnp.asarray(fc))
    v3_ref = np.minimum(v, hits_all)
    ch3 = v3_ref < v
    np.testing.assert_array_equal(np.asarray(v3), v3_ref)
    np.testing.assert_array_equal(np.asarray(fdb3),
                                  np.where(ch3, v3_ref, inf))
    assert float(cnt3) == ch3.sum()
