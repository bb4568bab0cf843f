"""Distributed layer tests on a virtual 8-device CPU mesh (what the
reference never had — SURVEY §2.8/§4: multi-node testing none)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from spla_tpu import op, formats as F
from spla_tpu.algorithms import bfs_naive, sssp_naive
from spla_tpu.parallel import (
    dist_bfs,
    dist_masked_spmv,
    dist_pagerank,
    dist_sssp,
    make_device_mesh,
    shard_csr_by_rows,
    shard_vector_by_rows,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_device_mesh(8)


def random_undirected(n, avg_deg, seed, weighted=False):
    rng = np.random.default_rng(seed)
    m = n * avg_deg // 2
    r = rng.integers(0, n, m)
    c = rng.integers(0, n, m)
    keep = r != c
    r, c = r[keep], c[keep]
    rows = np.concatenate([r, c])
    cols = np.concatenate([c, r])
    if weighted:
        w = rng.uniform(0.1, 2.0, r.size).astype(np.float32)
        vals = np.concatenate([w, w])
    else:
        vals = np.ones(rows.size, np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    if not weighted:
        A.data[:] = 1
    return A.tocsr()


def test_dist_spmv_matches_single(mesh):
    n = 203  # deliberately not divisible by 8
    A = random_undirected(n, 6, 0)
    Ac = F.csr_from_scipy(A)
    sc = shard_csr_by_rows(Ac, 8, mesh)
    x = np.random.default_rng(1).normal(size=n).astype(np.float32)
    xs = shard_vector_by_rows(x, 8, sc.mloc, mesh)
    r = dist_masked_spmv(mesh, sc, xs, op.MULT_FLOAT, op.PLUS_FLOAT, 0.0)
    got = np.asarray(r).ravel()[:n]
    np.testing.assert_allclose(got, A @ x, rtol=1e-4, atol=1e-5)


def test_dist_pagerank_matches_naive(mesh):
    n = 120
    A = random_undirected(n, 5, 2).astype(np.float32)
    alpha, eps = 0.85, 1e-5
    outdeg = np.asarray(A.sum(axis=0)).ravel()
    outdeg[outdeg == 0] = 1.0
    As = A.multiply(alpha / outdeg).tocsr().astype(np.float32)
    sc = shard_csr_by_rows(F.csr_from_scipy(As), 8, mesh)
    p = np.asarray(dist_pagerank(mesh, sc, alpha, eps)).ravel()[:n]
    # single-device reference
    from spla_tpu.algorithms import pr

    p1 = np.asarray(pr(F.csr_from_scipy(As), alpha, eps).values)
    np.testing.assert_allclose(p, p1, rtol=1e-4, atol=1e-8)


def test_dist_bfs_matches_naive(mesh):
    n = 150
    A = random_undirected(n, 6, 3)
    adj = [A.indices[A.indptr[i] : A.indptr[i + 1]].tolist() for i in range(n)]
    sc = shard_csr_by_rows(F.csr_from_scipy(A.astype(np.int32)), 8, mesh)
    v = np.asarray(dist_bfs(mesh, sc, 0)).ravel()[:n]
    np.testing.assert_array_equal(v, bfs_naive(adj, 0))


def test_dist_sssp_matches_naive(mesh):
    n = 100
    A = random_undirected(n, 6, 4, weighted=True)
    adj = [A.indices[A.indptr[i] : A.indptr[i + 1]].tolist() for i in range(n)]
    w = [A.data[A.indptr[i] : A.indptr[i + 1]].tolist() for i in range(n)]
    sc = shard_csr_by_rows(F.csr_from_scipy(A), 8, mesh)
    v = np.asarray(dist_sssp(mesh, sc, 0)).ravel()[:n]
    expect = sssp_naive(adj, w, 0)
    finite = np.isfinite(expect)
    np.testing.assert_allclose(v[finite], expect[finite], rtol=1e-5)
    assert np.all(np.isinf(v[~finite]))
