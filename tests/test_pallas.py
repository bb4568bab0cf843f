"""Pallas SpMV kernel tests — interpret mode on CPU (same-test-both-
backends strategy, SURVEY §4: interpret-mode Pallas is the CPU stand-in
for the TPU kernel)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from spla_tpu import formats as F
from spla_tpu.pallas.spmv import build_windowed_spmv, windowed_spmv_apply


@pytest.mark.parametrize(
    "m,n,density,seed",
    [(300, 250, 0.05, 1), (5000, 4000, 0.002, 2), (129, 128, 0.3, 3), (64, 64, 0.5, 4)],
)
def test_windowed_spmv_vs_scipy(m, n, density, seed):
    a = sp.random(m, n, density=density, random_state=seed, dtype=np.float32)
    A = F.csr_from_scipy(a)
    fmt = build_windowed_spmv(A)
    x = np.random.default_rng(seed).random(n, dtype=np.float32)
    r = np.asarray(windowed_spmv_apply(fmt, jnp.asarray(x)))
    np.testing.assert_allclose(r, a @ x, rtol=1e-4, atol=1e-5)


def test_windowed_spmv_empty_rows():
    a = sp.csr_matrix((np.ones(2, np.float32), ([0, 5], [3, 1])), shape=(10, 8))
    fmt = build_windowed_spmv(F.csr_from_scipy(a))
    x = np.arange(8, dtype=np.float32)
    r = np.asarray(windowed_spmv_apply(fmt, jnp.asarray(x)))
    np.testing.assert_allclose(r, a @ x)


def test_windowed_spmv_generalized_mul():
    # op_mul other than MULT: (a + x) with PLUS accumulation
    a = sp.random(100, 100, density=0.1, random_state=5, dtype=np.float32)
    fmt = build_windowed_spmv(F.csr_from_scipy(a))
    x = np.random.default_rng(5).random(100, dtype=np.float32)
    r = np.asarray(
        windowed_spmv_apply(fmt, jnp.asarray(x), op_mul=lambda av, xv: av + xv)
    )
    d = a.toarray()
    mask = d != 0
    exp = ((d + x[None, :]) * mask).sum(1)
    np.testing.assert_allclose(r, exp, rtol=1e-4, atol=1e-5)


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
    fmt = build_windowed_spmv(F.csr_from_scipy(a))
    assert fmt.slots / fmt.nnz < 1.6  # dense-ish buckets at this density
