"""Phase-level diagnosis of general mxm on hardware (r4 verdict item 5:
9.9 Mproducts/s, 58x below the masked kernel; target >= 100 Mprod/s).

Phases measured independently on the bench workload (8K^2, ~2.07M
products): current ESC total, expand, sort, fold; dense-path candidates:
MXU matmul, row-gather SpMM, and the m*n -> CSR compaction that killed
the dense path's fixed cost (~700 ms claim).
"""

import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")
from bench import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spla_tpu import formats as F  # noqa: E402
from spla_tpu import op  # noqa: E402
from spla_tpu.ops.spgemm import count_mxm_products, mxm  # noqa: E402


def t(label, fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)
    return best


def main():
    n = 8192
    rng = np.random.default_rng(5)
    A = sp.random(n, n, density=130900 / n / n, random_state=7,
                  dtype=np.float32).tocsr()
    A.data[:] = rng.random(A.nnz, np.float32) + 0.5
    B = sp.random(n, n, density=130900 / n / n, random_state=8,
                  dtype=np.float32).tocsr()
    B.data[:] = rng.random(B.nnz, np.float32) + 0.5
    Ac, Bc = F.csr_from_scipy(A), F.csr_from_scipy(B)
    total = count_mxm_products(Ac, Bc)
    out_nnz = (A @ B).nnz
    print(f"device={jax.devices()[0].platform} nnzA={A.nnz} "
          f"products={total} out_nnz={out_nnz}", flush=True)

    # current ESC path
    def esc():
        R = mxm(Ac, Bc, op.MULT_FLOAT, op.PLUS_FLOAT, 0.0)
        np.asarray(R.nnz)

    dt = t("mxm ESC total", esc)
    print(f"  -> {total/dt/1e6:.1f} Mprod/s", flush=True)

    # dense candidates
    Ad = jnp.asarray(A.toarray())
    Bd = jnp.asarray(B.toarray())

    @jax.jit
    def matmul(Ad, Bd):
        return jax.lax.dot(Ad, Bd,
                           precision=jax.lax.Precision.HIGHEST)

    Rd = matmul(Ad, Bd)

    def mm():
        np.asarray(jnp.sum(matmul(Ad, Bd)))

    t("dense MXU matmul (HIGHEST)", mm)

    # densify cost
    rowsA = jnp.asarray(A.tocoo().row.astype(np.int32))
    colsA = jnp.asarray(A.tocoo().col.astype(np.int32))
    valsA = jnp.asarray(A.data)

    @jax.jit
    def densify(rows, cols, vals):
        return jnp.zeros((n, n), jnp.float32).at[rows, cols].set(vals)

    def dn():
        np.asarray(jnp.sum(densify(rowsA, colsA, valsA)))

    t("densify A (scatter 131K)", dn)

    # row-gather SpMM: R = sum_k A[i,k] * B_dense[k,:]
    @jax.jit
    def spmm_gather(vals, cols, row_ids, Bd):
        contrib = vals[:, None] * Bd[cols]
        return jnp.zeros((n, n), jnp.float32).at[row_ids].add(contrib)

    row_ids = jnp.asarray(np.repeat(np.arange(n),
                                    np.diff(A.indptr)).astype(np.int32))

    def sg():
        np.asarray(jnp.sum(spmm_gather(valsA, colsA, row_ids, Bd)))

    t("row-gather SpMM (131K x 8K rows)", sg)

    # compaction m*n dense -> COO(size=cap)
    cap = 1 << 21

    @jax.jit
    def compact(Rd):
        mask = Rd != 0.0
        flat = Rd.reshape(-1)
        (idx,) = jnp.nonzero(mask.reshape(-1), size=cap,
                             fill_value=n * n)
        r = (idx // n).astype(jnp.int32)
        c = (idx % n).astype(jnp.int32)
        v = jnp.where(idx < n * n, flat[jnp.clip(idx, 0, n * n - 1)], 0.0)
        return r, c, v, jnp.sum(mask)

    def cp():
        r, c, v, k = compact(Rd)
        np.asarray(k)

    t("nonzero compaction (67M -> 2M)", cp)

    # per-row counts + indptr (CSR skeleton without global nonzero)
    @jax.jit
    def rowcount(Rd):
        cnt = jnp.sum(Rd != 0.0, axis=1, dtype=jnp.int32)
        return jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)])

    def rc():
        np.asarray(rowcount(Rd)[-1])

    t("row counts + cumsum", rc)

    # full dense pipeline: densify both + matmul + compact
    @jax.jit
    def dense_full(rA, cA, vA, rB, cB, vB):
        Ad = jnp.zeros((n, n), jnp.float32).at[rA, cA].set(vA)
        Bd = jnp.zeros((n, n), jnp.float32).at[rB, cB].set(vB)
        Rd = jax.lax.dot(Ad, Bd, precision=jax.lax.Precision.HIGHEST)
        return compact(Rd)

    cooB = B.tocoo()
    rB = jnp.asarray(cooB.row.astype(np.int32))
    cB = jnp.asarray(cooB.col.astype(np.int32))
    vB = jnp.asarray(cooB.data)

    def df():
        r, c, v, k = dense_full(rowsA, colsA, valsA, rB, cB, vB)
        np.asarray(k)

    dt = t("dense FULL (densify+matmul+compact)", df)
    print(f"  -> {total/dt/1e6:.1f} Mprod/s equivalent", flush=True)


if __name__ == "__main__":
    main()
