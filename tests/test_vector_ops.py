"""Vector op tests (model: reference ``tests/test_vector.cpp`` — 27 cases
of get/set/reduce/eadd/emult/eadd_fdb/assign/fill_value/map)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spla_tpu import op, formats as F
from spla_tpu.containers import DenseVec, Scalar, SparseVec
from spla_tpu.ops import (
    v_assign_masked,
    v_count_mf,
    v_eadd,
    v_eadd_fdb,
    v_emult,
    v_map,
    v_reduce,
)


def sv(n, idx, vals, fill=0, dtype=np.int32, cap=None):
    return F.sparse_vec_from_entries(n, idx, vals, fill=fill, dtype=dtype, capacity=cap)


def dv(vals, fill=0, dtype=np.int32):
    return DenseVec(jnp.asarray(np.asarray(vals, dtype)), jnp.asarray(fill, dtype))


def test_eadd_sparse_union():
    u = sv(10, [1, 3, 5], [10, 30, 50])
    v = sv(10, [3, 4], [3, 4])
    r = v_eadd(u, v, op.PLUS_INT)
    assert int(r.nnz) == 4
    np.testing.assert_array_equal(np.asarray(r.indices)[:4], [1, 3, 4, 5])
    # unmatched entries combine against the other's fill (0)
    np.testing.assert_array_equal(np.asarray(r.values)[:4], [10, 33, 4, 50])


def test_eadd_sparse_nonzero_fill():
    # fill participates in op for unmatched entries (cpu_v_eadd spNsp)
    u = sv(6, [0, 2], [5, 7], fill=100)
    v = sv(6, [2, 4], [1, 2], fill=200)
    r = v_eadd(u, v, op.PLUS_INT)
    np.testing.assert_array_equal(np.asarray(r.indices)[:3], [0, 2, 4])
    np.testing.assert_array_equal(np.asarray(r.values)[:3], [5 + 200, 8, 100 + 2])


def test_eadd_dense():
    u = dv([1, 2, 3])
    v = dv([10, 20, 30])
    r = v_eadd(u, v, op.PLUS_INT)
    assert isinstance(r, DenseVec)
    np.testing.assert_array_equal(np.asarray(r.values), [11, 22, 33])


def test_emult_sparse_intersection():
    u = sv(10, [1, 3, 5], [10, 30, 50])
    v = sv(10, [3, 5, 7], [3, 5, 7])
    r = v_emult(u, v, op.MULT_INT)
    assert int(r.nnz) == 2
    np.testing.assert_array_equal(np.asarray(r.indices)[:2], [3, 5])
    np.testing.assert_array_equal(np.asarray(r.values)[:2], [90, 250])


def test_map_sparse_and_dense():
    u = sv(5, [0, 2], [4, 9])
    r = v_map(u, op.AINV_INT)
    np.testing.assert_array_equal(np.asarray(r.values)[:2], [-4, -9])
    d = v_map(dv([1, -2, 3]), op.ABS_INT)
    np.testing.assert_array_equal(np.asarray(d.values), [1, 2, 3])


def test_reduce_sparse():
    u = sv(10, [1, 3, 5], [10, 30, 50])
    assert int(v_reduce(5, u, op.PLUS_INT).value) == 95
    assert int(v_reduce(1000, u, op.MIN_INT).value) == 10


def test_reduce_dense_folds_all_slots():
    # reference dense path folds every slot including fill
    d = dv([1, 2, 3], fill=7)
    assert int(v_reduce(0, d, op.PLUS_INT).value) == 6


def test_reduce_noncommutative_requires_associativity():
    u = sv(4, [0, 1], [1, 2])
    with pytest.raises(ValueError):
        v_reduce(0, u, op.MINUS_INT)


def test_count_mf():
    u = sv(10, [1, 3], [5, 0])
    assert int(v_count_mf(u).value) == 2  # sparse: stored entries even if == fill
    d = dv([0, 5, 0, 7], fill=0)
    assert int(v_count_mf(d).value) == 2
    d2 = dv([3, 3, 1], fill=3)
    assert int(v_count_mf(d2).value) == 1


def test_assign_masked_sparse_mask():
    r = dv([0, 0, 0, 0, 0])
    mask = sv(5, [1, 3], [1, 0])  # select NQZERO: only index 1 selected
    out = v_assign_masked(r, mask, 9, op.SECOND_INT, op.NQZERO_INT)
    np.testing.assert_array_equal(np.asarray(out.values), [0, 9, 0, 0, 0])


def test_assign_masked_dense_mask():
    r = dv([1, 2, 3])
    mask = dv([0, 5, 0])
    out = v_assign_masked(r, mask, 100, op.PLUS_INT, op.NQZERO_INT)
    np.testing.assert_array_equal(np.asarray(out.values), [1, 102, 3])


def test_eadd_fdb_sparse():
    # SSSP-style: r'=min(r,v); fdb = changed entries (cpu_v_eadd_fdb sp2dn)
    inf = np.float32(np.inf)
    r = dv([inf, 5.0, 2.0, inf], fill=inf, dtype=np.float32)
    v = sv(4, [0, 2, 3], [7.0, 3.0, 1.0], fill=inf, dtype=np.float32)
    r2, fdb = v_eadd_fdb(r, v, op.MIN_FLOAT)
    np.testing.assert_array_equal(np.asarray(r2.values), [7.0, 5.0, 2.0, 1.0])
    assert isinstance(fdb, SparseVec)
    assert int(fdb.nnz) == 2
    np.testing.assert_array_equal(np.asarray(fdb.indices)[:2], [0, 3])
    np.testing.assert_array_equal(np.asarray(fdb.values)[:2], [7.0, 1.0])


def test_eadd_fdb_dense():
    r = dv([4, 5, 6])
    v = dv([9, 1, 6])
    r2, fdb = v_eadd_fdb(r, v, op.MIN_INT)
    np.testing.assert_array_equal(np.asarray(r2.values), [4, 1, 6])
    np.testing.assert_array_equal(np.asarray(fdb.values), [0, 1, 0])


def test_eadd_fdb_custom_op():
    # custom op through the same path (reference test_vector.cpp:285)
    clamp = op.OpBinary.make("CLAMP9", op.INT if hasattr(op, "INT") else None, None)
    from spla_tpu.types import INT

    clamp = op.OpBinary.make("CLAMP9", INT, lambda a, b: jnp.minimum(a + b, 9))
    r = dv([5, 8])
    v = dv([3, 3])
    r2, fdb = v_eadd_fdb(r, v, clamp)
    np.testing.assert_array_equal(np.asarray(r2.values), [8, 9])
    np.testing.assert_array_equal(np.asarray(fdb.values), [8, 9])


def test_parallel_primitives_parity():
    import jax.numpy as jnp
    import numpy as np

    from spla_tpu import op
    from spla_tpu.utils.primitives import (
        exclusive_scan,
        prefix_sum,
        reduce_by_key,
        sort_by_key,
    )

    k = jnp.asarray([3, 1, 2, 1, 3, 0], jnp.int32)
    v = jnp.asarray([10, 20, 30, 40, 50, 60], jnp.int32)
    ks, vs = sort_by_key(k, v)
    np.testing.assert_array_equal(np.asarray(ks), [0, 1, 1, 2, 3, 3])
    np.testing.assert_array_equal(np.asarray(vs), [60, 20, 40, 30, 10, 50])
    out, has = reduce_by_key(ks, vs, op.PLUS_INT, 4)
    np.testing.assert_array_equal(np.asarray(out), [60, 60, 30, 60])
    assert bool(np.asarray(has).all())
    np.testing.assert_array_equal(
        np.asarray(prefix_sum(jnp.asarray([1, 2, 3, 4]))), [0, 1, 3, 6]
    )
    assert exclusive_scan is prefix_sum


def test_v_reduce_dense_fill_divergence_and_stored_only():
    """Dense v_reduce folds ALL slots (reference dense-kernel parity):
    with fill != identity and PLUS the fill slots contribute.
    stored_only=True restores the sparse-path semantics."""
    from spla_tpu.formats import dense_to_sparse_vec

    v = DenseVec(jnp.asarray([2.0, 5.0, 2.0, 7.0], jnp.float32),
                 jnp.float32(2.0))  # fill = 2: slots 0 and 2 are unstored
    all_slots = v_reduce(0.0, v, op.PLUS_FLOAT)
    assert float(np.asarray(all_slots.value)) == 16.0  # 2+5+2+7
    stored = v_reduce(0.0, v, op.PLUS_FLOAT, stored_only=True)
    assert float(np.asarray(stored.value)) == 12.0  # 5+7
    sparse = v_reduce(0.0, dense_to_sparse_vec(v), op.PLUS_FLOAT)
    assert float(np.asarray(sparse.value)) == float(np.asarray(stored.value))
