"""Functional op layer — TPU-native equivalents of the reference's 20
``exec_*`` operations (``include/spla/exec.hpp:53-519``).

Each op is a pure function over pytree containers, jax-traceable end to
end.  The reference's Schedule/Registry/Dispatcher machinery
(``src/exec.cpp``, ``src/core/dispatcher.cpp``) is subsumed by jit
tracing: an op *is* its dispatch key, and XLA's compilation cache replaces
the CLProgramCache.
"""

from .spmv import masked_spmv, masked_spmv_structural, mxv_masked, vxm_masked
from .vector import (
    v_assign_masked,
    v_count_mf,
    v_eadd,
    v_eadd_fdb,
    v_emult,
    v_map,
    v_reduce,
)
from .matrix import (
    kron,
    m_eadd,
    m_emult,
    m_extract_column,
    m_extract_row,
    m_reduce,
    m_reduce_by_column,
    m_reduce_by_row,
    m_transpose,
)
from .spgemm import count_mxm_products, count_mxmT_products, mxm, mxmT_masked
from .bsr import bsr_spmm, bsr_spmv

__all__ = [
    "masked_spmv",
    "masked_spmv_structural",
    "mxv_masked",
    "vxm_masked",
    "v_eadd",
    "v_emult",
    "v_map",
    "v_reduce",
    "v_count_mf",
    "v_assign_masked",
    "v_eadd_fdb",
    "m_eadd",
    "m_emult",
    "m_reduce",
    "m_reduce_by_row",
    "m_reduce_by_column",
    "m_transpose",
    "m_extract_row",
    "m_extract_column",
    "kron",
    "mxm",
    "mxmT_masked",
    "count_mxm_products",
    "count_mxmT_products",
    "bsr_spmv",
    "bsr_spmm",
]
