"""Distributed layer: mesh setup, block-row sharded CSR, collective SpMV
and distributed graph algorithms.

The reference is single-process/single-device (SURVEY §2.8 — its only
"communication backend" is host↔device buffer copies inside format
converters).  This layer is new capability mandated by BASELINE.json's
north star: row-partitioned matrices per chip, frontier/halo vectors
exchanged with ``jax.lax`` collectives over ICI, ``jax.sharding.Mesh`` +
``shard_map`` as the first-class communication backend.
"""

from .mesh import make_device_mesh
from .dist_matrix import (
    ShardedCsr,
    shard_csr_by_rows,
    shard_csr_by_rows_balanced,
    shard_csr_split_diag,
    shard_vector_by_rows,
)
from .dist_ops import (
    dist_bfs,
    dist_masked_spmv,
    dist_pagerank,
    dist_pagerank_overlap,
    dist_sssp,
)
from .dist_cell import (
    ShardedCellSpmv,
    dist_bfs_pallas,
    dist_bfs_pallas_overlap,
    dist_pagerank_pallas,
    dist_pagerank_pallas_overlap,
    dist_sssp_pallas,
    dist_sssp_pallas_overlap,
    shard_cell_spmv,
    shard_cell_spmv_split,
)
from .dist_spgemm import (
    count_dist_mxm_cap,
    count_dist_mxmT_cap,
    dist_mxm,
    dist_mxmT_masked_reduce,
    dist_tc,
)

__all__ = [
    "make_device_mesh",
    "ShardedCsr",
    "shard_csr_by_rows",
    "shard_csr_by_rows_balanced",
    "shard_csr_split_diag",
    "shard_vector_by_rows",
    "dist_masked_spmv",
    "dist_pagerank",
    "dist_pagerank_overlap",
    "dist_bfs",
    "dist_sssp",
    "ShardedCellSpmv",
    "shard_cell_spmv",
    "dist_pagerank_pallas",
    "dist_bfs_pallas",
    "dist_sssp_pallas",
    "dist_pagerank_pallas_overlap",
    "dist_bfs_pallas_overlap",
    "dist_sssp_pallas_overlap",
    "shard_cell_spmv_split",
    "dist_mxm",
    "dist_mxmT_masked_reduce",
    "dist_tc",
    "count_dist_mxm_cap",
    "count_dist_mxmT_cap",
]
