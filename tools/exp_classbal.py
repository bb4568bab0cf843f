"""Host-only experiment: does the class-balancing relabel cut fused-pack
padding at the uniform benchmark sizes?  (r4 verdict item 4.)

Padding is a pure host quantity — no TPU needed.  Compares:
  - baseline pack (auto cw policy),
  - class-balanced relabel pack (same cw),
at the headline size (2M rows deg 16) and the HBM size (8.4M rows deg
16), plus the measured relabel cost.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench_suite import random_graph  # noqa: E402
from spla_tpu.pallas.cellpack_native import class_relabel  # noqa: E402
from spla_tpu.pallas.spmv import (  # noqa: E402
    _auto_cw,
    build_fused_cell_spmv_arrays,
)


def run(n, deg, tag, d=16):
    A = random_graph(n, deg)
    coo = A.tocoo()
    rows = coo.row.astype(np.int32)
    cols = coo.col.astype(np.int32)
    vals = coo.data.astype(np.float32)
    nnz = rows.size
    cw = _auto_cw(n, n, nnz, False)
    print(f"[{tag}] n={n} nnz={nnz} cw={cw}", flush=True)

    t0 = time.perf_counter()
    base = build_fused_cell_spmv_arrays(n, n, rows, cols, vals, cw=cw)
    t_base = time.perf_counter() - t0
    print(f"[{tag}] baseline pad={base.slots / base.nnz:.3f} "
          f"tiles={base.n_tiles} pack={t_base:.1f}s", flush=True)

    t0 = time.perf_counter()
    perm = class_relabel(n, n, cw, rows, cols, d=d)
    t_perm = time.perf_counter() - t0
    assert perm is not None
    assert np.unique(perm).size == n  # bijection
    # within-block invariant
    assert np.all(perm // 16384 == np.arange(n) // 16384)

    r2 = perm[rows]
    c2 = perm[cols]
    srt = np.argsort(r2, kind="stable")
    t0 = time.perf_counter()
    bal = build_fused_cell_spmv_arrays(
        n, n, r2[srt], c2[srt], vals[srt], cw=cw)
    t_bal = time.perf_counter() - t0
    print(f"[{tag}] balanced pad={bal.slots / bal.nnz:.3f} "
          f"tiles={bal.n_tiles} relabel={t_perm:.1f}s pack={t_bal:.1f}s "
          f"(d={d})", flush=True)
    return base, bal


if __name__ == "__main__":
    small = "--small" in sys.argv
    if small:
        run(1 << 18, 16, "262K")
    else:
        run(1 << 21, 16, "headline-2M")
        run(8 * (1 << 20) + (1 << 18), 16, "big-8.4M")
