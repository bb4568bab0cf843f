"""Produce PARITY_r05.json: per-graph, per-algorithm agreement between
spla_tpu and the actual reference framework (spla, CPU-only build).

Runs the same battery as tests/test_reference_parity.py but records
quantitative agreement (including observed BITWISE equality on floats,
which the north star only requires to tolerance) plus the documented
deliberate differences.

usage: python tools/run_parity.py  (from the repo root; CPU backend)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import parity  # noqa: E402

import jax

jax.config.update("jax_platforms", "cpu")

from spla_tpu import algorithms as alg  # noqa: E402
from spla_tpu import formats as F  # noqa: E402


def _our_csr(n, rows, cols, vals):
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    return F.csr_from_scipy(a)


def main():
    if not parity.try_build_reference():
        print(json.dumps({"error": "reference unavailable"}))
        return 1
    out = {"graphs": {}, "notes": [
        "BFS levels + TC counts: bit-exact (int).",
        "SSSP: identical reached sets; values compared to 1e-6 and "
        "bitwise equality recorded (not required by the north star).",
        "PageRank: float tolerance (both iterate the same f32 "
        "recurrence to eps=1e-6).",
        "Deliberate differences: (1) unreached SSSP fill is FLT_MAX in "
        "the reference vs +inf here; (2) the reference's pull/adaptive "
        "traversal is undirected-only (reads outgoing rows, "
        "src/algorithm.cpp:98) - parity runs pin it to push mode; "
        "spla_tpu is direction-correct in all modes.",
    ]}
    tmp = tempfile.mkdtemp(prefix="parity_")
    for key, gen in parity.GRAPHS.items():
        n, rows, cols, vals = gen()
        mtx = os.path.join(tmp, f"{key}.mtx")
        parity.write_mtx(mtx, n, rows, cols, vals)
        g = {"n": int(n), "nnz": int(rows.size)}
        A = _our_csr(n, rows, cols, vals)

        ref = parity.run_reference("bfs", mtx, os.path.join(tmp, "b.txt"))
        ours = np.asarray(alg.bfs(A, 0).values).astype(np.int64)
        g["bfs_bitexact"] = bool(np.array_equal(ours, ref))

        refs, _ = parity.run_reference("sssp", mtx,
                                       os.path.join(tmp, "s.txt"))
        ourss = np.asarray(alg.sssp(A, 0).values)
        m = parity.unreached_mask(refs)
        same_reach = bool(
            np.array_equal(parity.unreached_mask(ourss), m))
        g["sssp_reached_set_equal"] = same_reach
        g["sssp_max_abs_err"] = float(
            np.abs(ourss[~m] - refs[~m]).max(initial=0.0))
        g["sssp_bitwise_equal_frac"] = float(
            (ourss[~m].view(np.uint32) == refs[~m].view(np.uint32)).mean()
            if (~m).any() else 1.0)

        refp, _ = parity.run_reference("pr", mtx,
                                       os.path.join(tmp, "p.txt"))
        alpha = np.float32(0.85)
        deg = np.bincount(rows, minlength=n).astype(np.float32)
        scaled = (alpha / deg[rows]).astype(np.float32)
        ourp = np.asarray(alg.pr(_our_csr(n, rows, cols, scaled),
                                 alpha=0.85, eps=1e-6).values)
        g["pr_max_abs_err"] = float(np.abs(ourp - refp).max())

        (reft,) = parity.run_reference("tc", mtx,
                                       os.path.join(tmp, "t.txt"))
        keep = rows > cols
        ourt = alg.tc(_our_csr(n, rows[keep], cols[keep],
                               np.ones(int(keep.sum()), np.float32)))
        g["tc_ref"] = int(reft)
        g["tc_ours"] = int(ourt)
        g["tc_bitexact"] = int(reft) == int(ourt)
        out["graphs"][key] = g
        print(key, g)

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "PARITY_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote PARITY_r05.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
