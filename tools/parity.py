"""Cross-validation harness: spla_tpu vs the ACTUAL reference (spla).

The north star mandates "match spla's reference results bit-for-bit on
integer/boolean semirings; float tolerance on BFS/SSSP/PageRank/TC".
This module generates shared graphs, drives the reference framework
(built CPU-only into ``.refbuild/`` from ``/root/reference``) on them,
and parses its raw outputs so tests / PARITY reports can compare.

Two reference drivers:

* algorithm level — ``tools/ref_runner.cpp`` (compiled against the
  reference's public C++ API, ``include/spla/algorithm.hpp:54-175``);
* op level — the reference's own ``pyspla`` ctypes package pointed at
  the same ``.so`` via ``SPLA_PATH`` (``python/pyspla/bridge.py``).

Graph battery: the reference's published dataset (BASELINE.md) spans
uniform-ish meshes (rgg_*), power-law social graphs (com-Orkut,
hollywood-2009), road networks (road_central, roadNet-CA, belgium_osm)
and scale-free web crawls (indochina-2004).  No SuiteSparse download is
reachable offline, so each class gets a deterministic synthetic
stand-in: uniform random, zipf hubs, 2D grid, and RMAT with Graph500
(a,b,c) = (0.57, 0.19, 0.19) whose degree skew mirrors the published
max-degree stats.
"""

from __future__ import annotations

import pathlib
import subprocess

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REFBUILD = REPO / ".refbuild"
RUNNER = REFBUILD / "ref_runner"
REFLIB = REFBUILD / "libspla_x64.so"
REF_SRC = pathlib.Path("/root/reference")

# the reference's "+inf": fill is std::numeric_limits<float>::max(), NOT
# infinity (src/algorithm.cpp:166) — a deliberate difference vs
# spla_tpu's +inf fill, normalized by `unreached_mask`
REF_FLT_MAX = np.float32(3.4028235e38)


def reference_available() -> bool:
    return RUNNER.exists() and REFLIB.exists()


def try_build_reference() -> bool:
    """Build the reference CPU-only + the parity runner, if the
    reference tree and toolchain are present.  Idempotent."""
    if reference_available():
        return True
    if not (REF_SRC / "CMakeLists.txt").exists():
        return False
    try:
        if not REFLIB.exists():
            subprocess.run(
                ["cmake", "-S", str(REF_SRC), "-B", str(REFBUILD),
                 "-G", "Ninja", "-DSPLA_BUILD_OPENCL=OFF",
                 "-DSPLA_BUILD_TESTS=OFF", "-DSPLA_BUILD_EXAMPLES=OFF",
                 "-DCMAKE_BUILD_TYPE=Release"],
                check=True, capture_output=True, timeout=300)
            subprocess.run(["ninja", "-C", str(REFBUILD), "spla_x64"],
                           check=True, capture_output=True, timeout=1800)
        if not RUNNER.exists():
            subprocess.run(
                ["g++", "-O2", "-std=c++17",
                 f"-I{REF_SRC}/include", str(REPO / "tools/ref_runner.cpp"),
                 f"-L{REFBUILD}", "-lspla_x64",
                 f"-Wl,-rpath,{REFBUILD}", "-o", str(RUNNER)],
                check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, OSError):
        return False
    return reference_available()


# ---------------------------------------------------------------------------
# graph battery
# ---------------------------------------------------------------------------


def _dedupe(rows, cols, n):
    key = rows.astype(np.int64) * n + cols
    key = np.unique(key[rows != cols])  # drop self loops + dups
    return (key // n).astype(np.int32), (key % n).astype(np.int32)


def _symmetrize(rows, cols, n):
    r = np.concatenate([rows, cols])
    c = np.concatenate([cols, rows])
    return _dedupe(r, c, n)


def _weights(rows, cols, n, seed):
    """Deterministic symmetric positive weights: w(i,j) = w(j,i) derived
    from the canonical (min, max) pair so both edge directions agree."""
    lo = np.minimum(rows, cols).astype(np.int64)
    hi = np.maximum(rows, cols).astype(np.int64)
    h = (lo * 2654435761 + hi * 40503 + seed * 97) % (1 << 20)
    return (0.25 + h.astype(np.float64) / (1 << 20)).astype(np.float32)


def gen_uniform(n=3000, deg=8, seed=1):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int32), deg)
    cols = rng.integers(0, n, n * deg).astype(np.int32)
    rows, cols = _symmetrize(rows, cols, n)
    return n, rows, cols, _weights(rows, cols, n, seed)


def gen_zipf(n=2000, seed=2):
    """Power-law out-degrees (zipf 2.1) — hollywood/orkut stand-in."""
    rng = np.random.default_rng(seed)
    deg = np.minimum(rng.zipf(2.1, n) * 4, n // 4).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int32), deg)
    cols = rng.integers(0, n, int(deg.sum())).astype(np.int32)
    rows, cols = _symmetrize(rows, cols, n)
    return n, rows, cols, _weights(rows, cols, n, seed)


def gen_grid(w=64, h=48):
    """2D grid — road-network stand-in (road_central avg deg 2.4)."""
    n = w * h
    idx = np.arange(n, dtype=np.int32)
    x, y = idx % w, idx // w
    right = idx[x < w - 1]
    down = idx[y < h - 1]
    rows = np.concatenate([right, down])
    cols = np.concatenate([right + 1, down + w]).astype(np.int32)
    rows, cols = _symmetrize(rows.astype(np.int32), cols, n)
    return n, rows, cols, _weights(rows, cols, n, 4)


def gen_rmat(scale=12, efactor=8, seed=3):
    """Graph500-style RMAT (a,b,c,d = .57,.19,.19,.05): scale-free skew
    mirroring the reference dataset's max-degree stats (BASELINE.md:
    soc-LiveJournal avg 17.7 / max 20333)."""
    rng = np.random.default_rng(seed)
    n = 1 << scale
    ne = n * efactor
    rows = np.zeros(ne, np.int64)
    cols = np.zeros(ne, np.int64)
    a, b, c = 0.57, 0.19, 0.19
    for _ in range(scale):
        r = rng.random(ne)
        bit_i = (r >= a + b).astype(np.int64)  # c+d quadrants
        bit_j = ((r >= a) & (r < a + b)).astype(np.int64) | (
            (r >= a + b + c).astype(np.int64))
        rows = rows * 2 + bit_i
        cols = cols * 2 + bit_j
    rows, cols = _symmetrize(rows.astype(np.int32), cols.astype(np.int32),
                             n)
    return n, rows, cols, _weights(rows, cols, n, seed)


def gen_directed(n=2500, deg=6, seed=7):
    """DIRECTED uniform graph (no symmetrization) — exercises the
    documented reference pull-mode difference."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int32), deg)
    cols = rng.integers(0, n, n * deg).astype(np.int32)
    rows, cols = _dedupe(rows, cols, n)
    return n, rows, cols, _weights(rows, cols, n, seed)


GRAPHS = {
    "uniform": gen_uniform,
    "zipf_hub": gen_zipf,
    "road_grid": gen_grid,
    "rmat": gen_rmat,
}


# ---------------------------------------------------------------------------
# mtx exchange + reference execution
# ---------------------------------------------------------------------------


def write_mtx(path, n, rows, cols, vals=None):
    """MatrixMarket coordinate general, 1-based, every edge explicit
    (undirectedness is encoded by the edge set, not the symmetric
    format, so both frameworks parse the identical entry list)."""
    with open(path, "w") as f:
        kind = "pattern" if vals is None else "real"
        f.write(f"%%MatrixMarket matrix coordinate {kind} general\n")
        f.write(f"{n} {n} {rows.size}\n")
        if vals is None:
            np.savetxt(f, np.c_[rows + 1, cols + 1], fmt="%d %d")
        else:
            np.savetxt(f, np.rec.fromarrays([rows + 1, cols + 1, vals]),
                       fmt="%d %d %.9g")


def run_reference(algo, mtx_path, out_path, source=0, mode="push",
                  timeout=600):
    subprocess.run(
        [str(RUNNER), algo, str(mtx_path), str(out_path), str(source),
         mode],
        check=True, capture_output=True, timeout=timeout)
    if algo in ("bfs", "tc"):
        return np.loadtxt(out_path, dtype=np.int64, ndmin=1)
    raw = np.loadtxt(out_path, dtype=str, ndmin=2)
    vals = raw[:, 0].astype(np.float32)
    bits = np.array([int(b, 16) for b in raw[:, 1]], np.uint32)
    return vals, bits


def unreached_mask(v: np.ndarray) -> np.ndarray:
    """Unreached slots under either convention (reference FLT_MAX,
    spla_tpu +inf)."""
    return (v >= REF_FLT_MAX) | ~np.isfinite(v)
