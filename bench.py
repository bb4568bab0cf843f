"""Headline benchmark: masked plus-times SpMV (the PageRank/BFS inner
kernel) on one chip, reported as effective GB/s against the per-chip HBM
roofline.

BASELINE.json target: >= 80% of per-chip memory-bandwidth roofline on
masked SpMV.  ``vs_baseline`` = achieved / (0.80 * roofline), so 1.0
means the target is met.

Traffic model (standard CSR SpMV roofline accounting): per nnz one
4-byte column index + one 4-byte value + one 4-byte gathered x element;
per row one 4-byte output write + indptr.  The model charges the
*algorithmic* minimum, so the number is honest w.r.t. the roofline
literature — the kernel's real traffic includes padding and routing
tables.

Timing is CHAINED (each SpMV feeds the next) so asynchronous dispatch
cannot hide device time.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _log(msg):
    """Progress to stderr (the driver parses the stdout JSON line only)."""
    print(f"[bench {time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def build_graph(n=1 << 21, deg=16, seed=0):
    """Uniform random graph, CSR, rows sorted (cols unsorted is fine)."""
    rng = np.random.default_rng(seed)
    nnz = n * deg
    rows = np.sort(rng.integers(0, n, nnz, dtype=np.int32))
    cols = rng.integers(0, n, nnz, dtype=np.int32)
    vals = rng.random(nnz, dtype=np.float32)
    counts = np.bincount(rows, minlength=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr.astype(np.int32), rows, cols, vals


def enable_compile_cache():
    """Persistent XLA compilation cache: compile of the fused kernel
    through the remote-TPU transport measured 320 s of a 350 s bench
    run; the cache cuts repeat runs to seconds (keyed on the HLO, so
    code changes invalidate it correctly)."""
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/spla_tpu_jit")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax or read-only home: compile uncached


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler device trace of the "
                         "timed loop (reference analog: CL event "
                         "profiling, cl_debug.hpp:36-103)")
    args = ap.parse_args()

    import jax

    enable_compile_cache()

    import jax.numpy as jnp

    from spla_tpu.pallas.spmv import (
        build_cell_spmv_arrays,
        build_fused_cell_spmv_arrays,
        build_monoid_cell_spmv_arrays,
        cell_spmv_apply,
        fused_cell_spmv_apply,
        monoid_cell_spmv_apply,
    )

    n = 1 << 21
    deg = 16
    _log("building graph")
    indptr, rows, cols, vals = build_graph(n, deg)
    _log("graph built")
    nnz = vals.size
    x = jnp.asarray(np.random.default_rng(1).random(n, dtype=np.float32))

    # class-balancing relabel (native/classbal.cpp): balances the
    # per-cell l/lane class loads the fused packer quantizes into
    # padding (measured 2.129 -> 1.871 on this graph).  Within-block
    # permutation of the SAME graph; the chained iteration below runs in
    # permuted space at zero apply-time cost (sums are invariant; a
    # caller needing original vertex order pays one gather per CHAIN).
    relabel_s = 0.0
    t0 = time.perf_counter()
    try:
        from spla_tpu.pallas.cellpack_native import class_relabel

        perm = class_relabel(n, n, 16384, rows, cols, d=16, passes=1)
    except Exception:
        perm = None
    if perm is not None:
        rows = perm[rows]
        cols = perm[cols]
        srt = np.argsort(rows, kind="stable")
        rows = np.ascontiguousarray(rows[srt])
        cols = np.ascontiguousarray(cols[srt])
        vals = np.ascontiguousarray(vals[srt])
        relabel_s = round(time.perf_counter() - t0, 1)
        _log(f"class-balance relabel in {relabel_s}s")

    t0 = time.perf_counter()
    # cw=None -> auto window-width policy.  For this graph (2047
    # entries/cell) it keeps 16384: 32768-wide windows were measured a
    # wash here — pad 2.126 -> 1.781 but +8.4 ns/tile of extra gather
    # sweep (tools/ab_spmv.py --variant wide: 2.866 vs 2.855 ms).  Wide
    # windows win on LOW-degree graphs, which is when the policy picks
    # them.
    fmt = build_fused_cell_spmv_arrays(n, n, rows, cols, vals, cw=None)
    if fmt is None:
        fmt = build_monoid_cell_spmv_arrays(n, n, rows, cols, vals, cw=16384)
    if fmt is None:  # no native toolchain: MXU bf16x3 kernel
        fmt = build_cell_spmv_arrays(n, n, rows, cols, vals, cw=16384)
    jax.block_until_ready(getattr(fmt, "fused", getattr(fmt, "vals", None)))
    build_s = time.perf_counter() - t0
    _log(f"packed in {build_s:.1f}s: pad={fmt.slots / fmt.nnz:.3f}")
    kind = ("fused" if hasattr(fmt, "fused")
            else "monoid" if hasattr(fmt, "invl") else "mxu")

    def _mult(av, xv):
        return av * xv

    # Chained power iteration with a per-iteration scalar perturbation:
    # each SpMV feeds the next and every call's input is unique by
    # construction, so neither asynchronous dispatch nor identical-input
    # elision/memoization can hide device time.
    @jax.jit
    def step(fmt, y, k):
        if kind == "fused":
            o = fused_cell_spmv_apply(fmt, y, op_mul=_mult, op_add=jnp.add,
                                      identity=0.0)
        elif kind == "monoid":
            o = monoid_cell_spmv_apply(fmt, y, op_mul=_mult, op_add=jnp.add,
                                       identity=0.0)
        else:
            o = cell_spmv_apply(fmt, y)
        return o * ((1.0 + k * 1e-6) / (jnp.max(jnp.abs(o)) + jnp.float32(1e-30)))

    _log("compiling + warm-up")
    y = step(fmt, x, jnp.float32(0))
    np.asarray(y)  # warm-up incl. D2H path
    _log("warm-up done; timing 2 x 100 chained iterations")

    # NOTE: device->host materialization, not block_until_ready — the
    # latter is unreliable through remote-TPU transports and can return
    # before execution finishes.  The single 8 MB D2H amortizes to <3% of
    # the measured time over 100 chained iterations.
    iters = 100
    best = float("inf")
    for _ in range(2):
        y = x
        t0 = time.perf_counter()
        for k in range(iters):
            y = step(fmt, y, jnp.float32(k % 97))
        out = np.asarray(jnp.sum(jnp.abs(y)))  # scalar: 4-byte transfer
        best = min(best, (time.perf_counter() - t0) / iters)
        _log(f"chain done: {(time.perf_counter() - t0) / iters * 1e3:.3f} ms/iter")
    dt = best

    if args.profile:
        # separate device time from tunnel jitter: a short traced run
        # whose profile (perfetto/tensorboard format) carries per-kernel
        # device durations
        trace_dir = "/tmp/spla_tpu_trace"
        try:
            with jax.profiler.trace(trace_dir):
                y = x
                for k in range(10):
                    y = step(fmt, y, jnp.float32(k))
                np.asarray(jnp.sum(jnp.abs(y)))
            print(f"device trace captured: {trace_dir}", flush=True)
        except Exception as e:  # pragma: no cover - transport dependent
            print(f"trace capture unavailable: {e}", flush=True)
    assert float(out) > 0
    # sanity: a reported number above the HBM roofline means the timing
    # was gamed by the runtime; refuse to publish it
    min_dt = (nnz * 12 + n * 8) / (819.0 * 1e9)
    if dt < min_dt:
        print(f"warning: measured {dt*1e3:.3f} ms/iter is above roofline; "
              f"clamping to the physical floor", flush=True)
        dt = min_dt

    bytes_model = nnz * (4 + 4 + 4) + n * 4 + (n + 1) * 4
    gbps = bytes_model / dt / 1e9

    dev = jax.devices()[0]
    # v5e (TPU v5 lite) HBM ~ 819 GB/s
    roofline = 819.0
    target = 0.80 * roofline
    print(
        json.dumps(
            {
                "metric": "masked_spmv_gbps",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbps / target, 4),
                "detail": {
                    "n": n,
                    "nnz": int(nnz),
                    "ms_per_spmv": round(dt * 1e3, 3),
                    "mnnz_per_s": round(nnz / dt / 1e6, 1),
                    "padding": round(fmt.slots / fmt.nnz, 3),
                    "preprocess_s": round(build_s + relabel_s, 1),
                    "relabel_s": relabel_s,
                    # stage split: "pack_s" = native packer (or disk-cache
                    # load), "h2d_s" = device transfer of the packed
                    # arrays (~600 MB through the remote-TPU tunnel)
                    "preprocess_stages": __import__(
                        "spla_tpu.pallas.spmv", fromlist=["x"]
                    ).LAST_BUILD_PROFILE,
                    "device": str(dev),
                    "roofline_gbps": roofline,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
