"""Hardware A/B harness for the fused masked-SpMV kernel variants.

Runs ONE variant per process (FUSED_K is frozen at import via
SPLA_FUSED_K) and prints a JSON line with ms/iter, so a shell loop can
sweep {layout, K, manual-DMA slots} on the real chip.  Timing follows
bench.py's methodology: chained iterations, per-iteration perturbation,
scalar host materialization.

Usage:
  SPLA_FUSED_K=32 python tools/ab_spmv.py --variant pair --manual 0
  SPLA_FUSED_K=64 python tools/ab_spmv.py --variant oct
  python tools/ab_spmv.py --variant wide --manual 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 21)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--cw", type=int, default=0,
                    help="window width; 0 = variant default")
    ap.add_argument("--variant", default="pair",
                    choices=["pair", "oct", "wide", "flat", "two",
                             "bf16", "bf16w", "split2", "split4"])
    ap.add_argument("--manual", type=int, default=0,
                    help="manual-DMA slot count; 0 = Mosaic pipeline")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reorder", action="store_true",
                    help="degree-aware lane-dealing relabeling before "
                         "packing (spla_tpu.reorder)")
    ap.add_argument("--split", action="store_true",
                    help="hub-column splitting (alias columns) before "
                         "packing")
    ap.add_argument("--split-thresh", type=int, default=0,
                    help="explicit hub-split threshold (0 = auto)")
    ap.add_argument("--graph", default="uniform",
                    choices=["uniform", "powerlaw"],
                    help="powerlaw: zipf(2.1) out-degrees — the skewed "
                         "case relabeling exists for")
    args = ap.parse_args()

    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS; SPLA_PLATFORM=cpu keeps
    # host-only runs (pad A/B) off the tunnel
    if os.environ.get("SPLA_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SPLA_PLATFORM"])
    import jax.numpy as jnp

    from bench import build_graph
    from spla_tpu.pallas import spmv as S

    if args.graph == "powerlaw":
        rng = np.random.default_rng(0)
        n = args.n
        deg = np.minimum(rng.zipf(2.1, n) * args.deg // 2, n // 4)
        rows = np.repeat(np.arange(n, dtype=np.int32),
                         deg).astype(np.int32)
        cols = rng.integers(0, n, rows.size, dtype=np.int32)
        vals = rng.random(rows.size, dtype=np.float32)
    else:
        indptr, rows, cols, vals = build_graph(args.n, args.deg)
        del indptr
    n = args.n
    nnz = vals.size

    kw = {}
    cw = args.cw or None
    if args.variant == "pair":
        cw = cw or 16384
    elif args.variant == "oct":
        cw = cw or 16384
        kw = dict(oct=True)
    elif args.variant == "wide":
        cw = cw or 32768
    elif args.variant == "flat":
        cw = cw or 16384
        kw = dict(paired=False)
    elif args.variant == "two":
        cw = cw or 16384
        kw = dict(two_choice=True)
    elif args.variant == "bf16":
        cw = cw or 16384
        kw = dict(values_bf16=True)
    elif args.variant == "bf16w":
        cw = cw or 32768
        kw = dict(values_bf16=True)
    elif args.variant in ("split2", "split4"):
        # VERDICT r3 item 5: N pallas_calls over disjoint tile ranges,
        # outputs merged with one elementwise add — does XLA overlap
        # their DMA streams where one kernel's grid pipeline cannot?
        cw = cw or 16384

    t0 = time.perf_counter()
    split = args.split_thresh if args.split_thresh else args.split
    fmt = S.build_fused_cell_spmv_arrays(n, n, rows, cols, vals, cw=cw,
                                         reorder=args.reorder,
                                         split_hubs=split, **kw)
    if fmt is None:
        print(json.dumps({"variant": args.variant, "error": "build failed"}))
        return
    jax.block_until_ready(fmt.fused)
    build_s = time.perf_counter() - t0
    if os.environ.get("SPLA_AB_PAD_ONLY"):
        print(json.dumps({
            "variant": args.variant, "graph": args.graph,
            "reorder": args.reorder, "cw": fmt.cw, "layout": fmt.layout,
            "padding": round(fmt.slots / fmt.nnz, 3),
            "tiles": fmt.slots // 1024, "build_s": round(build_s, 1),
        }))
        return

    x = jnp.asarray(np.random.default_rng(1).random(n, dtype=np.float32))

    def _mult(av, xv):
        return av * xv

    manual = args.manual

    split = None
    if args.variant.startswith("split"):
        split = S.split_fused_format(fmt, int(args.variant[-1]))
        print(f"split into {len(split)} tile ranges: "
              f"{[f.n_tiles for f in split]}", file=sys.stderr)

    @jax.jit
    def step_split(parts, y, k):
        # parts passed as pytree ARGS: closing over them would embed
        # ~700 MB of format constants in the HLO (the remote compile
        # service rejects the request with HTTP 413)
        os_ = [S.fused_cell_spmv_apply(f, y, op_mul=_mult,
                                       op_add=jnp.add, identity=0.0)
               for f in parts]
        o = os_[0]
        for oi in os_[1:]:
            o = o + oi
        return o * ((1.0 + k * 1e-6)
                    / (jnp.max(jnp.abs(o)) + jnp.float32(1e-30)))

    @jax.jit
    def step(fmt, y, k):
        if manual:
            o = S.fused_cell_spmv_apply_manual(fmt, y, _mult, jnp.add, 0.0,
                                               slots=manual)
        else:
            o = S.fused_cell_spmv_apply(fmt, y, op_mul=_mult, op_add=jnp.add,
                                        identity=0.0)
        return o * ((1.0 + k * 1e-6)
                    / (jnp.max(jnp.abs(o)) + jnp.float32(1e-30)))

    if split is not None:
        def step(fmt, y, k):
            return step_split(split, y, k)

    y = step(fmt, x, jnp.float32(0))
    ref = None
    if os.environ.get("SPLA_AB_CHECK") == "1":
        import scipy.sparse as sp
        data = np.asarray(vals)
        if args.variant.startswith("bf16"):
            # round BEFORE duplicate summing: the kernel rounds each
            # packed slot, then accumulates in f32
            u = data.view(np.uint32)
            data = (((u + np.uint32(0x7FFF) + ((u >> 16) & 1))
                     & np.uint32(0xFFFF0000)).view(np.float32))
        A = sp.coo_matrix((data, (np.asarray(rows),
                                  np.asarray(cols))),
                          shape=(n, n)).tocsr()
        got = np.asarray(
            S.fused_cell_spmv_apply(fmt, x, op_mul=_mult, op_add=jnp.add,
                                    identity=0.0) if not manual else
            S.fused_cell_spmv_apply_manual(fmt, x, _mult, jnp.add, 0.0,
                                           slots=manual))
        ref = A @ np.asarray(x)
        assert np.allclose(got, ref, rtol=1e-4, atol=1e-5), "MISMATCH"
    np.asarray(y)

    best = float("inf")
    for _ in range(2):
        y = x
        t0 = time.perf_counter()
        for k in range(args.iters):
            y = step(fmt, y, jnp.float32(k % 97))
        out = np.asarray(jnp.sum(jnp.abs(y)))
        best = min(best, (time.perf_counter() - t0) / args.iters)
    assert float(out) > 0
    dt = best

    bytes_model = nnz * 12 + n * 8 + 4
    tiles = fmt.slots // 1024
    print(json.dumps({
        "variant": args.variant,
        "K": S.FUSED_K,
        "manual": manual,
        "cw": fmt.cw,
        "layout": fmt.layout,
        "ms": round(dt * 1e3, 3),
        "gbps_model": round(bytes_model / dt / 1e9, 1),
        "ns_per_tile": round(dt * 1e9 / tiles, 1),
        "padding": round(fmt.slots / fmt.nnz, 3),
        "tiles": tiles,
        "build_s": round(build_s, 1),
        "checked": ref is not None,
    }))


if __name__ == "__main__":
    main()
