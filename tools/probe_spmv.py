"""Hardware probes for the fused SpMV kernel's per-tile cost structure.

Each probe is a pallas_call with IDENTICAL streaming to the real pair
kernel (same BlockSpecs over the same packed arrays) but with phases
removed, so subtracting probe times attributes cost to phases — and a
split-operand probe tests whether the fused-block DMA is single-stream
bound (two half-size operands = two concurrent DMA streams).

Probes (layout 4, pair-shared S-table, 40-row pair blocks):
  stream   — blocks DMA'd, one vreg-row sum consumed per pair, no compute
  stream2  — same bytes as two interleaved half-operands (2 DMA streams)
  gather   — stream + full two-half gather (sweep + products), no scatter
  fullfix  — full pair body but both RMWs land on FIXED row 0
  full     — the real kernel body (pair_body)
  xla_sum  — chained XLA sum over the same fused array (HBM stream ref)

Usage: python tools/probe_spmv.py [--probe all|stream|...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _FixedRB:
    """rb_ref stand-in whose every lookup returns row-block 0."""

    def __getitem__(self, i):
        return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 21)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--probe", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import build_graph
    from spla_tpu.pallas import spmv as S

    K = S.FUSED_K
    indptr, rows, cols, vals = build_graph(args.n, args.deg)
    del indptr
    n = args.n
    fmt = S.build_fused_cell_spmv_arrays(n, n, rows, cols, vals, cw=16384)
    assert fmt is not None and fmt.layout == 4, fmt and fmt.layout
    cwr = fmt.cw // 128
    n_rb = fmt.n_row_blocks
    tiles = fmt.n_tiles
    nb = tiles // K

    x = jnp.asarray(np.random.default_rng(1).random(n, dtype=np.float32))
    nwr = (n + fmt.cw - 1) // fmt.cw * cwr
    x2d = jnp.zeros((nwr * 128,), jnp.float32).at[:n].set(x).reshape(nwr, 128)

    out_shape = jax.ShapeDtypeStruct((n_rb * 128, 128), jnp.float32)
    dsem = None
    if os.environ.get("PROBE_DSEM"):
        dsem = (os.environ["PROBE_DSEM"],)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024,
                                   dimension_semantics=dsem)

    def gspec(n_f_operands, fblock):
        f_specs = [
            pl.BlockSpec(fblock, lambda c, rb, wb: (c, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_f_operands)
        ]
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # rb_of_tile, wb_of_batch
            grid=(nb,),
            in_specs=f_specs + [
                pl.BlockSpec((cwr, 128), lambda c, rb, wb: (wb[c], 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_rb * 128, 128),
                                   lambda c, rb, wb: (0, 0),
                                   memory_space=pltpu.VMEM),
        )

    body = S._make_pair_body(lambda a, b: a * b, jnp.add, 0.0, cwr, 4)
    acc = body.acc

    def k_full(rb_ref, wb_ref, f_ref, x_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for p in range(K // 2):
            body(p, c * K, rb_ref, f_ref, x_ref, out_ref)

    def k_fullfix(rb_ref, wb_ref, f_ref, x_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        fixed = _FixedRB()
        for p in range(K // 2):
            acc(0, fixed, lambda a, b, p=p: f_ref[p, a:b],
                lambda q: x_ref[8 * q:8 * q + 8], out_ref)

    def k_stream(rb_ref, wb_ref, f_ref, x_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        s = jnp.zeros((8, 128), jnp.float32)
        for p in range(K // 2):
            s = s + lax.bitcast_convert_type(f_ref[p, 0:8], jnp.float32)
        out_ref[0:8] = out_ref[0:8] + s

    def k_stream2(rb_ref, wb_ref, fe_ref, fo_ref, x_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        s = jnp.zeros((8, 128), jnp.float32)
        for p in range(K // 4):
            s = s + lax.bitcast_convert_type(fe_ref[p, 0:8], jnp.float32)
            s = s + lax.bitcast_convert_type(fo_ref[p, 0:8], jnp.float32)
        out_ref[0:8] = out_ref[0:8] + s

    def k_gather(rb_ref, wb_ref, f_ref, x_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        siota = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        sh8 = (siota % 4) * 8
        s = jnp.zeros((8, 128), jnp.float32)
        for p in range(K // 2):
            for voff, woff in ((0, 8), (12, 20)):
                w_words = f_ref[p, woff:woff + 2]
                wrep = jnp.concatenate(
                    [w_words[0:1]] * 4 + [w_words[1:2]] * 4, axis=0)
                wbyte = (wrep >> sh8) & 0xFF
                valid = (wbyte & 0x80) != 0
                w7 = wbyte & 0x7F
                r3 = w7 & 7
                m4 = w7 >> 3
                xg = jnp.zeros((8, 128), jnp.float32)
                for q in range(cwr // 8):
                    cand = jnp.take_along_axis(x_ref[8 * q: 8 * q + 8], r3,
                                               axis=0)
                    xg = jnp.where(m4 == q, cand, xg)
                vv = lax.bitcast_convert_type(f_ref[p, voff:voff + 8],
                                              jnp.float32)
                s = s + jnp.where(valid, vv * xg, 0.0)
        out_ref[0:8] = out_ref[0:8] + s

    def k_dummy_alu(rb_ref, wb_ref, f_ref, x_ref, out_ref):
        # stream + ~16 register-only VPU ops per tile, f_ref NEVER read:
        # if this is additive with stream, DMA overlaps NO VPU work at all
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        s = x_ref[0:8] + jnp.float32(c)
        for _ in range(16 * K):
            s = s * 1.0001 + 2.0
        out_ref[0:8] = out_ref[0:8] + s

    def k_dummy_vmem(rb_ref, wb_ref, f_ref, x_ref, out_ref):
        # stream + per-tile VMEM reads of x rows (not the DMA'd operand)
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        s = jnp.zeros((8, 128), jnp.float32) + jnp.float32(c)
        for j in range(2 * K):
            s = s * 1.0001 + x_ref[8 * (j % 16): 8 * (j % 16) + 8]
        out_ref[0:8] = out_ref[0:8] + s

    def k_full2(rb_ref, wb_ref, fe_ref, fo_ref, x_ref, out_ref):
        # real kernel over even/odd pair half-operands (2 DMA streams)
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for p in range(K // 2):
            ref = fe_ref if p % 2 == 0 else fo_ref
            acc(c * K + 2 * p, rb_ref,
                lambda a, b, p=p, ref=ref: ref[p // 2, a:b],
                lambda q: x_ref[8 * q:8 * q + 8], out_ref)

    def k_fullx(rb_ref, wb_ref, f_ref, x_ref, out_ref):
        # real kernel, x resident whole in VMEM, window sliced in-kernel
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        wbase = wb_ref[c] * cwr
        xw = x_ref.at[pl.ds(wbase, cwr)]
        for p in range(K // 2):
            body(p, c * K, rb_ref, f_ref, xw, out_ref)

    probes = {
        "fullx": (k_fullx, 1),
        "full2": (k_full2, 2),
        "full": (k_full, 1),
        "fullfix": (k_fullfix, 1),
        "stream": (k_stream, 1),
        "stream2": (k_stream2, 2),
        "gather": (k_gather, 1),
        "dummy_alu": (k_dummy_alu, 1),
        "dummy_vmem": (k_dummy_vmem, 1),
    }

    # -- manual-loop overlap probes: per batch {start DMA; ~1.3us ALU
    # chain; wait DMA} vs the same loop with no DMA at all.  If the DMA'd
    # batch costs ~0 extra, engines progress during VPU compute (overlap
    # is achievable and the grid pipeline is the problem); if it costs
    # the full stream time, DMA and VPU serialize at the hardware/Mosaic
    # level and the only levers are fewer bytes and fewer VPU ops.
    def make_manual(with_dma, alu_iters=600, real=False):
        ppb = K // 2

        def kernel(rb_ref, wb_ref, f_hbm, x_ref, out_ref):
            def body(scratch, sem_ref):
                out_ref[:] = jnp.zeros_like(out_ref)

                def get_dma(slot, c):
                    return pltpu.make_async_copy(
                        f_hbm.at[pl.ds(c * ppb, ppb)],
                        scratch.at[slot],
                        sem_ref.at[slot],
                    )

                if with_dma:
                    get_dma(0, 0).start()
                    get_dma(0, 0).wait()
                elif real:
                    # valid (stale) data so invl/S fields are in range
                    for sl in (0, 1):
                        get_dma(sl, 0).start()
                        get_dma(sl, 0).wait()

                def loop_body(c, s):
                    slot = lax.rem(c, 2)
                    # issue the NEXT batch's DMA before computing on the
                    # CURRENT slot; wait for it only at iteration end
                    if with_dma:
                        @pl.when(c + 1 < nb)
                        def _():
                            get_dma(1 - slot, c + 1).start()
                    if real:
                        for p in range(ppb):
                            acc(c * K + 2 * p, rb_ref,
                                lambda a, b, p=p, slot=slot:
                                scratch[slot, p, a:b],
                                lambda q: x_ref[8 * q:8 * q + 8], out_ref)
                    else:
                        for _ in range(alu_iters):
                            s = s * 1.0001 + 2.0
                    if with_dma:
                        @pl.when(c + 1 < nb)
                        def _():
                            get_dma(1 - slot, c + 1).wait()
                        if not real:
                            s = s + lax.bitcast_convert_type(
                                scratch[slot, 0, 0:8], jnp.float32)
                    return s

                s0 = x_ref[0:8] * 1.0
                s = lax.fori_loop(0, nb, loop_body, s0)
                out_ref[0:8] = out_ref[0:8] + s

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((2, ppb, 40, 128), jnp.int32),
                sem_ref=pltpu.SemaphoreType.DMA((2,)),
            )

        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=out_shape,
            compiler_params=cparams,
        )

    names = list(probes) if args.probe == "all" else [args.probe]
    results = {}

    # -- software-pipelined manual kernel with STATIC slot indexing: the
    # fori_loop body handles TWO batches (slot 0 then slot 1), so every
    # scratch access has a static leading index (the grid pipeline's
    # codegen quality) while the DMAs are issued a full batch ahead (the
    # run_scoped overlap the grid pipeline lacks).
    if args.probe == "sw2":
        ppb = K // 2
        nb2 = nb - (nb % 2)

        def kernel(rb_ref, wb_ref, f_hbm, x_ref, out_ref):
            def body(scratch, sem_ref):
                out_ref[:] = jnp.zeros_like(out_ref)

                def get_dma(slot, c):
                    return pltpu.make_async_copy(
                        f_hbm.at[pl.ds(c * ppb, ppb)],
                        scratch.at[slot],
                        sem_ref.at[slot],
                    )

                get_dma(0, 0).start()
                get_dma(1, 1).start()

                def compute(slot, c):
                    if os.environ.get("PROBE_STATIC_X") == "1":
                        xw = x_ref.at[pl.ds(0, cwr)]  # timing-only: wrong window
                    else:
                        wbase = wb_ref[c] * cwr
                        xw = x_ref.at[pl.ds(wbase, cwr)]
                    for p in range(ppb):
                        acc(c * K + 2 * p, rb_ref,
                            lambda a, b, p=p, slot=slot:
                            scratch[slot, p, a:b],
                            lambda q: xw[8 * q:8 * q + 8], out_ref)

                def iter_body(i, _):
                    c0 = 2 * i
                    c1 = 2 * i + 1
                    get_dma(0, c0).wait()
                    compute(0, c0)

                    @pl.when(c0 + 2 < nb2)
                    def _():
                        get_dma(0, c0 + 2).start()

                    get_dma(1, c1).wait()
                    compute(1, c1)

                    @pl.when(c1 + 2 < nb2)
                    def _():
                        get_dma(1, c1 + 2).start()

                    return 0

                lax.fori_loop(0, nb2 // 2, iter_body, 0)

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((2, ppb, 40, 128), jnp.int32),
                sem_ref=pltpu.SemaphoreType.DMA((2,)),
            )

        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=out_shape,
            compiler_params=cparams,
        )

        @jax.jit
        def stepsw(rb, wb, f, y, k, call=call):
            o = call(rb, wb, f, y)
            return y * (1.0 + k * 1e-9) + 1e-30 * o[0:1, 0:1], o

        y = x2d
        y, o = stepsw(fmt.rb_of_tile, fmt.wb_of_batch, fmt.fused, y,
                      jnp.float32(0))
        np.asarray(jnp.sum(o[0]))
        best = float("inf")
        for _ in range(2):
            y = x2d
            t0 = time.perf_counter()
            for k in range(args.iters):
                y, o = stepsw(fmt.rb_of_tile, fmt.wb_of_batch, fmt.fused,
                              y, jnp.float32(k % 97))
            np.asarray(jnp.sum(o[0]) + jnp.sum(y[0]))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results["sw2"] = round(best * 1e9 / tiles, 1)
        names = []

    # -- emit_pipeline variants: manual inner pipeline over the fused
    # blocks (outer pallas_call holds x + out resident in VMEM), with a
    # configurable buffer count.  Tests whether the hand-rolled pipeline
    # scheduler overlaps the fused-block DMA with real pair compute where
    # the automatic grid pipeline does not.
    if args.probe.startswith("ep"):
        nbuf = int(os.environ.get("PROBE_BUFS", "2"))
        lookahead = os.environ.get("PROBE_LOOKAHEAD") == "1"
        kind = args.probe  # ep_stream | ep_full

        def make_ep():
            fspec = pl.BlockSpec(
                (K // 2, 40, 128), lambda c: (c, 0, 0),
                pipeline_mode=pl.Buffered(buffer_count=nbuf,
                                          use_lookahead=lookahead))

            def outer(rb_ref, wb_ref, f_hbm, x_ref, out_ref):
                out_ref[:] = jnp.zeros_like(out_ref)

                def inner(f_ref):
                    c = pl.program_id(0)
                    if kind == "ep_stream":
                        s = jnp.zeros((8, 128), jnp.float32)
                        for p in range(K // 2):
                            s = s + lax.bitcast_convert_type(
                                f_ref[p, 0:8], jnp.float32)
                        out_ref[0:8] = out_ref[0:8] + s
                    else:
                        wbase = wb_ref[c] * cwr
                        for p in range(K // 2):
                            acc(c * K + 2 * p, rb_ref,
                                lambda a, b, p=p: f_ref[p, a:b],
                                lambda q: x_ref[
                                    pl.ds(wbase + 8 * q, 8)], out_ref)

                pipe = pltpu.emit_pipeline(
                    inner, grid=(nb,), in_specs=[fspec])
                pipe(f_hbm)

            return pl.pallas_call(
                outer,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(1,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
                out_shape=out_shape,
                compiler_params=cparams,
            )

        call = make_ep()

        @jax.jit
        def stepep(rb, wb, f, y, k, call=call):
            o = call(rb, wb, f, y)
            return y * (1.0 + k * 1e-9) + 1e-30 * o[0:1, 0:1], o

        y = x2d
        y, o = stepep(fmt.rb_of_tile, fmt.wb_of_batch, fmt.fused, y,
                      jnp.float32(0))
        np.asarray(jnp.sum(o[0]))
        best = float("inf")
        for _ in range(2):
            y = x2d
            t0 = time.perf_counter()
            for k in range(args.iters):
                y, o = stepep(fmt.rb_of_tile, fmt.wb_of_batch, fmt.fused,
                              y, jnp.float32(k % 97))
            np.asarray(jnp.sum(o[0]) + jnp.sum(y[0]))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results[f"{kind}_b{nbuf}{'L' if lookahead else ''}"] = round(
            best * 1e9 / tiles, 1)
        names = []

    # -- no-prefetch variants: is the PrefetchScalarGridSpec (or the
    # data-dependent x-window spec) what serializes DMA vs compute?
    if args.probe in ("np", "all"):
        def k_streamnp(f_ref, out_ref):
            c = pl.program_id(0)

            @pl.when(c == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            s = jnp.zeros((8, 128), jnp.float32)
            for p in range(K // 2):
                s = s + lax.bitcast_convert_type(f_ref[p, 0:8], jnp.float32)
            out_ref[0:8] = out_ref[0:8] + s

        def k_compnp(f_ref, out_ref):
            c = pl.program_id(0)

            @pl.when(c == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            s = jnp.zeros((8, 128), jnp.float32) + jnp.float32(c)
            for _ in range(16 * K):
                s = s * 1.0001 + 2.0
            out_ref[0:8] = out_ref[0:8] + s

        bufmode = None
        nbuf = int(os.environ.get("PROBE_BUFS", "0"))
        if nbuf:
            bufmode = pl.Buffered(buffer_count=nbuf)
        for nm, kern in (("streamnp", k_streamnp), ("compnp", k_compnp)):
            call = pl.pallas_call(
                kern,
                grid=(nb,),
                in_specs=[pl.BlockSpec((K // 2, 40, 128),
                                       lambda c: (c, 0, 0),
                                       pipeline_mode=bufmode,
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((n_rb * 128, 128), lambda c: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=out_shape,
                compiler_params=cparams,
            )

            @jax.jit
            def stepnp(f, y, k, call=call):
                o = call(f)
                return y * (1.0 + k * 1e-9) + 1e-30 * o[0:1, 0:1], o

            y = x2d
            y, o = stepnp(fmt.fused, y, jnp.float32(0))
            np.asarray(jnp.sum(o[0]))
            best = float("inf")
            for _ in range(2):
                y = x2d
                t0 = time.perf_counter()
                for k in range(args.iters):
                    y, o = stepnp(fmt.fused, y, jnp.float32(k % 97))
                np.asarray(jnp.sum(o[0]) + jnp.sum(y[0]))
                best = min(best, (time.perf_counter() - t0) / args.iters)
            results[nm] = round(best * 1e9 / tiles, 1)
        if args.probe == "np":
            names = []
    if args.probe in ("overlap", "overlap_real", "all"):
        cases = (("manual_dma_alu", True, False), ("manual_alu", False, False))
        if args.probe == "overlap_real":
            cases = (("manual_dma_real", True, True),
                     ("manual_real", False, True))
        elif args.probe == "all":
            cases = (("manual_dma_real", True, True),
                     ("manual_real", False, True)) + cases
        for nm, wd, rl in cases:
            call = make_manual(wd, real=rl)

            @jax.jit
            def step(rb, wb, f, y, k, call=call):
                o = call(rb, wb, f, y)
                return y * (1.0 + k * 1e-9) + 1e-30 * o[0:1, 0:1], o

            y = x2d
            y, o = step(fmt.rb_of_tile, fmt.wb_of_batch, fmt.fused, y,
                        jnp.float32(0))
            np.asarray(jnp.sum(o[0]))
            best = float("inf")
            for _ in range(2):
                y = x2d
                t0 = time.perf_counter()
                for k in range(args.iters):
                    y, o = step(fmt.rb_of_tile, fmt.wb_of_batch, fmt.fused,
                                y, jnp.float32(k % 97))
                np.asarray(jnp.sum(o[0]) + jnp.sum(y[0]))
                best = min(best, (time.perf_counter() - t0) / args.iters)
            results[nm] = round(best * 1e9 / tiles, 1)
        if args.probe == "overlap":
            names = []
    # -- field-split two-operand probe: operand V = the 16 value rows per
    # pair, operand M = the 24 metadata rows (w/invl/S).  Unlike full2's
    # even/odd split, every pair's body reads BOTH refs with static
    # offsets, and both blocks stay whole-vreg-aligned (16 and 24 rows).
    # Tests whether two concurrent DMA streams (23.5 ns/tile floor) are
    # reachable without full2's compute-codegen penalty.
    if args.probe in ("fullsplit", "all"):
        fnp = np.asarray(fmt.fused)
        fv = jnp.asarray(np.ascontiguousarray(
            fnp[:, np.r_[0:8, 12:20], :]))
        fm = jnp.asarray(np.ascontiguousarray(
            fnp[:, np.r_[8:12, 20:24, 24:40], :]))
        del fnp

        def split_body(rb_off, rb_ref, frv, frm, xs, out_ref):
            # V rows: [0:8)=valsA [8:16)=valsB
            # M rows: [0:2)=wA [2:4)=iA [4:6)=wB [6:8)=iB [8:24)=S
            siota = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            sh8 = (siota % 4) * 8
            sh4 = siota * 4

            def half(voff, woff, ioff):
                w_words = frm(woff, woff + 2)
                wrep = jnp.concatenate(
                    [w_words[0:1]] * 4 + [w_words[1:2]] * 4, axis=0)
                wbyte = (wrep >> sh8) & 0xFF
                valid = (wbyte & 0x80) != 0
                w7 = wbyte & 0x7F
                r3 = w7 & 7
                m4 = w7 >> 3
                xg = jnp.zeros((8, 128), jnp.float32)
                for q in range(cwr // 8):
                    cand = jnp.take_along_axis(xs(q), r3, axis=0)
                    xg = jnp.where(m4 == q, cand, xg)
                vals = lax.bitcast_convert_type(frv(voff, voff + 8),
                                                jnp.float32)
                prod = jnp.where(valid, vals * xg, 0.0)
                i_words = frm(ioff, ioff + 2)
                irep = jnp.concatenate(
                    [i_words[0:1]] * 4 + [i_words[1:2]] * 4, axis=0)
                inv = (irep >> sh8) & 0xFF
                return jnp.take_along_axis(prod, inv, axis=1)

            psA = half(0, 0, 2)
            psB = half(8, 4, 6)
            partsA, partsB = [], []
            for q in range(16):
                sw = jnp.broadcast_to(frm(8 + q, 9 + q), (8, 128))
                sk = (sw >> sh4) & 0xF
                skm = sk & 7
                gkA = jnp.take_along_axis(psA, skm, axis=0)
                gkB = jnp.take_along_axis(psB, skm, axis=0)
                isA = sk < 8
                partsA.append(jnp.where(isA, gkA, 0.0))
                partsB.append(jnp.where(isA, 0.0, gkB))
            deltaA = jnp.concatenate(partsA, axis=0)
            deltaB = jnp.concatenate(partsB, axis=0)
            g0A = rb_ref[rb_off] * 128
            out_ref[pl.ds(g0A, 128)] = out_ref[pl.ds(g0A, 128)] + deltaA
            g0B = rb_ref[rb_off + 1] * 128
            out_ref[pl.ds(g0B, 128)] = out_ref[pl.ds(g0B, 128)] + deltaB

        def k_fullsplit(rb_ref, wb_ref, fv_ref, fm_ref, x_ref, out_ref):
            c = pl.program_id(0)

            @pl.when(c == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            for p in range(K // 2):
                split_body(c * K + 2 * p, rb_ref,
                           lambda a, b, p=p: fv_ref[p, a:b],
                           lambda a, b, p=p: fm_ref[p, a:b],
                           lambda q: x_ref[8 * q: 8 * q + 8], out_ref)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((K // 2, 16, 128), lambda c, rb, wb: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K // 2, 24, 128), lambda c, rb, wb: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cwr, 128), lambda c, rb, wb: (wb[c], 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_rb * 128, 128),
                                   lambda c, rb, wb: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(k_fullsplit, grid_spec=gs,
                              out_shape=out_shape, compiler_params=cparams)

        @jax.jit
        def stepfs(rb, wb, v, m, y, k, call=call):
            o = call(rb, wb, v, m, y)
            return y * (1.0 + k * 1e-9) + 1e-30 * o[0:1, 0:1], o

        y = x2d
        y, o = stepfs(fmt.rb_of_tile, fmt.wb_of_batch, fv, fm, y,
                      jnp.float32(0))
        if os.environ.get("PROBE_CHECK") == "1":
            import scipy.sparse as sp
            A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
            got = np.asarray(o).reshape(-1)[:n]
            assert np.allclose(got, A @ np.asarray(x), rtol=1e-4,
                               atol=1e-5), "fullsplit MISMATCH"
        np.asarray(jnp.sum(o[0]))
        best = float("inf")
        for _ in range(2):
            y = x2d
            t0 = time.perf_counter()
            for k in range(args.iters):
                y, o = stepfs(fmt.rb_of_tile, fmt.wb_of_batch, fv, fm,
                              y, jnp.float32(k % 97))
            np.asarray(jnp.sum(o[0]) + jnp.sum(y[0]))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results["fullsplit"] = round(best * 1e9 / tiles, 1)
        if args.probe == "fullsplit":
            names = []

    fe = fmt.fused[0::2]
    fo = fmt.fused[1::2]

    for name in names:
        if name not in probes:
            continue
        kern, nops = probes[name]
        if nops == 2:
            fblock = (K // 4, 40, 128)
            operands = (fe, fo)
        else:
            fblock = (K // 2, 40, 128)
            operands = (fmt.fused,)
        if name == "fullx":
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nb,),
                in_specs=[pl.BlockSpec(fblock, lambda c, rb, wb: (c, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((nwr, 128), lambda c, rb, wb: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((n_rb * 128, 128),
                                       lambda c, rb, wb: (0, 0),
                                       memory_space=pltpu.VMEM),
            )
        else:
            gs = gspec(nops, fblock)
        call = pl.pallas_call(
            kern,
            grid_spec=gs,
            out_shape=out_shape,
            compiler_params=cparams,
        )

        @jax.jit
        def step(rb, wb, ops, y, k, call=call):
            o = call(rb, wb, *ops, y)
            return y * (1.0 + k * 1e-9) + 1e-30 * o[0:1, 0:1], o

        def stepc(y, k):
            return step(fmt.rb_of_tile, fmt.wb_of_batch, operands, y, k)

        y = x2d
        y, o = stepc(y, jnp.float32(0))
        np.asarray(jnp.sum(o[0]))
        best = float("inf")
        for _ in range(2):
            y = x2d
            t0 = time.perf_counter()
            for k in range(args.iters):
                y, o = stepc(y, jnp.float32(k % 97))
            np.asarray(jnp.sum(o[0]) + jnp.sum(y[0]))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results[name] = round(best * 1e9 / tiles, 1)

    if args.probe in ("all", "xla"):
        @jax.jit
        def xstep(f, y, k):
            s = jnp.sum(lax.bitcast_convert_type(f, jnp.float32)
                        * (1.0 + k * 1e-12), dtype=jnp.float32)
            return y + s * 1e-30

        def xstepc(y, k):
            return xstep(fmt.fused, y, k)

        y = jnp.float32(0)
        y = xstepc(y, jnp.float32(0))
        np.asarray(y)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for k in range(args.iters):
                y = xstepc(y, jnp.float32(k % 97))
            np.asarray(y)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results["xla_sum"] = round(best * 1e9 / tiles, 1)
        results["xla_sum_gbps"] = round(fmt.fused.nbytes / best / 1e9, 1)

    print(json.dumps({
        "K": K, "tiles": tiles, "pad": round(fmt.slots / fmt.nnz, 3),
        "bytes_per_tile": int(fmt.fused.nbytes // tiles),
        "ns_per_tile": results,
    }))


if __name__ == "__main__":
    main()
