"""Diagnose the r2->r4 PageRank regression (VERDICT r4 item 3).

bench_suite's pagerank_ms measured 19.8 ms in round 2 and 37.2 ms in
round 4 on the identical workload (uniform 1M v / 16.8M e, eps=1e-6).
This script decomposes the current pr() into parts on hardware:

  - iteration count of the while_loop (eps landing),
  - per-step cost of the inner fused-kernel apply (fori chain),
  - alg.pr wall time as bench_suite measures it,
  - variants: fixed cw=16384 vs auto, S-format, MXU cell format,
    error-check cadence.

Run serialized on the TPU (no other TPU process!).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_suite import random_graph  # noqa: E402
from spla_tpu import algorithms as alg  # noqa: E402
from spla_tpu import formats as F  # noqa: E402


def t(label, fn, reps=3):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)
    return best


def main():
    n = 1 << 20
    A = random_graph(n, 16)
    outdeg = np.asarray(A.sum(axis=0)).ravel()
    outdeg[outdeg == 0] = 1
    Ap = F.csr_from_scipy(
        A.multiply(0.85 / outdeg).tocsr().astype(np.float32))
    print("device:", jax.devices()[0].platform, flush=True)

    from spla_tpu.algorithms import _monoid_apply, _mult
    from spla_tpu.pallas.spmv import (
        get_best_monoid_format,
        get_fused_format,
    )

    fmtM, ap_fn = get_best_monoid_format(Ap)
    print("fmt: layout", fmtM.layout, "cw", fmtM.cw, "tiles", fmtM.n_tiles,
          "pad", round(fmtM.slots / fmtM.nnz, 3), flush=True)

    # --- iteration count: replicate the while_loop with a counter out
    @jax.jit
    def pr_iters(fmt, alpha, eps):
        nn = fmt.m
        addition = (1.0 - alpha) / nn
        p0 = jnp.full((nn,), 1.0 / nn, jnp.float32)

        def cond(s):
            return (s[1] > eps) & (s[2] < 10_000)

        def body(s):
            p_prev, _, it = s
            apv = _monoid_apply(fmt)(fmt, p_prev, op_mul=_mult,
                                     op_add=jnp.add, identity=0.0)
            p = apv + addition
            err = jnp.sqrt(jnp.sum((p - p_prev) ** 2))
            return (p, err, it + 1)

        p, err, it = jax.lax.while_loop(
            cond, body, (p0, jnp.float32(eps) + 0.1, jnp.int32(0)))
        return it, err

    it, err = pr_iters(fmtM, jnp.float32(0.85), jnp.float32(1e-6))
    print("iterations:", int(it), "final err:", float(err), flush=True)

    # --- per-step inner apply cost (fori chain, no error check)
    @jax.jit
    def chain_apply(fmt, x, k):
        def body(i, x):
            return _monoid_apply(fmt)(fmt, x, op_mul=_mult, op_add=jnp.add,
                                      identity=0.0) + (i * 0 + 1) * 1e-12

        return jax.lax.fori_loop(0, k, body, x)

    x0 = jnp.full((n,), 1.0 / n, jnp.float32)
    K = 50

    def run_chain():
        np.asarray(jnp.sum(chain_apply(fmtM, x0, K)))

    step = t(f"fused apply x{K} (fori)", run_chain) / K
    print(f"  -> {step*1e3:.3f} ms/step", flush=True)

    # --- per-step WITH the error check (the while_loop body shape)
    @jax.jit
    def chain_with_err(fmt, x, k):
        def body(i, carry):
            x, acc = carry
            p = _monoid_apply(fmt)(fmt, x, op_mul=_mult, op_add=jnp.add,
                                   identity=0.0) + 1e-7
            err = jnp.sqrt(jnp.sum((p - x) ** 2))
            return (p, acc + err)

        return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))

    def run_chain_err():
        p, acc = chain_with_err(fmtM, x0, K)
        np.asarray(acc)

    step_e = t(f"fused apply + err x{K} (fori)", run_chain_err) / K
    print(f"  -> {step_e*1e3:.3f} ms/step", flush=True)

    # --- alg.pr as bench_suite drives it (5-chain)
    def run_pr_chain():
        al = jnp.float32(0.85)
        for k in range(5):
            p = alg.pr(Ap, al, 1e-6)
            al = jnp.float32(0.85) + p.values[0] * 0 + jnp.float32(k * 1e-9)
        np.asarray(al)

    tot = t("alg.pr x5 (bench_suite shape)", run_pr_chain) / 5
    print(f"  -> {tot*1e3:.2f} ms per pr", flush=True)

    # --- variant: fixed narrow cw
    fmt16 = get_fused_format(Ap, 16384)
    if fmt16 is not None and fmt16.cw != fmtM.cw:
        print("fmt16: cw", fmt16.cw, "tiles", fmt16.n_tiles, flush=True)
        it2, _ = pr_iters(fmt16, jnp.float32(0.85), jnp.float32(1e-6))

        def run16():
            np.asarray(jnp.sum(chain_apply(fmt16, x0, K)))

        s2 = t(f"fused cw16384 apply x{K}", run16) / K
        print(f"  -> {s2*1e3:.3f} ms/step, iters {int(it2)}", flush=True)

    # --- while_loop overhead probe: same body through while_loop
    @jax.jit
    def chain_while(fmt, x, k):
        def cond(s):
            return s[2] < k

        def body(s):
            p_prev, _, it = s
            apv = _monoid_apply(fmt)(fmt, p_prev, op_mul=_mult,
                                     op_add=jnp.add, identity=0.0)
            p = apv + 1e-7
            err = jnp.sqrt(jnp.sum((p - p_prev) ** 2))
            return (p, err, it + 1)

        return jax.lax.while_loop(cond, body,
                                  (x, jnp.float32(1.0), jnp.int32(0)))

    def run_while():
        p, e, i = chain_while(fmtM, x0, K)
        np.asarray(e)

    sw = t(f"while_loop same body x{K}", run_while) / K
    print(f"  -> {sw*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
