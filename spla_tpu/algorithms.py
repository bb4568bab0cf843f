"""Graph algorithms built purely from the library's own primitives.

TPU-native redesign of the reference algorithms layer
(``src/algorithm.cpp``): BFS (:45-120), SSSP (:158-229), PageRank
(:278-335), triangle counting (:380-414), plus the naive sequential
oracles (:122-152, :231-272, :337-374, :416-448) used for validation.

Key TPU difference: the reference reads a frontier-count scalar back to
the host every iteration (``src/algorithm.cpp:112`` — a device→host sync
per level); here each loop is a single ``jax.lax.while_loop`` whose
convergence scalar stays on device, so a full BFS/SSSP/PageRank run is
ONE XLA program with zero host round-trips.

Traversal direction: the reference picks push (sparse frontier × matrix)
vs pull (matrix × dense vector) by frontier density
(``src/algorithm.cpp:93-100``).  On TPU both directions evaluate the same
static-shape masked SpMV — push exploits frontier sparsity through the
validity mask (XLA skips no work, but the Pallas kernels early-out on
all-inactive tiles); the descriptor is accepted for API parity and used
to choose the A vs A^T orientation.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import op as OP
from .containers import CsrMatrix, DenseVec, Scalar
from .descriptor import Descriptor
from .formats import WeakIdCache, csr_transpose_host

_TC_PATTERN_CACHE = WeakIdCache()  # is-0/1-pattern verdicts, keyed on values
_AT_CACHE = WeakIdCache()  # default A^T per matrix (bfs/sssp pull kernels)
from .ops.spmv import masked_spmv, masked_spmv_structural


def _default_At(A: CsrMatrix) -> CsrMatrix:
    """A^T for the pull traversal kernels when the caller gave none.

    The reference traverses by PUSH over A's rows (vxm:
    ``r[j] = or/min_i f[i] (x) A[i,j]``, ``src/algorithm.cpp:97``); the
    pull kernels here compute ``mxv(At, f)``, which matches only when
    ``At = A^T``.  Directed graphs therefore need the transpose — an
    ``At=A`` default silently walks REVERSED edges on any non-symmetric
    matrix.  Cached per matrix.  Symmetric matrices (the benchmark
    graphs) return A itself so packed-format caches keyed on A still
    hit; callers that already know A is symmetric should pass ``At=A``
    explicitly and skip this check.
    """
    hit = _AT_CACHE.get(A.values)
    if hit is not None:
        return hit
    T = csr_transpose_host(A)
    # T is canonical A^T; transposing again gives canonical A, so the
    # comparison is order-insensitive even when A's cols are unsorted.
    T2 = csr_transpose_host(T)
    if (np.array_equal(np.asarray(T2.indptr), np.asarray(T.indptr))
            and np.array_equal(np.asarray(T2.cols), np.asarray(T.cols))
            and np.array_equal(np.asarray(T2.values), np.asarray(T.values))):
        T = A
    _AT_CACHE.put(A.values, T)
    return T


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False

__all__ = [
    "bfs",
    "sssp",
    "pr",
    "tc",
    "bfs_naive",
    "sssp_naive",
    "pr_naive",
    "tc_naive",
]


# ---------------------------------------------------------------------------
# BFS
# ---------------------------------------------------------------------------


@jax.jit
def _bfs_kernel(At: CsrMatrix, source):
    """v[i] = depth (1-based) of i from source; 0 = unreachable.

    Structure-only traversal (the reference BFS sets struct_only +
    early_exit and uses the BAND/BOR semiring over {0,1} values —
    ``src/algorithm.cpp:88-100``): frontier' = (A^T @ front != 0) & (v == 0).
    """
    n = At.shape[0]
    v0 = jnp.zeros((n,), jnp.int32)
    front0 = jnp.zeros((n,), jnp.bool_).at[source].set(True)

    def cond(state):
        _, _, _, count = state
        return count > 0

    def body(state):
        v, front, depth, _ = state
        v = jnp.where(front, depth, v)
        front_new = masked_spmv_structural(At, front, v == 0)
        return (v, front_new, depth + 1, jnp.sum(front_new).astype(jnp.int32))

    v, front, depth, count = lax.while_loop(
        cond, body, (v0, front0, jnp.int32(1), jnp.int32(1))
    )
    return v


def _structural_or(av, xv):
    return xv  # values are {0,1}; MAX accumulation = boolean OR


@jax.jit
def _bfs_kernel_pallas_balanced(fmt, source):
    """BFS level loop over the hub-split (balanced) structural format —
    the Pallas path for SKEWED graphs (social-network class), which the
    resident/adaptive formats cannot serve (they keep x pre-windowed and
    cannot carry alias columns).  Plain per-level kernel applies with
    the alias-max fold; semantics of :func:`_bfs_kernel`."""
    from .pallas.spmv import fused_cell_spmv_apply

    n = fmt.m_orig
    v0 = jnp.zeros((n,), jnp.int32)
    front0 = jnp.zeros((n,), jnp.float32).at[source].set(1.0)

    def cond(state):
        return state[3] > 0

    def body(state):
        v, front, depth, _ = state
        v = jnp.where(front > 0, depth, v)
        hits = fused_cell_spmv_apply(fmt, front, op_mul=_mult,
                                     op_add=jnp.maximum, identity=0.0,
                                     alias_combine="max")
        front_new = jnp.where((hits > 0) & (v == 0), 1.0, 0.0)
        return (v, front_new, depth + 1,
                jnp.sum(front_new > 0).astype(jnp.int32))

    v, _, _, _ = lax.while_loop(
        cond, body, (v0, front0, jnp.int32(1), jnp.int32(1))
    )
    return v


@jax.jit
def _sssp_kernel_pallas_balanced(fmt, source):
    """Min-plus relaxation over the hub-split value format: the feedback
    validity mask becomes the +inf absorbing input (products from
    unchanged entries cannot win a min); semantics of
    :func:`_sssp_kernel`.  Requires finite weights (caller gates)."""
    from .pallas.spmv import fused_cell_spmv_apply

    n = fmt.m_orig
    inf = jnp.float32(jnp.inf)
    v0 = jnp.full((n,), inf, jnp.float32).at[source].set(0.0)
    valid0 = jnp.zeros((n,), jnp.bool_).at[source].set(True)

    def cond(state):
        return state[2] > 0

    def body(state):
        v, fdb_valid, _ = state
        x = jnp.where(fdb_valid, v, inf)
        # identity must be a PYTHON float (static jit arg of the apply)
        frontier = fused_cell_spmv_apply(fmt, x, op_mul=_minplus_mul,
                                         op_add=jnp.minimum,
                                         identity=float("inf"),
                                         alias_combine="min")
        new_v = jnp.minimum(v, frontier)
        changed = new_v != v
        return (new_v, changed, jnp.sum(changed).astype(jnp.int32))

    v, _, _ = lax.while_loop(cond, body, (v0, valid0, jnp.int32(1)))
    return v


def _monoid_apply(fmt):
    """Pick the apply fn matching the format type (fused routeless, S-table
    scatter, or the mode-1 sweep)."""
    from .pallas.spmv import (
        FusedCellSpmv,
        SCellSpmv,
        fused_cell_spmv_apply,
        monoid_cell_spmv_apply,
        s_cell_spmv_apply,
    )

    if isinstance(fmt, FusedCellSpmv):
        return fused_cell_spmv_apply
    return s_cell_spmv_apply if isinstance(fmt, SCellSpmv) else monoid_cell_spmv_apply


@partial(jax.jit, static_argnames=("monoid",))
def _bfs_kernel_pallas(fmt, source, monoid=True,
                       front_factor=jnp.float32(0.1)):
    """BFS levels with the Pallas cell-SpMV as the traversal kernel: the
    frontier is a {0,1} f32 vector; hits accumulate with MAX (boolean OR)
    on the VPU monoid scatter, or PLUS counting on the MXU fallback.

    With the fused format the per-level traversal is DIRECTION-OPTIMIZED
    (reference ``src/algorithm.cpp:93-100``): levels whose frontier
    density is at most ``front_factor`` run the indirect sparse-grid
    kernel (cost ~ active tiles only), dense levels the full-streaming
    kernel — chosen on device by ``lax.cond``, no host syncs."""
    from .pallas.spmv import (
        FusedCellSpmv,
        cell_spmv_apply,
        fused_spmv2d_adaptive,
    )

    n = fmt.m
    adaptive = isinstance(fmt, FusedCellSpmv) and fmt.m == fmt.n
    if adaptive:
        # 2D-layout loop: for square operators the kernel's padded input
        # (window-major [nwr, 128]) and output ([n_rb*128, 128]) layouts
        # coincide, so v/frontier stay 2D across levels — no per-level
        # flatten/pad round trips (the glue dominated road-graph BFS)
        from .pallas.spmv import (
            LEVEL_UPDATE_CHUNK,
            bfs_level_update_auto,
            bfs_resident,
        )

        # fully-resident whole-BFS kernel when the format fits VMEM
        # (pattern pairs + three state arrays): zero HBM traffic per level
        v_res = bfs_resident(fmt, source)
        if v_res is not None:
            return v_res.reshape(-1)[:n]

        cwr = fmt.cw // 128
        nwr = (fmt.n + fmt.cw - 1) // fmt.cw * cwr
        nwc = nwr // cwr
        R = fmt.n_row_blocks * 128  # R >= nwr (both ceil n/128, R coarser)
        v0 = jnp.zeros((R, 128), jnp.int32)
        front0 = jnp.zeros((R, 128), jnp.float32).at[
            source // 128, source % 128].set(1.0)
        act0 = jnp.any(
            front0[:nwr].reshape(nwc, cwr * 128) > 0, axis=1
        ).astype(jnp.int32)

        # level update (depth assignment, new frontier, next level's
        # window activity, count) fused into ONE Pallas pass (resident,
        # or streaming chunks past BFS_UPDATE_MAX_RB row blocks): the
        # separate XLA elementwise ops measured ~136 us/level on the
        # 2047-level road benchmark
        # frontier chunk activity carried between levels (the sparse
        # slab update touches only active 2048-row chunks; r4 item 7)
        n_ch = max(R // LEVEL_UPDATE_CHUNK, 1)
        fc0 = jnp.zeros((n_ch,), jnp.bool_).at[
            jnp.minimum(source // 128 // LEVEL_UPDATE_CHUNK,
                        n_ch - 1)].set(True)

        def cond2(state):
            return state[4] > 0

        def body2(state):
            v, front, act, depth, _, fc = state
            hits = fused_spmv2d_adaptive(
                fmt, front[:nwr], op_mul=_structural_or,
                op_add=jnp.maximum, identity=0.0,
                front_factor=front_factor, act=act,
            )
            v, front, act, cnt, fc = bfs_level_update_auto(
                fmt, hits, v, front, depth, fc)
            return (v, front, act, depth + 1, cnt, fc)

        v, _, _, _, _, _ = lax.while_loop(
            cond2, body2,
            (v0, front0, act0, jnp.int32(1), jnp.float32(1), fc0),
        )
        # (every frontier gets its depth inside the loop: the update
        # that PRODUCES an empty next-frontier also assigns the last
        # nonempty one)
        return v.reshape(-1)[:n]

    v0 = jnp.zeros((n,), jnp.int32)
    front0 = jnp.zeros((n,), jnp.float32).at[source].set(1.0)

    def cond(state):
        return state[3] > 0

    def body(state):
        v, front, depth, _ = state
        v = jnp.where(front > 0, depth, v)
        if monoid:
            hits = _monoid_apply(fmt)(
                fmt, front, op_mul=_structural_or, op_add=jnp.maximum,
                identity=0.0, skip_inactive=True,
            )
        else:
            hits = cell_spmv_apply(fmt, front, scatter_mode="bf16x1")
        front_new = jnp.where((hits > 0) & (v == 0), 1.0, 0.0)
        return (v, front_new, depth + 1, jnp.sum(front_new))

    v, _, _, _ = lax.while_loop(
        cond, body, (v0, front0, jnp.int32(1), jnp.float32(1))
    )
    return v


def _front_factor_of(descriptor):
    """Map the reference's traversal mode to the adaptive threshold:
    Push = always take the sparse path when it fits, Pull = never,
    PushPull/default = the descriptor's density threshold."""
    if descriptor is None:
        return jnp.float32(0.1)
    if descriptor.push_only:
        return jnp.float32(1.0)
    if descriptor.pull_only:
        return jnp.float32(0.0)
    return jnp.float32(descriptor.front_factor)


def bfs(A: CsrMatrix, source: int, descriptor: Descriptor | None = None,
        At: CsrMatrix | None = None) -> DenseVec:
    """Reference signature: ``bfs(v, A, s, desc)`` — returns depth vector.

    ``At`` is the CSR of A^T, the orientation the pull kernels traverse;
    it defaults to a cached transpose of A (returned as A itself when A
    is symmetric — pass ``At=A`` explicitly for known-undirected graphs
    to skip the one-time symmetry check).  All traversal modes produce
    identical depths; the loop runs fully on device.  On TPU the
    traversal step runs the Pallas cell-SpMV kernel.
    """
    if At is None:
        At = _default_At(A)
    if _on_tpu():
        if _skewed(At):
            # hub graphs: the resident/adaptive formats cannot carry
            # aliases; run plain per-level applies over the hub-split
            # structural format instead (social-network-class BFS)
            from .pallas.spmv import get_balanced_fused_format

            fmtB = get_balanced_fused_format(At, structural=True)
            if fmtB is not None:
                v = _bfs_kernel_pallas_balanced(
                    fmtB, jnp.asarray(source, jnp.int32))
                return DenseVec(v, jnp.int32(0))
        else:
            from .pallas.spmv import (
                get_best_monoid_format,
                get_structural_format,
            )

            fmtM, _ = get_best_monoid_format(At, structural=True)
            if fmtM is not None:
                v = _bfs_kernel_pallas(
                    fmtM, jnp.asarray(source, jnp.int32),
                    front_factor=_front_factor_of(descriptor))
            else:
                fmt = get_structural_format(At)
                v = _bfs_kernel_pallas(fmt, jnp.asarray(source, jnp.int32),
                                       monoid=False)
            return DenseVec(v, jnp.int32(0))
    v = _bfs_kernel(At, jnp.asarray(source, jnp.int32))
    return DenseVec(v, jnp.int32(0))


def bfs_naive(adj: list, source: int) -> np.ndarray:
    """Sequential queue BFS oracle (reference ``src/algorithm.cpp:122-152``)."""
    from collections import deque

    n = len(adj)
    v = np.zeros(n, np.int32)
    visited = np.zeros(n, bool)
    q = deque([source])
    visited[source] = True
    v[source] = 1
    while q:
        i = q.popleft()
        for j in adj[i]:
            if not visited[j]:
                visited[j] = True
                v[j] = v[i] + 1
                q.append(j)
    return v


# ---------------------------------------------------------------------------
# SSSP
# ---------------------------------------------------------------------------


@jax.jit
def _sssp_kernel(At: CsrMatrix, source):
    """Min-plus relaxation with feedback vector (reference
    ``src/algorithm.cpp:158-229``): frontier = feedback x(PLUS,MIN) A;
    v' = min(v, frontier); feedback = changed entries; loop until empty."""
    n = At.shape[0]
    inf = jnp.float32(jnp.inf)
    v0 = jnp.full((n,), inf, jnp.float32).at[source].set(0.0)
    fdb_vals0 = v0
    fdb_valid0 = jnp.zeros((n,), jnp.bool_).at[source].set(True)

    def cond(state):
        return state[3] > 0

    def body(state):
        v, fdb_vals, fdb_valid, _ = state
        frontier, _ = masked_spmv(
            At,
            fdb_vals,
            lambda a, x: x + a,  # mul = PLUS (v[i] + w(i,j))
            OP.MIN_FLOAT,
            inf,
            x_valid=fdb_valid,
        )
        new_v = jnp.minimum(v, frontier)
        changed = new_v != v
        return (new_v, new_v, changed, jnp.sum(changed).astype(jnp.int32))

    v, _, _, _ = lax.while_loop(cond, body, (v0, fdb_vals0, fdb_valid0, jnp.int32(1)))
    return v


def _minplus_mul(av, xv):
    return xv + av


@jax.jit
def _sssp_kernel_pallas(fmt, source, front_factor=jnp.float32(0.1)):
    """Min-plus relaxation with the Pallas monoid kernel (the VPU scatter
    accumulates MIN, which the MXU one-hot path cannot).

    Uses the reference's FEEDBACK-vector semantics
    (``src/algorithm.cpp:158-229``, v_eadd_fdb): only entries whose
    distance changed last iteration re-relax — the rest carry the +inf
    identity, so with the fused format the direction-optimized sparse
    kernel makes late (nearly-converged) iterations cost only the
    changed windows."""
    from .pallas.spmv import (
        FusedCellSpmv,
        fused_spmv2d_adaptive,
    )

    n = fmt.m
    inf = jnp.float32(jnp.inf)
    adaptive = isinstance(fmt, FusedCellSpmv) and fmt.m == fmt.n
    if adaptive:
        # 2D-layout loop (see _bfs_kernel_pallas): v/feedback stay in the
        # kernel's padded layout, no per-level flatten/pad round trips
        from .pallas.spmv import sssp_resident

        # fully-resident whole-SSSP kernel when the value-pair format
        # fits VMEM: zero HBM traffic per relaxation round
        v_res = sssp_resident(fmt, source)
        if v_res is not None:
            return v_res.reshape(-1)[:n]

        from .pallas.spmv import LEVEL_UPDATE_CHUNK, sssp_level_update_auto

        cwr = fmt.cw // 128
        nwr = (fmt.n + fmt.cw - 1) // fmt.cw * cwr
        nwc = nwr // cwr
        R = fmt.n_row_blocks * 128  # R >= nwr
        v0 = jnp.full((R, 128), inf, jnp.float32).at[
            source // 128, source % 128].set(0.0)
        act0 = jnp.any(
            v0[:nwr].reshape(nwc, cwr * 128) < inf, axis=1
        ).astype(jnp.int32)
        # finite-feedback chunk activity carried between rounds (the
        # sparse slab update touches only active 2048-row chunks)
        n_ch = max(R // LEVEL_UPDATE_CHUNK, 1)
        fc0 = jnp.zeros((n_ch,), jnp.bool_).at[
            jnp.minimum(source // 128 // LEVEL_UPDATE_CHUNK,
                        n_ch - 1)].set(True)

        def cond2(state):
            return state[3] > 0

        def body2(state):
            v, fdb, act, _, fc = state
            frontier = fused_spmv2d_adaptive(
                fmt, fdb[:nwr], op_mul=_minplus_mul, op_add=jnp.minimum,
                identity=float("inf"), front_factor=front_factor, act=act,
            )
            # min-merge + feedback + next-level window activity + count,
            # chunk-sparse at HBM scale (streaming kernel otherwise)
            new_v, fdb_new, act, changed, fc = sssp_level_update_auto(
                fmt, frontier, v, fc)
            return (new_v, fdb_new, act, changed, fc)

        v, _, _, _, _ = lax.while_loop(
            cond2, body2, (v0, v0, act0, jnp.float32(1), fc0))
        return v.reshape(-1)[:n]

    v0 = jnp.full((n,), inf, jnp.float32).at[source].set(0.0)
    fdb0 = v0

    def cond(state):
        return state[2] > 0

    def body(state):
        v, fdb, _ = state
        frontier = _monoid_apply(fmt)(
            fmt, fdb, op_mul=_minplus_mul, op_add=jnp.minimum,
            identity=float("inf"), skip_inactive=True,
        )
        new_v = jnp.minimum(v, frontier)
        changed_mask = new_v < v
        fdb_new = jnp.where(changed_mask, new_v, inf)
        changed = jnp.sum(changed_mask).astype(jnp.int32)
        return (new_v, fdb_new, changed)

    v, _, _ = lax.while_loop(cond, body, (v0, fdb0, jnp.int32(1)))
    return v


def sssp(A: CsrMatrix, source: int, descriptor: Descriptor | None = None,
         At: CsrMatrix | None = None) -> DenseVec:
    """Single-source shortest paths; fill/unreachable = +inf (reference
    sets fill_value=inf, ``src/algorithm.cpp:176-178``).  On TPU the
    relaxation runs the Pallas min-plus monoid kernel.

    ``At`` = CSR of A^T (see :func:`bfs`); defaults to a cached
    transpose so directed graphs relax along A's edges, not against
    them."""
    if At is None:
        At = _default_At(A)
    if _on_tpu() and At.values.dtype == jnp.float32:
        if _skewed(At):
            from .ops.spmv import _matrix_finite
            from .pallas.spmv import get_balanced_fused_format

            # +inf absorbing feedback requires finite weights
            if _matrix_finite(At):
                fmtB = get_balanced_fused_format(At)
                if fmtB is not None:
                    v = _sssp_kernel_pallas_balanced(
                        fmtB, jnp.asarray(source, jnp.int32))
                    return DenseVec(v, jnp.float32(jnp.inf))
        else:
            from .pallas.spmv import get_best_monoid_format

            fmt, _ = get_best_monoid_format(At)
            if fmt is not None:
                v = _sssp_kernel_pallas(
                    fmt, jnp.asarray(source, jnp.int32),
                    front_factor=_front_factor_of(descriptor))
                return DenseVec(v, jnp.float32(jnp.inf))
    v = _sssp_kernel(At, jnp.asarray(source, jnp.int32))
    return DenseVec(v, jnp.float32(jnp.inf))


def sssp_naive(adj: list, w: list, source: int) -> np.ndarray:
    """SPFA/Bellman-Ford queue oracle (reference ``src/algorithm.cpp:231-272``)."""
    from collections import deque

    n = len(adj)
    dist = np.full(n, np.inf, np.float32)
    dist[source] = 0.0
    inq = np.zeros(n, bool)
    q = deque([source])
    inq[source] = True
    while q:
        i = q.popleft()
        inq[i] = False
        for j, wx in zip(adj[i], w[i]):
            nd = np.float32(dist[i] + wx)
            if nd < dist[j]:
                dist[j] = nd
                if not inq[j]:
                    q.append(j)
                    inq[j] = True
    return dist


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


@jax.jit
def _pr_kernel(A: CsrMatrix, alpha, eps):
    """p = A·p_prev + (1-alpha)/N until ||p - p_prev||_2 < eps (reference
    ``src/algorithm.cpp:278-335``).  A is expected pre-scaled by the
    caller; note the REFERENCE example scales by the row's own out-degree
    (A[i,j] = alpha/outdeg(i), ``examples/pr.cpp:87``) whereas classic
    PageRank uses the source column's (alpha/outdeg(j)) — this kernel is
    convention-agnostic, pick the scaling when building A."""
    n = A.shape[0]
    addition = (1.0 - alpha) / n
    p0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def cond(state):
        # iteration cap: f32 error can plateau above a tiny eps forever
        return (state[1] > eps) & (state[2] < 10_000)

    def body(state):
        p_prev, _, it = state
        ap, _ = masked_spmv(A, p_prev, OP.MULT_FLOAT, OP.PLUS_FLOAT, jnp.float32(0))
        p = ap + addition
        err = jnp.sqrt(jnp.sum((p - p_prev) ** 2))
        return (p, err, it + 1)

    p, err, _ = lax.while_loop(cond, body, (p0, jnp.float32(eps) + 0.1, jnp.int32(0)))
    return p


def _mult(av, xv):
    return av * xv


def _skewed(A) -> bool:
    """Hub graphs: the resident/adaptive traversal formats cannot use
    alias splitting (x lives pre-windowed across levels), and the plain
    layouts pad catastrophically there (BENCH.md r4: zipf-2.1 padded
    216x and packed for 489 s).  BFS/SSSP/PageRank route to the
    hub-split (balanced) formats with plain per-level kernel applies
    instead."""
    try:
        from .pallas.spmv import is_skewed

        return is_skewed(A)
    except Exception:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("monoid", "combine"))
def _pr_kernel_pallas(fmt, alpha, eps, monoid=True, combine=None):
    from .pallas.spmv import cell_spmv_apply, fused_cell_spmv_apply

    # combine != None: hub-split (balanced) format — the state vector is
    # the ORIGINAL m; apply extends x / folds alias outputs internally
    n = fmt.m_orig if combine is not None else fmt.m
    addition = (1.0 - alpha) / n
    p0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def cond(state):
        return (state[1] > eps) & (state[2] < 10_000)

    def body(state):
        p_prev, _, it = state
        if combine is not None:
            ap = fused_cell_spmv_apply(fmt, p_prev, op_mul=_mult,
                                       op_add=jnp.add, identity=0.0,
                                       alias_combine=combine)
        elif monoid:
            ap = _monoid_apply(fmt)(
                fmt, p_prev, op_mul=_mult, op_add=jnp.add, identity=0.0
            )
        else:
            ap = cell_spmv_apply(fmt, p_prev)
        p = ap + addition
        err = jnp.sqrt(jnp.sum((p - p_prev) ** 2))
        return (p, err, it + 1)

    p, _, _ = lax.while_loop(cond, body, (p0, jnp.float32(eps) + 0.1, jnp.int32(0)))
    return p


def pr(A: CsrMatrix, alpha: float = 0.85, eps: float = 1e-6,
       descriptor: Descriptor | None = None) -> DenseVec:
    if _on_tpu() and A.values.dtype == jnp.float32:
        from .pallas.spmv import (
            get_balanced_fused_format,
            get_best_monoid_format,
            get_cell_format,
            is_skewed,
        )

        if is_skewed(A):
            # hub graphs: the plain layouts pad catastrophically (zipf
            # 2.1 measured 216x); the hub-split format runs the same
            # loop with an alias fold per step
            fmtB = get_balanced_fused_format(A)
            if fmtB is not None:
                p = _pr_kernel_pallas(fmtB, jnp.float32(alpha),
                                      jnp.float32(eps), combine="add")
                return DenseVec(p, jnp.float32(0))
        else:
            fmtM, _ = get_best_monoid_format(A)
            if fmtM is not None:
                p = _pr_kernel_pallas(fmtM, jnp.float32(alpha),
                                      jnp.float32(eps))
            else:
                p = _pr_kernel_pallas(get_cell_format(A), jnp.float32(alpha),
                                      jnp.float32(eps), monoid=False)
            return DenseVec(p, jnp.float32(0))
    p = _pr_kernel(A, jnp.float32(alpha), jnp.float32(eps))
    return DenseVec(p, jnp.float32(0))


def pr_naive(adj_in: list, w_in: list, alpha: float, eps: float) -> np.ndarray:
    """Dense-loop oracle (reference ``src/algorithm.cpp:337-374``):
    adj_in[i] lists in-neighbours k with weight w_in[i][k]."""
    n = len(adj_in)
    p_prev = np.full(n, 1.0 / n, np.float32)
    p = np.zeros(n, np.float32)
    err = eps + 0.1
    while err > eps:
        for i in range(n):
            p[i] = sum(
                wx * p_prev[k] for k, wx in zip(adj_in[i], w_in[i])
            ) + (1.0 - alpha) / n
        err = float(np.sqrt(((p - p_prev) ** 2).sum()))
        p, p_prev = p_prev, p
    return p_prev


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------


def tc(A: CsrMatrix, products_cap: int | None = None) -> int:
    """B = (A·A^T) ⊙ A via mxmT_masked(MULT, PLUS, GTZERO), then
    m_reduce(PLUS) (reference ``src/algorithm.cpp:380-414``).  For the
    full symmetric adjacency this counts each triangle 6 times, matching
    the reference convention.

    The struct_only fast path (values treated as 1, GTZERO select skipped)
    is only taken when A is verifiably a 0/1 pattern — otherwise explicit
    zeros / non-unit entries must go through the value path to match the
    reference semantics."""
    from .ops.spgemm import mxmT_masked
    from .ops.matrix import m_reduce

    is_pattern = _TC_PATTERN_CACHE.get(A.values, ("pat",))
    if is_pattern is None:
        is_pattern = bool(
            np.asarray(jnp.all(jnp.where(A.valid_mask(), A.values, 1) == 1))
        )
        _TC_PATTERN_CACHE.put(A.values, is_pattern, ("pat",))
    if _on_tpu():
        # fused Pallas intersection kernel (reduce folded in) — the
        # reference's cl_mxmT_masked + m_reduce pipeline in one pass
        from .formats import host_coo
        from .pallas.mxmt import pairs_available, pallas_mxmT_reduce

        if pairs_available():
            rows, cols, vals = host_coo(A)
            indptr = np.asarray(A.indptr)
            keep = vals > 0  # GTZERO select on the mask values
            av = np.ones_like(vals, np.float32) if is_pattern else vals
            # f32 exactness gates for the fused reduce: every product and
            # per-lane partial must stay < 2^24 (cf. _pallas_mxmT_try)
            deg_max = float(np.diff(indptr).max(initial=0))
            vmax = 1.0 if is_pattern else float(np.abs(vals).max(initial=0.0))
            prod_bound = vmax * vmax
            # per-lane accumulation across the grid: total products / 1024
            # lanes (uniformly sheared by the job layout) with headroom 4x
            from .ops.spgemm import count_mxmT_products

            total_products = float(count_mxmT_products(A, A))
            lane_bound = prod_bound * 4.0 * total_products / 1024.0
            if prod_bound * deg_max < float(1 << 24) and lane_bound < float(1 << 24):
                r = pallas_mxmT_reduce(
                    rows[keep], cols[keep], indptr, cols, av, indptr, cols,
                    av, cache_key=A.values, tag=("tc", is_pattern),
                )
                if r is not None:
                    return int(round(r))
    B = mxmT_masked(
        A, A, A, OP.MULT_INT, OP.PLUS_INT, OP.GTZERO_INT, 0,
        products_cap=products_cap, struct_only=is_pattern,
    )
    return int(np.asarray(m_reduce(0, B, OP.PLUS_INT).value))


def tc_naive(adj: list) -> int:
    """Sorted-intersection oracle (reference ``src/algorithm.cpp:416-448``)."""
    count = 0
    for row in adj:
        for nb in row:
            a = row
            b = adj[nb]
            i = j = 0
            while i < len(a) and j < len(b):
                if a[i] == b[j]:
                    count += 1
                    i += 1
                    j += 1
                elif a[i] < b[j]:
                    i += 1
                else:
                    j += 1
    return count
