// Joint l/lane class-balancing relabel for the fused cell layouts.
//
// The fused packer's per-tile constraints (native/cellpack.cpp): at most
// 8 entries per LANE class (col % 128) and 8 per OUTPUT-l class
// (row % 128) per tile, so a cell needs ceil(max_class_load / 8) tiles.
// Under random vertex ids the per-cell class loads are Poisson(lambda)
// and the realized MAX over 256 classes carries a ~sqrt(lambda) noise
// term that quantizes straight into padding (measured: pad 3.047 at
// lambda=8, the 8.4M-row uniform benchmark; pad 2.126 at lambda=16).
//
// This helper assigns every vertex a CLASS (its new id mod 128) by
// greedy power-of-d-choices vector scheduling, balancing BOTH families
// at once: vertex v's class decides the output-l loads of cells
// (block(v), w) for each out-edge window w, and the lane loads of cells
// (rb, window(v)) for each in-edge row-block rb.  The permutation is
// WITHIN-BLOCK (v's 16384-block and window membership never change), so
// packs of the relabeled matrix are valid layouts of P A P^T — chained
// iterations (PageRank/BFS/SSSP/power chains) run entirely in permuted
// space and pay ZERO apply-time gathers; only the final result is
// unpermuted once.
//
// No analog exists in the reference: spla's OpenCL CSR kernels have a
// hardware gather/scatter and no class quantization to balance
// (reference formats: src/opencl/cl_formats.hpp:60-101).
//
// C API:
//   classbal_run(m, n, cw, nnz, rows, cols, new_of_old_out, d, seed)
//     -> 0 ok, <0 error.  Square matrices only (m == n).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t ROW_BLOCK = 16384;
constexpr int CLASSES = 128;
// crossing a multiple of 8 in a class load opens a new tile for the
// whole cell: dominate the linear spread term
constexpr int64_t W8 = 1 << 20;

inline uint64_t mix(uint64_t x) {
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return x;
}

}  // namespace

extern "C" int32_t classbal_run(int64_t m, int64_t n, int64_t cw,
                                int64_t nnz, const int32_t* rows,
                                const int32_t* cols, int32_t* new_of_old,
                                int32_t d_cand, uint64_t seed,
                                int32_t passes) {
    if (m != n || m <= 0 || cw <= 0) return -1;
    const int64_t n_rb = (m + ROW_BLOCK - 1) / ROW_BLOCK;
    const int64_t nw = (n + cw - 1) / cw;
    if (nw > 32767 || n_rb > 32767) return -2;

    // per-vertex edge profiles via counting sorts
    std::vector<int64_t> out_off(m + 2, 0), in_off(m + 2, 0);
    for (int64_t e = 0; e < nnz; ++e) {
        ++out_off[rows[e] + 1];
        ++in_off[cols[e] + 1];
    }
    for (int64_t v = 0; v < m + 1; ++v) {
        out_off[v + 1] += out_off[v];
        in_off[v + 1] += in_off[v];
    }
    std::vector<int16_t> out_w(nnz), in_rb(nnz);
    {
        std::vector<int64_t> oc(out_off.begin(), out_off.end() - 1),
            ic(in_off.begin(), in_off.end() - 1);
        for (int64_t e = 0; e < nnz; ++e) {
            out_w[oc[rows[e]]++] = (int16_t)(cols[e] / cw);
            in_rb[ic[cols[e]]++] = (int16_t)(rows[e] / ROW_BLOCK);
        }
    }

    // load tables: l_load[(rb*nw + w)*128 + c], b_load likewise, plus
    // the running per-cell MAX of each family — tiles/cell quantize on
    // ceil(max/8), so only candidate placements that RAISE a cell's max
    // (and especially across an 8-boundary) should cost
    const int64_t cells = n_rb * nw;
    std::vector<uint16_t> l_load((size_t)cells * CLASSES, 0),
        b_load((size_t)cells * CLASSES, 0);
    std::vector<uint16_t> l_max(cells, 0), b_max(cells, 0);

    // class capacities per block (tail block may be short)
    std::vector<int32_t> cls_cnt((size_t)n_rb * CLASSES, 0);
    auto cap_of = [&](int64_t blk, int cls) -> int32_t {
        const int64_t bsize =
            std::min(ROW_BLOCK, m - blk * ROW_BLOCK);  // rows in block
        // locals with local % 128 == cls: ceil((bsize - cls)/128)
        if (cls >= bsize) return 0;
        return (int32_t)((bsize - cls + 127) / 128);
    };

    // visit order: heaviest vertices first (their placement constrains
    // the most cells); counting sort by degree bucket, capped
    std::vector<int32_t> order(m);
    {
        std::vector<int32_t> deg(m);
        int32_t dmax = 0;
        for (int64_t v = 0; v < m; ++v) {
            int64_t d = (out_off[v + 1] - out_off[v]) +
                        (in_off[v + 1] - in_off[v]);
            deg[v] = (int32_t)std::min<int64_t>(d, 1 << 20);
            dmax = std::max(dmax, deg[v]);
        }
        std::vector<int64_t> cnt((size_t)dmax + 2, 0);
        for (int64_t v = 0; v < m; ++v) ++cnt[deg[v]];
        // descending degree: offsets from the top
        std::vector<int64_t> pos((size_t)dmax + 2, 0);
        int64_t acc = 0;
        for (int64_t d = dmax; d >= 0; --d) {
            pos[d] = acc;
            acc += cnt[d];
        }
        for (int64_t v = 0; v < m; ++v) order[pos[deg[v]]++] = (int32_t)v;
    }

    const int D = std::max(2, std::min(d_cand, CLASSES));
    std::vector<int16_t> cls_of(m, -1);

    auto add_loads = [&](int64_t v, int c, int delta) {
        const int64_t blk = v / ROW_BLOCK;
        const int64_t wv = v / cw;
        for (int64_t e = out_off[v]; e < out_off[v + 1]; ++e) {
            const size_t cell = (size_t)blk * nw + out_w[e];
            uint16_t& x = l_load[cell * CLASSES + c];
            if (delta > 0) {
                if (++x > l_max[cell]) l_max[cell] = x;
            } else {
                if (x-- == l_max[cell]) {
                    uint16_t mx = 0;
                    for (int cc = 0; cc < CLASSES; ++cc)
                        mx = std::max(mx, l_load[cell * CLASSES + cc]);
                    l_max[cell] = mx;
                }
            }
        }
        for (int64_t e = in_off[v]; e < in_off[v + 1]; ++e) {
            const size_t cell = (size_t)in_rb[e] * nw + wv;
            uint16_t& x = b_load[cell * CLASSES + c];
            if (delta > 0) {
                if (++x > b_max[cell]) b_max[cell] = x;
            } else {
                if (x-- == b_max[cell]) {
                    uint16_t mx = 0;
                    for (int cc = 0; cc < CLASSES; ++cc)
                        mx = std::max(mx, b_load[cell * CLASSES + cc]);
                    b_max[cell] = mx;
                }
            }
        }
    };

    auto cost_of = [&](int64_t v, int c) -> int64_t {
        const int64_t blk = v / ROW_BLOCK;
        const int64_t wv = v / cw;
        int64_t cost = 0;
        for (int64_t e = out_off[v]; e < out_off[v + 1]; ++e) {
            const size_t cell = (size_t)blk * nw + out_w[e];
            const uint16_t x = l_load[cell * CLASSES + c];
            const uint16_t cm = l_max[cell];
            // raising the cell max costs; crossing an 8-boundary above
            // it opens a tile for the whole cell
            if (x + 1 > cm) {
                cost += 64;
                if ((x + 8) / 8 > (cm + 7) / 8) cost += W8;
            }
            cost += x;
        }
        for (int64_t e = in_off[v]; e < in_off[v + 1]; ++e) {
            const size_t cell = (size_t)in_rb[e] * nw + wv;
            const uint16_t x = b_load[cell * CLASSES + c];
            const uint16_t cm = b_max[cell];
            if (x + 1 > cm) {
                cost += 64;
                if ((x + 8) / 8 > (cm + 7) / 8) cost += W8;
            }
            cost += x;
        }
        return cost;
    };

    const int P = std::max(1, passes);
    for (int pass = 0; pass < P; ++pass) {
        for (int64_t i = 0; i < m; ++i) {
            const int64_t v = order[i];
            const int64_t blk = v / ROW_BLOCK;
            const int old_c = cls_of[v];
            if (old_c >= 0) {  // refinement: lift out, then re-place
                add_loads(v, old_c, -1);
                --cls_cnt[blk * CLASSES + old_c];
            }
            int best_c = -1;
            int64_t best_cost = INT64_MAX;
            uint64_t h = mix(seed ^ (uint64_t)v * 0x9e3779b97f4a7c15ULL +
                             (uint64_t)pass * 0x632be59bd9b4e019ULL);
            for (int t = 0; t < D; ++t) {
                h = mix(h + t + 1);
                const int c = (int)(h & 127);
                if (cls_cnt[blk * CLASSES + c] >= cap_of(blk, c)) continue;
                const int64_t cost = cost_of(v, c);
                if (cost < best_cost) {
                    best_cost = cost;
                    best_c = c;
                }
            }
            if (old_c >= 0) {  // keeping the old class is always legal
                const int64_t cost = cost_of(v, old_c);
                if (cost <= best_cost) best_c = old_c;
            }
            if (best_c < 0) {  // all sampled candidates full: linear scan
                for (int c = 0; c < CLASSES; ++c)
                    if (cls_cnt[blk * CLASSES + c] < cap_of(blk, c)) {
                        best_c = c;
                        break;
                    }
                if (best_c < 0) return -3;  // capacities sum to >= m
            }
            add_loads(v, best_c, +1);
            ++cls_cnt[blk * CLASSES + best_c];
            cls_of[v] = (int16_t)best_c;
        }
    }

    // final g assignment per (block, class), in vertex order
    std::vector<int32_t> g_cnt((size_t)n_rb * CLASSES, 0);
    for (int64_t v = 0; v < m; ++v) {
        const int64_t blk = v / ROW_BLOCK;
        const int c = cls_of[v];
        const int32_t g = g_cnt[blk * CLASSES + c]++;
        new_of_old[v] =
            (int32_t)(blk * ROW_BLOCK + (int64_t)g * CLASSES + c);
    }
    return 0;
}
