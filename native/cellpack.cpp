// Cell-layout packer for the Pallas TPU SpMV kernel (spla_tpu).
//
// Assigns every CSR entry a slot in the kernel's tile format:
//   cell  = (row block of 16384 rows) x (column window of cw columns)
//   tile  = 1024 slots (8 sublanes x 128 lanes), one cell per tile
//   routing constraint: slot (tile, w7 = (col % cw) >> 7, lane) can serve
//   ONE source column b = col % 128 (entries with equal b may share).
//
// One bucketing pass (counting sort by cell) + greedy lane probing per
// entry replace the numpy sort/repair-round pipeline — the host here has
// a single core, so the O(n) C++ path is ~20x faster than vectorized
// numpy multi-pass packing.
//
// C ABI, handle-based like mtxio.cpp; outputs are written into buffers
// exposed to Python via pointers (numpy views, no extra copy).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>

namespace {

constexpr int64_t ROW_BLOCK = 16384;
constexpr int64_t TILE = 1024;
constexpr int32_t VALID_BIT = 1 << 21;
constexpr int PROBE_LANES = 128;  // linear lane probes per tile
constexpr int PROBE_TILES = 8;    // how many most-recent tiles to try

struct Pack {
    int64_t n_tiles = 0;
    float* vals = nullptr;     // [n_tiles * 1024]
    int32_t* pk = nullptr;     // [n_tiles * 1024]
    int8_t* route = nullptr;   // [n_tiles * cwr * 128]
    int32_t* rb = nullptr;     // [n_tiles]
    int32_t* wb = nullptr;     // [n_tiles]
    int32_t* first = nullptr;  // [n_tiles]
    int8_t* invl = nullptr;    // [n_tiles * 8 * 128] (modes 1/2)
    int8_t* stab = nullptr;    // [n_tiles * 64 * 128] nibble S-table (mode 2)
    int32_t* fused = nullptr;  // [n_tiles * 28 * 128] fused layout (mode 3)
    ~Pack() {
        std::free(vals); std::free(pk); std::free(route);
        std::free(rb); std::free(wb); std::free(first); std::free(invl);
        std::free(stab); std::free(fused);
    }
};

// mode-3 fused tile layout, int32 words [28][128] per tile:
//   rows  0..7  : f32 values (bit pattern), slot (s, lane)
//   rows  8..9  : per-slot w-byte, byte s%4 of word [8 + s/4][lane]:
//                 bits 0-6 = w7 = (col % cw) >> 7, bit 7 = valid
//   rows 10..11 : invl byte, byte s%4 of word [10 + s/4][OUT-L]:
//                 slot lane of the sublane-s entry with that output l
//   rows 12..27 : S-table nibbles, nibble g%8 of word [12 + g/8][OUT-L]:
//                 sublane holding the entry for output cell (g, l); 0xF = none
constexpr int64_t FROWS = 28;

// per-open-tile scratch during packing of one cell
struct OpenTile {
    int64_t id;              // global tile index
    int16_t* claim;          // [cwr * 128] claimed b per (w7, lane), -1 free
    uint8_t sub_count[128];  // entries per lane (max 8)
    uint8_t slot_taken[8][128];  // monoid mode: explicit slot occupancy
    uint8_t l_used[8][128];      // monoid mode: output-l per sublane row
    int32_t used;
};

}  // namespace

extern "C" {

// mode 0: PLUS packing (route constraint only).
// mode 1: monoid packing — additionally each sublane row's OUTPUT lanes
//         (l = row % 128) are distinct, and an inverse-lane table
//         invl[t][s][l] = slot lane of the row-s entry with that l is
//         emitted, enabling the VPU compare-select scatter for ANY monoid
//         (min/max/or/...), not just MXU-able PLUS.
// mode 2: mode 1 + at most ONE entry per output row per tile, emitting a
//         nibble S-table stab[t][gg][l] = (sublane of entry (gg,l) |
//         sublane of entry (gg+64,l) << 4), 0xF = absent.  The kernel
//         scatter then collapses to depth-8 sublane gathers indexed by S
//         (one VPU gather per 8 output rows) instead of the 8-step
//         128x128 compare-select sweep — the round-1 bottleneck.
// mode 3: fused routeless layout — slot lane is FIXED at b = col % 128
//         (no routing table; the kernel gathers straight from the window
//         column = lane), sublane chosen so that each sublane row's output
//         l values are distinct and each output row appears at most once
//         per tile.  Cells are iterated WINDOW-major (w outer, row block
//         inner) for the resident-output kernel, each window's tile count
//         padded to a multiple of `batch` with all-invalid tiles so a
//         K-tile grid batch never straddles a window boundary.
static void* cellpack_mode3(int64_t nnz, int64_t m, int64_t n, int64_t cw,
                            const int32_t* rows, const int32_t* cols,
                            const float* vals, int64_t batch,
                            bool two_choice);

void* cellpack_run(int64_t nnz, int64_t m, int64_t n, int64_t cw,
                   const int32_t* rows, const int32_t* cols,
                   const float* vals, int32_t mode);

static void* cellpack_mode5(int64_t nnz, int64_t m, int64_t n, int64_t cw,
                            const int32_t* rows, const int32_t* cols,
                            const float* vals, int64_t batch, bool wide);

static void* cellpack_mode6(int64_t nnz, int64_t m, int64_t n, int64_t cw,
                            const int32_t* rows, const int32_t* cols,
                            const float* vals, int64_t batch);

void* cellpack_run2(int64_t nnz, int64_t m, int64_t n, int64_t cw,
                    const int32_t* rows, const int32_t* cols,
                    const float* vals, int32_t mode, int64_t batch) {
    if (mode == 7)  // wide-window pairs: 8-bit w, no valid flag
        return cellpack_mode5(nnz, m, n, cw, rows, cols, vals, batch, true);
    if (mode == 6)
        return cellpack_mode6(nnz, m, n, cw, rows, cols, vals, batch);
    if (mode == 5)
        return cellpack_mode5(nnz, m, n, cw, rows, cols, vals, batch, false);
    if (mode == 3 || mode == 4)
        return cellpack_mode3(nnz, m, n, cw, rows, cols, vals, batch,
                              mode == 4);
    return cellpack_run(nnz, m, n, cw, rows, cols, vals, mode);
}

// mode 4 = mode 3 + TWO-CHOICE lanes: an entry may sit at lane b or
// b ^ 64 (classic power-of-two-choices — the per-lane Poisson max that
// dictates the tile count drops from mean + O(sqrt) to mean + O(lg lg)).
// Layout grows one row (29): row 10 holds per-slot choice bits (bit s of
// word[lane] = 1 when the slot reads window column lane ^ 64); invl moves
// to rows 11-12 and the S-table to rows 13-28.  Tiles are 8-grouped for
// DMA alignment (29 * 8 = 232 rows = 29 vreg tiles exactly).
static void* cellpack_mode3(int64_t nnz, int64_t m, int64_t n, int64_t cw,
                            const int32_t* rows, const int32_t* cols,
                            const float* vals, int64_t batch,
                            bool two_choice) {
    const int64_t FR = two_choice ? 29 : FROWS;
    const int64_t IOFF = two_choice ? 11 : 10;  // invl rows
    const int64_t SOFF = two_choice ? 13 : 12;  // stab rows
    const int64_t n_rb = (m + ROW_BLOCK - 1) / ROW_BLOCK > 0
                             ? (m + ROW_BLOCK - 1) / ROW_BLOCK
                             : 1;
    const int64_t nwc = (n + cw - 1) / cw > 0 ? (n + cw - 1) / cw : 1;
    const int64_t n_cells = n_rb * nwc;
    if (batch < 1) batch = 1;

    Pack* out = new (std::nothrow) Pack();
    if (!out) return nullptr;

    // pass 1: counting sort by cell (row-block-major cell ids, iterated
    // window-major below)
    std::vector<int64_t> cell_count(n_cells + 1, 0);
    for (int64_t i = 0; i < nnz; ++i) {
        const int64_t cell =
            (int64_t)(rows[i] >> 14) * nwc + (int64_t)cols[i] / cw;
        ++cell_count[cell + 1];
    }
    for (int64_t c = 0; c < n_cells; ++c) cell_count[c + 1] += cell_count[c];
    std::vector<int64_t> order(nnz);
    {
        std::vector<int64_t> cur(cell_count.begin(), cell_count.end() - 1);
        for (int64_t i = 0; i < nnz; ++i) {
            const int64_t cell =
                (int64_t)(rows[i] >> 14) * nwc + (int64_t)cols[i] / cw;
            order[cur[cell]++] = i;
        }
    }

    int64_t alloc = 0;
    auto grow = [&](int64_t need) -> bool {
        if (need <= alloc && out->fused) return true;
        int64_t na = alloc ? alloc : 4096;
        while (na < need) na *= 2;
        void* v;
        v = std::realloc(out->fused, na * FR * 128 * sizeof(int32_t));
        if (!v) return false; out->fused = (int32_t*)v;
        v = std::realloc(out->rb, na * sizeof(int32_t));
        if (!v) return false; out->rb = (int32_t*)v;
        v = std::realloc(out->wb, na * sizeof(int32_t));
        if (!v) return false; out->wb = (int32_t*)v;
        alloc = na;
        return true;
    };

    OpenTile tiles[PROBE_TILES];
    std::vector<int64_t> row_stamp((size_t)PROBE_TILES * ROW_BLOCK, -1);

    int64_t t_next = 0;
    auto init_tile_words = [&](int64_t tid, int64_t w) {
        int32_t* f = out->fused + tid * FR * 128;
        std::memset(f, 0, (size_t)IOFF * 128 * sizeof(int32_t));  // vals+w(+c)
        std::memset(f + IOFF * 128, 0xFF, (size_t)2 * 128 * sizeof(int32_t));
        std::memset(f + SOFF * 128, 0xFF, (size_t)16 * 128 * sizeof(int32_t));
        out->rb[tid] = 0;
        out->wb[tid] = (int32_t)w;
    };
    auto open_tile = [&](int slot, int64_t cell) -> bool {
        if (!grow(t_next + 1)) return false;
        OpenTile& t = tiles[slot];
        t.id = t_next++;
        std::memset(t.slot_taken, 0, sizeof(t.slot_taken));
        std::memset(t.l_used, 0, sizeof(t.l_used));
        t.used = 0;
        init_tile_words(t.id, cell % nwc);
        out->rb[t.id] = (int32_t)(cell / nwc);
        return true;
    };

    std::vector<std::pair<int32_t, int64_t>> deal;
    int32_t l_counter[128], b_counter[128];
    int32_t lane_load[128];  // two-choice: entries placed per lane this cell

    for (int64_t w = 0; w < nwc; ++w) {
        for (int64_t rbi = 0; rbi < n_rb; ++rbi) {
            const int64_t cell = rbi * nwc + w;
            const int64_t lo = cell_count[cell], hi = cell_count[cell + 1];
            if (lo == hi) continue;
            if (two_choice) std::memset(lane_load, 0, sizeof(lane_load));
            if (hi - lo > 1) {
                // deal order: key = max(rank within lane class b, rank
                // within output-l class) — fills each tile's lane slots and
                // l slots evenly, reaching the per-lane occupancy floor
                std::memset(l_counter, 0, sizeof(l_counter));
                std::memset(b_counter, 0, sizeof(b_counter));
                deal.clear();
                deal.reserve(hi - lo);
                for (int64_t q = lo; q < hi; ++q) {
                    const int64_t e = order[q];
                    const int l = rows[e] & 127;
                    const int b = cols[e] & 127;
                    const int32_t key = std::max(l_counter[l]++, b_counter[b]++);
                    deal.emplace_back(key, e);
                }
                std::stable_sort(deal.begin(), deal.end(),
                                 [](const auto& a, const auto& b) {
                                     return a.first < b.first;
                                 });
                for (int64_t q = lo; q < hi; ++q)
                    order[q] = deal[q - lo].second;
            }
            int n_open = 0, newest = -1;
            for (int64_t q = lo; q < hi; ++q) {
                const int64_t e = order[q];
                const int32_t col = cols[e];
                const int32_t row = rows[e];
                const int32_t w7 = (int32_t)((col % cw) >> 7);
                const int32_t b = col & 127;
                const int32_t local = row & (ROW_BLOCK - 1);
                const int32_t g = local >> 7, l = local & 127;

                int cand[2] = {b, b};
                int n_cand = 1;
                if (two_choice) {
                    n_cand = 2;
                    cand[1] = b ^ 64;
                    if (lane_load[cand[1]] < lane_load[cand[0]])
                        std::swap(cand[0], cand[1]);
                }
                int placed_tile = -1, placed_sub = -1, lane = b;
                for (int ci = 0; ci < n_cand && placed_tile < 0; ++ci) {
                    const int la = cand[ci];
                    for (int k = 0; k < n_open && placed_tile < 0; ++k) {
                        const int slot_k =
                            (newest - k + PROBE_TILES) % PROBE_TILES;
                        OpenTile& t = tiles[slot_k];
                        if (t.used >= TILE) continue;
                        if (row_stamp[(size_t)slot_k * ROW_BLOCK + local] ==
                            t.id)
                            continue;
                        for (int sb = 0; sb < 8; ++sb) {
                            if (!t.slot_taken[sb][la] && !t.l_used[sb][l]) {
                                placed_tile = slot_k;
                                placed_sub = sb;
                                lane = la;
                                break;
                            }
                        }
                    }
                }
                if (placed_tile < 0) {
                    newest = (newest + 1) % PROBE_TILES;
                    if (n_open < PROBE_TILES) ++n_open;
                    if (!open_tile(newest, cell)) { delete out; return nullptr; }
                    placed_tile = newest;
                    placed_sub = 0;
                    lane = cand[0];
                }
                OpenTile& t = tiles[placed_tile];
                const int sub = placed_sub;
                t.slot_taken[sub][lane] = 1;
                t.l_used[sub][l] = 1;
                ++t.used;
                if (two_choice) ++lane_load[lane];
                row_stamp[(size_t)placed_tile * ROW_BLOCK + local] = t.id;
                int32_t* f = out->fused + t.id * FR * 128;
                int32_t vbits;
                std::memcpy(&vbits, &vals[e], 4);
                f[sub * 128 + lane] = vbits;
                const int sh8 = 8 * (sub & 3);
                int32_t* ww = f + (8 + (sub >> 2)) * 128 + lane;
                *ww = (*ww & ~(0xFF << sh8)) | ((w7 | 0x80) << sh8);
                if (two_choice && lane != b)
                    f[10 * 128 + lane] |= (1 << sub);
                int32_t* iw = f + (IOFF + (sub >> 2)) * 128 + l;
                *iw = (*iw & ~(0xFF << sh8)) | (lane << sh8);
                const int sh4 = 4 * (g & 7);
                int32_t* sw = f + (SOFF + (g >> 3)) * 128 + l;
                *sw = (*sw & ~(0xF << sh4)) | (sub << sh4);
            }
        }
        // pad this window's tile count to a multiple of `batch`
        while (t_next % batch) {
            if (!grow(t_next + 1)) { delete out; return nullptr; }
            init_tile_words(t_next, w);
            ++t_next;
        }
    }
    if (t_next == 0) {  // fully empty matrix: one all-invalid batch
        for (int64_t j = 0; j < batch; ++j) {
            if (!grow(t_next + 1)) { delete out; return nullptr; }
            init_tile_words(t_next, 0);
            ++t_next;
        }
    }

    // resolve invl sentinels (0xFF): point absent output-l slots at a lane
    // whose slot in that sublane row is INVALID (its product is identity);
    // a full sublane row has no sentinels left, so a fallback always exists
    for (int64_t t = 0; t < t_next; ++t) {
        int32_t* f = out->fused + t * FR * 128;
        for (int s = 0; s < 8; ++s) {
            const int sh8 = 8 * (s & 3);
            const int32_t* ww = f + (8 + (s >> 2)) * 128;
            int fallback = -1;
            for (int lane = 0; lane < 128; ++lane) {
                if (!((ww[lane] >> sh8) & 0x80)) { fallback = lane; break; }
            }
            if (fallback < 0) continue;
            int32_t* iw = f + (IOFF + (s >> 2)) * 128;
            for (int l = 0; l < 128; ++l) {
                if (((iw[l] >> sh8) & 0xFF) == 0xFF)
                    iw[l] = (iw[l] & ~(0xFF << sh8)) | (fallback << sh8);
            }
        }
    }
    out->n_tiles = t_next;
    return out;
}

// mode 5: PAIR-shared S-table.  Tiles come in pairs sharing ONE 16-row
// nibble S-table whose entry for output cell (g, l) addresses 16
// candidate slots: sk < 8 = half-A sublane sk, sk >= 8 = half-B sublane
// sk - 8.  Half B's sublane 7 never holds entries, so the init value 0xF
// addresses an always-empty row whose products are identity — unset
// positions need NO sentinel resolution and the kernel NO invalid case.
// Streaming drops from 28 to 20 int32 rows per tile (40 rows = exactly
// 5 physical vreg tiles per pair) for a small capacity trim (15/16 of
// the pair's sublane rows).  The two halves may have DIFFERENT row
// blocks (each tile keeps its own rb and the kernel does one RMW per
// half), so pairs form freely across cells within a window and odd
// cell tile counts cost nothing.
//
// Pair block rows [40][128] int32:
//   A: rows 0..7 f32 values | 8..9 w-bytes | 10..11 invl bytes
//   B: rows 12..19 values   | 20..21 w     | 22..23 invl
//   shared: rows 24..39 S-table nibbles (nibble g%8 of word [24+g/8][l])
//
// wide = mode 7: the w byte holds all 8 bits of (col % cw) >> 7 (cw up
// to 32768) and there is NO per-slot valid flag — unset slots are never
// selected by the S-table (the kernel forces half-B sublane 7, the
// 0xF-code target, to identity and masks invl with 0x7F so the 0xFF
// sentinel stays in-bounds), so no sentinel-resolution pass is needed.
static void* cellpack_mode5(int64_t nnz, int64_t m, int64_t n, int64_t cw,
                            const int32_t* rows, const int32_t* cols,
                            const float* vals, int64_t batch, bool wide) {
    const int64_t PFR = 40;  // rows per pair block
    const int64_t n_rb_ = (m + ROW_BLOCK - 1) / ROW_BLOCK;
    const int64_t n_rb = n_rb_ > 0 ? n_rb_ : 1;
    const int64_t nwc_ = (n + cw - 1) / cw;
    const int64_t nwc = nwc_ > 0 ? nwc_ : 1;
    const int64_t n_cells = n_rb * nwc;
    if (batch < 2) batch = 2;

    Pack* out = new (std::nothrow) Pack();
    if (!out) return nullptr;

    // pass 1: counting sort by cell (row-block-major ids, window-major walk)
    std::vector<int64_t> cell_count(n_cells + 1, 0);
    for (int64_t i = 0; i < nnz; ++i) {
        const int64_t cell =
            (int64_t)(rows[i] >> 14) * nwc + (int64_t)cols[i] / cw;
        ++cell_count[cell + 1];
    }
    for (int64_t c = 0; c < n_cells; ++c) cell_count[c + 1] += cell_count[c];
    std::vector<int64_t> order(nnz);
    {
        std::vector<int64_t> cur(cell_count.begin(), cell_count.end() - 1);
        for (int64_t i = 0; i < nnz; ++i) {
            const int64_t cell =
                (int64_t)(rows[i] >> 14) * nwc + (int64_t)cols[i] / cw;
            order[cur[cell]++] = i;
        }
    }

    int64_t alloc = 0;  // in PAIRS
    auto grow = [&](int64_t need_pairs) -> bool {
        if (need_pairs <= alloc && out->fused) return true;
        int64_t na = alloc ? alloc : 4096;
        while (na < need_pairs) na *= 2;
        void* v;
        v = std::realloc(out->fused, na * PFR * 128 * sizeof(int32_t));
        if (!v) return false; out->fused = (int32_t*)v;
        v = std::realloc(out->rb, na * 2 * sizeof(int32_t));
        if (!v) return false; out->rb = (int32_t*)v;
        v = std::realloc(out->wb, na * 2 * sizeof(int32_t));
        if (!v) return false; out->wb = (int32_t*)v;
        alloc = na;
        return true;
    };

    struct Half {
        int64_t rb = -1;  // -1 = unopened
        uint8_t slot_taken[8][128];
        uint8_t l_used[8][128];
        // occupant entry ids, for the depth-1 alternating repair
        int32_t occ_slot[8][128];  // by (sublane, slot lane b)
        int32_t occ_l[8][128];     // by (sublane, output l)
    };
    struct OpenPair {
        int64_t gid;  // global pair index (also the claim stamp)
        Half h[2];
    };
    OpenPair pairs[PROBE_TILES];
    // shared one-entry-per-output-cell claim, stamped by pair gid
    std::vector<int64_t> claim((size_t)PROBE_TILES * ROW_BLOCK, -1);

    int64_t p_next = 0;  // pairs emitted
    auto init_pair_words = [&](int64_t pid, int64_t w) {
        int32_t* f = out->fused + pid * PFR * 128;
        std::memset(f, 0, (size_t)10 * 128 * 4);            // A vals + w
        std::memset(f + 10 * 128, 0xFF, (size_t)2 * 128 * 4);   // A invl
        std::memset(f + 12 * 128, 0, (size_t)10 * 128 * 4);     // B vals + w
        std::memset(f + 22 * 128, 0xFF, (size_t)2 * 128 * 4);   // B invl
        std::memset(f + 24 * 128, 0xFF, (size_t)16 * 128 * 4);  // S-table
        out->rb[pid * 2] = 0;
        out->rb[pid * 2 + 1] = 0;
        out->wb[pid * 2] = (int32_t)w;
        out->wb[pid * 2 + 1] = (int32_t)w;
    };
    auto open_pair = [&](int slot, int64_t w) -> bool {
        if (!grow(p_next + 1)) return false;
        OpenPair& p = pairs[slot];
        p.gid = p_next++;
        p.h[0].rb = -1;
        p.h[1].rb = -1;
        init_pair_words(p.gid, w);
        return true;
    };

    std::vector<std::pair<int32_t, int64_t>> deal;
    int32_t l_counter[128], b_counter[128];

    // entry word surgery, kept consistent with the occupancy structures;
    // used by normal placement AND by the depth-1 repair relocations
    auto emit_entry = [&](OpenPair& p, int h, int sub, int64_t e) {
        Half& hf = p.h[h];
        const int32_t col = cols[e];
        const int32_t w7 = (int32_t)((col % cw) >> 7);
        const int32_t b = col & 127;
        const int32_t local = rows[e] & (ROW_BLOCK - 1);
        const int32_t g = local >> 7, l = local & 127;
        hf.slot_taken[sub][b] = 1;
        hf.l_used[sub][l] = 1;
        hf.occ_slot[sub][b] = (int32_t)e;
        hf.occ_l[sub][l] = (int32_t)e;
        int32_t* f = out->fused + p.gid * PFR * 128;
        const int ho = h * 12;
        int32_t vbits;
        std::memcpy(&vbits, &vals[e], 4);
        f[(ho + sub) * 128 + b] = vbits;
        const int sh8 = 8 * (sub & 3);
        int32_t* ww = f + (ho + 8 + (sub >> 2)) * 128 + b;
        *ww = (*ww & ~(0xFF << sh8)) | ((wide ? w7 : (w7 | 0x80)) << sh8);
        int32_t* iw = f + (ho + 10 + (sub >> 2)) * 128 + l;
        *iw = (*iw & ~(0xFF << sh8)) | (b << sh8);
        const int sh4 = 4 * (g & 7);
        const int code = h * 8 + sub;
        int32_t* sw = f + (24 + (g >> 3)) * 128 + l;
        *sw = (*sw & ~(0xF << sh4)) | (code << sh4);
    };
    auto erase_entry = [&](OpenPair& p, int h, int sub, int64_t e) {
        Half& hf = p.h[h];
        const int32_t b = cols[e] & 127;
        const int32_t local = rows[e] & (ROW_BLOCK - 1);
        const int32_t g = local >> 7, l = local & 127;
        hf.slot_taken[sub][b] = 0;
        hf.l_used[sub][l] = 0;
        hf.occ_slot[sub][b] = -1;
        hf.occ_l[sub][l] = -1;
        int32_t* f = out->fused + p.gid * PFR * 128;
        const int ho = h * 12;
        f[(ho + sub) * 128 + b] = 0;
        const int sh8 = 8 * (sub & 3);
        int32_t* ww = f + (ho + 8 + (sub >> 2)) * 128 + b;
        *ww &= ~(0xFF << sh8);  // valid bit clear
        int32_t* iw = f + (ho + 10 + (sub >> 2)) * 128 + l;
        *iw |= 0xFF << sh8;  // back to sentinel (resolved at the end)
        const int sh4 = 4 * (g & 7);
        int32_t* sw = f + (24 + (g >> 3)) * 128 + l;
        *sw |= 0xF << sh4;  // absent
    };

    for (int64_t w = 0; w < nwc; ++w) {
        int n_open = 0, newest = -1;  // pairs close at window boundaries
        for (int64_t rbi = 0; rbi < n_rb; ++rbi) {
            const int64_t cell = rbi * nwc + w;
            const int64_t lo = cell_count[cell], hi = cell_count[cell + 1];
            if (lo == hi) continue;
            if (hi - lo > 1) {
                std::memset(l_counter, 0, sizeof(l_counter));
                std::memset(b_counter, 0, sizeof(b_counter));
                deal.clear();
                deal.reserve(hi - lo);
                for (int64_t q = lo; q < hi; ++q) {
                    const int64_t e = order[q];
                    const int l = rows[e] & 127;
                    const int b = cols[e] & 127;
                    const int32_t key = std::max(l_counter[l]++, b_counter[b]++);
                    deal.emplace_back(key, e);
                }
                std::stable_sort(deal.begin(), deal.end(),
                                 [](const auto& a, const auto& b) {
                                     return a.first < b.first;
                                 });
                for (int64_t q = lo; q < hi; ++q)
                    order[q] = deal[q - lo].second;
            }
            for (int64_t q = lo; q < hi; ++q) {
                const int64_t e = order[q];
                const int32_t col = cols[e];
                const int32_t row = rows[e];
                const int32_t w7 = (int32_t)((col % cw) >> 7);
                const int32_t b = col & 127;
                const int32_t local = row & (ROW_BLOCK - 1);
                const int32_t g = local >> 7, l = local & 127;

                (void)w7;
                int pk_slot = -1, pk_half = -1, pk_sub = -1;
                // phase 0: opened halves with matching rb (newest-first);
                // cheap rb screens run BEFORE the claim-table load — the
                // ring persists across cells within a window
                for (int k = 0; k < n_open && pk_slot < 0; ++k) {
                    const int sk = (newest - k + PROBE_TILES) % PROBE_TILES;
                    OpenPair& p = pairs[sk];
                    const bool h0 = p.h[0].rb == rbi;
                    const bool h1 = p.h[1].rb == rbi;
                    if (!(h0 || h1)) continue;
                    if (claim[(size_t)sk * ROW_BLOCK + local] == p.gid)
                        continue;
                    for (int h = 0; h < 2 && pk_slot < 0; ++h) {
                        if (!(h == 0 ? h0 : h1)) continue;
                        Half& hf = p.h[h];
                        const int smax = (h == 1) ? 7 : 8;
                        for (int sb = 0; sb < smax; ++sb) {
                            if (!hf.slot_taken[sb][b] && !hf.l_used[sb][l]) {
                                pk_slot = sk;
                                pk_half = h;
                                pk_sub = sb;
                                break;
                            }
                        }
                    }
                }
                // repair phase (depth-1 alternating path): a slot blocked
                // by one or two occupants (same slot-lane b and/or same
                // output-l at a sublane) frees up when the blockers
                // relocate to other open same-rb halves.  A relocation is
                // applied as soon as a target is found; if the remaining
                // blocker cannot move, the applied move is left in place
                // (still a legal packing) and the scan continues.
                // Measured on the deg-16 benchmark graph this reaches the
                // per-cell l/b-max lower bound: pad 2.42 -> 2.12 for
                // ~1.3x pack time.
                auto relocate = [&](int sk_src, OpenPair& p, int h, int sb,
                                    int32_t e2) -> bool {
                    const int32_t local2 = rows[e2] & (ROW_BLOCK - 1);
                    const int32_t l2 = local2 & 127;
                    const int32_t b2 = cols[e2] & 127;
                    Half& hf = p.h[h];
                    for (int k2 = 0; k2 < n_open; ++k2) {
                        const int sk2 =
                            (newest - k2 + PROBE_TILES) % PROBE_TILES;
                        OpenPair& p2 = pairs[sk2];
                        const bool i0 = p2.h[0].rb == rbi;
                        const bool i1 = p2.h[1].rb == rbi;
                        if (!(i0 || i1)) continue;
                        if (sk2 != sk_src &&
                            claim[(size_t)sk2 * ROW_BLOCK + local2] == p2.gid)
                            continue;
                        for (int h2 = 0; h2 < 2; ++h2) {
                            if (!(h2 == 0 ? i0 : i1)) continue;
                            Half& hf2 = p2.h[h2];
                            if (&hf2 == &hf) continue;
                            const int smax2 = (h2 == 1) ? 7 : 8;
                            for (int sb2 = 0; sb2 < smax2; ++sb2) {
                                if (hf2.slot_taken[sb2][b2] ||
                                    hf2.l_used[sb2][l2])
                                    continue;
                                erase_entry(p, h, sb, e2);
                                emit_entry(p2, h2, sb2, e2);
                                if (sk2 != sk_src)
                                    claim[(size_t)sk2 * ROW_BLOCK + local2] =
                                        p2.gid;
                                return true;
                            }
                        }
                    }
                    return false;
                };
                for (int k = 0; k < n_open && pk_slot < 0; ++k) {
                    const int sk = (newest - k + PROBE_TILES) % PROBE_TILES;
                    OpenPair& p = pairs[sk];
                    const bool h0 = p.h[0].rb == rbi;
                    const bool h1 = p.h[1].rb == rbi;
                    if (!(h0 || h1)) continue;
                    if (claim[(size_t)sk * ROW_BLOCK + local] == p.gid)
                        continue;
                    for (int h = 0; h < 2 && pk_slot < 0; ++h) {
                        if (!(h == 0 ? h0 : h1)) continue;
                        Half& hf = p.h[h];
                        const int smax = (h == 1) ? 7 : 8;
                        for (int sb = 0; sb < smax && pk_slot < 0; ++sb) {
                            const int32_t ea =
                                hf.l_used[sb][l] ? hf.occ_l[sb][l]
                                                 : (int32_t)-1;
                            const int32_t eb =
                                hf.slot_taken[sb][b] ? hf.occ_slot[sb][b]
                                                     : (int32_t)-1;
                            if (ea < 0 && eb < 0) continue;  // phase-0 spot
                            if (hf.l_used[sb][l] && ea < 0) continue;
                            if (hf.slot_taken[sb][b] && eb < 0) continue;
                            if (ea >= 0 && !relocate(sk, p, h, sb, ea))
                                continue;
                            if (eb >= 0 && eb != ea &&
                                !relocate(sk, p, h, sb, eb))
                                continue;
                            pk_slot = sk;
                            pk_half = h;
                            pk_sub = sb;
                        }
                    }
                }
                // phase 2: claim an unopened half of an existing pair
                for (int k = 0; k < n_open && pk_slot < 0; ++k) {
                    const int sk = (newest - k + PROBE_TILES) % PROBE_TILES;
                    OpenPair& p = pairs[sk];
                    const bool f0 = p.h[0].rb < 0;
                    const bool f1 = p.h[1].rb < 0;
                    if (!(f0 || f1)) continue;
                    if (claim[(size_t)sk * ROW_BLOCK + local] == p.gid)
                        continue;
                    pk_slot = sk;
                    pk_half = f0 ? 0 : 1;
                    pk_sub = 0;
                }
                if (pk_slot < 0) {
                    newest = (newest + 1) % PROBE_TILES;
                    if (n_open < PROBE_TILES) ++n_open;
                    if (!open_pair(newest, w)) { delete out; return nullptr; }
                    pk_slot = newest;
                    pk_half = 0;
                    pk_sub = 0;
                }
                OpenPair& p = pairs[pk_slot];
                Half& hf = p.h[pk_half];
                if (hf.rb < 0) {
                    hf.rb = rbi;
                    std::memset(hf.slot_taken, 0, sizeof(hf.slot_taken));
                    std::memset(hf.l_used, 0, sizeof(hf.l_used));
                    std::memset(hf.occ_slot, 0xFF, sizeof(hf.occ_slot));
                    std::memset(hf.occ_l, 0xFF, sizeof(hf.occ_l));
                    out->rb[p.gid * 2 + pk_half] = (int32_t)rbi;
                }
                claim[(size_t)pk_slot * ROW_BLOCK + local] = p.gid;
                emit_entry(p, pk_half, pk_sub, e);
            }
        }
        // pad this window's tile count to a multiple of `batch`
        while ((p_next * 2) % batch) {
            if (!grow(p_next + 1)) { delete out; return nullptr; }
            init_pair_words(p_next, w);
            ++p_next;
        }
    }
    if (p_next == 0) {  // fully empty matrix: one all-invalid batch
        for (int64_t j = 0; j < batch / 2; ++j) {
            if (!grow(p_next + 1)) { delete out; return nullptr; }
            init_pair_words(p_next, 0);
            ++p_next;
        }
    }

    // resolve invl sentinels per half (absent output-l positions point at
    // a lane whose slot in that sublane row is INVALID; a full row has no
    // sentinels left, so a fallback always exists).  Wide mode has no
    // valid flag to scan; its kernel masks invl with 0x7F instead, so
    // the 0xFF sentinel reads (in-bounds, never-selected) lane 127.
    if (!wide)
    for (int64_t pid = 0; pid < p_next; ++pid) {
        int32_t* f = out->fused + pid * PFR * 128;
        for (int h = 0; h < 2; ++h) {
            const int ho = h * 12;
            for (int s = 0; s < 8; ++s) {
                const int sh8 = 8 * (s & 3);
                const int32_t* ww = f + (ho + 8 + (s >> 2)) * 128;
                int fallback = -1;
                for (int lane = 0; lane < 128; ++lane) {
                    if (!((ww[lane] >> sh8) & 0x80)) { fallback = lane; break; }
                }
                if (fallback < 0) continue;
                int32_t* iw = f + (ho + 10 + (s >> 2)) * 128;
                for (int l = 0; l < 128; ++l) {
                    if (((iw[l] >> sh8) & 0xFF) == 0xFF)
                        iw[l] = (iw[l] & ~(0xFF << sh8)) | (fallback << sh8);
                }
            }
        }
    }
    out->n_tiles = p_next * 2;
    return out;
}

// mode 6: OCT-shared S-table.  Eight tiles share ONE 6-bit S-table:
// code (0..63) for output cell (g, l) = tile * 8 + sublane; code 63 =
// tile-7 sublane-7, which never holds entries, so the init value reads
// identity (same trick as mode 5's half-B sublane 7).  The 6-bit code is
// stored as a nibble table (low 4 bits, rows 96..111) plus two bit
// planes (bit 4 rows 112..115, bit 5 rows 116..119; bit g % 32 of word
// [base + g/32][l]).  Oct block = 120 int32 rows = exactly 15 physical
// (8,128) vreg tiles, so DMA stays aligned; 15 rows streamed per tile
// vs mode 5's 20 (-25%).  The real win is CAPACITY POOLING: the per-
// (oct, output-l) cap is 63 slots and up to eight cells (each tile keeps
// its own rb) share one oct, so low-degree graphs whose per-cell l-class
// Poisson max quantized a whole pair (pad 4+ on deg-16 at 8M rows) pool
// into ~2x fewer slots.
//
// Oct block rows [120][128] int32 (tile t = 0..7):
//   t*12 .. t*12+7  : f32 values     | t*12+8..+9 : w-bytes
//   t*12+10 .. +11  : invl bytes
//   96..111 : S-table nibbles | 112..115 : bit-4 plane | 116..119 : bit-5
static void* cellpack_mode6(int64_t nnz, int64_t m, int64_t n, int64_t cw,
                            const int32_t* rows, const int32_t* cols,
                            const float* vals, int64_t batch) {
    const int64_t PFR = 120;  // rows per oct block
    const int QF = 8;         // tiles (halves) per oct
    const int64_t n_rb_ = (m + ROW_BLOCK - 1) / ROW_BLOCK;
    const int64_t n_rb = n_rb_ > 0 ? n_rb_ : 1;
    const int64_t nwc_ = (n + cw - 1) / cw;
    const int64_t nwc = nwc_ > 0 ? nwc_ : 1;
    const int64_t n_cells = n_rb * nwc;
    if (batch < QF) batch = QF;

    Pack* out = new (std::nothrow) Pack();
    if (!out) return nullptr;

    // pass 1: counting sort by cell (row-block-major ids, window-major walk)
    std::vector<int64_t> cell_count(n_cells + 1, 0);
    for (int64_t i = 0; i < nnz; ++i) {
        const int64_t cell =
            (int64_t)(rows[i] >> 14) * nwc + (int64_t)cols[i] / cw;
        ++cell_count[cell + 1];
    }
    for (int64_t c = 0; c < n_cells; ++c) cell_count[c + 1] += cell_count[c];
    std::vector<int64_t> order(nnz);
    {
        std::vector<int64_t> cur(cell_count.begin(), cell_count.end() - 1);
        for (int64_t i = 0; i < nnz; ++i) {
            const int64_t cell =
                (int64_t)(rows[i] >> 14) * nwc + (int64_t)cols[i] / cw;
            order[cur[cell]++] = i;
        }
    }

    int64_t alloc = 0;  // in OCTS
    auto grow = [&](int64_t need_octs) -> bool {
        if (need_octs <= alloc && out->fused) return true;
        int64_t na = alloc ? alloc : 1024;
        while (na < need_octs) na *= 2;
        void* v;
        v = std::realloc(out->fused, na * PFR * 128 * sizeof(int32_t));
        if (!v) return false; out->fused = (int32_t*)v;
        v = std::realloc(out->rb, na * QF * sizeof(int32_t));
        if (!v) return false; out->rb = (int32_t*)v;
        v = std::realloc(out->wb, na * QF * sizeof(int32_t));
        if (!v) return false; out->wb = (int32_t*)v;
        alloc = na;
        return true;
    };

    struct Half {
        int64_t rb = -1;  // -1 = unopened
        uint8_t slot_taken[8][128];
        uint8_t l_used[8][128];
        int32_t occ_slot[8][128];  // by (sublane, slot lane b)
        int32_t occ_l[8][128];     // by (sublane, output l)
    };
    struct OpenOct {
        int64_t gid;  // global oct index (also the claim stamp)
        Half h[8];
    };
    OpenOct octs[PROBE_TILES];
    // shared one-entry-per-output-cell claim, stamped by oct gid
    std::vector<int64_t> claim((size_t)PROBE_TILES * ROW_BLOCK, -1);

    int64_t p_next = 0;  // octs emitted
    auto init_oct_words = [&](int64_t pid, int64_t w) {
        int32_t* f = out->fused + pid * PFR * 128;
        for (int t = 0; t < QF; ++t) {
            std::memset(f + (t * 12) * 128, 0, (size_t)10 * 128 * 4);
            std::memset(f + (t * 12 + 10) * 128, 0xFF, (size_t)2 * 128 * 4);
            out->rb[pid * QF + t] = 0;
            out->wb[pid * QF + t] = (int32_t)w;
        }
        // nibbles + both planes all-ones: every position reads code 63
        std::memset(f + 96 * 128, 0xFF, (size_t)24 * 128 * 4);
    };
    auto open_oct = [&](int slot, int64_t w) -> bool {
        if (!grow(p_next + 1)) return false;
        OpenOct& p = octs[slot];
        p.gid = p_next++;
        for (int t = 0; t < QF; ++t) p.h[t].rb = -1;
        init_oct_words(p.gid, w);
        return true;
    };

    std::vector<std::pair<int32_t, int64_t>> deal;
    int32_t l_counter[128], b_counter[128];

    // entry word surgery, kept consistent with the occupancy structures
    auto emit_entry = [&](OpenOct& p, int h, int sub, int64_t e) {
        Half& hf = p.h[h];
        const int32_t col = cols[e];
        const int32_t w7 = (int32_t)((col % cw) >> 7);
        const int32_t b = col & 127;
        const int32_t local = rows[e] & (ROW_BLOCK - 1);
        const int32_t g = local >> 7, l = local & 127;
        hf.slot_taken[sub][b] = 1;
        hf.l_used[sub][l] = 1;
        hf.occ_slot[sub][b] = (int32_t)e;
        hf.occ_l[sub][l] = (int32_t)e;
        int32_t* f = out->fused + p.gid * PFR * 128;
        const int ho = h * 12;
        int32_t vbits;
        std::memcpy(&vbits, &vals[e], 4);
        f[(ho + sub) * 128 + b] = vbits;
        const int sh8 = 8 * (sub & 3);
        int32_t* ww = f + (ho + 8 + (sub >> 2)) * 128 + b;
        *ww = (*ww & ~(0xFF << sh8)) | ((w7 | 0x80) << sh8);
        int32_t* iw = f + (ho + 10 + (sub >> 2)) * 128 + l;
        *iw = (*iw & ~(0xFF << sh8)) | (b << sh8);
        const int code = h * 8 + sub;
        const int sh4 = 4 * (g & 7);
        int32_t* sw = f + (96 + (g >> 3)) * 128 + l;
        *sw = (*sw & ~(0xF << sh4)) | ((code & 0xF) << sh4);
        const int shg = g & 31;
        int32_t* p4 = f + (112 + (g >> 5)) * 128 + l;
        *p4 = (*p4 & ~(1 << shg)) | (((code >> 4) & 1) << shg);
        int32_t* p5 = f + (116 + (g >> 5)) * 128 + l;
        *p5 = (*p5 & ~(1 << shg)) | (((code >> 5) & 1) << shg);
    };
    auto erase_entry = [&](OpenOct& p, int h, int sub, int64_t e) {
        Half& hf = p.h[h];
        const int32_t b = cols[e] & 127;
        const int32_t local = rows[e] & (ROW_BLOCK - 1);
        const int32_t g = local >> 7, l = local & 127;
        hf.slot_taken[sub][b] = 0;
        hf.l_used[sub][l] = 0;
        hf.occ_slot[sub][b] = -1;
        hf.occ_l[sub][l] = -1;
        int32_t* f = out->fused + p.gid * PFR * 128;
        const int ho = h * 12;
        f[(ho + sub) * 128 + b] = 0;
        const int sh8 = 8 * (sub & 3);
        int32_t* ww = f + (ho + 8 + (sub >> 2)) * 128 + b;
        *ww &= ~(0xFF << sh8);  // valid bit clear
        int32_t* iw = f + (ho + 10 + (sub >> 2)) * 128 + l;
        *iw |= 0xFF << sh8;  // back to sentinel (resolved at the end)
        const int sh4 = 4 * (g & 7);
        int32_t* sw = f + (96 + (g >> 3)) * 128 + l;
        *sw |= 0xF << sh4;  // back to code 63 (absent)
        const int shg = g & 31;
        f[(112 + (g >> 5)) * 128 + l] |= 1 << shg;
        f[(116 + (g >> 5)) * 128 + l] |= 1 << shg;
    };

    for (int64_t w = 0; w < nwc; ++w) {
        int n_open = 0, newest = -1;  // octs close at window boundaries
        for (int64_t rbi = 0; rbi < n_rb; ++rbi) {
            const int64_t cell = rbi * nwc + w;
            const int64_t lo = cell_count[cell], hi = cell_count[cell + 1];
            if (lo == hi) continue;
            if (hi - lo > 1) {
                std::memset(l_counter, 0, sizeof(l_counter));
                std::memset(b_counter, 0, sizeof(b_counter));
                deal.clear();
                deal.reserve(hi - lo);
                for (int64_t q = lo; q < hi; ++q) {
                    const int64_t e = order[q];
                    const int l = rows[e] & 127;
                    const int b = cols[e] & 127;
                    const int32_t key = std::max(l_counter[l]++, b_counter[b]++);
                    deal.emplace_back(key, e);
                }
                std::stable_sort(deal.begin(), deal.end(),
                                 [](const auto& a, const auto& b) {
                                     return a.first < b.first;
                                 });
                for (int64_t q = lo; q < hi; ++q)
                    order[q] = deal[q - lo].second;
            }
            for (int64_t q = lo; q < hi; ++q) {
                const int64_t e = order[q];
                const int32_t col = cols[e];
                const int32_t row = rows[e];
                const int32_t b = col & 127;
                const int32_t local = row & (ROW_BLOCK - 1);
                const int32_t l = local & 127;

                int pk_slot = -1, pk_half = -1, pk_sub = -1;
                // phase 0: opened halves with matching rb (newest-first);
                // rb screens run BEFORE the claim-table load
                for (int k = 0; k < n_open && pk_slot < 0; ++k) {
                    const int sk = (newest - k + PROBE_TILES) % PROBE_TILES;
                    OpenOct& p = octs[sk];
                    bool any = false;
                    for (int h = 0; h < QF; ++h)
                        if (p.h[h].rb == rbi) { any = true; break; }
                    if (!any) continue;
                    if (claim[(size_t)sk * ROW_BLOCK + local] == p.gid)
                        continue;
                    for (int h = 0; h < QF && pk_slot < 0; ++h) {
                        if (p.h[h].rb != rbi) continue;
                        Half& hf = p.h[h];
                        const int smax = (h == QF - 1) ? 7 : 8;
                        for (int sb = 0; sb < smax; ++sb) {
                            if (!hf.slot_taken[sb][b] && !hf.l_used[sb][l]) {
                                pk_slot = sk;
                                pk_half = h;
                                pk_sub = sb;
                                break;
                            }
                        }
                    }
                }
                // repair phase (depth-1 alternating path), as in mode 5
                auto relocate = [&](int sk_src, OpenOct& p, int h, int sb,
                                    int32_t e2) -> bool {
                    const int32_t local2 = rows[e2] & (ROW_BLOCK - 1);
                    const int32_t l2 = local2 & 127;
                    const int32_t b2 = cols[e2] & 127;
                    Half& hf = p.h[h];
                    for (int k2 = 0; k2 < n_open; ++k2) {
                        const int sk2 =
                            (newest - k2 + PROBE_TILES) % PROBE_TILES;
                        OpenOct& p2 = octs[sk2];
                        bool any = false;
                        for (int h2 = 0; h2 < QF; ++h2)
                            if (p2.h[h2].rb == rbi) { any = true; break; }
                        if (!any) continue;
                        if (sk2 != sk_src &&
                            claim[(size_t)sk2 * ROW_BLOCK + local2] == p2.gid)
                            continue;
                        for (int h2 = 0; h2 < QF; ++h2) {
                            if (p2.h[h2].rb != rbi) continue;
                            Half& hf2 = p2.h[h2];
                            if (&hf2 == &hf) continue;
                            const int smax2 = (h2 == QF - 1) ? 7 : 8;
                            for (int sb2 = 0; sb2 < smax2; ++sb2) {
                                if (hf2.slot_taken[sb2][b2] ||
                                    hf2.l_used[sb2][l2])
                                    continue;
                                erase_entry(p, h, sb, e2);
                                emit_entry(p2, h2, sb2, e2);
                                if (sk2 != sk_src)
                                    claim[(size_t)sk2 * ROW_BLOCK + local2] =
                                        p2.gid;
                                return true;
                            }
                        }
                    }
                    return false;
                };
                for (int k = 0; k < n_open && pk_slot < 0; ++k) {
                    const int sk = (newest - k + PROBE_TILES) % PROBE_TILES;
                    OpenOct& p = octs[sk];
                    bool any = false;
                    for (int h = 0; h < QF; ++h)
                        if (p.h[h].rb == rbi) { any = true; break; }
                    if (!any) continue;
                    if (claim[(size_t)sk * ROW_BLOCK + local] == p.gid)
                        continue;
                    for (int h = 0; h < QF && pk_slot < 0; ++h) {
                        if (p.h[h].rb != rbi) continue;
                        Half& hf = p.h[h];
                        const int smax = (h == QF - 1) ? 7 : 8;
                        for (int sb = 0; sb < smax && pk_slot < 0; ++sb) {
                            const int32_t ea =
                                hf.l_used[sb][l] ? hf.occ_l[sb][l]
                                                 : (int32_t)-1;
                            const int32_t eb =
                                hf.slot_taken[sb][b] ? hf.occ_slot[sb][b]
                                                     : (int32_t)-1;
                            if (ea < 0 && eb < 0) continue;  // phase-0 spot
                            if (hf.l_used[sb][l] && ea < 0) continue;
                            if (hf.slot_taken[sb][b] && eb < 0) continue;
                            if (ea >= 0 && !relocate(sk, p, h, sb, ea))
                                continue;
                            if (eb >= 0 && eb != ea &&
                                !relocate(sk, p, h, sb, eb))
                                continue;
                            pk_slot = sk;
                            pk_half = h;
                            pk_sub = sb;
                        }
                    }
                }
                // phase 2: claim an unopened half of an existing oct
                for (int k = 0; k < n_open && pk_slot < 0; ++k) {
                    const int sk = (newest - k + PROBE_TILES) % PROBE_TILES;
                    OpenOct& p = octs[sk];
                    int free_h = -1;
                    for (int h = 0; h < QF; ++h)
                        if (p.h[h].rb < 0) { free_h = h; break; }
                    if (free_h < 0) continue;
                    if (claim[(size_t)sk * ROW_BLOCK + local] == p.gid)
                        continue;
                    pk_slot = sk;
                    pk_half = free_h;
                    pk_sub = 0;
                }
                if (pk_slot < 0) {
                    newest = (newest + 1) % PROBE_TILES;
                    if (n_open < PROBE_TILES) ++n_open;
                    if (!open_oct(newest, w)) { delete out; return nullptr; }
                    pk_slot = newest;
                    pk_half = 0;
                    pk_sub = 0;
                }
                OpenOct& p = octs[pk_slot];
                Half& hf = p.h[pk_half];
                if (hf.rb < 0) {
                    hf.rb = rbi;
                    std::memset(hf.slot_taken, 0, sizeof(hf.slot_taken));
                    std::memset(hf.l_used, 0, sizeof(hf.l_used));
                    std::memset(hf.occ_slot, 0xFF, sizeof(hf.occ_slot));
                    std::memset(hf.occ_l, 0xFF, sizeof(hf.occ_l));
                    out->rb[p.gid * QF + pk_half] = (int32_t)rbi;
                }
                claim[(size_t)pk_slot * ROW_BLOCK + local] = p.gid;
                emit_entry(p, pk_half, pk_sub, e);
            }
        }
        // pad this window's tile count to a multiple of `batch`
        while ((p_next * QF) % batch) {
            if (!grow(p_next + 1)) { delete out; return nullptr; }
            init_oct_words(p_next, w);
            ++p_next;
        }
    }
    if (p_next == 0) {  // fully empty matrix: one all-invalid batch
        for (int64_t j = 0; j < batch / QF; ++j) {
            if (!grow(p_next + 1)) { delete out; return nullptr; }
            init_oct_words(p_next, 0);
            ++p_next;
        }
    }

    // resolve invl sentinels per half (absent output-l positions point at
    // a lane whose slot in that sublane row is INVALID)
    for (int64_t pid = 0; pid < p_next; ++pid) {
        int32_t* f = out->fused + pid * PFR * 128;
        for (int h = 0; h < QF; ++h) {
            const int ho = h * 12;
            for (int s = 0; s < 8; ++s) {
                const int sh8 = 8 * (s & 3);
                const int32_t* ww = f + (ho + 8 + (s >> 2)) * 128;
                int fallback = -1;
                for (int lane = 0; lane < 128; ++lane) {
                    if (!((ww[lane] >> sh8) & 0x80)) { fallback = lane; break; }
                }
                if (fallback < 0) continue;
                int32_t* iw = f + (ho + 10 + (s >> 2)) * 128;
                for (int l = 0; l < 128; ++l) {
                    if (((iw[l] >> sh8) & 0xFF) == 0xFF)
                        iw[l] = (iw[l] & ~(0xFF << sh8)) | (fallback << sh8);
                }
            }
        }
    }
    out->n_tiles = p_next * QF;
    return out;
}

void* cellpack_run(int64_t nnz, int64_t m, int64_t n, int64_t cw,
                   const int32_t* rows, const int32_t* cols,
                   const float* vals, int32_t mode) {
    const int64_t n_rb = (m + ROW_BLOCK - 1) / ROW_BLOCK > 0
                             ? (m + ROW_BLOCK - 1) / ROW_BLOCK
                             : 1;
    const int64_t nwc = (n + cw - 1) / cw > 0 ? (n + cw - 1) / cw : 1;
    const int64_t cwr = cw / 128;
    const int64_t n_cells = n_rb * nwc;

    Pack* out = new (std::nothrow) Pack();
    if (!out) return nullptr;

    // ---- pass 1: counting sort by cell ----
    std::vector<int64_t> cell_count(n_cells + 1, 0);
    for (int64_t i = 0; i < nnz; ++i) {
        const int64_t cell =
            (int64_t)(rows[i] >> 14) * nwc + (int64_t)cols[i] / cw;
        ++cell_count[cell + 1];
    }
    for (int64_t c = 0; c < n_cells; ++c) cell_count[c + 1] += cell_count[c];
    std::vector<int64_t> order(nnz);
    {
        std::vector<int64_t> cur(cell_count.begin(), cell_count.end() - 1);
        for (int64_t i = 0; i < nnz; ++i) {
            const int64_t cell =
                (int64_t)(rows[i] >> 14) * nwc + (int64_t)cols[i] / cw;
            order[cur[cell]++] = i;
        }
    }

    // ---- pass 2: greedy slot assignment, writing outputs as tiles open ----
    // worst-case tile bound: every entry alone in a tile is impossible; a
    // safe bound is ceil(cnt/1) per cell capped by retries — grow buffers
    // geometrically instead.
    int64_t cap_tiles = 0;
    for (int64_t c = 0; c < n_cells; ++c) {
        const int64_t cnt = cell_count[c + 1] - cell_count[c];
        cap_tiles += (cnt + 127) / 128;  // generous: >= entries/128 tiles
    }
    cap_tiles += n_rb + 1;

    int64_t alloc = 0;
    auto grow = [&](int64_t need) -> bool {
        if (need <= alloc && out->vals) return true;
        int64_t na = alloc ? alloc : 4096;
        while (na < need) na *= 2;
        if (na > cap_tiles) na = cap_tiles > need ? cap_tiles : need;
        void* v;
        v = std::realloc(out->vals, na * TILE * sizeof(float));
        if (!v) return false; out->vals = (float*)v;
        v = std::realloc(out->pk, na * TILE * sizeof(int32_t));
        if (!v) return false; out->pk = (int32_t*)v;
        v = std::realloc(out->route, na * cwr * 128);
        if (!v) return false; out->route = (int8_t*)v;
        v = std::realloc(out->rb, na * sizeof(int32_t));
        if (!v) return false; out->rb = (int32_t*)v;
        v = std::realloc(out->wb, na * sizeof(int32_t));
        if (!v) return false; out->wb = (int32_t*)v;
        v = std::realloc(out->first, na * sizeof(int32_t));
        if (!v) return false; out->first = (int32_t*)v;
        if (mode >= 1) {
            v = std::realloc(out->invl, na * TILE);
            if (!v) return false; out->invl = (int8_t*)v;
        }
        if (mode == 2) {
            v = std::realloc(out->stab, na * 8192);
            if (!v) return false; out->stab = (int8_t*)v;
        }
        alloc = na;
        return true;
    };

    std::vector<int16_t> claim_pool((size_t)PROBE_TILES * cwr * 128);
    OpenTile tiles[PROBE_TILES];

    // mode 2: tile-id stamps per (probe slot, local row) for the
    // one-entry-per-row-per-tile constraint (no per-tile memsets)
    std::vector<int64_t> row_stamp;
    if (mode == 2) row_stamp.assign((size_t)PROBE_TILES * ROW_BLOCK, -1);

    int64_t t_next = 0;
    for (int p = 0; p < PROBE_TILES; ++p)
        tiles[p].claim = claim_pool.data() + (size_t)p * cwr * 128;

    auto open_tile = [&](int slot, int64_t cell) -> bool {
        if (!grow(t_next + 1)) return false;
        OpenTile& t = tiles[slot];
        t.id = t_next++;
        std::memset(t.claim, 0xFF, (size_t)cwr * 128 * sizeof(int16_t));
        std::memset(t.sub_count, 0, sizeof(t.sub_count));
        std::memset(t.slot_taken, 0, sizeof(t.slot_taken));
        std::memset(t.l_used, 0, sizeof(t.l_used));
        t.used = 0;
        std::memset(out->vals + t.id * TILE, 0, TILE * sizeof(float));
        std::memset(out->pk + t.id * TILE, 0, TILE * sizeof(int32_t));
        std::memset(out->route + t.id * cwr * 128, 0, (size_t)cwr * 128);
        out->rb[t.id] = (int32_t)(cell / nwc);
        out->wb[t.id] = (int32_t)(cell % nwc);
        out->first[t.id] = 0;
        if (mode >= 1) std::memset(out->invl + t.id * TILE, 0xFF, TILE);
        if (mode == 2) std::memset(out->stab + t.id * 8192, 0xFF, 8192);
        return true;
    };

    // mode 1: within each cell, deal entries round-robin across output-l
    // classes (order by rank-within-l).  Same-l entries can share a tile
    // only via distinct sublane rows (8 max), so a row-major entry order
    // exhausts the probe ring on heavy rows/classes and opens near-empty
    // tiles; rank-major order fills every tile's rows evenly and reaches
    // the ceil(max_l_count/8) packing floor.
    std::vector<int32_t> l_rank;
    std::vector<std::pair<int32_t, int64_t>> deal;
    int32_t l_counter[128];

    int32_t last_rb_emitted = -1;
    for (int64_t rbi = 0; rbi < n_rb; ++rbi) {
        bool rb_has_tile = false;
        for (int64_t w = 0; w < nwc; ++w) {
            const int64_t cell = rbi * nwc + w;
            const int64_t lo = cell_count[cell], hi = cell_count[cell + 1];
            if (lo == hi) continue;
            if (mode >= 1 && hi - lo > 1) {
                std::memset(l_counter, 0, sizeof(l_counter));
                deal.clear();
                deal.reserve(hi - lo);
                for (int64_t q = lo; q < hi; ++q) {
                    const int64_t e = order[q];
                    const int l = rows[e] & 127;
                    deal.emplace_back(l_counter[l]++, e);
                }
                std::stable_sort(deal.begin(), deal.end(),
                                 [](const auto& a, const auto& b) {
                                     return a.first < b.first;
                                 });
                for (int64_t q = lo; q < hi; ++q)
                    order[q] = deal[q - lo].second;
            }
            int n_open = 0;          // open tiles for this cell (ring)
            int newest = -1;
            for (int64_t q = lo; q < hi; ++q) {
                const int64_t e = order[q];
                const int32_t col = cols[e];
                const int32_t row = rows[e];
                const int32_t w7 = (int32_t)((col % cw) >> 7);
                const int32_t b = col & 127;
                const int32_t local = row & (ROW_BLOCK - 1);
                const int32_t g = local >> 7, l = local & 127;

                int placed_tile = -1, placed_lane = -1, placed_sub = -1;
                for (int k = 0; k < n_open && placed_tile < 0; ++k) {
                    const int slot_k = (newest - k + PROBE_TILES) % PROBE_TILES;
                    OpenTile& t = tiles[slot_k];
                    if (t.used >= TILE) continue;
                    if (mode == 2 &&
                        row_stamp[(size_t)slot_k * ROW_BLOCK + local] == t.id)
                        continue;  // row already present in this tile
                    int16_t* crow = t.claim + (size_t)w7 * 128;
                    for (int pr = 0; pr < PROBE_LANES; ++pr) {
                        const int lane = (b + pr) & 127;
                        const int16_t c = crow[lane];
                        if (c != -1 && c != b) continue;
                        if (mode == 0) {
                            if (t.sub_count[lane] >= 8) continue;
                            placed_sub = t.sub_count[lane];
                        } else {
                            placed_sub = -1;
                            for (int sb = 0; sb < 8; ++sb) {
                                if (!t.slot_taken[sb][lane] && !t.l_used[sb][l]) {
                                    placed_sub = sb;
                                    break;
                                }
                            }
                            if (placed_sub < 0) continue;
                        }
                        placed_tile = slot_k;
                        placed_lane = lane;
                        break;
                    }
                }
                if (placed_tile < 0) {
                    newest = (newest + 1) % PROBE_TILES;
                    if (n_open < PROBE_TILES) ++n_open;
                    if (!open_tile(newest, cell)) { delete out; return nullptr; }
                    rb_has_tile = true;
                    placed_tile = newest;
                    // fresh tile: the b-lane is free by construction
                    placed_lane = b & 127;
                    placed_sub = 0;
                }
                OpenTile& t = tiles[placed_tile];
                const int lane = placed_lane;
                const int sub = (mode == 0) ? t.sub_count[lane]++ : placed_sub;
                if (mode >= 1) {
                    t.slot_taken[sub][lane] = 1;
                    t.l_used[sub][l] = 1;
                }
                t.claim[(size_t)w7 * 128 + lane] = (int16_t)b;
                ++t.used;
                const int64_t slot = t.id * TILE + sub * 128 + lane;
                out->vals[slot] = vals[e];
                out->pk[slot] = w7 | (g << 7) | (l << 14) | VALID_BIT;
                out->route[t.id * cwr * 128 + (size_t)w7 * 128 + lane] =
                    (int8_t)b;
                if (mode >= 1)
                    out->invl[t.id * TILE + sub * 128 + l] = (int8_t)lane;
                if (mode == 2) {
                    row_stamp[(size_t)placed_tile * ROW_BLOCK + local] = t.id;
                    int8_t* sb =
                        out->stab + t.id * 8192 + (size_t)(g & 63) * 128 + l;
                    const uint8_t cur = (uint8_t)*sb;
                    *sb = (g < 64)
                              ? (int8_t)((cur & 0xF0) | (uint8_t)sub)
                              : (int8_t)((cur & 0x0F) | ((uint8_t)sub << 4));
                }
            }
        }
        if (!rb_has_tile) {  // empty row block still needs a zeroing tile
            if (!grow(t_next + 1)) { delete out; return nullptr; }
            std::memset(out->vals + t_next * TILE, 0, TILE * sizeof(float));
            std::memset(out->pk + t_next * TILE, 0, TILE * sizeof(int32_t));
            std::memset(out->route + t_next * cwr * 128, 0, (size_t)cwr * 128);
            out->rb[t_next] = (int32_t)rbi;
            out->wb[t_next] = 0;
            out->first[t_next] = 0;
            if (mode >= 1) std::memset(out->invl + t_next * TILE, 0xFF, TILE);
            if (mode == 2) std::memset(out->stab + t_next * 8192, 0xFF, 8192);
            ++t_next;
        }
    }

    out->n_tiles = t_next;
    for (int64_t t = 0; t < t_next; ++t) {
        const int32_t r = out->rb[t];
        out->first[t] = (r != last_rb_emitted) ? 1 : 0;
        last_rb_emitted = r;
    }
    if (mode >= 1) {
        // resolve invl sentinels: point absent-l slots at an INVALID slot
        // lane of the same sublane row (a full row has no sentinels, since
        // its 128 distinct l values cover every slot)
        for (int64_t t = 0; t < t_next; ++t) {
            for (int s = 0; s < 8; ++s) {
                int fallback = -1;
                for (int lane = 0; lane < 128; ++lane) {
                    if (!(out->pk[t * TILE + s * 128 + lane] & VALID_BIT)) {
                        fallback = lane;
                        break;
                    }
                }
                if (fallback < 0) continue;
                int8_t* row = out->invl + t * TILE + s * 128;
                for (int lane = 0; lane < 128; ++lane)
                    if (row[lane] == (int8_t)0xFF) row[lane] = (int8_t)fallback;
            }
        }
    }
    return out;
}

int8_t* cellpack_invl(void* h) { return ((Pack*)h)->invl; }
int8_t* cellpack_stab(void* h) { return ((Pack*)h)->stab; }
int32_t* cellpack_fused(void* h) { return ((Pack*)h)->fused; }

int64_t cellpack_n_tiles(void* h) { return ((Pack*)h)->n_tiles; }
float* cellpack_vals(void* h) { return ((Pack*)h)->vals; }
int32_t* cellpack_pk(void* h) { return ((Pack*)h)->pk; }
int8_t* cellpack_route(void* h) { return ((Pack*)h)->route; }
int32_t* cellpack_rb(void* h) { return ((Pack*)h)->rb; }
int32_t* cellpack_wb(void* h) { return ((Pack*)h)->wb; }
int32_t* cellpack_first(void* h) { return ((Pack*)h)->first; }
void cellpack_release(void* h) { delete (Pack*)h; }

}  // extern "C"
