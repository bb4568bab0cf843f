// Job builder for the Pallas masked-mxmT (SpGEMM-T) intersection kernel.
//
// The reference GPU kernel walks, per mask entry (i, j), the sorted-list
// intersection of A-row i and B-row j (src/opencl/cl_mxmT_masked.hpp,
// kernels/mxmT_masked.cl).  A TPU has no per-lane random access, so the
// intersection is re-expressed as a *stream*: each mask entry is split
// into (A-chunk x B-chunk) JOBS of at most K=8 sorted entries per side,
// range-pruned with a two-pointer staircase sweep (only chunk pairs whose
// column ranges overlap can produce matches, and every matching pair is
// visited exactly once).  The kernel then evaluates 128 jobs per lane-row
// with dense all-pairs compare-FMA — pure streaming, no gathers.
//
// Output layout (job-major, padded to a multiple of 128 jobs):
//   ac/bc: int32 [n_jobs * 8]  column ids, sentinel -1 (A) / -2 (B)
//   av/bv: f32   [n_jobs * 8]  values, 0 at sentinels
//   seg:   int32 [n_jobs]      mask-entry index of the job (for future
//                              per-entry materialization; the fused
//                              reduce ignores it)
//
// C ABI, handle-based like cellpack.cpp.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>

namespace {

constexpr int K = 8;

struct PairPack {
    int64_t n_jobs = 0;      // padded to a multiple of 128
    int64_t n_jobs_real = 0;
    int32_t* ac = nullptr;
    float* av = nullptr;
    int32_t* bc = nullptr;
    float* bv = nullptr;
    int32_t* seg = nullptr;
    ~PairPack() {
        std::free(ac); std::free(av); std::free(bc); std::free(bv);
        std::free(seg);
    }
};

}  // namespace

extern "C" {

// mask given as COO entry lists (mrow/mcol, pre-filtered by the caller's
// select op); A/B as CSR with cols sorted within each row.
void* pairpack_run(int64_t m_nnz, const int32_t* mrow, const int32_t* mcol,
                   const int32_t* a_indptr, const int32_t* a_cols,
                   const float* a_vals, const int32_t* b_indptr,
                   const int32_t* b_cols, const float* b_vals) {
    PairPack* out = new (std::nothrow) PairPack();
    if (!out) return nullptr;

    int64_t alloc = 0;
    auto grow = [&](int64_t need) -> bool {
        if (need <= alloc && out->ac) return true;
        int64_t na = alloc ? alloc : 4096;
        while (na < need) na *= 2;
        void* v;
        v = std::realloc(out->ac, na * K * sizeof(int32_t));
        if (!v) return false; out->ac = (int32_t*)v;
        v = std::realloc(out->av, na * K * sizeof(float));
        if (!v) return false; out->av = (float*)v;
        v = std::realloc(out->bc, na * K * sizeof(int32_t));
        if (!v) return false; out->bc = (int32_t*)v;
        v = std::realloc(out->bv, na * K * sizeof(float));
        if (!v) return false; out->bv = (float*)v;
        v = std::realloc(out->seg, na * sizeof(int32_t));
        if (!v) return false; out->seg = (int32_t*)v;
        alloc = na;
        return true;
    };

    int64_t nj = 0;
    auto emit = [&](int64_t e, const int32_t* acs, const float* avs, int an,
                    const int32_t* bcs, const float* bvs, int bn) -> bool {
        if (!grow(nj + 1)) return false;
        int32_t* acp = out->ac + nj * K;
        float* avp = out->av + nj * K;
        int32_t* bcp = out->bc + nj * K;
        float* bvp = out->bv + nj * K;
        int t = 0;
        for (; t < an; ++t) { acp[t] = acs[t]; avp[t] = avs[t]; }
        for (; t < K; ++t) { acp[t] = -1; avp[t] = 0.f; }
        for (t = 0; t < bn; ++t) { bcp[t] = bcs[t]; bvp[t] = bvs[t]; }
        for (; t < K; ++t) { bcp[t] = -2; bvp[t] = 0.f; }
        out->seg[nj] = (int32_t)e;
        ++nj;
        return true;
    };

    for (int64_t e = 0; e < m_nnz; ++e) {
        const int32_t i = mrow[e], j = mcol[e];
        const int64_t as = a_indptr[i], ae = a_indptr[i + 1];
        const int64_t bs = b_indptr[j], be = b_indptr[j + 1];
        if (as >= ae || bs >= be) continue;
        const int64_t ca = (ae - as + K - 1) / K;
        const int64_t cb = (be - bs + K - 1) / K;
        int64_t p = 0, q = 0;
        while (p < ca && q < cb) {
            const int64_t ap0 = as + p * K;
            const int64_t ap1 = std::min(ap0 + K, ae);
            const int64_t bq0 = bs + q * K;
            const int64_t bq1 = std::min(bq0 + K, be);
            const int32_t alo = a_cols[ap0], ahi = a_cols[ap1 - 1];
            const int32_t blo = b_cols[bq0], bhi = b_cols[bq1 - 1];
            if (ahi < blo) { ++p; continue; }
            if (bhi < alo) { ++q; continue; }
            if (!emit(e, a_cols + ap0, a_vals + ap0, (int)(ap1 - ap0),
                      b_cols + bq0, b_vals + bq0, (int)(bq1 - bq0))) {
                delete out;
                return nullptr;
            }
            if (ahi <= bhi) ++p;
            else ++q;
        }
    }

    out->n_jobs_real = nj;
    // pad to a multiple of 128 with sentinel-only jobs
    const int64_t padded = ((nj + 127) / 128) * 128;
    if (padded == 0) {
        if (!grow(128)) { delete out; return nullptr; }
        for (int64_t u = 0; u < 128; ++u) {
            for (int t = 0; t < K; ++t) {
                out->ac[u * K + t] = -1; out->av[u * K + t] = 0.f;
                out->bc[u * K + t] = -2; out->bv[u * K + t] = 0.f;
            }
            out->seg[u] = 0;
        }
        out->n_jobs = 128;
        return out;
    }
    if (!grow(padded)) { delete out; return nullptr; }
    for (int64_t u = nj; u < padded; ++u) {
        for (int t = 0; t < K; ++t) {
            out->ac[u * K + t] = -1; out->av[u * K + t] = 0.f;
            out->bc[u * K + t] = -2; out->bv[u * K + t] = 0.f;
        }
        out->seg[u] = out->seg[nj - 1];
    }
    out->n_jobs = padded;
    return out;
}

int64_t pairpack_n_jobs(void* h) { return ((PairPack*)h)->n_jobs; }
int64_t pairpack_n_jobs_real(void* h) { return ((PairPack*)h)->n_jobs_real; }
int32_t* pairpack_ac(void* h) { return ((PairPack*)h)->ac; }
float* pairpack_av(void* h) { return ((PairPack*)h)->av; }
int32_t* pairpack_bc(void* h) { return ((PairPack*)h)->bc; }
float* pairpack_bv(void* h) { return ((PairPack*)h)->bv; }
int32_t* pairpack_seg(void* h) { return ((PairPack*)h)->seg; }
void pairpack_release(void* h) { delete (PairPack*)h; }

}  // extern "C"
