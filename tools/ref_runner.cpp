// Cross-validation runner: drives the REFERENCE framework (spla, built
// CPU-only into .refbuild/libspla_x64.so) on a MatrixMarket file and
// dumps raw per-vertex results to a text file, so
// tests/test_reference_parity.py can compare spla_tpu's outputs against
// the reference's — bit-for-bit on integer results (BFS levels, triangle
// counts), float otherwise (SSSP distances, PageRank).
//
// The reference is used strictly AS A LIBRARY (headers + .so); no
// reference code is copied.  Algorithm setup mirrors the reference's own
// example harnesses: examples/bfs.cpp:66-122, sssp.cpp:66-110,
// pr.cpp:70-100 (A pre-normalized to alpha/outdeg), tc.cpp:80-100
// (lower-triangle A).  The MatrixMarket file is parsed here directly
// (coordinate real/integer/pattern, general/symmetric) so edge VALUES
// reach sssp, which spla's MtxLoader drops (include/spla/io.hpp:80-84).
//
// usage: ref_runner <bfs|sssp|pr|tc> <graph.mtx> <out.txt> [source] [mode]
//        mode = push|pull|pushpull (default push).  NOTE the reference's
//        pull/adaptive traversal reads A's rows = OUTGOING edges
//        (src/algorithm.cpp:98 mxv over A, not A^T), which is only
//        correct on undirected graphs — its loader force-undirects by
//        default (include/spla/io.hpp:64-66) and its whole published
//        dataset is undirected.  Push is correct on both, so it is the
//        parity default; the directed-pull discrepancy is documented in
//        tests/test_reference_parity.py.
//        floats print as %.9g plus the raw bit pattern for exactness
//        bookkeeping on the python side.

#include <spla.hpp>

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Coo {
    uint32_t           n = 0;
    std::vector<uint32_t> ai, aj;
    std::vector<float>    ax;
};

bool load_mtx(const char* path, Coo& out) {
    FILE* f = std::fopen(path, "r");
    if (!f) return false;
    char line[1024];
    bool symmetric = false, pattern = false, header = true;
    uint64_t rows = 0, cols = 0, nnz = 0;
    while (std::fgets(line, sizeof line, f)) {
        if (line[0] == '%') {
            if (std::strstr(line, "symmetric")) symmetric = true;
            if (std::strstr(line, "pattern")) pattern = true;
            continue;
        }
        if (header) {
            if (std::sscanf(line, "%lu %lu %lu", &rows, &cols, &nnz) != 3) {
                std::fclose(f);
                return false;
            }
            header = false;
            out.n = static_cast<uint32_t>(rows > cols ? rows : cols);
            out.ai.reserve(nnz * (symmetric ? 2 : 1));
            out.aj.reserve(nnz * (symmetric ? 2 : 1));
            out.ax.reserve(nnz * (symmetric ? 2 : 1));
            continue;
        }
        uint64_t i = 0, j = 0;
        double   v = 1.0;
        int      got = std::sscanf(line, "%lu %lu %lf", &i, &j, &v);
        if (got < 2) continue;
        if (pattern || got < 3) v = 1.0;
        const uint32_t r = static_cast<uint32_t>(i - 1);
        const uint32_t c = static_cast<uint32_t>(j - 1);
        out.ai.push_back(r);
        out.aj.push_back(c);
        out.ax.push_back(static_cast<float>(v));
        if (symmetric && r != c) {
            out.ai.push_back(c);
            out.aj.push_back(r);
            out.ax.push_back(static_cast<float>(v));
        }
    }
    std::fclose(f);
    return !header;
}

void dump_int(FILE* o, const spla::ref_ptr<spla::Vector>& v, uint32_t n) {
    for (uint32_t i = 0; i < n; ++i) {
        int x = 0;
        v->get_int(i, x);
        std::fprintf(o, "%d\n", x);
    }
}

void dump_float(FILE* o, const spla::ref_ptr<spla::Vector>& v, uint32_t n) {
    for (uint32_t i = 0; i < n; ++i) {
        float x = 0.0f;
        v->get_float(i, x);
        uint32_t bits;
        std::memcpy(&bits, &x, 4);
        std::fprintf(o, "%.9g 0x%08x\n", static_cast<double>(x), bits);
    }
}

}  // namespace

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr,
                     "usage: ref_runner <bfs|sssp|pr|tc> <graph.mtx> "
                     "<out.txt> [source]\n");
        return 2;
    }
    const std::string algo = argv[1];
    const uint32_t    s    = argc > 4 ? std::strtoul(argv[4], nullptr, 10) : 0;
    const std::string mode = argc > 5 ? argv[5] : "push";

    Coo g;
    if (!load_mtx(argv[2], g)) {
        std::fprintf(stderr, "failed to load %s\n", argv[2]);
        return 2;
    }
    FILE* o = std::fopen(argv[3], "w");
    if (!o) return 2;

    spla::Library* library = spla::Library::get();
    library->set_force_no_acceleration(true);  // CPU-only build anyway

    const uint32_t                  N    = g.n;
    spla::ref_ptr<spla::Descriptor> desc = spla::Descriptor::make();
    desc->set_traversal_mode(
            mode == "pull" ? spla::Descriptor::TraversalMode::Pull
            : mode == "pushpull" ? spla::Descriptor::TraversalMode::PushPull
                                 : spla::Descriptor::TraversalMode::Push);

    if (algo == "bfs") {
        auto A = spla::Matrix::make(N, N, spla::INT);
        for (std::size_t k = 0; k < g.ai.size(); ++k)
            A->set_int(g.ai[k], g.aj[k], 1);
        auto v = spla::Vector::make(N, spla::INT);
        spla::bfs(v, A, s, desc);
        dump_int(o, v, N);
    } else if (algo == "sssp") {
        auto A = spla::Matrix::make(N, N, spla::FLOAT);
        for (std::size_t k = 0; k < g.ai.size(); ++k)
            A->set_float(g.ai[k], g.aj[k], g.ax[k]);
        auto v = spla::Vector::make(N, spla::FLOAT);
        spla::sssp(v, A, s, desc);
        dump_float(o, v, N);
    } else if (algo == "pr") {
        const float alpha = 0.85f, eps = 1e-6f;
        // the reference harness pre-normalizes: A[i,j] = alpha/outdeg(i)
        // (examples/pr.cpp:82-89)
        std::vector<float> deg(N, 0.0f);
        for (std::size_t k = 0; k < g.ai.size(); ++k) deg[g.ai[k]] += 1.0f;
        auto A = spla::Matrix::make(N, N, spla::FLOAT);
        for (std::size_t k = 0; k < g.ai.size(); ++k)
            A->set_float(g.ai[k], g.aj[k], alpha / deg[g.ai[k]]);
        auto p = spla::Vector::make(N, spla::FLOAT);
        spla::pr(p, A, alpha, eps, desc);
        dump_float(o, p, N);
    } else if (algo == "tc") {
        // lower-triangle orientation, counts total directed triangles x1
        // (examples/tc.cpp:83-100)
        auto A = spla::Matrix::make(N, N, spla::INT);
        for (std::size_t k = 0; k < g.ai.size(); ++k)
            if (g.ai[k] > g.aj[k]) A->set_int(g.ai[k], g.aj[k], 1);
        auto B      = spla::Matrix::make(N, N, spla::INT);
        int  ntrins = -1;
        spla::tc(ntrins, A, B, desc);
        std::fprintf(o, "%d\n", ntrins);
    } else {
        std::fprintf(stderr, "unknown algo %s\n", algo.c_str());
        std::fclose(o);
        return 2;
    }
    std::fclose(o);
    spla::Library::get()->finalize();
    return 0;
}
