// Fast MatrixMarket coordinate-format parser.
//
// Native equivalent of the reference's C++ MtxLoader (reference:
// src/io.cpp:50-157 — buffered sliding-window parse).  Design differs:
// mmap + branch-light hand-rolled integer/float scanning in a single
// pass, emitting parallel arrays ready for zero-copy adoption by numpy
// via ctypes (the framework's MemView-style boundary).
//
// Exposed C ABI (consumed by spla_tpu/io.py):
//   mtx_parse(path, &handle) -> status
//   accessors for dims / nnz / arrays, mtx_release(handle)

#include <cctype>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct MtxData {
    int64_t n_rows = 0;
    int64_t n_cols = 0;
    int64_t nnz = 0;       // entries actually parsed
    int pattern = 0;       // 1 = no values in file
    int symmetric = 0;     // 1 = symmetric/skew/hermitian header
    int integer_field = 0; // 1 = integer values
    std::vector<int32_t> rows;
    std::vector<int32_t> cols;
    std::vector<double> vals;
    std::string error;
};

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* next_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

inline const char* parse_i64(const char* p, const char* end, int64_t* out) {
    p = skip_ws(p, end);
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = *p == '-'; ++p; }
    int64_t v = 0;
    const char* start = p;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
    if (p == start) return nullptr;
    *out = neg ? -v : v;
    return p;
}

inline const char* parse_f64(const char* p, const char* end, double* out) {
    p = skip_ws(p, end);
    char* q = nullptr;
    // strtod stops at whitespace/newline; the mapping is NUL-padded past
    // the file (mmap guarantees zero fill to page boundary)
    *out = strtod(p, &q);
    if (q == p) return nullptr;
    return q;
}

}  // namespace

extern "C" {

void* mtx_parse(const char* path) {
    auto* d = new MtxData();
    int fd = open(path, O_RDONLY);
    if (fd < 0) {
        d->error = std::string("open failed: ") + strerror(errno);
        return d;
    }
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
        d->error = "stat failed or empty file";
        close(fd);
        return d;
    }
    size_t size = size_t(st.st_size);
    const char* base =
        static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    close(fd);
    if (base == MAP_FAILED) {
        d->error = "mmap failed";
        return d;
    }
    const char* p = base;
    const char* end = base + size;

    // header line: %%MatrixMarket matrix coordinate <field> <symmetry>
    if (size > 14 && strncmp(p, "%%MatrixMarket", 14) == 0) {
        const char* line_end = p;
        while (line_end < end && *line_end != '\n') ++line_end;
        std::string header(p, line_end);
        for (auto& ch : header) ch = char(tolower(ch));
        if (header.find("pattern") != std::string::npos) d->pattern = 1;
        if (header.find("integer") != std::string::npos) d->integer_field = 1;
        if (header.find("symmetric") != std::string::npos ||
            header.find("hermitian") != std::string::npos ||
            header.find("skew") != std::string::npos)
            d->symmetric = 1;
        p = next_line(p, end);
    }
    // comments
    while (p < end && (*p == '%' || *p == '\n')) p = next_line(p, end);

    int64_t m = 0, n = 0, decl = 0;
    const char* q = parse_i64(p, end, &m);
    if (q) q = parse_i64(q, end, &n);
    if (q) q = parse_i64(q, end, &decl);
    if (!q) {
        d->error = "bad size line";
        munmap(const_cast<char*>(base), size);
        return d;
    }
    p = next_line(q, end);
    d->n_rows = m;
    d->n_cols = n;
    d->rows.reserve(size_t(decl));
    d->cols.reserve(size_t(decl));
    if (!d->pattern) d->vals.reserve(size_t(decl));

    while (p < end) {
        int64_t r = 0, c = 0;
        const char* q2 = parse_i64(p, end, &r);
        if (!q2) { p = next_line(p, end); continue; }
        q2 = parse_i64(q2, end, &c);
        if (!q2) { p = next_line(p, end); continue; }
        double v = 1.0;
        if (!d->pattern) {
            const char* q3 = parse_f64(q2, end, &v);
            if (q3) q2 = q3;
        }
        d->rows.push_back(int32_t(r));
        d->cols.push_back(int32_t(c));
        if (!d->pattern) d->vals.push_back(v);
        p = next_line(q2, end);
    }
    d->nnz = int64_t(d->rows.size());
    munmap(const_cast<char*>(base), size);
    return d;
}

const char* mtx_error(void* h) {
    auto* d = static_cast<MtxData*>(h);
    return d->error.empty() ? nullptr : d->error.c_str();
}
int64_t mtx_n_rows(void* h) { return static_cast<MtxData*>(h)->n_rows; }
int64_t mtx_n_cols(void* h) { return static_cast<MtxData*>(h)->n_cols; }
int64_t mtx_nnz(void* h) { return static_cast<MtxData*>(h)->nnz; }
int mtx_pattern(void* h) { return static_cast<MtxData*>(h)->pattern; }
int mtx_symmetric(void* h) { return static_cast<MtxData*>(h)->symmetric; }
const int32_t* mtx_rows(void* h) { return static_cast<MtxData*>(h)->rows.data(); }
const int32_t* mtx_cols(void* h) { return static_cast<MtxData*>(h)->cols.data(); }
const double* mtx_vals(void* h) {
    auto* d = static_cast<MtxData*>(h);
    return d->vals.empty() ? nullptr : d->vals.data();
}
void mtx_release(void* h) { delete static_cast<MtxData*>(h); }

}  // extern "C"
