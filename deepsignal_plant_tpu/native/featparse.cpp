// Native fast path for the features-TSV codec.
//
// The features format (12 tab-separated columns, reference
// extract_features.py:381-395) carries ~260 floats per row; Python-level
// parsing is the host bottleneck of the call_mods feed once the model runs
// on TPU. This parser walks the raw byte buffer once and fills
// caller-allocated numpy arrays.
//
// Exposed C ABI (ctypes):
//   dsp_parse_features(buf, len, kmer_len, signal_len,
//                      kmer, means, stds, slens, signals, labels,
//                      row_starts, info_ends)
//     -> number of rows parsed, or -(line_index+1) on a malformed line.
//
//   dsp_count_lines(buf, len) -> newline count.

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

// base -> code table (reference process_utils.py:25-28)
int8_t base_code(char c) {
    switch (c) {
        case 'A': return 0; case 'C': return 1; case 'G': return 2;
        case 'T': return 3; case 'N': return 4; case 'W': return 5;
        case 'S': return 6; case 'M': return 7; case 'K': return 8;
        case 'R': return 9; case 'Y': return 10; case 'B': return 11;
        case 'V': return 12; case 'D': return 13; case 'H': return 14;
        case 'Z': return 15; default: return 4;  // unknown -> N
    }
}

// fast float parse for our constrained grammar: [-]ddd[.ffffff][e[+-]dd]
// falls back to strtod for anything unusual.
inline double parse_float(const char*& p, const char* end, bool& ok) {
    const char* start = p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    uint64_t ip = 0; int idig = 0;
    while (p < end && *p >= '0' && *p <= '9') {
        ip = ip * 10 + uint64_t(*p - '0'); ++p; ++idig;
    }
    double val = double(ip);
    if (p < end && *p == '.') {
        ++p;
        uint64_t fp = 0; int fdig = 0;
        while (p < end && *p >= '0' && *p <= '9') {
            fp = fp * 10 + uint64_t(*p - '0'); ++p; ++fdig;
        }
        static const double kPow10[19] = {
            1e0, 1e-1, 1e-2, 1e-3, 1e-4, 1e-5, 1e-6, 1e-7, 1e-8, 1e-9,
            1e-10, 1e-11, 1e-12, 1e-13, 1e-14, 1e-15, 1e-16, 1e-17, 1e-18};
        if (fdig < 19 && idig + fdig < 19) {
            val += double(fp) * kPow10[fdig];
        } else {
            char* e2 = nullptr;
            val = strtod(start, &e2);
            p = e2;
            ok = (p != start);
            return val;
        }
    }
    if (p < end && (*p == 'e' || *p == 'E')) {  // rare: scientific notation
        char* e2 = nullptr;
        val = strtod(start, &e2);
        p = e2;
        ok = (p != start);
        return val;
    }
    ok = (idig > 0);
    return neg ? -val : val;
}

}  // namespace

extern "C" {

int64_t dsp_count_lines(const char* buf, int64_t len) {
    int64_t n = 0;
    const char* p = buf;
    const char* end = buf + len;
    while ((p = static_cast<const char*>(memchr(p, '\n', end - p)))) {
        ++n; ++p;
    }
    if (len > 0 && buf[len - 1] != '\n') ++n;  // unterminated final line
    return n;
}

int64_t dsp_parse_features(const char* buf, int64_t len, int kmer_len,
                           int signal_len, int32_t* kmer, float* means,
                           float* stds, float* slens, float* signals,
                           int32_t* labels, int64_t* row_starts,
                           int64_t* info_ends) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t row = 0;
    const int L = kmer_len;
    const int S = signal_len;

    while (p < end) {
        const char* line_start = p;
        const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
        const char* line_end = nl ? nl : end;
        if (line_start == line_end) { p = line_end + 1; continue; }
        row_starts[row] = line_start - buf;

        // skip the 6 passthrough text columns
        const char* q = line_start;
        for (int t = 0; t < 6; ++t) {
            q = static_cast<const char*>(memchr(q, '\t', line_end - q));
            if (!q) return -(row + 1);
            ++q;
        }
        info_ends[row] = (q - 1) - buf;

        // col 6: kmer
        int32_t* krow = kmer + row * L;
        for (int i = 0; i < L; ++i) {
            if (q >= line_end || *q == '\t') return -(row + 1);
            krow[i] = base_code(*q++);
        }
        if (q >= line_end || *q != '\t') return -(row + 1);
        ++q;

        bool ok = true;
        // cols 7-9: csv float vectors of length L
        float* vecs[3] = {means + row * L, stds + row * L, slens + row * L};
        for (int v = 0; v < 3; ++v) {
            float* out = vecs[v];
            for (int i = 0; i < L; ++i) {
                out[i] = float(parse_float(q, line_end, ok));
                if (!ok) return -(row + 1);
                if (i + 1 < L) {
                    if (q >= line_end || *q != ',') return -(row + 1);
                    ++q;
                }
            }
            if (q >= line_end || *q != '\t') return -(row + 1);
            ++q;
        }
        // col 10: L rows of S csv floats joined by ';'
        float* srow = signals + row * int64_t(L) * S;
        for (int i = 0; i < L; ++i) {
            for (int j = 0; j < S; ++j) {
                srow[i * S + j] = float(parse_float(q, line_end, ok));
                if (!ok) return -(row + 1);
                if (j + 1 < S) {
                    if (q >= line_end || *q != ',') return -(row + 1);
                    ++q;
                }
            }
            if (i + 1 < L) {
                if (q >= line_end || *q != ';') return -(row + 1);
                ++q;
            }
        }
        if (q >= line_end || *q != '\t') return -(row + 1);
        ++q;
        // col 11: label
        bool lneg = false;
        if (q < line_end && *q == '-') { lneg = true; ++q; }
        int32_t lab = 0;
        bool ldig = false;
        while (q < line_end && *q >= '0' && *q <= '9') {
            lab = lab * 10 + (*q - '0'); ++q; ldig = true;
        }
        if (!ldig) return -(row + 1);
        // allow trailing \r
        labels[row] = lneg ? -lab : lab;

        ++row;
        p = line_end + 1;
    }
    return row;
}

}  // extern "C"
