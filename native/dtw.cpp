// Native monotonic DTW — the host-side hot loop of word-timestamp alignment.
//
// Each transcribed 30 s window aligns up to 224 text tokens against 1500
// audio frames (~340k cells); the three-move recurrence is inherently
// sequential, so it runs here instead of interpreted Python (the reference's
// engine runs the equivalent alignment inside CTranslate2's C++ core).
//
// C ABI (used via ctypes, see eioku_tpu/models/whisper/align.py):
//   dtw_best_path(cost, n, m, out_ti, out_fi, max_out) -> path_len (or -1)
//     cost: row-major float32 [n, m]; lower is better
//     out_ti/out_fi: int32 buffers receiving the path, time-ascending
//
// Build: g++ -O2 -shared -fPIC -o libdtw.so dtw.cpp

#include <algorithm>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

int64_t dtw_best_path(const float* cost, int64_t n, int64_t m,
                      int32_t* out_ti, int32_t* out_fi, int64_t max_out) {
    if (n <= 0 || m <= 0) return 0;
    const double inf = std::numeric_limits<double>::infinity();
    std::vector<double> prev(static_cast<size_t>(m) + 1, inf);
    std::vector<double> cur(static_cast<size_t>(m) + 1, inf);
    // trace moves: 0 = diagonal, 1 = advance text, 2 = advance frame
    std::vector<uint8_t> trace(static_cast<size_t>(n + 1) * (m + 1), 0);
    prev[0] = 0.0;
    for (int64_t i = 1; i <= n; ++i) {
        const float* row = cost + (i - 1) * m;
        uint8_t* trow = trace.data() + static_cast<size_t>(i) * (m + 1);
        cur[0] = inf;
        for (int64_t j = 1; j <= m; ++j) {
            double c0 = prev[j - 1], c1 = prev[j], c2 = cur[j - 1];
            double best;
            uint8_t move;
            if (c0 <= c1 && c0 <= c2) { best = c0; move = 0; }
            else if (c1 <= c2)        { best = c1; move = 1; }
            else                      { best = c2; move = 2; }
            cur[j] = best + row[j - 1];
            trow[j] = move;
        }
        std::swap(prev, cur);
    }
    // backtrace from (n, m)
    int64_t i = n, j = m, len = 0;
    std::vector<int32_t> ti, fi;
    ti.reserve(n + m);
    fi.reserve(n + m);
    while (i > 0 && j > 0) {
        ti.push_back(static_cast<int32_t>(i - 1));
        fi.push_back(static_cast<int32_t>(j - 1));
        uint8_t mv = trace[static_cast<size_t>(i) * (m + 1) + j];
        if (mv == 0) { --i; --j; }
        else if (mv == 1) { --i; }
        else { --j; }
        ++len;
    }
    if (len > max_out) return -1;
    for (int64_t k = 0; k < len; ++k) {  // reverse into time-ascending order
        out_ti[k] = ti[len - 1 - k];
        out_fi[k] = fi[len - 1 - k];
    }
    return len;
}

}  // extern "C"
