// Parallel host-side row copy for the serving ingest path.
//
// The StreamServer's staged fast path is bounded by one large memcpy per
// tick: at 50k slots x 1280 int16 samples that is ~128 MB, and a
// single-threaded numpy assignment moves it at ~5 GB/s (~24 ms) — most of
// the measured host tick (PERF_NOTES round 3). The copy is embarrassingly
// parallel across rows, and commodity server hosts sustain 4-8x that
// bandwidth across cores, so this library provides threaded contiguous and
// gathered row copies. It is an optional accelerator: the Python binding
// (openwakeword_tpu/parallel/ingest.py) falls back to numpy when the
// library is absent, and the truly copy-free path is the server's
// acquire_block/commit_block API where the client writes the staging rows
// directly.
//
// Replaces-what: the reference has no serving runtime at all (its closest
// analog is the bulk_predict process pool, reference utils.py:467-539);
// this is new capability for the multi-stream engine.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Rows below this byte volume are cheaper single-threaded (thread spawn
// costs ~50 us each; crossover measured well under 4 MB).
constexpr int64_t kParallelBytes = 4 << 20;

inline void copy_span(int16_t* dst, const int16_t* src, int64_t n_elems) {
    std::memcpy(dst, src, static_cast<size_t>(n_elems) * sizeof(int16_t));
}

template <typename Fn>
void parallel_rows(int64_t n_rows, int64_t row_len, int32_t n_threads, Fn fn) {
    const int64_t total_bytes = n_rows * row_len
                                * static_cast<int64_t>(sizeof(int16_t));
    int64_t workers = std::min<int64_t>(std::max(n_threads, 1), 32);
    workers = std::min(workers, n_rows);
    if (workers <= 1 || total_bytes < kParallelBytes) {
        fn(0, n_rows);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(static_cast<size_t>(workers));
    const int64_t rows_per = (n_rows + workers - 1) / workers;
    for (int64_t w = 0; w < workers; ++w) {
        const int64_t r0 = w * rows_per;
        const int64_t r1 = std::min(n_rows, r0 + rows_per);
        if (r0 >= r1) break;
        threads.emplace_back([=] { fn(r0, r1); });
    }
    for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// dst[0:n_rows] = src[0:n_rows]; both contiguous (n_rows, row_len) int16.
void owwt_copy_rows(int16_t* dst, const int16_t* src, int64_t n_rows,
                    int64_t row_len, int32_t n_threads) {
    parallel_rows(n_rows, row_len, n_threads, [=](int64_t r0, int64_t r1) {
        copy_span(dst + r0 * row_len, src + r0 * row_len,
                  (r1 - r0) * row_len);
    });
}

// dst[i] = src[idx[i]] for i in [0, n_rows); dst/src contiguous int16
// matrices with row_len columns, idx int64.
void owwt_gather_rows(int16_t* dst, const int16_t* src, const int64_t* idx,
                      int64_t n_rows, int64_t row_len, int32_t n_threads) {
    parallel_rows(n_rows, row_len, n_threads, [=](int64_t r0, int64_t r1) {
        for (int64_t r = r0; r < r1; ++r) {
            copy_span(dst + r * row_len, src + idx[r] * row_len, row_len);
        }
    });
}

}  // extern "C"
