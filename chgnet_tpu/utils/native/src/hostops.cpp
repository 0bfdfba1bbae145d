// Threaded host-side array utilities for graph preprocessing.
//
// The padded-batch and multi-chip re-layout pipelines are dominated by
// random row gathers over 10M+-row arrays. Those are DRAM-latency-bound
// (~150-200 ns per cache miss on virtualized hosts): single-threaded numpy
// fancy indexing runs at ~5M rows/s. Hiding latency across cores and
// issuing software prefetches ahead of use recovers most of the machine's
// memory parallelism.
//
// Exposed via ctypes (chgnet_tpu/utils/native/hostops.py); generic over
// dtype by treating rows as opaque byte strips.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

template <int ROW>
void gather_fixed(const char* src, const int64_t* idx, char* out,
                  int64_t lo, int64_t hi) {
    constexpr int kAhead = 16;  // prefetch distance (rows)
    for (int64_t i = lo; i < hi; ++i) {
        if (i + kAhead < hi) {
            __builtin_prefetch(src + idx[i + kAhead] * ROW, 0, 0);
        }
        std::memcpy(out + i * ROW, src + idx[i] * ROW, ROW);
    }
}

void gather_var(const char* src, const int64_t* idx, char* out,
                int64_t row, int64_t lo, int64_t hi) {
    constexpr int kAhead = 16;
    for (int64_t i = lo; i < hi; ++i) {
        if (i + kAhead < hi) {
            __builtin_prefetch(src + idx[i + kAhead] * row, 0, 0);
        }
        std::memcpy(out + i * row, src + idx[i] * row, row);
    }
}

void gather_range(const char* src, const int64_t* idx, char* out,
                  int64_t row, int64_t lo, int64_t hi) {
    switch (row) {
        case 4:  gather_fixed<4>(src, idx, out, lo, hi); break;
        case 8:  gather_fixed<8>(src, idx, out, lo, hi); break;
        case 12: gather_fixed<12>(src, idx, out, lo, hi); break;
        case 16: gather_fixed<16>(src, idx, out, lo, hi); break;
        case 24: gather_fixed<24>(src, idx, out, lo, hi); break;
        case 32: gather_fixed<32>(src, idx, out, lo, hi); break;
        default: gather_var(src, idx, out, row, lo, hi); break;
    }
}

}  // namespace

extern "C" {

// out[i] = src[idx[i]] for byte rows; n rows, row bytes each.
void hostops_gather_rows(const char* src, const int64_t* idx, char* out,
                         int64_t n, int64_t row, int32_t n_threads) {
    if (n_threads <= 1 || n < (int64_t)1 << 16) {
        gather_range(src, idx, out, row, 0, n);
        return;
    }
    std::vector<std::thread> workers;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        workers.emplace_back(gather_range, src, idx, out, row, lo, hi);
    }
    for (auto& w : workers) w.join();
}

}  // extern "C"
