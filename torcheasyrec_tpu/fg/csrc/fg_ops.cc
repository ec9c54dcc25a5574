// Native feature-generation ops (pyfg equivalent).
//
// TPU-native counterpart of the reference's closed-source pyfg C++ wheel
// (/root/reference/tzrec/features/feature.py:979-995 uses FgArrowHandler;
// SURVEY.md §2.1 row 1). The host-side FG hot loops — string hashing,
// multi-value splitting, bucketization — run here over Arrow-compatible
// flat buffers (offsets + data pointers), exposed through a C ABI and
// loaded via ctypes (no pybind11 dependency in this image).
//
// Hash: 64-bit FNV-1a, identical to the numpy fallback in
// torcheasyrec_tpu/features/feature.py (train/serve consistency holds
// whichever side computes it). Parallelized with a simple thread pool
// (pyfg's multi-threaded DAG equivalent; fg_threads in DataConfig).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t kFnvOffset = 0xCBF29CE484222325ULL;
constexpr uint64_t kFnvPrime = 0x100000001B3ULL;

inline uint64_t fnv1a(const char* data, int64_t len) {
  uint64_t h = kFnvOffset;
  for (int64_t i = 0; i < len; ++i) {
    h ^= static_cast<unsigned char>(data[i]);
    h *= kFnvPrime;
  }
  return h;
}

void parallel_for(int64_t n, int threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  if (threads <= 1 || n < (1 << 14)) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Hash utf-8 strings laid out as (offsets[n+1], data) -> out[n] uint64.
void fg_hash64_strings(const int32_t* offsets, const char* data, int64_t n,
                       uint64_t* out, int threads) {
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      out[i] = fnv1a(data + offsets[i], offsets[i + 1] - offsets[i]);
    }
  });
}

// Same but modulo a bucket count (hash_bucket_size semantics).
void fg_hash64_strings_mod(const int32_t* offsets, const char* data,
                           int64_t n, uint64_t num_buckets, int64_t* out,
                           int threads) {
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t h =
          fnv1a(data + offsets[i], offsets[i + 1] - offsets[i]);
      out[i] = static_cast<int64_t>(h % num_buckets);
    }
  });
}

// Bucketize: out[i] = #boundaries <= searchsorted-right position.
void fg_bucketize(const double* values, int64_t n, const double* boundaries,
                  int64_t n_bounds, int64_t* out, int threads) {
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      out[i] = std::upper_bound(boundaries, boundaries + n_bounds,
                                values[i]) -
               boundaries;
    }
  });
}

// Split multi-value strings on `sep` and hash each token:
// inputs (offsets[n+1], data); outputs: token hashes appended to
// out_vals (caller-sized to max_tokens), per-row counts in out_lengths.
// Returns total token count, or -1 if out_vals capacity was exceeded.
int64_t fg_split_hash(const int32_t* offsets, const char* data, int64_t n,
                      char sep, uint64_t num_buckets, int64_t* out_vals,
                      int64_t max_tokens, int32_t* out_lengths) {
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    const char* begin = data + offsets[i];
    const char* end = data + offsets[i + 1];
    int32_t count = 0;
    if (begin == end) {
      out_lengths[i] = 0;
      continue;
    }
    const char* tok = begin;
    for (const char* p = begin; p <= end; ++p) {
      if (p == end || *p == sep) {
        if (p > tok) {
          if (total >= max_tokens) return -1;
          uint64_t h = fnv1a(tok, p - tok);
          out_vals[total++] =
              num_buckets ? static_cast<int64_t>(h % num_buckets)
                          : static_cast<int64_t>(h);
          ++count;
        }
        tok = p + 1;
      }
    }
    out_lengths[i] = count;
  }
  return total;
}

// log10 normalizer with threshold/default (reference raw_feature
// normalizer "method=log10").
void fg_normalize_log10(const float* values, int64_t n, float threshold,
                        float default_value, float* out, int threads) {
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      out[i] = values[i] >= threshold ? log10f(values[i]) : default_value;
    }
  });
}

int fg_version() { return 1; }

}  // extern "C"
