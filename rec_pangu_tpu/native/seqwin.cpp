// Native sequence-window builder — the hot host-side loop of the sequence
// data pipeline (rec_pangu_tpu/data/sequence.py::_build).
//
// Given each user's interaction list (flattened + offsets) and a per-user
// split point k, fills the fixed-shape training arrays:
//   hist[u]   = items[k-L:k] (right-padded with 0)
//   mask[u]   = 1.0 for valid history positions
//   target[u] = items[min(k, len-1)]
//   next[u]   = items[k:k+S] (padded), next_mask accordingly
//
// The Python fallback walks users in an interpreter loop; this runs the same
// logic in O(total) C++ and is loaded via ctypes (no pybind11 dependency).
#include <cstdint>
#include <algorithm>

extern "C" {

// items: concatenated per-user item ids; offsets: [U+1] prefix offsets.
// ks: [U] split points.  Outputs are pre-allocated by the caller.
void build_windows(const int64_t* items, const int64_t* offsets,
                   const int64_t* ks, int64_t num_users, int64_t max_length,
                   int64_t next_len,
                   int32_t* hist, float* mask, int32_t* target,
                   int32_t* next_items, float* next_mask,
                   int32_t with_target) {
  for (int64_t u = 0; u < num_users; ++u) {
    const int64_t* seq = items + offsets[u];
    const int64_t len = offsets[u + 1] - offsets[u];
    const int64_t k = ks[u];
    int32_t* h = hist + u * max_length;
    float* m = mask + u * max_length;
    const int64_t start = k >= max_length ? k - max_length : 0;
    const int64_t n = k - start;  // number of valid history items (<= L)
    for (int64_t i = 0; i < n; ++i) {
      h[i] = static_cast<int32_t>(seq[start + i]);
      m[i] = 1.0f;
    }
    for (int64_t i = n; i < max_length; ++i) {
      h[i] = 0;
      m[i] = 0.0f;
    }
    if (with_target) {
      const int64_t t = std::min(k, len - 1);
      target[u] = static_cast<int32_t>(seq[t < 0 ? 0 : t]);
      int32_t* nx = next_items + u * next_len;
      float* nm = next_mask + u * next_len;
      const int64_t fut = std::min(next_len, len - k);
      for (int64_t i = 0; i < fut; ++i) {
        nx[i] = static_cast<int32_t>(seq[k + i]);
        nm[i] = 1.0f;
      }
      for (int64_t i = fut < 0 ? 0 : fut; i < next_len; ++i) {
        nx[i] = 0;
        nm[i] = 0.0f;
      }
    }
  }
}

// Windows for a categorical side column (same logic, no target/next).
void build_cate_windows(const int64_t* items, const int64_t* offsets,
                        const int64_t* ks, int64_t num_users,
                        int64_t max_length, int32_t* hist) {
  for (int64_t u = 0; u < num_users; ++u) {
    const int64_t* seq = items + offsets[u];
    const int64_t k = ks[u];
    int32_t* h = hist + u * max_length;
    const int64_t start = k >= max_length ? k - max_length : 0;
    const int64_t n = k - start;
    for (int64_t i = 0; i < n; ++i) h[i] = static_cast<int32_t>(seq[start + i]);
    for (int64_t i = n; i < max_length; ++i) h[i] = 0;
  }
}

}  // extern "C"
