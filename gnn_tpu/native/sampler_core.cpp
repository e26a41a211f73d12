// Native host-side sampling core for gnn_tpu.
//
// Plays the role the CUDA extension plays in the reference
// (`/root/reference/spmm_cpp/` — the reference's only native component),
// but aimed at the *host* hot loop, which is where a TPU trainer's cycles
// go: the device side is XLA/Pallas, while LADIES sampling
// (`/root/reference/sampler.py:113-139`) — CSR row slicing, column-count
// probabilities, weighted sampling without replacement, column slicing
// with debias weights — runs on a handful of host cores and must feed
// multiple chips.
//
// Everything here is exact-equivalent to the numpy path (same math,
// Gumbel top-k == successive sampling without replacement) but fused,
// allocation-free per call, and OpenMP-parallel. The Python wrapper
// (`gnn_tpu/native/__init__.py`) builds this JIT like the reference does
// (`custom_sparse_ops.py:8`) and falls back to numpy when unavailable.
//
// Exposed C ABI (ctypes):
//   count_cols       — pi = per-column nonzero counts of U = A[prev, :]
//   gumbel_topk      — top-k of log(p) + Gumbel noise over p > 0
//   slice_cols_count — row lengths of U[:, after]
//   slice_cols_fill  — COO of U[:, after] with w = data * normfact[col]

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// pi[c] = |{(r, c) in U}| for U = A[prev, :].
// indptr: int64[N+1], indices: int32[nnz], prev: int32[n_prev]
// out_pi: float64[n_cols] (pre-zeroed by caller)
void count_cols(const int64_t* indptr, const int32_t* indices,
                const int32_t* prev, int64_t n_prev, int64_t n_cols,
                double* out_pi) {
#ifdef _OPENMP
  int nt = omp_get_max_threads();
#else
  int nt = 1;
#endif
  if (nt > 1 && n_prev > 256) {
    std::vector<std::vector<float>> partial(nt);
#pragma omp parallel
    {
      int t = 0;
#ifdef _OPENMP
      t = omp_get_thread_num();
#endif
      partial[t].assign(n_cols, 0.f);
      float* mine = partial[t].data();
#pragma omp for schedule(dynamic, 64)
      for (int64_t i = 0; i < n_prev; ++i) {
        int64_t s = indptr[prev[i]], e = indptr[prev[i] + 1];
        for (int64_t j = s; j < e; ++j) mine[indices[j]] += 1.f;
      }
#pragma omp for schedule(static)
      for (int64_t c = 0; c < n_cols; ++c) {
        double acc = 0;
        for (int tt = 0; tt < nt; ++tt) acc += partial[tt][c];
        out_pi[c] = acc;
      }
    }
  } else {
    for (int64_t i = 0; i < n_prev; ++i) {
      int64_t s = indptr[prev[i]], e = indptr[prev[i] + 1];
      for (int64_t j = s; j < e; ++j) out_pi[indices[j]] += 1.0;
    }
  }
}

// Scale pi on a skew set (locality-aware sampling, `sampler.py:119-121`).
void scale_skew(double* pi, const int32_t* skew, int64_t n_skew,
                double factor) {
  for (int64_t i = 0; i < n_skew; ++i) pi[skew[i]] *= factor;
}

// Sample k indices without replacement with prob ~ pi (Gumbel top-k).
// Returns the actual count (= min(k, #nonzero)). out: int32[k].
int64_t gumbel_topk(const double* pi, int64_t n, int64_t k, uint64_t seed,
                    int32_t* out) {
  // collect nonzero entries with keys log(pi) + Gumbel
  std::vector<std::pair<float, int32_t>> keys;
  keys.reserve(1 << 16);
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unif(1e-300, 1.0);
  for (int64_t i = 0; i < n; ++i) {
    if (pi[i] > 0) {
      double g = -std::log(-std::log(unif(rng)));
      keys.emplace_back((float)(std::log(pi[i]) + g), (int32_t)i);
    }
  }
  int64_t m = (int64_t)keys.size();
  int64_t take = std::min(k, m);
  if (take < m) {
    std::nth_element(keys.begin(), keys.begin() + take, keys.end(),
                     [](auto& a, auto& b) { return a.first > b.first; });
  }
  for (int64_t i = 0; i < take; ++i) out[i] = keys[i].second;
  std::sort(out, out + take);
  return take;
}

// Per-row output lengths of U[:, after]: pos[c] >= 0 iff c in after.
void slice_cols_count(const int64_t* indptr, const int32_t* indices,
                      const int32_t* prev, int64_t n_prev,
                      const int32_t* pos, int64_t* out_rowlen) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < n_prev; ++i) {
    int64_t s = indptr[prev[i]], e = indptr[prev[i] + 1];
    int64_t c = 0;
    for (int64_t j = s; j < e; ++j) c += (pos[indices[j]] >= 0);
    out_rowlen[i] = c;
  }
}

// Fill COO of U[:, after] with weights data * normfact[newcol]
// (`sampler.py:133-139` + `cuda_spmm.cu:800` semantics).
// row_off: exclusive prefix sum of rowlen (int64[n_prev+1]).
void slice_cols_fill(const int64_t* indptr, const int32_t* indices,
                     const float* data, const int32_t* prev, int64_t n_prev,
                     const int32_t* pos, const float* normfact,
                     const int64_t* row_off, int32_t* out_rows,
                     int32_t* out_cols, float* out_vals) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < n_prev; ++i) {
    int64_t s = indptr[prev[i]], e = indptr[prev[i] + 1];
    int64_t w = row_off[i];
    for (int64_t j = s; j < e; ++j) {
      int32_t c = pos[indices[j]];
      if (c >= 0) {
        out_rows[w] = (int32_t)i;
        out_cols[w] = c;
        out_vals[w] = data[j] * normfact[c];
        ++w;
      }
    }
  }
}

// Convenience: exclusive prefix sum.
void prefix_sum(const int64_t* in, int64_t n, int64_t* out) {
  int64_t acc = 0;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = acc;
    acc += in[i];
  }
  out[n] = acc;
}

}  // extern "C"
