// Host-side SPH grid analytics — native core for preprocessing.
//
// The TPU owns the compute path (XLA/Pallas); this library owns the
// host-side, latency-critical preprocessing that the reference does with
// numba/numpy/torch host code (sphops/preprocess.py, test.py FPS):
//
//   sphgrid_capacity     exact max cell occupancy + max neighbor count
//                        (sizes the static shapes of the neighbor engine;
//                        O(N * 3^D * occupancy) via a periodic cell grid,
//                        same modulo hash as the device engine)
//   sphgrid_cell_hash    periodic mixed-radix cell hash per point
//   sphgrid_fps          greedy farthest-point sampling (O(M*N)),
//                        the host fallback for utils.meshes FPS
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC -o libsphgrid.so sphgrid.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Periodic mixed-radix cell hash (matches ops/hashgrid.cell_index:
// floor(x/h) mod dims, flattened with dim-0 fastest).
void sphgrid_cell_hash(const float* x, int64_t n, int d, float h,
                       const int32_t* dims, int32_t* out) {
  std::vector<int64_t> stride(d);
  stride[0] = 1;
  for (int i = 1; i < d; ++i) stride[i] = stride[i - 1] * dims[i - 1];
  for (int64_t p = 0; p < n; ++p) {
    int64_t hash = 0;
    for (int i = 0; i < d; ++i) {
      int64_t c = (int64_t)std::floor(x[p * d + i] / h) % dims[i];
      if (c < 0) c += dims[i];
      hash += c * stride[i];
    }
    out[p] = (int32_t)hash;
  }
}

// Exact max hash-cell occupancy and max neighbor count within radius h.
// periodic: if non-null, period[d] for minimum-image displacements.
// Returns 0 on success.
int sphgrid_capacity(const float* x, int64_t n, int d, float h,
                     const int32_t* dims, const float* period,
                     int32_t* max_occupancy, int32_t* max_neighbors) {
  if (d < 1 || d > 3) return 1;
  std::vector<int64_t> stride(d);
  stride[0] = 1;
  int64_t num_cells = dims[0];
  for (int i = 1; i < d; ++i) {
    stride[i] = stride[i - 1] * dims[i - 1];
    num_cells *= dims[i];
  }

  // cell hash per point + counting sort into cell buckets
  std::vector<int32_t> hash(n);
  std::vector<int32_t> ci(n * d);
  for (int64_t p = 0; p < n; ++p) {
    int64_t hv = 0;
    for (int i = 0; i < d; ++i) {
      int64_t c = (int64_t)std::floor(x[p * d + i] / h) % dims[i];
      if (c < 0) c += dims[i];
      ci[p * d + i] = (int32_t)c;
      hv += c * stride[i];
    }
    hash[p] = (int32_t)hv;
  }
  std::vector<int32_t> count(num_cells + 1, 0);
  for (int64_t p = 0; p < n; ++p) count[hash[p] + 1]++;
  int32_t occ = 0;
  for (int64_t c = 0; c < num_cells; ++c)
    if (count[c + 1] > occ) occ = count[c + 1];
  *max_occupancy = occ;
  for (int64_t c = 0; c < num_cells; ++c) count[c + 1] += count[c];
  std::vector<int32_t> order(n);
  {
    std::vector<int32_t> cursor(count.begin(), count.end() - 1);
    for (int64_t p = 0; p < n; ++p) order[cursor[hash[p]]++] = (int32_t)p;
  }

  // neighbor counting over the 3^D stencil
  const float h2 = h * h;
  int32_t maxn = 0;
  int span = 1;
  for (int i = 0; i < d; ++i) span *= 3;
  for (int64_t p = 0; p < n; ++p) {
    int32_t cnt = 0;
    for (int s = 0; s < span; ++s) {
      int64_t hv = 0;
      int t = s;
      for (int i = 0; i < d; ++i) {
        int off = (t % 3) - 1;
        t /= 3;
        int64_t c = (ci[p * d + i] + off + dims[i]) % dims[i];
        hv += c * stride[i];
      }
      for (int32_t q = count[hv]; q < count[hv + 1]; ++q) {
        const float* xj = x + (int64_t)order[q] * d;
        float d2 = 0.f;
        for (int i = 0; i < d; ++i) {
          float r = xj[i] - x[p * d + i];
          if (period) r -= std::nearbyint(r / period[i]) * period[i];
          d2 += r * r;
        }
        if (d2 < h2) cnt++;
      }
    }
    if (cnt > maxn) maxn = cnt;
  }
  *max_neighbors = maxn;
  return 0;
}

// Greedy farthest-point sampling: pick m indices from x [n, d].
void sphgrid_fps(const float* x, int64_t n, int d, int64_t m, int64_t start,
                 int32_t* out) {
  std::vector<float> mind(n, 1e30f);
  int64_t cur = start;
  out[0] = (int32_t)cur;
  for (int64_t k = 1; k < m; ++k) {
    const float* xc = x + cur * d;
    int64_t best = 0;
    float bestd = -1.f;
    for (int64_t p = 0; p < n; ++p) {
      float d2 = 0.f;
      for (int i = 0; i < d; ++i) {
        float r = x[p * d + i] - xc[i];
        d2 += r * r;
      }
      if (d2 < mind[p]) mind[p] = d2;
      if (mind[p] > bestd) {
        bestd = mind[p];
        best = p;
      }
    }
    cur = best;
    out[k] = (int32_t)cur;
  }
}

}  // extern "C"
