// Native host-side kernels for nerfjax.
//
// The reference delegated point-cloud outlier filtering to Open3D's C++ core
// (reference: colmap2nerf_corrected.py:157-167) and voxelization to numpy
// fancy indexing (write_format.py:19-38). This library provides the same
// operations as a small self-contained C++ core (OpenMP-parallel, exact
// brute-force kNN — SfM clouds are <= a few 1e5 points), loaded via ctypes
// with a pure-numpy fallback (nerfjax/colmap/outliers.py).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC knn.cpp -o libnerfjax_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Mean distance of every point to its k nearest neighbours (self excluded).
// pts: [n,3] row-major float32. out: [n] float32.
void knn_mean_distances(const float* pts, int64_t n, int k, float* out) {
  if (n <= 1 || k <= 0) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.0f;
    return;
  }
  if (k > n - 1) k = (int)(n - 1);

#pragma omp parallel
  {
    std::vector<float> d2(n);
#pragma omp for schedule(dynamic, 64)
    for (int64_t i = 0; i < n; ++i) {
      const float xi = pts[3 * i], yi = pts[3 * i + 1], zi = pts[3 * i + 2];
      for (int64_t j = 0; j < n; ++j) {
        const float dx = pts[3 * j] - xi;
        const float dy = pts[3 * j + 1] - yi;
        const float dz = pts[3 * j + 2] - zi;
        d2[j] = dx * dx + dy * dy + dz * dz;
      }
      d2[i] = INFINITY;  // exclude self
      std::nth_element(d2.begin(), d2.begin() + (k - 1), d2.end());
      // sum the k smallest (nth_element partitions around k-1)
      double acc = 0.0;
      for (int64_t j = 0; j < k; ++j) acc += std::sqrt((double)d2[j]);
      out[i] = (float)(acc / k);
    }
  }
}

// Voxelize normalized points in [-1,1]^3 into binary + RGB uint8 grids.
// pts: [n,3] f32; rgbs: [n,3] f32 in [0,1]; grids: [g,g,g] and [g,g,g,3].
void voxelize_points(const float* pts, const float* rgbs, int64_t n, int g,
                     uint8_t fill, uint8_t* binary, uint8_t* rgb) {
  const float s = 0.5f * (g - 1);
  for (int64_t i = 0; i < n; ++i) {
    int ix = (int)((pts[3 * i] + 1.0f) * s);
    int iy = (int)((pts[3 * i + 1] + 1.0f) * s);
    int iz = (int)((pts[3 * i + 2] + 1.0f) * s);
    ix = std::min(std::max(ix, 0), g - 1);
    iy = std::min(std::max(iy, 0), g - 1);
    iz = std::min(std::max(iz, 0), g - 1);
    const int64_t v = ((int64_t)ix * g + iy) * g + iz;
    binary[v] = fill;
    for (int c = 0; c < 3; ++c) {
      float x = rgbs[3 * i + c] * 255.0f;
      rgb[3 * v + c] = (uint8_t)std::min(std::max(x, 0.0f), 255.0f);
    }
  }
}

// Gather one shuffled ray batch from the 5 dataset arrays in a single
// OpenMP-parallel pass — the native data-loader role the reference filled
// with torch DataLoader worker processes (reference: train.py:209-217).
// With memmapped sources the parallel loop also overlaps page-in I/O.
// o, d, rgb: [n,3] f32; tn, tf: [n] f32; idx: [b] int64.
void gather_ray_batch(const float* o, const float* d, const float* rgb,
                      const float* tn, const float* tf, const int64_t* idx,
                      int64_t b, float* o_out, float* d_out, float* rgb_out,
                      float* tn_out, float* tf_out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < b; ++i) {
    const int64_t j = idx[i];
    std::memcpy(o_out + 3 * i, o + 3 * j, 3 * sizeof(float));
    std::memcpy(d_out + 3 * i, d + 3 * j, 3 * sizeof(float));
    std::memcpy(rgb_out + 3 * i, rgb + 3 * j, 3 * sizeof(float));
    tn_out[i] = tn[j];
    tf_out[i] = tf[j];
  }
}

}  // extern "C"
