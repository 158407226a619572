// Farthest-point sampling, host-side native implementation.
//
// Exact-semantics counterpart of adaptigraph_tpu/utils/host_fps.py (which
// mirrors the reference src/sim/utils.py:95-133 fps / fps_rad_idx): greedy
// max-min selection with ties broken by lowest index (argmax semantics of
// numpy). Called from Python via ctypes; host_fps falls back to numpy when
// the shared library is absent.
//
// Build: native/build.sh -> adaptigraph_tpu/native/libfps.so

#include <cstdint>
#include <cmath>
#include <limits>
#include <vector>

extern "C" {

// Greedy FPS from start index; writes n_out indices. Returns n_out.
// points: (n, 3) float32 row-major.
int64_t fps_indices(const float* points, int64_t n, int64_t n_out,
                    int64_t start, int64_t* out_idx) {
  if (n_out > n) n_out = n;
  if (n_out <= 0) return 0;
  std::vector<float> dist(static_cast<size_t>(n),
                          std::numeric_limits<float>::infinity());
  int64_t cur = start;
  out_idx[0] = cur;
  for (int64_t i = 1; i < n_out; ++i) {
    const float cx = points[3 * cur], cy = points[3 * cur + 1],
                cz = points[3 * cur + 2];
    float best = -1.0f;
    int64_t best_j = 0;
    for (int64_t j = 0; j < n; ++j) {
      const float dx = points[3 * j] - cx;
      const float dy = points[3 * j + 1] - cy;
      const float dz = points[3 * j + 2] - cz;
      const float d = std::sqrt(dx * dx + dy * dy + dz * dz);
      if (d < dist[j]) dist[j] = d;
      if (dist[j] > best) {  // strict '>' == numpy argmax lowest-index tie
        best = dist[j];
        best_j = j;
      }
    }
    cur = best_j;
    out_idx[i] = cur;
  }
  return n_out;
}

// Radius-stop FPS from start index: add farthest points until every point
// is within `radius` of the sampled set. Writes at most max_out indices;
// returns the count.
int64_t fps_rad_indices(const float* points, int64_t n, float radius,
                        int64_t start, int64_t max_out, int64_t* out_idx) {
  if (n <= 0 || max_out <= 0) return 0;
  std::vector<float> dist(static_cast<size_t>(n));
  const float sx = points[3 * start], sy = points[3 * start + 1],
              sz = points[3 * start + 2];
  float best = -1.0f;
  int64_t best_j = 0;
  for (int64_t j = 0; j < n; ++j) {
    const float dx = points[3 * j] - sx;
    const float dy = points[3 * j + 1] - sy;
    const float dz = points[3 * j + 2] - sz;
    dist[j] = std::sqrt(dx * dx + dy * dy + dz * dz);
    if (dist[j] > best) {
      best = dist[j];
      best_j = j;
    }
  }
  out_idx[0] = start;
  int64_t count = 1;
  while (best > radius && count < max_out) {
    const int64_t cur = best_j;
    out_idx[count++] = cur;
    const float cx = points[3 * cur], cy = points[3 * cur + 1],
                cz = points[3 * cur + 2];
    best = -1.0f;
    best_j = 0;
    for (int64_t j = 0; j < n; ++j) {
      const float dx = points[3 * j] - cx;
      const float dy = points[3 * j + 1] - cy;
      const float dz = points[3 * j + 2] - cz;
      const float d = std::sqrt(dx * dx + dy * dy + dz * dz);
      if (d < dist[j]) dist[j] = d;
      if (dist[j] > best) {
        best = dist[j];
        best_j = j;
      }
    }
  }
  return count;
}

}  // extern "C"
