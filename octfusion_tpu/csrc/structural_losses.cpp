// CPU reference kernels for point-cloud structural losses.
//
// Native counterpart of the reference's CUDA extension
// (`/root/reference/metrics/pytorch_structural_losses/src/nndistance.cu`,
// `approxmatch.cu`) — same algorithms on CPU with OpenMP, exposed through a
// plain C ABI for ctypes.  Serves as the correctness oracle for the
// TPU (JAX) implementations and as a fallback evaluator.
//
// Build: make -C octfusion_tpu/csrc  (produces libstructural.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Brute-force nearest-neighbour squared distances both directions.
// xyz1: [b, n, 3], xyz2: [b, m, 3]; dist1: [b, n], dist2: [b, m];
// idx1: [b, n], idx2: [b, m] (nearest indices).
void nn_distance(const float* xyz1, const float* xyz2, float* dist1,
                 int32_t* idx1, float* dist2, int32_t* idx2, int b, int n,
                 int m) {
#pragma omp parallel for collapse(2) schedule(static)
  for (int bi = 0; bi < b; ++bi) {
    for (int i = 0; i < n; ++i) {
      const float* p = xyz1 + (bi * n + i) * 3;
      float best = 1e30f;
      int bj = 0;
      const float* q0 = xyz2 + bi * m * 3;
      for (int j = 0; j < m; ++j) {
        const float dx = p[0] - q0[j * 3];
        const float dy = p[1] - q0[j * 3 + 1];
        const float dz = p[2] - q0[j * 3 + 2];
        const float d = dx * dx + dy * dy + dz * dz;
        if (d < best) {
          best = d;
          bj = j;
        }
      }
      dist1[bi * n + i] = best;
      idx1[bi * n + i] = bj;
    }
  }
#pragma omp parallel for collapse(2) schedule(static)
  for (int bi = 0; bi < b; ++bi) {
    for (int j = 0; j < m; ++j) {
      const float* q = xyz2 + (bi * m + j) * 3;
      float best = 1e30f;
      int bi2 = 0;
      const float* p0 = xyz1 + bi * n * 3;
      for (int i = 0; i < n; ++i) {
        const float dx = q[0] - p0[i * 3];
        const float dy = q[1] - p0[i * 3 + 1];
        const float dz = q[2] - p0[i * 3 + 2];
        const float d = dx * dx + dy * dy + dz * dz;
        if (d < best) {
          best = d;
          bi2 = i;
        }
      }
      dist2[bi * m + j] = best;
      idx2[bi * m + j] = bi2;
    }
  }
}

// Auction-style approximate matching (`approxmatch.cu:3-182`): `rounds`
// passes of exponentially sharpening soft assignment with remaining-mass
// multipliers.  match: [b, n, m] soft assignment; cost: [b] mean matched
// distance (sqrt).
void approx_match_cost(const float* xyz1, const float* xyz2, float* match,
                       float* cost, int b, int n, int m, int rounds) {
#pragma omp parallel for schedule(static)
  for (int bi = 0; bi < b; ++bi) {
    const float* x = xyz1 + bi * n * 3;
    const float* y = xyz2 + bi * m * 3;
    float* mt = match + (size_t)bi * n * m;
    std::vector<float> d2((size_t)n * m);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < m; ++j) {
        const float dx = x[i * 3] - y[j * 3];
        const float dy = x[i * 3 + 1] - y[j * 3 + 1];
        const float dz = x[i * 3 + 2] - y[j * 3 + 2];
        d2[(size_t)i * m + j] = dx * dx + dy * dy + dz * dz;
      }
    std::memset(mt, 0, sizeof(float) * (size_t)n * m);
    std::vector<float> remain_r(n, (float)m / n);
    std::vector<float> remain_c(m, 1.0f);
    std::vector<float> w((size_t)n * m);
    // level schedule matches approxmatch.cu:24-28 exactly: j = 7..-1,
    // level = -4^j (the reference's j==-2 branch is dead code)
    for (int r = rounds - 1; r >= 0; --r) {
      const float level = -powf(4.0f, (float)(r - 1));
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < m; ++j)
          w[(size_t)i * m + j] =
              expf(level * d2[(size_t)i * m + j]) * remain_r[i];
      // column normalisation by demand
      for (int j = 0; j < m; ++j) {
        float s = 0.f;
        for (int i = 0; i < n; ++i) s += w[(size_t)i * m + j];
        const float scale = remain_c[j] / (s > 1e-9f ? s : 1e-9f);
        for (int i = 0; i < n; ++i) w[(size_t)i * m + j] *= scale;
      }
      // row cap by supply
      for (int i = 0; i < n; ++i) {
        float s = 0.f;
        for (int j = 0; j < m; ++j) s += w[(size_t)i * m + j];
        const float ratio =
            s > 1e-9f ? (remain_r[i] / s < 1.f ? remain_r[i] / s : 1.f) : 0.f;
        for (int j = 0; j < m; ++j) w[(size_t)i * m + j] *= ratio;
      }
      for (int i = 0; i < n; ++i) {
        float rs = 0.f;
        for (int j = 0; j < m; ++j) {
          mt[(size_t)i * m + j] += w[(size_t)i * m + j];
          rs += w[(size_t)i * m + j];
        }
        remain_r[i] = remain_r[i] - rs > 0.f ? remain_r[i] - rs : 0.f;
      }
      for (int j = 0; j < m; ++j) {
        float cs = 0.f;
        for (int i = 0; i < n; ++i) cs += w[(size_t)i * m + j];
        remain_c[j] = remain_c[j] - cs > 0.f ? remain_c[j] - cs : 0.f;
      }
    }
    float c = 0.f;
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < m; ++j)
        c += mt[(size_t)i * m + j] * sqrtf(d2[(size_t)i * m + j]);
    cost[bi] = c / m;
  }
}

}  // extern "C"
