// Farthest point sampling — native host kernel for offline mesh tools.
//
// Same capability as the reference's cffi extension
// (core/csrc/fps/src/farthest_point_sampling.cpp:77-186 in /root/reference):
// O(KN) iterative max-min over a point cloud, plain and
// bbox-center-initialized variants. Fresh implementation: the distance
// update is vectorized over points and parallelized with OpenMP; ties and
// numerics are float32 to stay bit-compatible with the numpy/JAX twins
// (gdrnet_tpu/ops/fps.py).
//
// C ABI (ctypes-friendly):
//   fps_sample(pts[N*3], N, K, init_center, out_idx[K])

#include <cfloat>
#include <cmath>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline float sq_dist(const float* a, const float* b) {
    const float dx = a[0] - b[0];
    const float dy = a[1] - b[1];
    const float dz = a[2] - b[2];
    return dx * dx + dy * dy + dz * dz;
}

}  // namespace

extern "C" {

// pts: row-major [n, 3]; out_idx: [k]. Returns 0 on success.
int fps_sample(const float* pts, int64_t n, int64_t k, int init_center,
               int64_t start_idx, int64_t* out_idx) {
    if (n <= 0 || k <= 0 || k > n) return -1;

    float* min_d = new float[n];
    int64_t cur;

    if (init_center) {
        // seed with squared distance to the bbox center (max+min)/2
        float lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
        float hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        for (int64_t i = 0; i < n; ++i) {
            for (int d = 0; d < 3; ++d) {
                const float v = pts[i * 3 + d];
                if (v < lo[d]) lo[d] = v;
                if (v > hi[d]) hi[d] = v;
            }
        }
        const float c[3] = {0.5f * (lo[0] + hi[0]), 0.5f * (lo[1] + hi[1]),
                            0.5f * (lo[2] + hi[2])};
        cur = 0;
        float best = -FLT_MAX;
#ifdef _OPENMP
#pragma omp parallel for
#endif
        for (int64_t i = 0; i < n; ++i) min_d[i] = sq_dist(&pts[i * 3], c);
        for (int64_t i = 0; i < n; ++i) {
            if (min_d[i] > best) { best = min_d[i]; cur = i; }
        }
    } else {
        for (int64_t i = 0; i < n; ++i) min_d[i] = FLT_MAX;
        cur = start_idx;
    }

    for (int64_t s = 0; s < k; ++s) {
        out_idx[s] = cur;
        const float* p = &pts[cur * 3];
#ifdef _OPENMP
#pragma omp parallel for
#endif
        for (int64_t i = 0; i < n; ++i) {
            const float d = sq_dist(&pts[i * 3], p);
            if (d < min_d[i]) min_d[i] = d;
        }
        min_d[cur] = -FLT_MAX;  // never re-pick
        int64_t nxt = 0;
        float best = -FLT_MAX;
        for (int64_t i = 0; i < n; ++i) {
            if (min_d[i] > best) { best = min_d[i]; nxt = i; }
        }
        cur = nxt;
    }

    delete[] min_d;
    return 0;
}

}  // extern "C"
