// Native host-side kernels for mimikit_tpu.
//
// These are the TPU build's C++ equivalents of the reference's numba @njit
// kernels (the only compiled components the reference has — see SURVEY.md
// §2.10): multi-lag smoothed derivative (features/functionals.py:919-948),
// banded pairwise cosine distance + checkerboard novelty convolution
// (extract/segment.py:21-89), and the samplify cut-refinement family
// (extract/samplify.py:56-122).  OpenMP parallel over the outer loops,
// exposed via a C ABI for ctypes.
//
// Build: make -C mimikit_tpu/native  (invoked lazily by mimikit_tpu.ops.native)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// odd-reflect value of y at (possibly out-of-range) index i
static inline float odd_reflect(const float* y, int64_t T, int64_t i) {
    if (i < 0) return 2.f * y[0] - y[-i];
    if (i >= T) return 2.f * y[T - 1] - y[2 * T - 2 - i];
    return y[i];
}

// multi-lag averaged central difference over rows (derivative_np_2d)
void mmk_derivative(const float* y, float* out, int64_t rows, int64_t T,
                    int64_t max_lag) {
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < rows; ++r) {
        const float* yr = y + r * T;
        float* gr = out + r * T;
        for (int64_t t = 0; t < T; ++t) {
            float acc = 0.f;
            for (int64_t lag = 1; lag <= max_lag; ++lag) {
                float b = odd_reflect(yr, T, t + lag);
                float a = odd_reflect(yr, T, t - lag);
                acc += (b - a) / (2.f * (float)lag);
            }
            gr[t] = acc / (float)max_lag;
        }
    }
}

// banded pairwise cosine distance (pwdk_cosine): out shape (T, 2k-1),
// out[i, (k-1) + (j - i)] = cosine_dist(X[i], X[j]) for |j - i| <= k-1.
// NOTE: the reference kernel (extract/segment.py:21-59) iterates j out to
// |j-i| <= k and centers at k, silently writing past the row (numba has no
// bounds checking); the band actually consumed by the checkerboard
// convolution is halfwidth k-1 centered at k-1, which is what we compute.
void mmk_pwdk_cosine(const double* X, double* out, int64_t T, int64_t D,
                     int64_t k) {
    std::memset(out, 0, sizeof(double) * (size_t)T * (size_t)(2 * k - 1));
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < T; ++i) {
        const double* Xi = X + i * D;
        double ni = 0.0;
        for (int64_t d = 0; d < D; ++d) ni += Xi[d] * Xi[d];
        ni = std::sqrt(ni);
        int64_t j0 = std::max(i - (k - 1), (int64_t)0);
        int64_t j1 = std::min(i + k, T);
        for (int64_t j = j0; j < j1; ++j) {
            if (i == j) continue;
            const double* Xj = X + j * D;
            double dot = 0.0, nj = 0.0;
            for (int64_t d = 0; d < D; ++d) {
                dot += Xi[d] * Xj[d];
                nj += Xj[d] * Xj[d];
            }
            double denom = ni * std::sqrt(nj);
            double dij = denom == 0.0 ? 1.0 : 1.0 - dot / denom;
            out[i * (2 * k - 1) + ((k - 1) + (j - i))] = dij;
        }
    }
}

// checkerboard-kernel novelty convolution (convolve_diagonals):
// diagonals (T x 2K-1), kernel (K x K), out (T - K + 1)
void mmk_convolve_diagonals(const double* diagonals, const double* kernel,
                            double* out, int64_t T, int64_t K) {
    int64_t N = T - K + 1;
    int64_t W = 2 * K - 1;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < N; ++i) {
        double s = 0.0;
        for (int64_t j = 0; j < K; ++j) {
            const double* row = diagonals + (i + j) * W + (K - j - 1);
            const double* kj = kernel + j * K;
            for (int64_t l = 0; l < K; ++l) s += row[l] * kj[l];
        }
        out[i] = s;
    }
}

// attack/decay pairing over a gradient signal (samplify.attack_decay):
// writes attack indices (upward zero crossings) and their following peaks.
// Returns the number of attacks found; callers pre-allocate T-sized buffers.
int64_t mmk_attack_decay(const float* y, int64_t T, int64_t* att,
                         int64_t* dec) {
    int64_t n = 0;
    for (int64_t t = 1; t < T; ++t)
        if (y[t - 1] < 0.f && y[t] > 0.f) att[n++] = t;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        int64_t a = att[i];
        int64_t b = (i + 1 < n) ? att[i + 1] : T - 1;
        int64_t found = T - 1;
        for (int64_t t = a; t < b - 1; ++t) {
            if (y[t] > 0.f && y[t + 1] < 0.f) { found = t; break; }
        }
        dec[i] = found;
    }
    return n;
}

// envelope-difference scores around candidate cuts (left_right_scores);
// fine_env: the finest level envelope (T,)
void mmk_left_right_scores(const float* fine_env, const int64_t* cuts,
                           const float* coarse_env, const int64_t* half_window,
                           int64_t T, int64_t n, float* left, float* right) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        int64_t c = cuts[i], w = half_window[i];
        int64_t l0 = std::max(c - w, (int64_t)0);
        float lmax = -1e30f, rmax = -1e30f;
        for (int64_t t = l0; t < c && t < T; ++t)
            lmax = std::max(lmax, coarse_env[t] - fine_env[t]);
        for (int64_t t = c; t < std::min(c + w, T); ++t)
            rmax = std::max(rmax, coarse_env[t] - fine_env[t]);
        left[i] = l0 >= c ? 0.f : lmax;
        right[i] = c >= T ? 0.f : rmax;
    }
}

// multi-level cut refinement + zero-crossing snap (refine_cuts / _refine):
// envs/grads: (n_levels, T) row-major
void mmk_refine_cuts(const uint8_t* z_crossings, const int64_t* coarse_cuts,
                     const int64_t* coarse_peaks, const int64_t* sides,
                     const float* envs, const float* grads, int64_t n_levels,
                     int64_t T, int64_t n_cuts, int64_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_cuts; ++i) {
        int64_t c = coarse_cuts[i];
        int64_t d = coarse_peaks[i];
        if (sides[i] == 0) {
            d = c;
            c = c - (coarse_peaks[i] - coarse_cuts[i]);
            if (c < 0) c = 0;
        }
        for (int64_t lvl = 0; lvl < n_levels; ++lvl) {
            if (c == d) break;
            const float* e = envs + lvl * T;
            const float* g = grads + lvl * T;
            int64_t best = 0; float best_v = 1e30f;
            int64_t emax = 0; float emax_v = -1e30f;
            for (int64_t t = c; t < d; ++t) {
                float v = .9f * e[t] + .1f * (1.f - g[t]);
                if (v < best_v) { best_v = v; best = t - c; }
                if (e[t] > emax_v) { emax_v = e[t]; emax = t - c; }
            }
            int64_t new_start = (best < (d - c) - 1) ? best : 0;
            int64_t nc = new_start + c;
            int64_t nd = std::max(emax + c, nc);
            c = nc; d = nd;
        }
        int64_t before = c, after = c + 1;
        while (before >= 0 && after < T && !z_crossings[before] &&
               !z_crossings[after]) {
            --before;
            ++after;
        }
        out[i] = (before >= 0 && z_crossings[before]) ? before : after;
    }
}

}  // extern "C"
