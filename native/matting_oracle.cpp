// Host-side matting-Laplacian oracle (C++), ctypes-loaded.
//
// The reference's only native-backed component is scipy.sparse (C) used
// to assemble Levin's closed-form matting Laplacian on the CPU
// (SURVEY.md §2 comp.6 / "Native components"). The TPU framework never
// materializes that matrix (see dpst_tpu/ops/laplacian*.py); this
// library is its HOST-side counterpart: a direct, dependency-free
// implementation of the windowed operator used as a fast verification
// oracle — it lets the test suite cross-check the device kernels at
// sizes where the pure-Python scipy builder is too slow.
//
// y = L v with, per interior 3x3 window k:
//   W_k[i,j] = delta_ij - (1/9) (1 + (I_i - mu_k)^T Lam_k (I_j - mu_k)),
//   Lam_k = (Sigma_k + eps/9 Id)^{-1}.
//
// Implemented matrix-free with the same two-pass factorization as the
// TPU kernels (box sums + pointwise 3-vector algebra), in double
// precision: an INDEPENDENT code path at higher precision than the
// fp32 device implementations it checks.
//
// Build: tools/build_native.sh  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <vector>

namespace {

// 3x3 symmetric inverse via adjugate.
inline void sym3_inv(const double m[6], double inv[6]) {
  const double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5];
  const double co00 = d * f - e * e;
  const double co01 = c * e - b * f;
  const double co02 = b * e - c * d;
  const double co11 = a * f - c * c;
  const double co12 = b * c - a * e;
  const double co22 = a * d - b * b;
  const double det = a * co00 + b * co01 + c * co02;
  const double s = 1.0 / det;
  inv[0] = co00 * s; inv[1] = co01 * s; inv[2] = co02 * s;
  inv[3] = co11 * s; inv[4] = co12 * s; inv[5] = co22 * s;
}

}  // namespace

extern "C" {

// image: (H, W, 3) row-major doubles in [0, 1];
// v:     (H, W, C) row-major doubles;
// y:     (H, W, C) output buffer.
// Returns 0 on success.
int matting_matvec(const double* image, const double* v, double* y,
                   int64_t h, int64_t w, int64_t channels, double eps) {
  if (h < 3 || w < 3 || channels < 1) return 1;
  const int64_t n = h * w;
  const double inv_win = 1.0 / 9.0;

  // Per-window-center stats over interior centers.
  std::vector<double> mu(n * 3, 0.0);
  std::vector<double> lam(n * 6, 0.0);
  std::vector<uint8_t> valid(n, 0);
  for (int64_t cy = 1; cy + 1 < h; ++cy) {
    for (int64_t cx = 1; cx + 1 < w; ++cx) {
      const int64_t k = cy * w + cx;
      double m[3] = {0, 0, 0};
      double s2[6] = {0, 0, 0, 0, 0, 0};  // xx, xy, xz, yy, yz, zz
      for (int64_t dy = -1; dy <= 1; ++dy) {
        for (int64_t dx = -1; dx <= 1; ++dx) {
          const double* p = image + ((cy + dy) * w + cx + dx) * 3;
          m[0] += p[0]; m[1] += p[1]; m[2] += p[2];
          s2[0] += p[0] * p[0]; s2[1] += p[0] * p[1];
          s2[2] += p[0] * p[2]; s2[3] += p[1] * p[1];
          s2[4] += p[1] * p[2]; s2[5] += p[2] * p[2];
        }
      }
      for (int i = 0; i < 3; ++i) m[i] *= inv_win;
      double cov[6] = {
          s2[0] * inv_win - m[0] * m[0] + eps * inv_win,
          s2[1] * inv_win - m[0] * m[1],
          s2[2] * inv_win - m[0] * m[2],
          s2[3] * inv_win - m[1] * m[1] + eps * inv_win,
          s2[4] * inv_win - m[1] * m[2],
          s2[5] * inv_win - m[2] * m[2] + eps * inv_win,
      };
      sym3_inv(cov, &lam[k * 6]);
      mu[k * 3 + 0] = m[0]; mu[k * 3 + 1] = m[1]; mu[k * 3 + 2] = m[2];
      valid[k] = 1;
    }
  }

  std::vector<double> alpha(n, 0.0);
  std::vector<double> beta(n * 3, 0.0);
  for (int64_t c = 0; c < channels; ++c) {
    // pass 1: per-window scalars.
    for (int64_t k = 0; k < n; ++k) { alpha[k] = 0.0;
      beta[k * 3] = beta[k * 3 + 1] = beta[k * 3 + 2] = 0.0; }
    for (int64_t cy = 1; cy + 1 < h; ++cy) {
      for (int64_t cx = 1; cx + 1 < w; ++cx) {
        const int64_t k = cy * w + cx;
        if (!valid[k]) continue;
        double s = 0.0, q[3] = {0, 0, 0};
        for (int64_t dy = -1; dy <= 1; ++dy) {
          for (int64_t dx = -1; dx <= 1; ++dx) {
            const int64_t j = (cy + dy) * w + cx + dx;
            const double vj = v[j * channels + c];
            const double* pj = image + j * 3;
            s += vj;
            q[0] += pj[0] * vj; q[1] += pj[1] * vj; q[2] += pj[2] * vj;
          }
        }
        const double* muk = &mu[k * 3];
        const double t0 = q[0] - muk[0] * s;
        const double t1 = q[1] - muk[1] * s;
        const double t2 = q[2] - muk[2] * s;
        const double* L = &lam[k * 6];
        const double b0 = L[0] * t0 + L[1] * t1 + L[2] * t2;
        const double b1 = L[1] * t0 + L[3] * t1 + L[4] * t2;
        const double b2 = L[2] * t0 + L[4] * t1 + L[5] * t2;
        const double mub = muk[0] * b0 + muk[1] * b1 + muk[2] * b2;
        alpha[k] = (mub - s) * inv_win;
        beta[k * 3 + 0] = -inv_win * b0;
        beta[k * 3 + 1] = -inv_win * b1;
        beta[k * 3 + 2] = -inv_win * b2;
      }
    }
    // pass 2: gather window contributions back to pixels.
    for (int64_t py = 0; py < h; ++py) {
      for (int64_t px = 0; px < w; ++px) {
        const int64_t i = py * w + px;
        double acc = 0.0;
        int nwin = 0;
        const double* pi = image + i * 3;
        for (int64_t dy = -1; dy <= 1; ++dy) {
          const int64_t cy = py + dy;
          if (cy < 1 || cy + 1 >= h) continue;
          for (int64_t dx = -1; dx <= 1; ++dx) {
            const int64_t cx = px + dx;
            if (cx < 1 || cx + 1 >= w) continue;
            const int64_t k = cy * w + cx;
            acc += alpha[k] + pi[0] * beta[k * 3] + pi[1] * beta[k * 3 + 1]
                 + pi[2] * beta[k * 3 + 2];
            ++nwin;
          }
        }
        y[i * channels + c] = nwin * v[i * channels + c] + acc;
      }
    }
  }
  return 0;
}

}  // extern "C"
