// Native plan factory: factorization, validity, twiddle generation.
//
// TPU-native C++ counterpart of the reference's native setup path
// (/root/reference/src/pffft_priv_impl.h:903-1001 decompose/rffti1/cffti1
// and /root/reference/src/pffft_common.c helpers).  The TPU engine consumes
// the tables from Python (ctypes); this library exists so plan
// construction -- the host-side native piece of the framework -- is native
// code with long-double trig conditioning (better-than-float64 twiddle
// accuracy for large N, the analog of the reference's per-stage ld*argh
// scheme at pffft_priv_impl.h:942-962).
//
// C ABI only; no exceptions across the boundary.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <initializer_list>

extern "C" {

// Decompose n into prime factors {2,3,5}, ascending.  Returns the count,
// or -1 if n has other prime factors or is < 1.  factors_out capacity 64.
int pftpu_decompose(uint64_t n, int32_t* factors_out) {
  if (n < 1) return -1;
  int cnt = 0;
  static const uint64_t primes[3] = {2, 3, 5};
  for (int pi = 0; pi < 3; ++pi) {
    while (n % primes[pi] == 0) {
      if (cnt >= 64) return -1;
      factors_out[cnt++] = (int32_t)primes[pi];
      n /= primes[pi];
    }
  }
  return n == 1 ? cnt : -1;
}

// kind: 0 = real, 1 = complex (pffft.h:115 enum order).
static uint64_t min_fft_size(int kind) { return kind == 0 ? 32 : 16; }

int pftpu_is_valid_size(uint64_t n, int kind) {
  const uint64_t m = min_fft_size(kind);
  if (n == 0 || n % m != 0 || n > (1ull << 26)) return 0;
  uint64_t q = n / m;
  for (uint64_t p : {2ull, 3ull, 5ull})
    while (q % p == 0) q /= p;
  return q == 1;
}

uint64_t pftpu_nearest_transform_size(uint64_t n, int kind, int higher) {
  const uint64_t m = min_fft_size(kind);
  if (n < m) return m;
  uint64_t c = higher ? ((n + m - 1) / m) * m : (n / m) * m;
  while (!pftpu_is_valid_size(c, kind)) {
    if (higher) {
      c += m;
    } else {
      if (c <= m) return m;
      c -= m;
    }
  }
  return c;
}

// T[k, i] = exp(-2*pi*j * (k*i mod period) / period), k in [l], i in [r].
// Row-major [l, r].  Integer phase reduction + long-double trig.
void pftpu_fill_stage_twiddle(double* out_re, double* out_im, uint64_t l,
                              uint64_t r, uint64_t period) {
  const long double step = -2.0L * 3.14159265358979323846264338327950288L /
                           (long double)period;
  for (uint64_t k = 0; k < l; ++k) {
    for (uint64_t i = 0; i < r; ++i) {
      const uint64_t e = (k * i) % period;
      const long double ang = step * (long double)e;
      out_re[k * r + i] = (double)cosl(ang);
      out_im[k * r + i] = (double)sinl(ang);
    }
  }
}

// Dense DFT matrix W[i, t] = exp(-2*pi*j * (i*t mod r) / r), row-major [r, r].
void pftpu_fill_dft_matrix(double* out_re, double* out_im, uint64_t r) {
  pftpu_fill_stage_twiddle(out_re, out_im, r, r, r);
}

// Real-split twiddles B[k] = exp(-2*pi*j*k/n), k in [n/2].
void pftpu_fill_real_split_twiddle(double* out_re, double* out_im, uint64_t n) {
  const uint64_t h = n / 2;
  const long double step = -2.0L * 3.14159265358979323846264338327950288L /
                           (long double)n;
  for (uint64_t k = 0; k < h; ++k) {
    const long double ang = step * (long double)k;
    out_re[k] = (double)cosl(ang);
    out_im[k] = (double)sinl(ang);
  }
}

uint64_t pftpu_next_power_of_two(uint64_t n) {
  if (n <= 1) return 1;
  uint64_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

int pftpu_is_power_of_two(uint64_t n) { return n != 0 && (n & (n - 1)) == 0; }

int pftpu_version(void) { return 1; }

}  // extern "C"
