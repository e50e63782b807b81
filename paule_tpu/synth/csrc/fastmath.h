// Fast transcendental approximations for the audio-rate synthesis path.
//
// The per-sample glottis oscillation (p^skew, sin^2) and the per-frame tract
// geometry (hundreds of gaussians + powers per tract_to_tube call) are
// libm-bound; these near-minimax polynomial replacements are 3-10x faster at
// accuracies far below audibility:
//
//   fast_exp2   rel error < 3e-9    (degree-6 on the [0,1) fraction)
//   fast_log2   abs error < 5e-8    (degree-8 on the [1,2) mantissa)
//   cospi_half  abs error < 3e-10   (degree-5 in v^2 on [-1/2, 1/2])
//
// NOT general-purpose: restricted domains, no NaN/inf propagation.  Keep
// libm for anything outside the audio-rate hot loops.

#pragma once

#include <cmath>
#include <cstdint>

namespace pts {

// 2^x; underflows to 0, clamps near the overflow edge.
inline double fast_exp2(double x) {
  double xi = std::floor(x);
  double f = x - xi;  // [0, 1)
  double p =
      1.0000000025868891 +
      f * (0.693146928693029 +
           f * (0.24023050204499768 +
                f * (0.05548042632577707 +
                     f * (0.009684580452328492 +
                          f * (0.0012387821478955943 +
                               f * 0.00021877504770057688)))));
  int64_t e = (int64_t)xi + 1023;
  if (e <= 0) return 0.0;
  if (e >= 2047) e = 2046;
  union {
    uint64_t u;
    double d;
  } v;
  v.u = (uint64_t)e << 52;
  return v.d * p;
}

inline double fast_exp(double x) {
  return fast_exp2(x * 1.4426950408889634);
}

// 2^x without the overflow/underflow edge handling: valid for
// x in (-1022, 1023).  Branch-free and bit-cast based (no union memory
// round-trip), so a loop over an array of inputs auto-vectorizes (the
// clamped fast_exp2 above carries two branches).
inline double fast_exp2_nc(double x) {
  double xi = std::floor(x);
  double f = x - xi;  // [0, 1)
  double p =
      1.0000000025868891 +
      f * (0.693146928693029 +
           f * (0.24023050204499768 +
                f * (0.05548042632577707 +
                     f * (0.009684580452328492 +
                          f * (0.0012387821478955943 +
                               f * 0.00021877504770057688)))));
  double scale = __builtin_bit_cast(
      double, (uint64_t)((int64_t)xi + 1023) << 52);
  return scale * p;
}

// Gaussian exp(-0.5 ((x-c)/w)^2) in the branch-free bit-cast form
// (auto-vectorizes like fast_exp2_nc).  The exponent is floored at -1000
// (2^-1000 ~ 1e-301, i.e. 0 for every consumer; flushed to exactly 0 under
// the synthesis loops' FTZ) so arbitrarily distant x — reachable through
// user speaker files with wide parameter ranges — stays inside
// fast_exp2_nc's valid domain instead of wrapping the bit-cast exponent
// into sign-bit garbage.  The clamp if-converts to a max, so the loop
// still vectorizes.
inline double fast_gauss_nc(double x, double c, double w) {
  constexpr double kLog2E = 1.4426950408889634;
  double z = (x - c) / w;
  double t = -0.5 * z * z * kLog2E;
  t = t < -1000.0 ? -1000.0 : t;
  return fast_exp2_nc(t);
}

// log2(x) for finite normal x > 0 — bit-cast variant of fast_log2 that
// auto-vectorizes (identical arithmetic).
inline double fast_log2_bc(double x) {
  uint64_t u = __builtin_bit_cast(uint64_t, x);
  int64_t e = (int64_t)(u >> 52) - 1023;
  double m = __builtin_bit_cast(
      double, (u & 0x000fffffffffffffULL) | 0x3ff0000000000000ULL);
  double t = m - 1.0;  // [0, 1)
  double p =
      4.8863580334963816e-08 +
      t * (1.4426867778259658 +
           t * (-0.7211146144034014 +
                t * (0.4783235448678622 +
                     t * (-0.34599601243364225 +
                          t * (0.23923166297286413 +
                               t * (-0.13453425419894569 +
                                    t * (0.05027750737057517 +
                                         t * -0.008874696651227329)))))));
  return (double)e + p;
}

// log2(x) for finite normal x > 0.
inline double fast_log2(double x) {
  union {
    double d;
    uint64_t u;
  } v;
  v.d = x;
  int64_t e = (int64_t)(v.u >> 52) - 1023;
  v.u = (v.u & 0x000fffffffffffffULL) | 0x3ff0000000000000ULL;
  double t = v.d - 1.0;  // [0, 1)
  double p =
      4.8863580334963816e-08 +
      t * (1.4426867778259658 +
           t * (-0.7211146144034014 +
                t * (0.4783235448678622 +
                     t * (-0.34599601243364225 +
                          t * (0.23923166297286413 +
                               t * (-0.13453425419894569 +
                                    t * (0.05027750737057517 +
                                         t * -0.008874696651227329)))))));
  return (double)e + p;
}

// a^b for a >= 0, b > 0 (a <= 0 returns 0; the explicit guard also covers
// -0.0, whose sign bit would otherwise corrupt fast_log2's exponent read).
inline double fast_pow(double a, double b) {
  if (a <= 0.0) return 0.0;
  return fast_exp2(b * fast_log2(a));
}

// cos(pi v) for v in [-1/2, 1/2].
inline double fast_cospi_half(double v) {
  double u = v * v;
  return 0.9999999997799052 +
         u * (-4.934802137078843 +
              u * (4.058709159556513 +
                   u * (-1.335212003052287 +
                        u * (0.2349373138236159 +
                             u * -0.024396324360926345))));
}

// sin(pi p)^2 for p in [0, 1]  (sin(pi p) = cos(pi (p - 1/2))).
inline double fast_sinpi_sq(double p) {
  double s = fast_cospi_half(p - 0.5);
  return s * s;
}

// sin(2 pi u) for any finite u, range-reduced mod 1 (abs error < 3e-10 on
// the reduced argument; for large |u| the reduction itself carries the
// usual catastrophic-cancellation precision loss, same as sin(2*pi*u)
// evaluated in double).
inline double fast_sin2pi(double u) {
  double y = 2.0 * (u - std::floor(u));  // [0, 2)
  double sign = 1.0;
  if (y >= 1.0) {
    y -= 1.0;
    sign = -1.0;
  }
  return sign * fast_cospi_half(y - 0.5);
}

// tanh(x) for x >= 0 via the [3/2] Pade approximant, which reaches exactly
// 1.0 at x = 3 and is clamped there (abs error < 5e-3 — used only to
// saturate a noise level estimate, far below audibility).
inline double fast_tanh_pos(double x) {
  if (x >= 3.0) return 1.0;
  double x2 = x * x;
  return x * (27.0 + x2) / (27.0 + 9.0 * x2);
}

}  // namespace pts
