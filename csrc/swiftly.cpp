// Native SwiFTly processing-function library.
//
// C++ equivalent of the reference's external `ska_sdp_func` native backend
// (reference: /root/reference/src/ska_sdp_exec_swiftly/fourier_transform/
// core.py:487-929 wraps `ska_sdp_func.fourier_transforms.swiftly.Swiftly`,
// poetry.lock:3295-3307): the ten SwiFTly processing functions on
// complex128 arrays, each implemented as a single fused pass —
// gather-load (window multiply + centre-pad + phase roll folded into the
// FFT input permutation), in-place FFT, scatter-store (window multiply +
// extract + roll + optional accumulate folded into the output permutation)
// — so no intermediate buffers are materialised, which is exactly why the
// reference grew a native backend next to its NumPy one.
//
// Design notes:
//  * All kernels are stride-aware and operate along an arbitrary axis of a
//    2-D array (rows x n with independent row/element strides), so axis-0
//    calls need no transposed copies.
//  * FFT: iterative radix-2 Cooley-Tukey with precomputed per-stage
//    twiddles for power-of-two sizes; Bluestein's algorithm (chirp-Z via a
//    power-of-two convolution) for everything else. The centre-zero
//    ("fftshift") convention used throughout SwiFTly is folded into the
//    load/store permutations, never materialised.
//  * OpenMP parallelism over rows when compiled with -fopenmp.
//
// C ABI only; bound from Python via ctypes (ops/native.py).

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

using std::complex;
typedef complex<double> c128;
typedef int64_t i64;

static inline i64 md(i64 x, i64 n) {
  x %= n;
  return x < 0 ? x + n : x;
}

static inline i64 floordiv(i64 a, i64 b) {
  i64 q = a / b, r = a % b;
  return (r != 0 && ((r < 0) != (b < 0))) ? q - 1 : q;
}

// ---------------------------------------------------------------------------
// FFT plans
// ---------------------------------------------------------------------------

namespace {

struct Pow2Plan {
  i64 n = 0;
  int log2n = 0;
  std::vector<i64> bitrev;
  // stage twiddles, concatenated: stage s (len = 2^s butterflies half-span)
  std::vector<c128> tw;

  void init(i64 n_) {
    n = n_;
    log2n = 0;
    while ((i64(1) << log2n) < n) log2n++;
    bitrev.resize(n);
    for (i64 i = 0; i < n; i++) {
      i64 r = 0;
      for (int b = 0; b < log2n; b++)
        if (i & (i64(1) << b)) r |= i64(1) << (log2n - 1 - b);
      bitrev[i] = r;
    }
    tw.resize(n > 1 ? n - 1 : 0);
    i64 pos = 0;
    for (i64 half = 1; half < n; half *= 2) {
      for (i64 j = 0; j < half; j++) {
        // long-double angle + trig: twiddles exact to double rounding,
        // which the end-to-end 3e-10 accuracy bound needs (Fb amplifies
        // edge-sample FFT error by ~1e5).
        long double ang = -(long double)M_PIl * (long double)j /
                          (long double)half;
        tw[pos++] = c128(double(cosl(ang)), double(sinl(ang)));
      }
    }
  }

  // forward in-place FFT of `a` (length n). inverse => conj twiddles + 1/n.
  void run(c128* a, bool inverse) const {
    for (i64 i = 0; i < n; i++) {
      i64 j = bitrev[i];
      if (i < j) std::swap(a[i], a[j]);
    }
    i64 pos = 0;
    for (i64 half = 1; half < n; half *= 2) {
      const c128* w = &tw[pos];
      pos += half;
      for (i64 base = 0; base < n; base += 2 * half) {
        for (i64 j = 0; j < half; j++) {
          c128 wj = inverse ? std::conj(w[j]) : w[j];
          c128 u = a[base + j];
          c128 v = a[base + half + j] * wj;
          a[base + j] = u + v;
          a[base + half + j] = u - v;
        }
      }
    }
    if (inverse) {
      double s = 1.0 / double(n);
      for (i64 i = 0; i < n; i++) a[i] *= s;
    }
  }
};

// Arbitrary-size FFT: radix-2 fast path, Bluestein fallback.
struct FftPlan {
  i64 n = 0;
  bool pow2 = false;
  Pow2Plan p2;           // the size-n plan (pow2) or the size-m plan
  i64 m = 0;             // Bluestein convolution size
  std::vector<c128> chirp;      // exp(-i*pi*k^2/n), k in [0,n)
  std::vector<c128> bfft;       // FFT of padded conj chirp (forward kernel)

  void init(i64 n_) {
    n = n_;
    pow2 = (n & (n - 1)) == 0;
    if (pow2) {
      p2.init(n);
      return;
    }
    m = 1;
    while (m < 2 * n - 1) m <<= 1;
    p2.init(m);
    chirp.resize(n);
    for (i64 k = 0; k < n; k++) {
      // k^2 mod 2n keeps the angle argument small and exact
      i64 k2 = i64((__int128(k) * k) % (2 * n));
      long double ang = -(long double)M_PIl * (long double)k2 /
                        (long double)n;
      chirp[k] = c128(double(cosl(ang)), double(sinl(ang)));
    }
    std::vector<c128> b(m, c128(0, 0));
    b[0] = std::conj(chirp[0]);
    for (i64 k = 1; k < n; k++) {
      b[k] = std::conj(chirp[k]);
      b[m - k] = std::conj(chirp[k]);
    }
    p2.run(b.data(), false);
    bfft = std::move(b);
  }

  i64 scratch_size() const { return pow2 ? n : m; }

  // in-place FFT of a[0..n); scratch must hold scratch_size() elements
  // (unused for pow2 sizes).
  void run(c128* a, bool inverse, c128* scratch) const {
    if (pow2) {
      p2.run(a, inverse);
      return;
    }
    // Bluestein: X[k] = conj(c[k]) * IFFT_m(FFT_m(a*c) .* bfft)[k]
    // inverse via conjugation trick.
    if (inverse)
      for (i64 i = 0; i < n; i++) a[i] = std::conj(a[i]);
    for (i64 k = 0; k < n; k++) scratch[k] = a[k] * chirp[k];
    std::memset((void*)(scratch + n), 0, sizeof(c128) * (m - n));
    p2.run(scratch, false);
    for (i64 k = 0; k < m; k++) scratch[k] *= bfft[k];
    p2.run(scratch, true);
    for (i64 k = 0; k < n; k++) a[k] = scratch[k] * chirp[k];
    if (inverse) {
      double s = 1.0 / double(n);
      for (i64 i = 0; i < n; i++) a[i] = std::conj(a[i]) * s;
    }
  }
};

struct Swiftly {
  i64 N, yN, xM, xMyN;
  double W;
  std::vector<double> Fb;  // length yN - 1 (grid correction)
  std::vector<double> Fn;  // length xMyN (resampled window)
  FftPlan plan_yN, plan_xM, plan_xMyN;

  const FftPlan& plan_for(i64 n) const {
    if (n == yN) return plan_yN;
    if (n == xM) return plan_xM;
    return plan_xMyN;
  }
};

struct View {
  const c128* ptr;
  i64 rstride, estride;
  const c128* row(i64 r) const { return ptr + r * rstride; }
};
struct MutView {
  c128* ptr;
  i64 rstride, estride;
  c128* row(i64 r) const { return ptr + r * rstride; }
};

// Run `fn(row, work)` for every row with a per-thread work buffer.
template <typename F>
static void for_rows(i64 rows, i64 work_len, F fn) {
#ifdef _OPENMP
#pragma omp parallel
  {
    std::vector<c128> work(work_len);
#pragma omp for schedule(static)
    for (i64 r = 0; r < rows; r++) fn(r, work.data());
  }
#else
  std::vector<c128> work(work_len);
  for (i64 r = 0; r < rows; r++) fn(r, work.data());
#endif
}

}  // namespace

extern "C" {

void* swiftly_create(i64 N, i64 yN, i64 xM, double W, const double* Fb,
                     const double* Fn) {
  if (N <= 0 || yN <= 0 || xM <= 0) return nullptr;
  if (N % yN != 0 || N % xM != 0 || (xM * yN) % N != 0) return nullptr;
  Swiftly* h = new Swiftly;
  h->N = N;
  h->yN = yN;
  h->xM = xM;
  h->xMyN = xM * yN / N;
  h->W = W;
  h->Fb.assign(Fb, Fb + (yN - 1));
  h->Fn.assign(Fn, Fn + h->xMyN);
  h->plan_yN.init(yN);
  h->plan_xM.init(xM);
  h->plan_xMyN.init(h->xMyN);
  return h;
}

void swiftly_free(void* hp) { delete static_cast<Swiftly*>(hp); }

int swiftly_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

// --- facet -> subgrid chain -------------------------------------------------

// facet(yB) -> BF(yN): out = ifft_shifted(roll(pad_mid(in * fb, yN), +off))
// (reference semantics: core.py:189-222)
int swiftly_prepare_facet(void* hp, const c128* in, i64 in_rs, i64 in_es,
                          c128* out, i64 out_rs, i64 out_es, i64 rows,
                          i64 yB, i64 off) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 n = h->yN;
  if (yB > n - 1) return 1;  // Fb has yN-1 entries; yB==yN would read fb[-1]
  const double* fb = h->Fb.data() + ((n - 1) / 2 - yB / 2);
  const i64 lo = n / 2 - yB / 2;  // pad_mid window start
  const i64 base = n / 2 - off;   // ifftshift + roll(+off) load offset
  const FftPlan& plan = h->plan_yN;
  View vi{in, in_rs, in_es};
  MutView vo{out, out_rs, out_es};
  for_rows(rows, n + plan.scratch_size(), [&](i64 r, c128* work) {
    c128* scratch = work + n;
    const c128* src = vi.row(r);
    for (i64 p = 0; p < n; p++) {
      i64 k = md(p + base, n) - lo;
      work[p] = (k >= 0 && k < yB) ? src[k * in_es] * fb[k] : c128(0, 0);
    }
    plan.run(work, true, scratch);
    c128* dst = vo.row(r);
    for (i64 q = 0; q < n; q++) dst[q * out_es] = work[md(q - n / 2, n)];
  });
  return 0;
}

// BF(yN) -> NMBF(xM_yN): pure wrap-window gather at the scaled offset
// (reference: core.py:224-253 — roll(-s), extract_mid, roll(+s))
int swiftly_extract_from_facet(void* hp, const c128* in, i64 in_rs,
                               i64 in_es, c128* out, i64 out_rs, i64 out_es,
                               i64 rows, i64 off) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 n = h->yN, m = h->xMyN;
  const i64 s = floordiv(off * h->yN, h->N);
  View vi{in, in_rs, in_es};
  MutView vo{out, out_rs, out_es};
  for_rows(rows, 0, [&](i64 r, c128*) {
    const c128* src = vi.row(r);
    c128* dst = vo.row(r);
    for (i64 q = 0; q < m; q++) {
      i64 j = md(n / 2 - m / 2 + md(q - s, m) + s, n);
      dst[q * out_es] = src[j * in_es];
    }
  });
  return 0;
}

// NMBF(xM_yN) -> += subgrid term (xM): fft, roll(-s), *Fn, pad, roll(+s),
// accumulate (reference: core.py:255-285, add_mode)
int swiftly_add_to_subgrid(void* hp, const c128* in, i64 in_rs, i64 in_es,
                           c128* out, i64 out_rs, i64 out_es, i64 rows,
                           i64 off) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 m = h->xMyN, xM = h->xM;
  const i64 s = floordiv(off * xM, h->N);
  const double* Fn = h->Fn.data();
  const FftPlan& plan = h->plan_xMyN;
  View vi{in, in_rs, in_es};
  MutView vo{out, out_rs, out_es};
  for_rows(rows, m + plan.scratch_size(), [&](i64 r, c128* work) {
    c128* scratch = work + m;
    const c128* src = vi.row(r);
    for (i64 p = 0; p < m; p++) work[p] = src[md(p + m / 2, m) * in_es];
    plan.run(work, false, scratch);
    c128* dst = vo.row(r);
    for (i64 k = 0; k < m; k++) {
      i64 q = md(xM / 2 - m / 2 + k + s, xM);
      dst[q * out_es] += Fn[k] * work[md(k + s - m / 2, m)];
    }
  });
  return 0;
}

// summed(xM) -> subgrid(xA): shifted ifft + wrap-window gather at -off
// (reference: core.py:287-325)
int swiftly_finish_subgrid(void* hp, const c128* in, i64 in_rs, i64 in_es,
                           c128* out, i64 out_rs, i64 out_es, i64 rows,
                           i64 xA, i64 off) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 n = h->xM;
  if (xA > n) return 1;
  const FftPlan& plan = h->plan_xM;
  View vi{in, in_rs, in_es};
  MutView vo{out, out_rs, out_es};
  for_rows(rows, n + plan.scratch_size(), [&](i64 r, c128* work) {
    c128* scratch = work + n;
    const c128* src = vi.row(r);
    for (i64 p = 0; p < n; p++) work[p] = src[md(p + n / 2, n) * in_es];
    plan.run(work, true, scratch);
    c128* dst = vo.row(r);
    for (i64 k = 0; k < xA; k++)
      dst[k * out_es] = work[md(k + off - xA / 2, n)];
  });
  return 0;
}

// --- subgrid -> facet chain -------------------------------------------------

// subgrid(xA) -> FS(xM): pad, roll(+off), shifted fft
// (reference: core.py:328-368)
int swiftly_prepare_subgrid(void* hp, const c128* in, i64 in_rs, i64 in_es,
                            c128* out, i64 out_rs, i64 out_es, i64 rows,
                            i64 xA, i64 off) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 n = h->xM;
  if (xA > n) return 1;
  const i64 lo = n / 2 - xA / 2;
  const i64 base = n / 2 - off;
  const FftPlan& plan = h->plan_xM;
  View vi{in, in_rs, in_es};
  MutView vo{out, out_rs, out_es};
  for_rows(rows, n + plan.scratch_size(), [&](i64 r, c128* work) {
    c128* scratch = work + n;
    const c128* src = vi.row(r);
    for (i64 p = 0; p < n; p++) {
      i64 k = md(p + base, n) - lo;
      work[p] = (k >= 0 && k < xA) ? src[k * in_es] : c128(0, 0);
    }
    plan.run(work, false, scratch);
    c128* dst = vo.row(r);
    for (i64 q = 0; q < n; q++) dst[q * out_es] = work[md(q - n / 2, n)];
  });
  return 0;
}

// FS(xM) -> NAF(xM_yN): wrap-window gather at scaled off, *Fn, roll(+s),
// shifted ifft (reference: core.py:370-406)
int swiftly_extract_from_subgrid(void* hp, const c128* in, i64 in_rs,
                                 i64 in_es, c128* out, i64 out_rs,
                                 i64 out_es, i64 rows, i64 off) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 m = h->xMyN, xM = h->xM;
  const i64 s = floordiv(off * xM, h->N);
  const double* Fn = h->Fn.data();
  const FftPlan& plan = h->plan_xMyN;
  View vi{in, in_rs, in_es};
  MutView vo{out, out_rs, out_es};
  for_rows(rows, m + plan.scratch_size(), [&](i64 r, c128* work) {
    c128* scratch = work + m;
    const c128* src = vi.row(r);
    for (i64 p = 0; p < m; p++) {
      i64 k = md(p + m / 2 - s, m);
      i64 j = md(xM / 2 - m / 2 + k + s, xM);
      work[p] = Fn[k] * src[j * in_es];
    }
    plan.run(work, true, scratch);
    c128* dst = vo.row(r);
    for (i64 q = 0; q < m; q++) dst[q * out_es] = work[md(q - m / 2, m)];
  });
  return 0;
}

// NAF(xM_yN) -> += facet term (yN): roll(-s), pad, roll(+s), accumulate
// — a pure scatter-add (reference: core.py:408-449, add_mode)
int swiftly_add_to_facet(void* hp, const c128* in, i64 in_rs, i64 in_es,
                         c128* out, i64 out_rs, i64 out_es, i64 rows,
                         i64 off) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 m = h->xMyN, n = h->yN;
  const i64 s = floordiv(off * n, h->N);
  View vi{in, in_rs, in_es};
  MutView vo{out, out_rs, out_es};
  for_rows(rows, 0, [&](i64 r, c128*) {
    const c128* src = vi.row(r);
    c128* dst = vo.row(r);
    for (i64 k = 0; k < m; k++) {
      i64 q = md(n / 2 - m / 2 + k + s, n);
      dst[q * out_es] += src[md(k + s, m) * in_es];
    }
  });
  return 0;
}

// accumulated(yN) -> facet(yB): shifted fft, wrap-window gather at -off,
// grid-correct by Fb (reference: core.py:452-484)
int swiftly_finish_facet(void* hp, const c128* in, i64 in_rs, i64 in_es,
                         c128* out, i64 out_rs, i64 out_es, i64 rows,
                         i64 yB, i64 off) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 n = h->yN;
  if (yB > n - 1) return 1;  // Fb has yN-1 entries; yB==yN would read fb[-1]
  const double* fb = h->Fb.data() + ((n - 1) / 2 - yB / 2);
  const FftPlan& plan = h->plan_yN;
  View vi{in, in_rs, in_es};
  MutView vo{out, out_rs, out_es};
  for_rows(rows, n + plan.scratch_size(), [&](i64 r, c128* work) {
    c128* scratch = work + n;
    const c128* src = vi.row(r);
    for (i64 p = 0; p < n; p++) work[p] = src[md(p + n / 2, n) * in_es];
    plan.run(work, false, scratch);
    c128* dst = vo.row(r);
    for (i64 k = 0; k < yB; k++)
      dst[k * out_es] = fb[k] * work[md(k + off - yB / 2, n)];
  });
  return 0;
}

// --- fused 2-D variants (native-only ops of the reference backend,
//     core.py:752-778 / :837-855) ---------------------------------------

// NMBF_NMBF [m, m] -> += subgrid [xM, xM] (both axes in one call)
int swiftly_add_to_subgrid_2d(void* hp, const c128* in, i64 in_rs, i64 in_es,
                              c128* out, i64 out_rs, i64 out_es, i64 off0,
                              i64 off1) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 m = h->xMyN, xM = h->xM;
  // axis 1 (rows of `in`), into a temp [m, xM]
  std::vector<c128> tmp(m * xM, c128(0, 0));
  int rc = swiftly_add_to_subgrid(hp, in, in_rs, in_es, tmp.data(), xM, 1,
                                  m, off1);
  if (rc) return rc;
  // axis 0: columns of tmp are rows under swapped strides
  return swiftly_add_to_subgrid(hp, tmp.data(), 1, xM, out, out_es, out_rs,
                                xM, off0);
}

// subgrid [xA, xA] -> FS [xM, xM] (both axes in one call)
int swiftly_prepare_subgrid_2d(void* hp, const c128* in, i64 in_rs,
                               i64 in_es, c128* out, i64 out_rs, i64 out_es,
                               i64 xA, i64 off0, i64 off1) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  const i64 xM = h->xM;
  std::vector<c128> tmp(xA * xM);
  int rc = swiftly_prepare_subgrid(hp, in, in_rs, in_es, tmp.data(), xM, 1,
                                   xA, xA, off1);
  if (rc) return rc;
  return swiftly_prepare_subgrid(hp, tmp.data(), 1, xM, out, out_es, out_rs,
                                 xM, xA, off0);
}

// --- standalone shifted FFT entry points (exercised by tests; also the
//     building block a host fallback can use) ----------------------------

int swiftly_fft_shifted(void* hp, c128* buf, i64 rs, i64 es, i64 rows, i64 n,
                        int inverse) {
  Swiftly* h = static_cast<Swiftly*>(hp);
  if (n != h->yN && n != h->xM && n != h->xMyN) return 1;
  const FftPlan& plan = h->plan_for(n);
  MutView v{buf, rs, es};
  for_rows(rows, n + plan.scratch_size(), [&](i64 r, c128* work) {
    c128* scratch = work + n;
    c128* p = v.row(r);
    for (i64 i = 0; i < n; i++) work[i] = p[md(i + n / 2, n) * es];
    plan.run(work, inverse != 0, scratch);
    for (i64 q = 0; q < n; q++) p[q * es] = work[md(q - n / 2, n)];
  });
  return 0;
}

}  // extern "C"
