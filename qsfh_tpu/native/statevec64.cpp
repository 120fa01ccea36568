// f64 statevector engine for CPU polish-grade optimization of rot programs.
//
// Mirrors the semantics of qsfh_tpu/engine/compiled.py exactly:
//   per rot term      psi'[b] = cos(th)*psi[b] - i*sin(th)*ph*s(b)*psi[b^x]
//                     with th = theta[pidx]*scale, ph = (-i)^popcount(x&z),
//                     s(b) = (-1)^popcount(b&z)
//   grouped (same x-mask, same pidx, same parity(x&z), mutually commuting):
//                     psi' = exp(-i*theta*M) psi,  M(b) = sum_k w_k s_k(b)
//   observable        (H psi)[b] = sum_j c_adj_j * s_zj(b) * psi[b^x_j],
//                     c_adj = c * (-1)^popcount(x&z)   (Observable._scan_terms)
//   adjoint sweep     contrib_g = Im <lam| M_g |psi_post>, then inverse-rotate
//                     psi and lam (run_rot_adjoint gbody)
//
// The hot trick: within a group all z-parities are packed into one byte per
// amplitude via split hi/lo parity tables, so the per-amplitude mixing
// coefficients come from 2^S-entry cos/sin lookups (S <= 8) -- one state pass
// per generator, a handful of ops per amplitude pair.
//
// Group phase classes (see _group_rot_terms): parity(x&z) even -> ph_k in
// {+1,-1} (unit 1); odd -> ph_k in {+i,-i} (unit i).  The caller folds the
// per-term sign into w_k and passes gflip = parity.  Padding terms carry
// w_k = 0 and contribute nothing.
//
// Plain C ABI (ctypes); all state arrays are separate contiguous re/im
// double planes of length 2^n.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Tables {
  // pb(b) = hi[b >> half] ^ lo[b & halfmask], S parity bits packed per entry
  std::vector<uint8_t> hi, lo;
  std::vector<double> ctab, stab;  // cos(theta*r(pat)), sin(theta*r(pat))
  std::vector<double> rtab;        // r(pat) = sum_k w_k * (1 - 2*bit_k(pat))
  int half = 0;
  uint32_t halfmask = 0;
  int npat = 0;
};

// Build parity/r tables for one group (S subterms, z-masks zs, weights ws).
static void build_group_tables(int n, int S, const uint32_t* zs,
                               const double* ws, Tables& t) {
  int half = n / 2;
  int hi_bits = n - half;
  t.half = half;
  t.halfmask = (1u << half) - 1u;
  t.npat = 1 << S;
  t.hi.assign(size_t(1) << hi_bits, 0);
  t.lo.assign(size_t(1) << half, 0);
  for (int k = 0; k < S; ++k) {
    uint32_t zhi = zs[k] >> half;
    uint32_t zlo = zs[k] & t.halfmask;
    for (uint32_t h = 0; h < (1u << hi_bits); ++h)
      t.hi[h] |= uint8_t((__builtin_popcount(h & zhi) & 1) << k);
    for (uint32_t l = 0; l <= t.halfmask; ++l)
      t.lo[l] |= uint8_t((__builtin_popcount(l & zlo) & 1) << k);
  }
  t.rtab.assign(t.npat, 0.0);
  for (int p = 0; p < t.npat; ++p) {
    double r = 0.0;
    for (int k = 0; k < S; ++k) r += ws[k] * ((p >> k) & 1 ? -1.0 : 1.0);
    t.rtab[p] = r;
  }
}

static void build_trig(double theta, Tables& t) {
  t.ctab.resize(t.npat);
  t.stab.resize(t.npat);
  for (int p = 0; p < t.npat; ++p) {
    t.ctab[p] = std::cos(theta * t.rtab[p]);
    t.stab[p] = std::sin(theta * t.rtab[p]);
  }
}

// One grouped rotation pass, direction dir = -1.0 forward (exp(-i theta M))
// or +1.0 inverse.  x != 0.
static void rot_pass(uint32_t N, uint32_t x, int flip, const Tables& t,
                     double dir, double* re, double* im) {
  uint32_t hbit = 31 - __builtin_clz(x);
  uint32_t hmask = 1u << hbit;
  uint8_t pxor = flip ? uint8_t(t.npat - 1) : 0;
  int half = t.half;
  uint32_t lmask = t.halfmask;
  const uint8_t* hi = t.hi.data();
  const uint8_t* lo = t.lo.data();
  const double* ct = t.ctab.data();
  const double* st = t.stab.data();
  if (!flip) {
    // unit = 1: q = dir * i * s  (forward dir=-1: -i*s)
    for (uint32_t base = 0; base < N; base += 2 * hmask) {
      for (uint32_t b = base; b < base + hmask; ++b) {
        uint32_t p = b ^ x;
        uint8_t pb = uint8_t(hi[b >> half] ^ lo[b & lmask]);
        uint8_t pp = uint8_t(pb ^ pxor);
        double cb = ct[pb], sb = dir * st[pb];
        double cp = ct[pp], sp = dir * st[pp];
        double bre = re[b], bim = im[b], pre = re[p], pim = im[p];
        re[b] = cb * bre - sb * pim;
        im[b] = cb * bim + sb * pre;
        re[p] = cp * pre - sp * bim;
        im[p] = cp * pim + sp * bre;
      }
    }
  } else {
    // unit = i: q = -dir * s (forward dir=-1: +s)
    for (uint32_t base = 0; base < N; base += 2 * hmask) {
      for (uint32_t b = base; b < base + hmask; ++b) {
        uint32_t p = b ^ x;
        uint8_t pb = uint8_t(hi[b >> half] ^ lo[b & lmask]);
        uint8_t pp = uint8_t(pb ^ pxor);
        double cb = ct[pb], sb = -dir * st[pb];
        double cp = ct[pp], sp = -dir * st[pp];
        double bre = re[b], bim = im[b], pre = re[p], pim = im[p];
        re[b] = cb * bre + sb * pre;
        im[b] = cb * bim + sb * pim;
        re[p] = cp * pre + sp * bre;
        im[p] = cp * pim + sp * bim;
      }
    }
  }
}

// Diagonal (x == 0) grouped rotation: psi[b] *= exp(dir * i * theta * r(b)).
// (unit is always 1 for x == 0: parity(0 & z) = 0.)
static void diag_pass(uint32_t N, const Tables& t, double dir, double* re,
                      double* im) {
  int half = t.half;
  uint32_t lmask = t.halfmask;
  const uint8_t* hi = t.hi.data();
  const uint8_t* lo = t.lo.data();
  const double* ct = t.ctab.data();
  const double* st = t.stab.data();
  for (uint32_t b = 0; b < N; ++b) {
    uint8_t pb = uint8_t(hi[b >> half] ^ lo[b & lmask]);
    double c = ct[pb], s = dir * st[pb];
    double r0 = re[b], i0 = im[b];
    re[b] = c * r0 - s * i0;
    im[b] = c * i0 + s * r0;
  }
}

}  // namespace

extern "C" {

// Apply the grouped rot program in order (forward).  Group g has subterms
// [off[g], off[g+1]) in (zsub, wsub); x-mask gx[g]; parity class gflip[g];
// angle gangle[g] (theta[pidx]*1.0, scales folded into wsub).
void qsfh_sv64_apply(int32_t n, int64_t G, const uint32_t* gx,
                     const int64_t* off, const uint32_t* zsub,
                     const double* wsub, const uint8_t* gflip,
                     const double* gangle, double* re, double* im) {
  uint32_t N = 1u << n;
  Tables t;
  for (int64_t g = 0; g < G; ++g) {
    int S = int(off[g + 1] - off[g]);
    build_group_tables(n, S, zsub + off[g], wsub + off[g], t);
    build_trig(gangle[g], t);
    if (gx[g] == 0)
      diag_pass(N, t, -1.0, re, im);
    else
      rot_pass(N, gx[g], gflip[g], t, -1.0, re, im);
  }
}

// out += sum_j c_adj_j * s_zj(b) * psi[b ^ x_j]   (caller zeroes out).
void qsfh_sv64_happly(int32_t n, int64_t T, const uint32_t* xh,
                      const uint32_t* zh, const double* cre, const double* cim,
                      const double* re, const double* im, double* ore,
                      double* oim) {
  uint32_t N = 1u << n;
  int half = n / 2;
  uint32_t lmask = (1u << half) - 1u;
  int hi_bits = n - half;
  std::vector<uint8_t> hi(size_t(1) << hi_bits), lo(size_t(1) << half);
  for (int64_t j = 0; j < T; ++j) {
    uint32_t x = xh[j], z = zh[j];
    double wr = cre[j], wi = cim[j];
    uint32_t zhi = z >> half, zlo = z & lmask;
    for (uint32_t h = 0; h < (1u << hi_bits); ++h)
      hi[h] = uint8_t(__builtin_popcount(h & zhi) & 1);
    for (uint32_t l = 0; l <= lmask; ++l)
      lo[l] = uint8_t(__builtin_popcount(l & zlo) & 1);
    for (uint32_t b = 0; b < N; ++b) {
      double s = (hi[b >> half] ^ lo[b & lmask]) ? -1.0 : 1.0;
      uint32_t p = b ^ x;
      double pr = re[p], pi = im[p];
      ore[b] += s * (wr * pr - wi * pi);
      oim[b] += s * (wr * pi + wi * pr);
    }
  }
}

// Fused adjoint sweep: iterate groups in REVERSE order; per group g record
// contrib[g] = Im <lam| M_g |psi> at the post-gate state, then inverse-rotate
// BOTH psi and lam in the same pair loop.  On return psi/lam are rewound to
// the program start and contrib holds per-group gradient contributions
// (caller scatters by pidx).
void qsfh_sv64_adjoint(int32_t n, int64_t G, const uint32_t* gx,
                       const int64_t* off, const uint32_t* zsub,
                       const double* wsub, const uint8_t* gflip,
                       const double* gangle, double* re, double* im,
                       double* lre, double* lim, double* contrib) {
  uint32_t N = 1u << n;
  Tables t;
  for (int64_t g = G - 1; g >= 0; --g) {
    int S = int(off[g + 1] - off[g]);
    build_group_tables(n, S, zsub + off[g], wsub + off[g], t);
    build_trig(gangle[g], t);
    uint32_t x = gx[g];
    int flip = gflip[g];
    int half = t.half;
    uint32_t lmask = t.halfmask;
    const uint8_t* hi = t.hi.data();
    const uint8_t* lo = t.lo.data();
    const double* ct = t.ctab.data();
    const double* st = t.stab.data();
    const double* rt = t.rtab.data();
    double acc = 0.0;
    if (x == 0) {
      // M diagonal (unit 1): contrib = sum r(b) * Im(conj(lam)*psi)
      for (uint32_t b = 0; b < N; ++b) {
        uint8_t pb = uint8_t(hi[b >> half] ^ lo[b & lmask]);
        double r = rt[pb];
        acc += r * (lre[b] * im[b] - lim[b] * re[b]);
        double c = ct[pb], s = st[pb];  // inverse: *= exp(+i theta r)
        double r0 = re[b], i0 = im[b];
        re[b] = c * r0 - s * i0;
        im[b] = c * i0 + s * r0;
        double l0 = lre[b], m0 = lim[b];
        lre[b] = c * l0 - s * m0;
        lim[b] = c * m0 + s * l0;
      }
    } else {
      uint32_t hbit = 31 - __builtin_clz(x);
      uint32_t hmask = 1u << hbit;
      uint8_t pxor = flip ? uint8_t(t.npat - 1) : 0;
      for (uint32_t base = 0; base < N; base += 2 * hmask) {
        for (uint32_t b = base; b < base + hmask; ++b) {
          uint32_t p = b ^ x;
          uint8_t pb = uint8_t(hi[b >> half] ^ lo[b & lmask]);
          uint8_t pp = uint8_t(pb ^ pxor);
          double rb = rt[pb], rp = rt[pp];
          double bre = re[b], bim = im[b], pre = re[p], pim = im[p];
          double Lbr = lre[b], Lbi = lim[b], Lpr = lre[p], Lpi = lim[p];
          // (M psi)[b] = unit * r_b * psi[p]; contrib += Im(conj(L_b)*that)
          double cb = ct[pb], sb = st[pb];
          double cp = ct[pp], sp = st[pp];
          if (!flip) {
            // unit 1: Im(conj(L)*(r*psi_p)) = r*(Lr*pi - Li*pr)
            acc += rb * (Lbr * pim - Lbi * pre);
            acc += rp * (Lpr * bim - Lpi * bre);
            // inverse rotation: psi' = c*psi + i*s*psi[p]  (dir=+1, unit 1)
            re[b] = cb * bre - sb * pim;  // note: +i*s*(pre+i*pim) -> re -= ...
            im[b] = cb * bim + sb * pre;
            re[p] = cp * pre - sp * bim;
            im[p] = cp * pim + sp * bre;
            lre[b] = cb * Lbr - sb * Lpi;
            lim[b] = cb * Lbi + sb * Lpr;
            lre[p] = cp * Lpr - sp * Lbi;
            lim[p] = cp * Lpi + sp * Lbr;
          } else {
            // unit i: Im(conj(L)*(i*r*psi_p)) = r*Re(conj(L)*psi_p)
            acc += rb * (Lbr * pre + Lbi * pim);
            acc += rp * (Lpr * bre + Lpi * bim);
            // inverse: q = -dir*s with dir=+1 -> -s (real coefficient)
            re[b] = cb * bre - sb * pre;
            im[b] = cb * bim - sb * pim;
            re[p] = cp * pre - sp * bre;
            im[p] = cp * pim - sp * bim;
            lre[b] = cb * Lbr - sb * Lpr;
            lim[b] = cb * Lbi - sb * Lpi;
            lre[p] = cp * Lpr - sp * Lbr;
            lim[p] = cp * Lpi - sp * Lbi;
          }
        }
      }
    }
    contrib[g] = acc;
  }
}

}  // extern "C"
