// Native merge kernel for packed Pauli sums.
//
// The framework's symbolic layer (qsfh_tpu/ops/pauli.py) represents a qubit
// operator as flat arrays (x_mask, z_mask, coeff); every product/sum ends in
// a canonicalization pass that sorts the (x, z) keys and combines duplicate
// monomials (the analog of OpenFermion QubitOperator dict merging, consumed
// by the iQCC dressing loop, /root/reference/models/iqcc.py:175-180).  That
// merge dominates host-side symbolic time once the dressed Hamiltonian grows
// to ~10^5..10^7 terms, so it lives here as a C++ kernel: one cache-friendly
// struct sort + linear combine, exposed over a plain C ABI for ctypes.
//
// Build: qsfh_tpu/native/__init__.py compiles this with g++ on first import
// (no pybind11 in the image; the C ABI + ctypes keeps the binding layer
// trivial).  Python falls back to the numpy lexsort path when unavailable.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Term {
  uint64_t x;
  uint64_t z;
  double re;
  double im;
};

inline bool key_less(const Term& a, const Term& b) {
  // Match numpy lexsort((z, x)): primary key x, secondary z.
  if (a.x != b.x) return a.x < b.x;
  return a.z < b.z;
}

}  // namespace

extern "C" {

// Sort (x, z) keys, sum coefficients of duplicate keys, drop |c| <= tol.
// Output arrays must have capacity n.  Returns the merged term count.
int64_t qsfh_merge_terms(const uint64_t* x, const uint64_t* z,
                         const double* c_re, const double* c_im, int64_t n,
                         double tol, uint64_t* out_x, uint64_t* out_z,
                         double* out_re, double* out_im) {
  if (n <= 0) return 0;
  std::vector<Term> terms(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    terms[static_cast<size_t>(i)] = Term{x[i], z[i], c_re[i], c_im[i]};
  }
  // stable: duplicate (x,z) keys sum in input order, so output is
  // bitwise-identical to np.lexsort-based numpy fallback (ADVICE r1)
  std::stable_sort(terms.begin(), terms.end(), key_less);

  int64_t m = 0;
  size_t i = 0;
  const size_t nn = static_cast<size_t>(n);
  while (i < nn) {
    const uint64_t kx = terms[i].x;
    const uint64_t kz = terms[i].z;
    double re = 0.0, im = 0.0;
    do {
      re += terms[i].re;
      im += terms[i].im;
      ++i;
    } while (i < nn && terms[i].x == kx && terms[i].z == kz);
    if (re * re + im * im > tol * tol) {
      out_x[m] = kx;
      out_z[m] = kz;
      out_re[m] = re;
      out_im[m] = im;
      ++m;
    }
  }
  return m;
}

// Fused single-string dressing pass (the iQCC fast path): given H as flat
// arrays and one Hermitian Pauli string P = pc * X^px Z^pz with P^2 = I,
// emit the un-merged term list of
//   H' = H - (1 - cos(tau)) * H_A - i sin(tau) * (H_A @ P)
// where H_A is the P-anticommuting part of H.  Output capacity must be 2n.
// Returns the emitted count (n + |A|); caller merges with qsfh_merge_terms.
int64_t qsfh_dress_emit(const uint64_t* x, const uint64_t* z,
                        const double* c_re, const double* c_im, int64_t n,
                        uint64_t px, uint64_t pz, double pc_re, double pc_im,
                        double tau, uint64_t* out_x, uint64_t* out_z,
                        double* out_re, double* out_im) {
  const double ct = std::cos(tau);
  const double st = std::sin(tau);
  // -i * sin(tau) * pc
  const double f_re = st * pc_im;
  const double f_im = -st * pc_re;
  int64_t m = n;
  for (int64_t i = 0; i < n; ++i) {
    const bool anti = (__builtin_popcountll(z[i] & px) +
                       __builtin_popcountll(x[i] & pz)) & 1;
    out_x[i] = x[i];
    out_z[i] = z[i];
    if (anti) {
      out_re[i] = c_re[i] * ct;
      out_im[i] = c_im[i] * ct;
      const double s = (__builtin_popcountll(z[i] & px) & 1) ? -1.0 : 1.0;
      const double ar = c_re[i] * s, ai = c_im[i] * s;
      out_x[m] = x[i] ^ px;
      out_z[m] = z[i] ^ pz;
      out_re[m] = ar * f_re - ai * f_im;
      out_im[m] = ar * f_im + ai * f_re;
      ++m;
    } else {
      out_re[i] = c_re[i];
      out_im[i] = c_im[i];
    }
  }
  return m;
}

}  // extern "C"
