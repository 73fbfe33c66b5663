// Native host LDPC codec for gf3x.
//
// The reference genre's one compiled component is its C LDPC library
// (SURVEY.md §3.1: the course-provided `ldpc` C extension — encoder +
// BP decoder). This is the gf3x equivalent: a small C++ implementation of
// the same rate-1/2 QC code family, exposed through a C ABI and bound via
// ctypes (no pybind11 in this image). It serves as (a) an independent
// parity oracle for the JAX/Pallas decoders and (b) a fast host path for
// CPU-only deployments.
//
// The code structure (expanded edge list, parity projector) is passed in
// from Python so the single source of truth for the base matrix stays in
// gf3x/fec/codes.py.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Systematic encode: out = [u | P·u mod 2] for n_cw codewords.
// P is (m × k) row-major uint8 (0/1), u is (n_cw × k), out is (n_cw × (k+m)).
void gf3x_ldpc_encode(const uint8_t* P, int m, int k,
                      const uint8_t* u, int n_cw, uint8_t* out) {
  const int n = k + m;
  // bit-pack P rows for fast AND/popcount matvec
  const int words = (k + 63) / 64;
  std::vector<uint64_t> Pp((size_t)m * words, 0);
  for (int r = 0; r < m; ++r)
    for (int c = 0; c < k; ++c)
      if (P[(size_t)r * k + c])
        Pp[(size_t)r * words + c / 64] |= (uint64_t)1 << (c % 64);

  std::vector<uint64_t> up(words);
  for (int w = 0; w < n_cw; ++w) {
    const uint8_t* uw = u + (size_t)w * k;
    uint8_t* ow = out + (size_t)w * n;
    std::memcpy(ow, uw, k);
    std::fill(up.begin(), up.end(), 0);
    for (int c = 0; c < k; ++c)
      if (uw[c]) up[c / 64] |= (uint64_t)1 << (c % 64);
    for (int r = 0; r < m; ++r) {
      uint64_t acc = 0;
      const uint64_t* row = &Pp[(size_t)r * words];
      for (int ww = 0; ww < words; ++ww) acc ^= row[ww] & up[ww];
      ow[k + r] = (uint8_t)(__builtin_popcountll(acc) & 1);
    }
  }
}

// Layered (check-serial) normalized min-sum decode (alpha = 0.8), the same
// schedule as gf3x.fec.ldpc (first-argmin tie-breaking), float32 messages:
// each check reads the CURRENT variable totals — already updated by this
// iteration's earlier checks — and writes its message delta back
// immediately. Checks ascend in block-row-major order, and within one
// block row of the QC code the z checks touch disjoint variables, so this
// per-check schedule is exactly the block-LAYERED schedule of the
// NumPy/JAX/Pallas twins (bit-identical decodes); vs flooding it roughly
// halves the iterations to convergence.
// edges: n_edges pairs (check_idx, var_idx); llr is (n_cw × n) with
// positive => bit 0. out_bits is (n_cw × n) hard decisions of the final
// totals (caller slices the systematic k).
// early_exit != 0 stops a codeword at the first pass whose totals already
// satisfy every check (the shared freeze rule; `iters` becomes the
// maximum). Returns the number of codewords whose syndrome is zero on exit.
int gf3x_ldpc_decode(const int32_t* edge_chk, const int32_t* edge_var,
                     int n_edges, int n_chk, int n_var,
                     const float* llr, int n_cw, int iters,
                     float alpha, int early_exit, uint8_t* out_bits) {
  // per-check edge grouping (CSR)
  std::vector<int> deg(n_chk, 0);
  for (int e = 0; e < n_edges; ++e) deg[edge_chk[e]]++;
  std::vector<int> off(n_chk + 1, 0);
  for (int c = 0; c < n_chk; ++c) off[c + 1] = off[c] + deg[c];
  std::vector<int> order(n_edges), fill(off.begin(), off.end() - 1);
  for (int e = 0; e < n_edges; ++e) order[fill[edge_chk[e]]++] = e;

  std::vector<float> c2v(n_edges), total(n_var);
  int ok = 0;

  for (int w = 0; w < n_cw; ++w) {
    const float* lam = llr + (size_t)w * n_var;
    std::fill(c2v.begin(), c2v.end(), 0.0f);
    for (int v = 0; v < n_var; ++v) total[v] = lam[v];

    for (int it = 0; it < iters; ++it) {
      if (early_exit) {
        int violated = 0;
        for (int c = 0; c < n_chk && !violated; ++c) {
          int par = 0;
          for (int t = off[c]; t < off[c + 1]; ++t)
            par ^= (total[edge_var[order[t]]] < 0.0f);
          violated = par;
        }
        if (!violated) break;
      }
      // layered check update: v2c from the CURRENT totals; the delta goes
      // back into the totals immediately (within one check every edge has
      // a distinct variable, so pass 2's v2c recomputation still sees the
      // pre-update totals for its own edge)
      for (int c = 0; c < n_chk; ++c) {
        const int lo = off[c], hi = off[c + 1];
        float m1 = 1e30f, m2 = 1e30f;
        int am = -1;
        float sgn_prod = 1.0f;
        for (int t = lo; t < hi; ++t) {
          const int e = order[t];
          const float v2c = total[edge_var[e]] - c2v[e];
          const float mag = std::fabs(v2c);
          if (v2c < 0) sgn_prod = -sgn_prod;
          if (mag < m1) { m2 = m1; m1 = mag; am = t; }
          else if (mag < m2) { m2 = mag; }
        }
        for (int t = lo; t < hi; ++t) {
          const int e = order[t];
          const float v2c = total[edge_var[e]] - c2v[e];
          const float sgn = (v2c < 0 ? -1.0f : 1.0f) * sgn_prod;
          const float mag = (t == am) ? m2 : m1;
          const float nw = alpha * sgn * mag;
          total[edge_var[e]] += nw - c2v[e];
          c2v[e] = nw;
        }
      }
    }

    uint8_t* bits = out_bits + (size_t)w * n_var;
    for (int v = 0; v < n_var; ++v) bits[v] = total[v] < 0.0f;

    // syndrome check
    int violated = 0;
    for (int c = 0; c < n_chk && !violated; ++c) {
      int par = 0;
      for (int t = off[c]; t < off[c + 1]; ++t)
        par ^= bits[edge_var[order[t]]];
      violated = par;
    }
    ok += !violated;
  }
  return ok;
}

}  // extern "C"
