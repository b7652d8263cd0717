// Native host kernels for the variant-block engine.
//
// The combination growth of the genotyper (grow left/right with
// back-tracking, then cross-product through the center variant —
// semantics of reference var_block.hpp:436-677, as mirrored by
// malva_tpu/variants/blocks.py) is pure integer work on tiny arrays but
// runs once per variant and dominates the Python host profile on dense
// VCFs.  This module exposes it via a C ABI for ctypes.
//
// Build: make -C native   (produces libmalva_host.so)

#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

namespace {

struct V {
  int64_t pos, size, min_size;
  uint8_t present;
};

inline bool overlapping(const V& a, const V& b) {
  return a.pos <= b.pos && b.pos < a.pos + a.size;
}

inline bool near_rl(const V& a, const V& b, int64_t k, int64_t sum) {
  // var_block.hpp:417-423: a is the left variant, b the right one
  return a.pos + a.size - a.min_size - 1 + sum + (k + 1) / 2 >= b.pos;
}

// grow combinations outward from `center`; dir=+1 right, -1 left.
// Mirrors blocks.py _grow_combs exactly (including the halt rule and the
// clean stop when back-tracking empties a combination).
void grow(const std::vector<V>& vs, int64_t center, int64_t k, int dir,
          std::vector<std::vector<int32_t>>& combs) {
  const V& mid = vs[center];
  std::vector<int64_t> sums;
  int64_t n = (int64_t)vs.size();

  for (int64_t j = center + dir; j >= 0 && j < n; j += dir) {
    const V& curr = vs[j];
    if (!curr.present) continue;
    if (dir > 0 ? overlapping(mid, curr) : overlapping(curr, mid)) continue;

    auto is_near = [&](int64_t s) {
      return dir > 0 ? near_rl(mid, curr, k, s) : near_rl(curr, mid, k, s);
    };
    auto tail_overlaps = [&](const std::vector<int32_t>& c) {
      const V& last = vs[c.back()];
      return dir > 0 ? overlapping(last, curr) : overlapping(curr, last);
    };

    if (combs.empty()) {
      if (is_near(0)) {
        combs.push_back({(int32_t)j});
        sums.push_back(curr.size - curr.min_size);
      }
      continue;
    }

    bool added = false;
    size_t n_existing = combs.size();
    for (size_t c = 0; c < n_existing; ++c) {
      if (!tail_overlaps(combs[c])) {
        added = true;
        if (is_near(sums[c])) {
          combs[c].push_back((int32_t)j);
          sums[c] += curr.size - curr.min_size;
        }
      }
    }
    if (!added) {
      std::vector<std::vector<int32_t>> ncombs;
      std::vector<int64_t> nsums;
      for (size_t c = 0; c < n_existing; ++c) {
        std::vector<int32_t> nc = combs[c];
        int64_t ns = sums[c];
        while (!nc.empty() && tail_overlaps(nc)) {
          const V& popped = vs[nc.back()];
          nc.pop_back();
          ns -= popped.size - popped.min_size;
        }
        nc.push_back((int32_t)j);
        if (is_near(ns)) {
          added = true;
          ncombs.push_back(nc);
          nsums.push_back(ns + curr.size - curr.min_size);
        }
      }
      for (size_t c = 0; c < ncombs.size(); ++c) {
        combs.push_back(std::move(ncombs[c]));
        sums.push_back(nsums[c]);
      }
      if (!added) break;  // halt: nothing further can be near
    }
  }
}

}  // namespace

extern "C" {

// Computes the full combination list for `center` (left x right crossed
// through the center — var_block.hpp:630-677).  Outputs flattened:
//   out_idx:  concatenated variant indices of every comb
//   out_off:  comb c spans out_idx[out_off[c] : out_off[c+1]]
// Returns the number of combs, or -1 if the output capacity would be
// exceeded (caller falls back).
int64_t malva_combs(const int64_t* pos, const int64_t* size,
                    const int64_t* min_size, const uint8_t* present,
                    int64_t n, int64_t center, int64_t k,
                    int32_t* out_idx, int64_t* out_off,
                    int64_t max_idx, int64_t max_combs) {
  std::vector<V> vs(n);
  for (int64_t i = 0; i < n; ++i) vs[i] = V{pos[i], size[i], min_size[i], present[i]};

  std::vector<std::vector<int32_t>> right, left;
  grow(vs, center, k, +1, right);
  grow(vs, center, k, -1, left);

  int64_t n_combs = 0;
  int64_t n_idx = 0;
  auto emit = [&](const std::vector<int32_t>& lrev, const std::vector<int32_t>* rc) -> bool {
    int64_t len = (int64_t)lrev.size() + 1 + (rc ? (int64_t)rc->size() : 0);
    if (n_combs + 1 > max_combs || n_idx + len > max_idx) return false;
    out_off[n_combs] = n_idx;
    for (auto it = lrev.rbegin(); it != lrev.rend(); ++it) out_idx[n_idx++] = *it;
    out_idx[n_idx++] = (int32_t)center;
    if (rc)
      for (int32_t v : *rc) out_idx[n_idx++] = v;
    ++n_combs;
    return true;
  };

  static const std::vector<int32_t> kEmpty;
  if (left.empty() && right.empty()) {
    if (!emit(kEmpty, nullptr)) return -1;
  } else if (left.empty()) {
    for (const auto& rc : right)
      if (!emit(kEmpty, &rc)) return -1;
  } else if (right.empty()) {
    for (const auto& lc : left)
      if (!emit(lc, nullptr)) return -1;
  } else {
    for (const auto& lc : left)
      for (const auto& rc : right)
        if (!emit(lc, &rc)) return -1;
  }
  out_off[n_combs] = n_idx;
  return n_combs;
}

// GT parsing over a VCF record's sample region (the tab-joined columns
// 10+).  Mirrors malva_tpu/io/vcf.py::_encode_gt / _genotypes_flat_slow
// exactly: htslib encoding ((allele+1)<<1 | phased-of-preceding-sep,
// '.'/'' -> 0|phase), a leading separator donates its phase to the first
// allele, max ploidy spans ALL samples, shorter samples pad with
// VECTOR_END.  This covers the irregular FORMATs (GT:DP:..., GT not
// first, multi-digit alleles) the numpy fast path can't.
//
// out must hold n_samples * max_ploidy_cap int32.  Rows are written at
// stride max_ploidy_cap; the caller slices to the returned max_ploidy.
// Returns max_ploidy, or -1 on any malformed input (caller falls back to
// the Python path, preserving its exception behavior).

extern "C" int64_t malva_parse_gt(const uint8_t* s, int64_t len,
                                  int64_t n_samples, int64_t gt_at,
                                  int32_t* out, int64_t cap) {
  const int32_t kVectorEnd = (int32_t)0x80000000;
  int64_t i = 0;
  int64_t max_ploidy = 0;
  for (int64_t smp = 0; smp < n_samples; ++smp) {
    // seek to the GT subfield
    for (int64_t f = 0; f < gt_at; ++f) {
      while (i < len && s[i] != ':' && s[i] != '\t') ++i;
      if (i >= len || s[i] != ':') return -1;
      ++i;
    }
    int32_t* row = out + smp * cap;
    int64_t p = 0;
    int phase = 0;
    if (i < len && (s[i] == '|' || s[i] == '/')) {
      // leading separator: its phase attaches to the first allele
      phase = (s[i] == '|');
      ++i;
    }
    while (true) {
      // one allele token: digits, or '.'/'' (missing)
      int32_t enc;
      if (i < len && s[i] == '.') {
        enc = 0 | phase;
        ++i;
      } else if (i < len && s[i] >= '0' && s[i] <= '9') {
        int64_t a = 0;
        while (i < len && s[i] >= '0' && s[i] <= '9') {
          a = a * 10 + (s[i] - '0');
          if (a > (1 << 29)) return -1;
          ++i;
        }
        enc = (int32_t)(((a + 1) << 1) | phase);
      } else if (i >= len || s[i] == '\t' || s[i] == ':' || s[i] == '|' ||
                 s[i] == '/') {
        enc = 0 | phase;  // empty token
      } else {
        return -1;  // unexpected character in GT
      }
      if (p >= cap) return -1;
      row[p++] = enc;
      if (i >= len || s[i] == '\t' || s[i] == ':') break;
      if (s[i] == '|' || s[i] == '/') {
        phase = (s[i] == '|');
        ++i;
        continue;
      }
      return -1;
    }
    if (p > max_ploidy) max_ploidy = p;
    // skip the rest of this sample's column
    while (i < len && s[i] != '\t') ++i;
    if (smp + 1 < n_samples) {
      if (i >= len || s[i] != '\t') return -1;
      ++i;
    }
    // pad the row
    for (int64_t q = p; q < cap; ++q) row[q] = kVectorEnd;
  }
  if (i < len) return -1;  // trailing garbage / sample count mismatch
  return max_ploidy;
}

// Genotype likelihoods for a batch of variants (semantics of reference
// var_block.hpp:224-330 as mirrored by malva_tpu/models/genotype.py).
// Bit-exactness requires libm log/exp in double with float32 operand
// pre-rounding exactly where the C++ reference has float expressions —
// this kernel IS that C++, so parity is by construction (and fuzz-gated).
//
// Inputs are flattened per-variant arrays: variant v owns
// cov[off[v]:off[v+1]] and freqs[same range]; n_all = off[v+1]-off[v].
// Outputs: mode[v] (0 = normal probabilities, 1 = over-coverage guard,
// 2 = single-allele, 3 = zero total coverage), n_out[v] = number of
// emitted entries, probs = concatenated normal-mode probabilities in
// genotype order (haploid: g ascending; diploid: (g1,g2) with g2 >= g1,
// g1 outer).  For mode 1, n_out = number of over-covered alleles.
// Returns total probs written, or -1 if max_probs would be exceeded.

#include <cmath>

namespace {

inline double xlog(float x) {
  double d = (double)x;
  if (d == 0.0) return -INFINITY;
  if (d < 0.0) return NAN;
  return std::log(d);
}

inline double log_binomial(int64_t n, int64_t k) {
  if (n == 0 || n == k || k == 0) return 0.0;
  double dn = (double)n, dk = (double)k, dr = (double)(n - k);
  return dn * std::log(dn) - dk * std::log(dk) - dr * std::log(dr);
}

inline double store(double lp) { return std::isinf(lp) ? 0.0 : std::exp(lp); }

}  // namespace

extern "C" {

int64_t malva_genotype_block(const int64_t* cov, const float* freqs,
                             const int64_t* off, int64_t n_var,
                             int haploid, int64_t max_cov, float er,
                             int8_t* mode, int32_t* n_out,
                             double* probs, int64_t max_probs) {
  int64_t w = 0;
  for (int64_t v = 0; v < n_var; ++v) {
    const int64_t* c = cov + off[v];
    const float* f = freqs + off[v];
    int64_t n_all = off[v + 1] - off[v];

    int32_t over = 0;
    for (int64_t i = 0; i < n_all; ++i)
      if (c[i] > max_cov) ++over;
    if (over) { mode[v] = 1; n_out[v] = over; continue; }
    if (n_all == 1) { mode[v] = 2; n_out[v] = 1; continue; }

    int64_t total = 0;
    for (int64_t i = 0; i < n_all; ++i) total += c[i];
    if (total == 0) { mode[v] = 3; n_out[v] = 1; continue; }

    mode[v] = 0;
    if (haploid) {
      if (w + n_all > max_probs) return -1;
      for (int64_t g1 = 0; g1 < n_all; ++g1) {
        int64_t truth = c[g1], error = total - truth;
        double log_prior = 2 * xlog(f[g1]);
        double log_post = log_binomial(truth + error, truth)
            + (double)truth * xlog(1.0f - er)
            + (double)error * xlog(er / (float)(n_all - 1));
        probs[w++] = store(log_prior + log_post);
      }
      n_out[v] = (int32_t)n_all;
    } else {
      int64_t cnt = n_all * (n_all + 1) / 2;
      if (w + cnt > max_probs) return -1;
      for (int64_t g1 = 0; g1 < n_all; ++g1) {
        for (int64_t g2 = g1; g2 < n_all; ++g2) {
          double log_prior, log_post;
          if (g1 == g2) {
            log_prior = 2 * xlog(f[g1]);
            int64_t truth = c[g1], error = total - truth;
            log_post = log_binomial(truth + error, truth)
                + (double)truth * xlog(1.0f - er)
                + (double)error * xlog(er / (float)(n_all - 1));
          } else {
            log_prior = xlog(2.0f * f[g1] * f[g2]);
            int64_t t1 = c[g1], t2 = c[g2];
            int64_t error = total - t1 - t2;
            log_post = log_binomial(t1 + t2 + error, t1 + t2)
                + log_binomial(t1 + t2, t1)
                + (double)t1 * xlog((1.0f - er) / 2.0f)
                + (double)t2 * xlog((1.0f - er) / 2.0f);
            if (n_all > 2)
              log_post += (double)error * xlog(er / (float)(n_all - 2));
          }
          probs[w++] = store(log_prior + log_post);
        }
      }
      n_out[v] = (int32_t)cnt;
    }
  }
  return w;
}

}  // extern "C"

// Exclusive popcount scan over the Bloom bit words: rank[i] = number of
// set bits in words[0..i).  This is the rank_support_v rebuild the
// genotyper does at switch_mode/load (reference bloom_filter.hpp:93-98);
// one memory-bandwidth-bound pass here replaces numpy's bitwise_count +
// cumsum double pass.  Returns the total popcount.
uint64_t malva_bf_rank(const uint32_t* words, int64_t n, uint32_t* rank) {
  uint64_t acc = 0;
  for (int64_t i = 0; i < n; ++i) {
    rank[i] = (uint32_t)acc;
    acc += (uint64_t)__builtin_popcount(words[i]);
  }
  return acc;
}

}  // extern "C"
