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
