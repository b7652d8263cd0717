// Minimal stand-in for the sdsl-lite APIs the reference genotyper uses
// (bit_vector, rank_support_v<1>, int_vector<16>), written from the
// documented interface so the reference can be compiled as a test oracle.
// Serialization format is oracle-private (only read back by the oracle).
#ifndef ORACLE_SDSL_BIT_VECTORS_HPP
#define ORACLE_SDSL_BIT_VECTORS_HPP

#include <cstdint>
#include <cstring>
#include <istream>
#include <ostream>
#include <vector>

namespace sdsl {

class bit_vector {
 public:
  bit_vector() : n_(0) {}
  bit_vector(uint64_t n, int value) : words_((n + 63) / 64, value ? ~0ULL : 0ULL), n_(n) {}

  struct reference {
    uint64_t* w;
    int b;
    operator bool() const { return (*w >> b) & 1ULL; }
    reference& operator=(bool v) {
      if (v) *w |= 1ULL << b; else *w &= ~(1ULL << b);
      return *this;
    }
  };
  reference operator[](uint64_t i) { return reference{&words_[i >> 6], int(i & 63)}; }
  bool operator[](uint64_t i) const { return (words_[i >> 6] >> (i & 63)) & 1ULL; }
  uint64_t size() const { return n_; }
  const std::vector<uint64_t>& words() const { return words_; }

  void serialize(std::ostream& s) const {
    s.write(reinterpret_cast<const char*>(&n_), sizeof n_);
    s.write(reinterpret_cast<const char*>(words_.data()), words_.size() * 8);
  }
  void load(std::istream& s) {
    s.read(reinterpret_cast<char*>(&n_), sizeof n_);
    words_.assign((n_ + 63) / 64, 0);
    s.read(reinterpret_cast<char*>(words_.data()), words_.size() * 8);
  }

 private:
  std::vector<uint64_t> words_;
  uint64_t n_;
};

template <int t_b>
class rank_support_v {
 public:
  rank_support_v() : bv_(nullptr) {}
  explicit rank_support_v(const bit_vector* bv) : bv_(bv) {
    cum_.resize(bv->words().size() + 1, 0);
    for (size_t i = 0; i < bv->words().size(); ++i)
      cum_[i + 1] = cum_[i] + __builtin_popcountll(bv->words()[i]);
  }
  uint64_t operator()(uint64_t i) const {
    uint64_t w = i >> 6, b = i & 63;
    uint64_t mask = b ? ((1ULL << b) - 1) : 0ULL;
    return cum_[w] + __builtin_popcountll(bv_->words()[w] & mask);
  }

 private:
  const bit_vector* bv_;
  std::vector<uint64_t> cum_;
};

template <int t_w>
class int_vector {
 public:
  int_vector() {}
  int_vector(uint64_t n, uint16_t value, int /*width*/) : v_(n, value) {}
  uint16_t operator[](uint64_t i) const { return v_[i]; }
  uint16_t& operator[](uint64_t i) { return v_[i]; }
  uint64_t size() const { return v_.size(); }
  // sdsl-faithful layout: size in BITS (uint64), then data padded to
  // 64-bit words (fixed-width vectors carry no width byte).
  void serialize(std::ostream& s) const {
    uint64_t bits = v_.size() * t_w;
    s.write(reinterpret_cast<const char*>(&bits), sizeof bits);
    uint64_t nwords = (bits + 63) / 64;
    std::vector<uint64_t> buf(nwords, 0);
    memcpy(buf.data(), v_.data(), v_.size() * 2);
    s.write(reinterpret_cast<const char*>(buf.data()), nwords * 8);
  }
  void load(std::istream& s) {
    uint64_t bits = 0;
    s.read(reinterpret_cast<char*>(&bits), sizeof bits);
    uint64_t nwords = (bits + 63) / 64;
    std::vector<uint64_t> buf(nwords, 0);
    s.read(reinterpret_cast<char*>(buf.data()), nwords * 8);
    v_.assign(bits / t_w, 0);
    memcpy(v_.data(), buf.data(), v_.size() * 2);
  }

 private:
  std::vector<uint16_t> v_;
};

}  // namespace sdsl

#endif
