// Stand-in for the KMC listing API used by the reference (OpenForListing /
// Info / ReadNextKmer).  Instead of reading a KMC database, it counts the
// k-mers of the reads file itself (the "prefix" argument is the
// FASTA/FASTQ path) with KMC's default semantics: canonical k-mers, pure
// ACGT windows only, exclude count < 2 (ci), saturate at 255 (cs).
// k comes from MALVA_ORACLE_REFK (default 43).  This is an independent
// C++ implementation used only to build the test oracle.
#ifndef ORACLE_KMC_FILE_H
#define ORACLE_KMC_FILE_H

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <zlib.h>

typedef unsigned int uint32;
typedef unsigned long long uint64;

class CKmerAPI {
 public:
  explicit CKmerAPI(uint32 len) : k(len) {}
  void to_string(char* out) const { memcpy(out, cur.data(), cur.size()); out[cur.size()] = 0; }
  uint32 k;
  std::string cur;
};

class CKMCFile {
 public:
  bool OpenForListing(const std::string& path) {
    const char* env = getenv("MALVA_ORACLE_REFK");
    k_ = env ? (uint32)atoi(env) : 43u;
    uint32 ci = 2, cs = 255;
    if (const char* e = getenv("MALVA_ORACLE_CI")) ci = (uint32)atoi(e);
    if (const char* e = getenv("MALVA_ORACLE_CS")) cs = (uint32)atoi(e);

    gzFile f = gzopen(path.c_str(), "r");
    if (!f) return false;
    std::unordered_map<std::string, uint32> counts;
    std::string seq;
    char buf[1 << 16];
    bool fastq = false;
    int lineno_in_rec = 0;
    auto flush_seq = [&]() {
      add_seq(counts, seq, ci);
      seq.clear();
    };
    while (gzgets(f, buf, sizeof buf)) {
      size_t len = strlen(buf);
      while (len && (buf[len - 1] == '\n' || buf[len - 1] == '\r')) buf[--len] = 0;
      if (!len) continue;
      if (buf[0] == '>' || buf[0] == '@') {
        flush_seq();
        fastq = buf[0] == '@';
        lineno_in_rec = 0;
        continue;
      }
      if (fastq && buf[0] == '+' && lineno_in_rec == 1) {
        // skip the quality line(s): read until quality length >= seq length
        size_t qlen = 0, slen = seq.size();
        while (qlen < slen && gzgets(f, buf, sizeof buf)) {
          size_t l = strlen(buf);
          while (l && (buf[l - 1] == '\n' || buf[l - 1] == '\r')) --l;
          qlen += l;
        }
        flush_seq();
        lineno_in_rec = 0;
        continue;
      }
      seq.append(buf);
      lineno_in_rec = 1;
    }
    flush_seq();
    gzclose(f);

    listing_.clear();
    for (auto& kv : counts)
      if (kv.second >= ci) listing_.emplace_back(kv.first, std::min(kv.second, cs));
    pos_ = 0;
    return true;
  }

  void Info(uint32& klen, uint32& mode, uint32& min_counter, uint32& pref_len,
            uint32& sign_len, uint32& min_c, uint64& max_c, uint64& tot) {
    klen = k_; mode = 0; min_counter = 2; pref_len = 0; sign_len = 0; min_c = 2;
    max_c = 255; tot = listing_.size();
  }

  bool ReadNextKmer(CKmerAPI& obj, uint32& counter) {
    if (pos_ >= listing_.size()) return false;
    obj.cur = listing_[pos_].first;
    counter = listing_[pos_].second;
    ++pos_;
    return true;
  }

 private:
  static char comp(char c) {
    switch (c) { case 'A': return 'T'; case 'C': return 'G'; case 'G': return 'C'; case 'T': return 'A'; }
    return 0;
  }

  void add_seq(std::unordered_map<std::string, uint32>& counts, const std::string& raw, uint32) {
    if (raw.size() < k_) return;
    std::string s(raw);
    std::transform(s.begin(), s.end(), s.begin(), ::toupper);
    std::string rc(k_, 0), fwd;
    for (size_t i = 0; i + k_ <= s.size(); ++i) {
      bool ok = true;
      for (size_t j = i; j < i + k_; ++j) {
        char c = s[j];
        if (c != 'A' && c != 'C' && c != 'G' && c != 'T') { ok = false; break; }
      }
      if (!ok) continue;
      fwd.assign(s, i, k_);
      for (uint32 j = 0; j < k_; ++j) rc[j] = comp(fwd[k_ - 1 - j]);
      const std::string& canon = fwd < rc ? fwd : rc;
      auto& c = counts[canon];
      if (c < 0xFFFFFFFFu) ++c;
    }
  }

  uint32 k_ = 43;
  std::vector<std::pair<std::string, uint32>> listing_;
  size_t pos_ = 0;
};

#endif
