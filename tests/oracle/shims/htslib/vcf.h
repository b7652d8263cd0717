// Minimal text-VCF stand-in for the htslib APIs the reference genotyper
// uses, written from htslib's documented behavior so the reference can be
// compiled unmodified as a test oracle.  Covers: gz/plain VCF reading,
// sample subsetting, GT extraction with htslib's encoding
// ((allele+1)<<1 | phased, '.'-> -1, vector_end padding at the record's
// max ploidy across ALL samples), INFO float extraction, and header
// rewrite (append missing FORMAT/INFO lines, replace samples).
#ifndef ORACLE_HTSLIB_VCF_H
#define ORACLE_HTSLIB_VCF_H

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <iomanip>
#include <map>
#include <string>
#include <vector>
#include <zlib.h>

#ifndef KSTRING_T
#define KSTRING_T kstring_t
typedef struct __kstring_t { size_t l, m; char* s; } kstring_t;
#endif

#define BCF_UN_STR 1
#define bcf_int32_vector_end (INT32_MIN + 1)
#define bcf_gt_allele(val) (((val) >> 1) - 1)
#define bcf_gt_is_phased(idx) ((idx) & 1)
#define bcf_hdr_nsamples(hdr) ((int)(hdr)->sel.size())

struct bcf_hdr_t {
  std::vector<std::string> meta;        // "##..." lines in order
  std::vector<std::string> all_samples; // #CHROM columns 10+
  std::vector<int> sel;                 // selected original sample indices
  std::vector<std::string> contigs;     // rid -> name
  std::map<std::string, int> contig_id;
};

struct bcf_dec_t {
  char* id;
  char** allele;
};

struct bcf1_t {
  int rid = 0;
  int64_t pos = 0;
  float qual = 0;
  int n_allele = 0;
  bcf_dec_t d{nullptr, nullptr};
  // storage
  std::string id_s;
  std::vector<std::string> alleles_s;
  std::vector<char*> allele_ptrs;
  std::string info_s, fmt_s;
  std::vector<std::string> sample_s;
};

struct htsFile {
  gzFile fp = nullptr;
  bcf_hdr_t* hdr = nullptr;  // parsed at bcf_hdr_read
  std::string pending;
};

// ---------------------------------------------------------------------------

static inline htsFile* bcf_open(const char* path, const char*) {
  gzFile f = gzopen(path, "r");
  if (!f) return nullptr;
  htsFile* h = new htsFile();
  h->fp = f;
  return h;
}

static inline void bcf_close(htsFile* h) {
  if (!h) return;
  if (h->fp) gzclose(h->fp);
  delete h;
}

static inline bool oracle_getline(gzFile f, std::string& out) {
  out.clear();
  char buf[1 << 16];
  while (gzgets(f, buf, sizeof buf)) {
    out.append(buf);
    if (!out.empty() && out.back() == '\n') break;
  }
  while (!out.empty() && (out.back() == '\n' || out.back() == '\r')) out.pop_back();
  return !out.empty() || gzeof(f) == 0;
}

static inline bcf_hdr_t* bcf_hdr_read(htsFile* h) {
  bcf_hdr_t* hdr = new bcf_hdr_t();
  std::string line;
  while (oracle_getline(h->fp, line)) {
    if (line.rfind("##", 0) == 0) {
      hdr->meta.push_back(line);
      if (line.rfind("##contig=<ID=", 0) == 0) {
        size_t s = strlen("##contig=<ID=");
        size_t e = line.find_first_of(",>", s);
        std::string name = line.substr(s, e - s);
        if (!hdr->contig_id.count(name)) {
          hdr->contig_id[name] = (int)hdr->contigs.size();
          hdr->contigs.push_back(name);
        }
      }
    } else if (line.rfind("#CHROM", 0) == 0) {
      std::vector<std::string> cols;
      size_t start = 0;
      while (start <= line.size()) {
        size_t tab = line.find('\t', start);
        cols.push_back(line.substr(start, tab == std::string::npos ? std::string::npos : tab - start));
        if (tab == std::string::npos) break;
        start = tab + 1;
      }
      for (size_t i = 9; i < cols.size(); ++i) hdr->all_samples.push_back(cols[i]);
      break;
    } else if (line.empty() && gzeof(h->fp)) {
      break;
    }
  }
  for (size_t i = 0; i < hdr->all_samples.size(); ++i) hdr->sel.push_back((int)i);
  h->hdr = hdr;
  return hdr;
}

static inline void bcf_hdr_destroy(bcf_hdr_t* hdr) { delete hdr; }

static inline int bcf_hdr_set_samples(bcf_hdr_t* hdr, const char* samples, int is_file) {
  hdr->sel.clear();
  if (samples == nullptr) return 0;  // htslib: NULL drops all samples
  std::vector<std::string> want;
  if (strcmp(samples, "-") == 0) {
    for (size_t i = 0; i < hdr->all_samples.size(); ++i) hdr->sel.push_back((int)i);
    return 0;
  }
  if (is_file) {
    FILE* f = fopen(samples, "r");
    if (!f) return -1;
    char buf[4096];
    while (fgets(buf, sizeof buf, f)) {
      std::string s(buf);
      while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
      if (!s.empty()) want.push_back(s);
    }
    fclose(f);
  } else {
    std::string s(samples), tok;
    for (char c : s) {
      if (c == ',') { if (!tok.empty()) want.push_back(tok); tok.clear(); }
      else tok += c;
    }
    if (!tok.empty()) want.push_back(tok);
  }
  for (size_t wi = 0; wi < want.size(); ++wi) {
    int found = -1;
    for (size_t i = 0; i < hdr->all_samples.size(); ++i)
      if (hdr->all_samples[i] == want[wi]) { found = (int)i; break; }
    if (found < 0) return (int)wi + 1;  // htslib: index of first bad sample
    hdr->sel.push_back(found);
  }
  return 0;
}

static inline bcf1_t* bcf_init() { return new bcf1_t(); }
static inline void bcf_destroy(bcf1_t* r) { delete r; }
static inline void bcf_unpack(bcf1_t*, int) {}

static inline int bcf_read(htsFile* h, bcf_hdr_t* hdr, bcf1_t* rec) {
  std::string line;
  do {
    if (!oracle_getline(h->fp, line)) return -1;
    if (line.empty() && gzeof(h->fp)) return -1;
  } while (line.empty() || line[0] == '#');

  std::vector<std::string> cols;
  size_t start = 0;
  while (start <= line.size()) {
    size_t tab = line.find('\t', start);
    cols.push_back(line.substr(start, tab == std::string::npos ? std::string::npos : tab - start));
    if (tab == std::string::npos) break;
    start = tab + 1;
  }
  if (cols.size() < 8) return -1;

  if (!hdr->contig_id.count(cols[0])) {
    hdr->contig_id[cols[0]] = (int)hdr->contigs.size();
    hdr->contigs.push_back(cols[0]);
  }
  rec->rid = hdr->contig_id[cols[0]];
  rec->pos = atoll(cols[1].c_str()) - 1;
  rec->id_s = cols[2];
  rec->alleles_s.clear();
  rec->alleles_s.push_back(cols[3]);
  if (cols[4] != ".") {
    start = 0;
    const std::string& alt = cols[4];
    while (start <= alt.size()) {
      size_t comma = alt.find(',', start);
      rec->alleles_s.push_back(alt.substr(start, comma == std::string::npos ? std::string::npos : comma - start));
      if (comma == std::string::npos) break;
      start = comma + 1;
    }
  }
  rec->n_allele = (int)rec->alleles_s.size();
  rec->allele_ptrs.clear();
  for (auto& a : rec->alleles_s) rec->allele_ptrs.push_back(const_cast<char*>(a.c_str()));
  rec->d.id = const_cast<char*>(rec->id_s.c_str());
  rec->d.allele = rec->allele_ptrs.data();
  rec->qual = (cols[5] == "." || cols[5].empty()) ? std::nanf("") : strtof(cols[5].c_str(), nullptr);
  rec->info_s = cols.size() > 7 ? cols[7] : ".";
  rec->fmt_s = cols.size() > 8 ? cols[8] : "";
  rec->sample_s.assign(cols.begin() + (cols.size() > 9 ? 9 : cols.size()), cols.end());
  return 0;
}

static inline const char* bcf_hdr_id2name(const bcf_hdr_t* hdr, int rid) {
  return hdr->contigs[rid].c_str();
}

static inline int bcf_get_info_float(const bcf_hdr_t*, bcf1_t* rec, const char* key,
                                     float** dst, int* ndst) {
  const std::string& info = rec->info_s;
  size_t klen = strlen(key);
  size_t pos = 0;
  while (pos < info.size()) {
    size_t end = info.find(';', pos);
    if (end == std::string::npos) end = info.size();
    if (end - pos > klen && info.compare(pos, klen, key) == 0 && info[pos + klen] == '=') {
      std::string val = info.substr(pos + klen + 1, end - pos - klen - 1);
      std::vector<float> vals;
      size_t s = 0;
      while (s <= val.size()) {
        size_t comma = val.find(',', s);
        std::string tok = val.substr(s, comma == std::string::npos ? std::string::npos : comma - s);
        vals.push_back(tok == "." ? std::nanf("") : strtof(tok.c_str(), nullptr));
        if (comma == std::string::npos) break;
        s = comma + 1;
      }
      int n = (int)vals.size();
      if (*dst == nullptr || *ndst < n) {
        *dst = (float*)realloc(*dst, n * sizeof(float));
        *ndst = n;
      }
      memcpy(*dst, vals.data(), n * sizeof(float));
      return n;
    }
    pos = end + 1;
  }
  return -3;  // tag not present
}

static inline void oracle_parse_gt(const std::string& gt, std::vector<int32_t>& out) {
  out.clear();
  size_t i = 0;
  int phased = 0;
  if (!gt.empty() && (gt[0] == '|' || gt[0] == '/')) {
    phased = gt[0] == '|';
    i = 1;
  }
  std::string tok;
  auto push = [&](int ph) {
    if (tok == "." || tok.empty()) out.push_back(0 | ph);
    else out.push_back(((atoi(tok.c_str()) + 1) << 1) | ph);
    tok.clear();
  };
  for (; i < gt.size(); ++i) {
    char c = gt[i];
    if (c == '|' || c == '/') {
      push(phased);
      phased = c == '|';
    } else {
      tok += c;
    }
  }
  push(phased);
}

static inline int bcf_get_genotypes(const bcf_hdr_t* hdr, bcf1_t* rec, int32_t** dst, int* ndst) {
  if (rec->fmt_s.empty() || hdr->sel.empty()) return -3;
  // find GT position in FORMAT
  int gt_at = -1, fi = 0;
  {
    size_t s = 0;
    while (s <= rec->fmt_s.size()) {
      size_t colon = rec->fmt_s.find(':', s);
      std::string k = rec->fmt_s.substr(s, colon == std::string::npos ? std::string::npos : colon - s);
      if (k == "GT") { gt_at = fi; break; }
      ++fi;
      if (colon == std::string::npos) break;
      s = colon + 1;
    }
  }
  if (gt_at < 0) return -3;

  // max ploidy across ALL samples in the record (htslib parses the full
  // record before subsetting)
  std::vector<std::vector<int32_t>> parsed(rec->sample_s.size());
  int ploidy = 0;
  for (size_t i = 0; i < rec->sample_s.size(); ++i) {
    const std::string& f = rec->sample_s[i];
    std::string gt;
    size_t s = 0;
    for (int j = 0; j <= gt_at; ++j) {
      size_t colon = f.find(':', s);
      if (j == gt_at) gt = f.substr(s, colon == std::string::npos ? std::string::npos : colon - s);
      if (colon == std::string::npos) break;
      s = colon + 1;
    }
    oracle_parse_gt(gt, parsed[i]);
    if ((int)parsed[i].size() > ploidy) ploidy = (int)parsed[i].size();
  }

  int n = (int)hdr->sel.size();
  int total = n * ploidy;
  if (*dst == nullptr || *ndst < total) {
    *dst = (int32_t*)realloc(*dst, total * sizeof(int32_t));
    *ndst = total;
  }
  for (int i = 0; i < n; ++i) {
    const std::vector<int32_t>& p = parsed[hdr->sel[i]];
    for (int j = 0; j < ploidy; ++j)
      (*dst)[i * ploidy + j] = j < (int)p.size() ? p[j] : bcf_int32_vector_end;
  }
  return total;
}

// -- header rewrite ---------------------------------------------------------

static inline int bcf_hdr_append(bcf_hdr_t* hdr, const char* line) {
  // skip if a definition with the same type+ID already exists
  const char* id = strstr(line, "<ID=");
  if (id) {
    size_t tlen = (size_t)(strchr(line, '=') - line);  // "##FORMAT" etc.
    std::string prefix(line, tlen + 1);                // "##FORMAT="
    const char* idend = strpbrk(id + 4, ",>");
    std::string ident(id + 4, idend - (id + 4));
    std::string probe = prefix + "<ID=" + ident;
    for (auto& m : hdr->meta) {
      if (m.rfind(probe, 0) == 0 &&
          (m.size() == probe.size() || m[probe.size()] == ',' || m[probe.size()] == '>'))
        return 0;
    }
  }
  hdr->meta.push_back(line);
  return 0;
}

static inline int bcf_hdr_add_sample(bcf_hdr_t* hdr, const char* name) {
  hdr->all_samples.push_back(name);
  return 0;
}

static inline int bcf_hdr_sync(bcf_hdr_t*) { return 0; }

static inline int bcf_hdr_format(const bcf_hdr_t* hdr, int, kstring_t* str) {
  std::string out;
  for (auto& m : hdr->meta) { out += m; out += '\n'; }
  out += "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO";
  if (!hdr->sel.empty()) {
    out += "\tFORMAT";
    for (int i : hdr->sel) { out += '\t'; out += hdr->all_samples[i]; }
  }
  out += '\n';
  str->s = (char*)malloc(out.size() + 1);
  memcpy(str->s, out.c_str(), out.size() + 1);
  str->l = out.size();
  str->m = out.size() + 1;
  return 0;
}

#endif
