// Native corpus ingest for strutopy_tpu.
//
// The reference is pure Python end-to-end (SURVEY.md: no native code
// exists upstream); this library is the framework's native data-path
// component: it parses MatrixMarket BoW corpora and packs ragged
// documents into the padded (words, counts) device layout at C++
// speed, so multi-GB corpora don't bottleneck on the Python loop in
// corpus/bow.py.  Exposed via a C ABI consumed with ctypes
// (strutopy_tpu/corpus/native.py).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Corpus {
  // CSR-ish: per-document ranges into (words, counts)
  std::vector<int64_t> doc_offsets;  // n_docs + 1
  std::vector<int32_t> words;
  std::vector<float> counts;
  int64_t n_docs = 0;
  int64_t n_terms = 0;
  std::string error;
};

}  // namespace

extern "C" {

// Parse a MatrixMarket coordinate file (1-based doc/term ids, gensim
// MmCorpus convention).  Returns an opaque handle (nullptr on error).
void* stm_mm_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* c = new Corpus();

  char line[1 << 16];
  if (!std::fgets(line, sizeof line, f) ||
      std::strncmp(line, "%%MatrixMarket", 14) != 0) {
    c->error = "not a MatrixMarket file";
    std::fclose(f);
    return c;
  }
  // skip comments
  do {
    if (!std::fgets(line, sizeof line, f)) {
      c->error = "truncated header";
      std::fclose(f);
      return c;
    }
  } while (line[0] == '%');

  long long n_docs = 0, n_terms = 0, nnz = 0;
  if (std::sscanf(line, "%lld %lld %lld", &n_docs, &n_terms, &nnz) != 3 ||
      n_docs < 0 || n_terms < 0 || nnz < 0) {
    // negative sizes would wrap to huge size_t in assign/reserve below
    // and the bad_alloc would escape the C ABI (std::terminate)
    c->error = "bad size line";
    std::fclose(f);
    return c;
  }
  c->n_docs = n_docs;
  c->n_terms = n_terms;

  std::vector<int64_t> di;
  di.reserve(nnz);
  c->words.reserve(nnz);
  c->counts.reserve(nnz);
  long long i, j;
  double v;
  while (std::fgets(line, sizeof line, f)) {
    if (line[0] == '\n' || line[0] == '\r' || line[0] == '\0') continue;
    if (std::sscanf(line, "%lld %lld %lf", &i, &j, &v) != 3) {
      // match the python reader: a malformed line is an error, not a
      // silently dropped entry
      c->error = "unparseable data line: " + std::string(line).substr(0, 80);
      std::fclose(f);
      return c;
    }
    // File-supplied indices are untrusted: an out-of-range doc id would
    // scatter out of bounds below (heap corruption), and a term id
    // >= n_terms would propagate word ids >= V into the fit path where
    // XLA's clamped gather silently corrupts results.
    if (i < 1 || i > n_docs || j < 1 || j > n_terms) {
      c->error = "entry (" + std::to_string(i) + ", " + std::to_string(j) +
                 ") outside the declared " + std::to_string(n_docs) + " x " +
                 std::to_string(n_terms) + " matrix";
      std::fclose(f);
      return c;
    }
    di.push_back(i - 1);
    c->words.push_back(static_cast<int32_t>(j - 1));
    c->counts.push_back(static_cast<float>(v));
  }
  std::fclose(f);
  if (static_cast<long long>(di.size()) != nnz) {
    // truncation at a line boundary passes every per-entry check; the
    // declared count is the only witness (python read_mm agrees)
    c->error = "header declares " + std::to_string(nnz) +
               " entries but the file contains " +
               std::to_string(di.size());
    return c;
  }

  // entries may be unsorted by document: counting sort into offsets
  c->doc_offsets.assign(n_docs + 1, 0);
  for (int64_t d : di) c->doc_offsets[d + 1]++;
  for (int64_t d = 0; d < n_docs; ++d) c->doc_offsets[d + 1] += c->doc_offsets[d];
  std::vector<int32_t> w2(c->words.size());
  std::vector<float> c2(c->counts.size());
  std::vector<int64_t> cursor(c->doc_offsets.begin(), c->doc_offsets.end() - 1);
  for (size_t k = 0; k < di.size(); ++k) {
    int64_t pos = cursor[di[k]]++;
    w2[pos] = c->words[k];
    c2[pos] = c->counts[k];
  }
  c->words.swap(w2);
  c->counts.swap(c2);
  return c;
}

int64_t stm_corpus_n_docs(void* h) { return static_cast<Corpus*>(h)->n_docs; }
int64_t stm_corpus_n_terms(void* h) { return static_cast<Corpus*>(h)->n_terms; }

// Maximum number of entries in any document (for choosing L).
int64_t stm_corpus_max_len(void* h) {
  auto* c = static_cast<Corpus*>(h);
  int64_t m = 0;
  for (int64_t d = 0; d < c->n_docs; ++d)
    m = std::max(m, c->doc_offsets[d + 1] - c->doc_offsets[d]);
  return m;
}

const char* stm_corpus_error(void* h) {
  auto* c = static_cast<Corpus*>(h);
  return c->error.empty() ? nullptr : c->error.c_str();
}

// Fill caller-allocated padded arrays: words_out/counts_out are
// (n_docs, L) row-major; doc_ok_out is (n_docs,) uint8.
// Returns 0 on success, -1 if L is too small.
int32_t stm_corpus_pad(void* h, int64_t L, int32_t* words_out,
                       float* counts_out, uint8_t* doc_ok_out) {
  auto* c = static_cast<Corpus*>(h);
  std::memset(words_out, 0, sizeof(int32_t) * c->n_docs * L);
  std::memset(counts_out, 0, sizeof(float) * c->n_docs * L);
  for (int64_t d = 0; d < c->n_docs; ++d) {
    int64_t b = c->doc_offsets[d], e = c->doc_offsets[d + 1];
    int64_t len = e - b;
    if (len > L) return -1;
    for (int64_t k = 0; k < len; ++k) {
      words_out[d * L + k] = c->words[b + k];
      counts_out[d * L + k] = c->counts[b + k];
    }
    doc_ok_out[d] = len > 0 ? 1 : 0;
  }
  return 0;
}

void stm_corpus_free(void* h) { delete static_cast<Corpus*>(h); }

// Pack a ragged COO corpus (doc_idx sorted or not) into padded arrays
// directly from caller buffers — the fast path for in-memory BoW.
// Returns max doc len, -1 on a bad doc index, or -2 on a bad word id
// (>= n_terms or negative: XLA's clamped gather would silently corrupt
// the fit downstream, same invariant as stm_mm_open above).
int64_t stm_pack_coo(const int64_t* doc_idx, const int32_t* word_idx,
                     const float* count, int64_t nnz, int64_t n_docs,
                     int64_t n_terms, int64_t L, int32_t* words_out,
                     float* counts_out, uint8_t* doc_ok_out) {
  std::vector<int64_t> lens(n_docs, 0);
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t d = doc_idx[k];
    if (d < 0 || d >= n_docs) return -1;
    if (word_idx[k] < 0 || word_idx[k] >= n_terms) return -2;
    lens[d]++;
  }
  int64_t maxlen = 0;
  for (int64_t d = 0; d < n_docs; ++d) maxlen = std::max(maxlen, lens[d]);
  if (maxlen > L) return maxlen;  // caller re-allocates with bigger L
  std::memset(words_out, 0, sizeof(int32_t) * n_docs * L);
  std::memset(counts_out, 0, sizeof(float) * n_docs * L);
  std::memset(doc_ok_out, 0, n_docs);
  std::vector<int64_t> cursor(n_docs, 0);
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t d = doc_idx[k];
    int64_t pos = cursor[d]++;
    words_out[d * L + pos] = word_idx[k];
    counts_out[d * L + pos] = count[k];
    doc_ok_out[d] = 1;
  }
  return maxlen;
}

}  // extern "C"
