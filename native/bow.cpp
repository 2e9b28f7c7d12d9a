// Native corpus construction: lowered UTF-8 texts -> BoW + vocabulary.
//
// The hot loop of strutopy_tpu/corpus/preprocess.py::build_corpus
// (reference src/02_create_corpus.py:11-44): punctuation/digit
// stripping, whitespace splitting, stopword/min-length filtering,
// document-frequency vocabulary pruning and per-doc counting — one
// pass in C++ instead of per-token python dict work.
//
// Parity contract with the python path (tests/test_native_bow.py):
//   * the caller lowercases and normalizes unicode whitespace to ' '
//     in python first (both are C-speed there; unicode case tables
//     don't belong in this file);
//   * ASCII punctuation + digits split tokens (python's regex is also
//     ASCII-only: string.punctuation);
//   * min_len counts CODEPOINTS (UTF-8 lead bytes), matching python's
//     len(str);
//   * vocabulary sorts by byte order == codepoint order for UTF-8.
//
// C ABI (ctypes, strutopy_tpu/corpus/native.py); python fallback stays.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct BowResult {
  std::string error;
  std::string vocab_blob;            // '\n'-joined sorted kept tokens
  int64_t vocab_size = 0;
  std::vector<int64_t> doc_offsets;  // n_docs + 1
  std::vector<int32_t> idx;          // nnz term ids (sorted per doc)
  std::vector<float> cnt;            // nnz counts

  // intermediate (freed after finalize)
  std::vector<std::string> tokens;   // tid -> token
  std::vector<int64_t> doc_freq;     // tid -> #docs containing it
};

inline bool is_split_byte(unsigned char c) {
  // ASCII whitespace, punctuation and digits all split; bytes >= 0x80
  // (UTF-8 continuation/lead) are letter-like and never split.
  // Punctuation is the fixed ASCII set of python's string.punctuation
  // (the parity contract with the python path) — NOT std::ispunct,
  // whose result is locale-dependent (ADVICE r2).
  if (c >= 0x80) return false;
  if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v')
    return true;
  if (c >= '0' && c <= '9') return true;
  return (c >= 0x21 && c <= 0x2F) ||  // !"#$%&'()*+,-./
         (c >= 0x3A && c <= 0x40) ||  // :;<=>?@
         (c >= 0x5B && c <= 0x60) ||  // [\]^_`
         (c >= 0x7B && c <= 0x7E);    // {|}~
}

inline int64_t codepoints(const char* s, size_t n) {
  int64_t k = 0;
  for (size_t i = 0; i < n; ++i)
    if ((static_cast<unsigned char>(s[i]) & 0xC0) != 0x80) ++k;  // lead bytes
  return k;
}

}  // namespace

extern "C" {

void* stm_bow_build(const char* blob, const int64_t* offs, int64_t n_docs,
                    const char* stop_blob, int32_t min_len,
                    int64_t min_doc_freq, double max_doc_frac) {
  auto* r = new BowResult();
  if (n_docs < 0 || !blob || !offs) {
    r->error = "bad arguments";
    return r;
  }

  std::unordered_set<std::string> stop;
  if (stop_blob) {
    const char* p = stop_blob;
    while (*p) {
      const char* nl = std::strchr(p, '\n');
      size_t len = nl ? static_cast<size_t>(nl - p) : std::strlen(p);
      if (len) stop.emplace(p, len);
      if (!nl) break;
      p = nl + 1;
    }
  }

  std::unordered_map<std::string, int32_t> tid;
  std::vector<std::unordered_map<int32_t, int32_t>> doc_counts(n_docs);
  std::vector<int32_t> last_doc;  // tid -> last doc that counted its df

  std::string tok;
  for (int64_t d = 0; d < n_docs; ++d) {
    const char* s = blob + offs[d];
    const char* e = blob + offs[d + 1];
    if (offs[d] > offs[d + 1]) {
      r->error = "offsets not monotone";
      return r;
    }
    auto& counts = doc_counts[d];
    const char* t0 = nullptr;
    for (const char* p = s;; ++p) {
      bool split = (p == e) || is_split_byte(static_cast<unsigned char>(*p));
      if (!split) {
        if (!t0) t0 = p;
      } else if (t0) {
        size_t len = static_cast<size_t>(p - t0);
        if (codepoints(t0, len) >= min_len) {
          tok.assign(t0, len);
          if (stop.find(tok) == stop.end()) {
            auto it = tid.find(tok);
            int32_t id;
            if (it == tid.end()) {
              id = static_cast<int32_t>(r->tokens.size());
              tid.emplace(tok, id);
              r->tokens.push_back(tok);
              r->doc_freq.push_back(0);
              last_doc.push_back(-1);
            } else {
              id = it->second;
            }
            ++counts[id];
            if (last_doc[id] != static_cast<int32_t>(d)) {
              last_doc[id] = static_cast<int32_t>(d);
              ++r->doc_freq[id];
            }
          }
        }
        t0 = nullptr;
      }
      if (p == e) break;
    }
  }

  // document-frequency pruning + sorted re-index (python: sorted(keep))
  const double max_df = max_doc_frac * static_cast<double>(n_docs);
  std::vector<int32_t> kept;
  kept.reserve(r->tokens.size());
  for (size_t t = 0; t < r->tokens.size(); ++t)
    if (r->doc_freq[t] >= min_doc_freq &&
        static_cast<double>(r->doc_freq[t]) <= max_df)
      kept.push_back(static_cast<int32_t>(t));
  std::sort(kept.begin(), kept.end(), [&](int32_t a, int32_t b) {
    return r->tokens[a] < r->tokens[b];
  });
  std::vector<int32_t> remap(r->tokens.size(), -1);
  for (size_t i = 0; i < kept.size(); ++i) {
    remap[kept[i]] = static_cast<int32_t>(i);
    if (i) r->vocab_blob += '\n';
    r->vocab_blob += r->tokens[kept[i]];
  }
  r->vocab_size = static_cast<int64_t>(kept.size());

  r->doc_offsets.assign(1, 0);
  std::vector<std::pair<int32_t, int32_t>> row;
  for (int64_t d = 0; d < n_docs; ++d) {
    row.clear();
    for (const auto& kv : doc_counts[d]) {
      int32_t nid = remap[kv.first];
      if (nid >= 0) row.emplace_back(nid, kv.second);
    }
    std::sort(row.begin(), row.end());
    for (const auto& ic : row) {
      r->idx.push_back(ic.first);
      r->cnt.push_back(static_cast<float>(ic.second));
    }
    r->doc_offsets.push_back(static_cast<int64_t>(r->idx.size()));
  }

  r->tokens.clear();
  r->doc_freq.clear();
  return r;
}

const char* stm_bow_error(void* h) {
  auto* r = static_cast<BowResult*>(h);
  return r->error.empty() ? nullptr : r->error.c_str();
}

int64_t stm_bow_vocab_size(void* h) {
  return static_cast<BowResult*>(h)->vocab_size;
}

int64_t stm_bow_vocab_blob_len(void* h) {
  return static_cast<int64_t>(static_cast<BowResult*>(h)->vocab_blob.size());
}

void stm_bow_vocab_copy(void* h, char* out) {
  auto* r = static_cast<BowResult*>(h);
  std::memcpy(out, r->vocab_blob.data(), r->vocab_blob.size());
}

int64_t stm_bow_nnz(void* h) {
  return static_cast<int64_t>(static_cast<BowResult*>(h)->idx.size());
}

void stm_bow_doc_offsets(void* h, int64_t* out) {
  auto* r = static_cast<BowResult*>(h);
  std::memcpy(out, r->doc_offsets.data(),
              r->doc_offsets.size() * sizeof(int64_t));
}

void stm_bow_entries(void* h, int32_t* idx_out, float* cnt_out) {
  auto* r = static_cast<BowResult*>(h);
  std::memcpy(idx_out, r->idx.data(), r->idx.size() * sizeof(int32_t));
  std::memcpy(cnt_out, r->cnt.data(), r->cnt.size() * sizeof(float));
}

void stm_bow_free(void* h) { delete static_cast<BowResult*>(h); }

}  // extern "C"
