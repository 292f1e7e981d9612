// Native WordPiece tokenizer for the data pipeline hot path.
//
// Implements the ASCII fast path of BERT basic+WordPiece tokenization
// (lowercase, punctuation split, greedy longest-match WordPiece). The Python
// wrapper (multimodal_uncertainty_tpu/data/native.py) routes non-ASCII texts
// to the pure-Python tokenizer, so end-to-end results are identical to the
// HF-parity Python implementation while bulk ASCII text (Food-101 captions
// are pre-cleaned lowercase ASCII) tokenizes at C++ speed.
//
// C ABI only — loaded via ctypes; no pybind11 in this environment.

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int> vocab;
  int unk_id = 0;
  int cls_id = 0;
  int sep_id = 0;
  bool lower = true;
  size_t max_word_chars = 100;
};

inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
         (c >= 123 && c <= 126);
}

inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

inline bool is_control(unsigned char c) {
  // matches Python's unicodedata Cc handling for ASCII: 0x00-0x1F (minus
  // whitespace) and DEL (0x7F)
  return (c < 32 && !is_space(c)) || c == 127;
}

// basic tokenize: clean, lowercase, split on whitespace + punctuation
void basic_tokenize(const Tokenizer& tok, const char* text,
                    std::vector<std::string>* out) {
  std::string cur;
  const auto flush = [&]() {
    if (!cur.empty()) {
      out->push_back(cur);
      cur.clear();
    }
  };
  for (const char* p = text; *p; ++p) {
    unsigned char c = static_cast<unsigned char>(*p);
    if (c == 0 || is_control(c)) continue;
    if (is_space(c)) {
      flush();
      continue;
    }
    if (is_ascii_punct(c)) {
      flush();
      out->push_back(std::string(1, static_cast<char>(c)));
      continue;
    }
    cur.push_back(tok.lower && c >= 'A' && c <= 'Z'
                      ? static_cast<char>(c - 'A' + 'a')
                      : static_cast<char>(c));
  }
  flush();
}

// greedy longest-match WordPiece on one basic token
void wordpiece(const Tokenizer& tok, const std::string& word,
               std::vector<int>* out_ids) {
  if (word.size() > tok.max_word_chars) {
    out_ids->push_back(tok.unk_id);
    return;
  }
  size_t start = 0;
  std::vector<int> pieces;
  while (start < word.size()) {
    size_t end = word.size();
    int cur = -1;
    std::string sub;
    while (start < end) {
      sub.assign(word, start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = tok.vocab.find(sub);
      if (it != tok.vocab.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out_ids->push_back(tok.unk_id);
      return;
    }
    pieces.push_back(cur);
    start = end;
  }
  out_ids->insert(out_ids->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

void* mmu_tokenizer_create(const char* vocab_path, int do_lower_case) {
  auto* tok = new Tokenizer();
  tok->lower = do_lower_case != 0;
  std::ifstream f(vocab_path);
  if (!f.good()) {
    delete tok;
    return nullptr;
  }
  std::string line;
  int idx = 0;
  while (std::getline(f, line)) {
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    if (!line.empty()) tok->vocab.emplace(line, idx);
    ++idx;
  }
  auto find_or = [&](const char* t, int d) {
    auto it = tok->vocab.find(t);
    return it == tok->vocab.end() ? d : it->second;
  };
  tok->unk_id = find_or("[UNK]", 0);
  tok->cls_id = find_or("[CLS]", 0);
  tok->sep_id = find_or("[SEP]", 0);
  return tok;
}

void mmu_tokenizer_destroy(void* handle) {
  delete static_cast<Tokenizer*>(handle);
}

// Tokenize one text into ids. Returns the number of ids produced (<= max_ids;
// output truncated at max_ids, count still reflects the truncated length).
int mmu_tokenize(void* handle, const char* text, int* out_ids, int max_ids) {
  const auto& tok = *static_cast<Tokenizer*>(handle);
  std::vector<std::string> words;
  basic_tokenize(tok, text, &words);
  std::vector<int> ids;
  ids.reserve(words.size() * 2);
  for (const auto& w : words) wordpiece(tok, w, &ids);
  int n = static_cast<int>(ids.size());
  int keep = n < max_ids ? n : max_ids;
  std::memcpy(out_ids, ids.data(), keep * sizeof(int));
  return keep;
}

// Batch-encode: texts are \0-separated in one buffer with offsets.
// Writes [n, max_len] int64 id + mask arrays (CLS/SEP optional).
void mmu_encode_batch(void* handle, const char* buffer, const long long* offsets,
                      int n, int max_len, int add_cls_sep, long long* out_ids,
                      long long* out_mask) {
  const auto& tok = *static_cast<Tokenizer*>(handle);
  std::vector<int> scratch(max_len);
  for (int i = 0; i < n; ++i) {
    const char* text = buffer + offsets[i];
    int budget = add_cls_sep ? max_len - 2 : max_len;
    int count = mmu_tokenize(handle, text, scratch.data(), budget);
    long long* ids = out_ids + static_cast<long long>(i) * max_len;
    long long* mask = out_mask + static_cast<long long>(i) * max_len;
    int pos = 0;
    if (add_cls_sep) ids[pos++] = tok.cls_id;
    for (int j = 0; j < count; ++j) ids[pos++] = scratch[j];
    if (add_cls_sep) ids[pos++] = tok.sep_id;
    for (int j = 0; j < pos; ++j) mask[j] = 1;
    for (int j = pos; j < max_len; ++j) {
      ids[j] = 0;
      mask[j] = 0;
    }
  }
}

}  // extern "C"
