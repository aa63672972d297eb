// text_core.cpp — native tokenizer + snowball-3.0.1-english stemmer.
//
// Host-side native component of valkey_search_tpu: the text-ingest hot
// loop (punctuation split → ASCII case fold → stop words → stemming),
// the same pipeline the reference runs in C++ (src/indexes/text/lexer.cc
// over the vendored snowball C library). This stemmer is an independent
// C++ port of this repo's Python implementation of the published
// snowball 3.0.1 english algorithm (valkey_search_tpu/text/stemmer.py),
// validated against the same golden file.
//
// ASCII-only fast path: callers route non-ASCII documents through the
// Python lexer (rare; semantics identical).
//
// C ABI (ctypes): lexer_create / lexer_free / lexer_tokenize.
// Output buffer format: token '\0' stem '\0' ... (stem empty when equal
// to the token).

#include <algorithm>
#include <bitset>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

using std::size_t;
using std::string;

// ---------------------------------------------------------------------------
// snowball 3.0.1 english stemmer (see valkey_search_tpu/text/stemmer.py)
// ---------------------------------------------------------------------------

inline bool is_vowel(const string& w, size_t i) {
  const char c = w[i];
  return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y';
}

inline bool ends_with(const string& w, const char* suf) {
  const size_t n = std::strlen(suf);
  return w.size() >= n && std::memcmp(w.data() + w.size() - n, suf, n) == 0;
}

void mark_regions(const string& w, size_t* p1, size_t* p2) {
  static const char* kPrefixes[] = {"arsen", "commun", "emerg", "gener",
                                    "later", "organ",  "past",  "univers"};
  const size_t n = w.size();
  *p1 = n;
  *p2 = n;
  size_t start = n;
  bool matched = false;
  for (const char* pre : kPrefixes) {
    const size_t pl = std::strlen(pre);
    if (w.size() >= pl && std::memcmp(w.data(), pre, pl) == 0) {
      start = pl;
      matched = true;
      break;
    }
  }
  if (!matched) {
    size_t i = 0;
    while (i < n && !is_vowel(w, i)) ++i;
    while (i < n && is_vowel(w, i)) ++i;
    if (i >= n) return;
    start = i + 1;
  }
  *p1 = start;
  size_t i = *p1;
  while (i < n && !is_vowel(w, i)) ++i;
  while (i < n && is_vowel(w, i)) ++i;
  if (i < n) *p2 = i + 1;
}

bool ends_short_syllable(const string& w) {
  const size_t n = w.size();
  if (n >= 3 && !is_vowel(w, n - 3) && is_vowel(w, n - 2) &&
      !is_vowel(w, n - 1) && w[n - 1] != 'w' && w[n - 1] != 'x' &&
      w[n - 1] != 'Y')
    return true;
  if (n == 2 && is_vowel(w, 0) && !is_vowel(w, 1)) return true;
  if (ends_with(w, "past")) return true;
  return false;
}

bool has_vowel(const string& w, size_t end) {
  for (size_t i = 0; i < end && i < w.size(); ++i)
    if (is_vowel(w, i)) return true;
  return false;
}

// Whole-word exceptions.
const std::unordered_map<string, string>& exceptions() {
  static const auto* m = new std::unordered_map<string, string>{
      {"andes", "andes"}, {"atlas", "atlas"}, {"bias", "bias"},
      {"cosmos", "cosmos"}, {"howe", "howe"}, {"news", "news"},
      {"sky", "sky"}, {"skies", "sky"}, {"idly", "idl"},
      {"gently", "gentl"}, {"ugly", "ugli"}, {"early", "earli"},
      {"only", "onli"}, {"singly", "singl"}};
  return *m;
}

string stem_english(string w) {
  if (w.size() < 3) return w;
  {
    auto it = exceptions().find(w);
    if (it != exceptions().end()) return it->second;
  }
  if (w[0] == '\'') w.erase(0, 1);
  if (w.empty()) return w;

  bool y_found = false;
  if (w[0] == 'y') {
    w[0] = 'Y';
    y_found = true;
  }
  for (size_t i = 1; i < w.size(); ++i) {
    const char p = w[i - 1];
    if (w[i] == 'y' && (p == 'a' || p == 'e' || p == 'i' || p == 'o' ||
                        p == 'u' || p == 'y')) {
      w[i] = 'Y';
      y_found = true;
    }
  }

  size_t p1, p2;
  mark_regions(w, &p1, &p2);
  auto in_r1 = [&](size_t suf) { return w.size() - suf >= p1; };
  auto in_r2 = [&](size_t suf) { return w.size() - suf >= p2; };

  // Step 1a: possessives.
  if (ends_with(w, "'s'"))
    w.resize(w.size() - 3);
  else if (ends_with(w, "'s"))
    w.resize(w.size() - 2);
  else if (ends_with(w, "'"))
    w.resize(w.size() - 1);
  // Step 1a: plurals.
  if (ends_with(w, "sses")) {
    w.resize(w.size() - 2);
  } else if (ends_with(w, "ied") || ends_with(w, "ies")) {
    w.resize(w.size() - 3);
    w += (w.size() + 3 >= 5) ? "i" : "ie";
  } else if (ends_with(w, "us") || ends_with(w, "ss")) {
  } else if (ends_with(w, "s")) {
    if (w.size() >= 2 && has_vowel(w, w.size() - 2)) w.resize(w.size() - 1);
  }

  // Step 1b.
  static const char* k1b[] = {"eedly", "ingly", "edly", "eed", "ing", "ed"};
  const char* suf = nullptr;
  for (const char* s : k1b)
    if (ends_with(w, s)) {
      suf = s;
      break;
    }
  if (suf && (std::strcmp(suf, "eed") == 0 || std::strcmp(suf, "eedly") == 0)) {
    const string stem_part = w.substr(0, w.size() - std::strlen(suf));
    if (stem_part != "succ" && stem_part != "proc" && stem_part != "exc") {
      if (in_r1(std::strlen(suf))) {
        w.resize(w.size() - std::strlen(suf));
        w += "ee";
      }
    }
  } else if (suf) {
    bool handled = false;
    if (std::strcmp(suf, "ing") == 0) {
      const string stem_part = w.substr(0, w.size() - 3);
      if (stem_part == "even" || stem_part == "cann" || stem_part == "inn" ||
          stem_part == "earr" || stem_part == "herr" || stem_part == "out") {
        handled = true;
      } else if (stem_part.size() == 2 &&
                 (stem_part[1] == 'y' || stem_part[1] == 'Y') &&
                 !is_vowel(stem_part, 0)) {
        w = stem_part.substr(0, 1) + "ie";  // dying -> die
        handled = true;
      }
    }
    if (!handled) {
      const string stem_part = w.substr(0, w.size() - std::strlen(suf));
      if (has_vowel(stem_part, stem_part.size())) {
        w = stem_part;
        if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz")) {
          w += "e";
        } else if (ends_with(w, "bb") || ends_with(w, "dd") ||
                   ends_with(w, "ff") || ends_with(w, "gg") ||
                   ends_with(w, "mm") || ends_with(w, "nn") ||
                   ends_with(w, "pp") || ends_with(w, "rr") ||
                   ends_with(w, "tt")) {
          if (!(w.size() == 3 && (w[0] == 'a' || w[0] == 'e' || w[0] == 'o')))
            w.resize(w.size() - 1);
        } else if (w.size() == p1 && ends_short_syllable(w)) {
          w += "e";
        }
      }
    }
  }

  // Step 1c: y/Y -> i after a non-vowel that is not the first letter.
  if (w.size() > 2 && (w.back() == 'y' || w.back() == 'Y') &&
      !is_vowel(w, w.size() - 2)) {
    w.back() = 'i';
  }

  // Step 2 (longest suffix, in R1).
  {
    struct Rule { const char* s; const char* rep; };
    static const Rule k2[] = {
        {"ization", "ize"}, {"ational", "ate"}, {"fulness", "ful"},
        {"ousness", "ous"}, {"iveness", "ive"}, {"tional", "tion"},
        {"biliti", "ble"},  {"lessli", "less"}, {"entli", "ent"},
        {"ation", "ate"},   {"alism", "al"},    {"aliti", "al"},
        {"ousli", "ous"},   {"iviti", "ive"},   {"fulli", "ful"},
        {"ogist", "og"},    {"enci", "ence"},   {"anci", "ance"},
        {"abli", "able"},   {"izer", "ize"},    {"ator", "ate"},
        {"alli", "al"},     {"ogi", nullptr},   {"bli", "ble"},
        {"li", nullptr}};
    for (const Rule& r : k2) {
      if (!ends_with(w, r.s)) continue;
      const size_t sl = std::strlen(r.s);
      if (std::strcmp(r.s, "ogi") == 0) {
        if (in_r1(3) && w.size() >= 4 && w[w.size() - 4] == 'l') {
          w.resize(w.size() - 3);
          w += "og";
        }
      } else if (std::strcmp(r.s, "li") == 0) {
        static const string kValidLi = "cdeghkmnrt";
        if (in_r1(2) && w.size() >= 3 &&
            kValidLi.find(w[w.size() - 3]) != string::npos)
          w.resize(w.size() - 2);
      } else if (in_r1(sl)) {
        w.resize(w.size() - sl);
        w += r.rep;
      }
      break;
    }
  }

  // Step 3 (in R1; 'ative' requires R2).
  {
    struct Rule { const char* s; const char* rep; };
    static const Rule k3[] = {{"ational", "ate"}, {"tional", "tion"},
                              {"alize", "al"},    {"icate", "ic"},
                              {"iciti", "ic"},    {"ical", "ic"},
                              {"ness", ""},       {"ful", ""}};
    if (ends_with(w, "ative")) {
      if (in_r1(5) && in_r2(5)) w.resize(w.size() - 5);
    } else {
      for (const Rule& r : k3) {
        if (!ends_with(w, r.s)) continue;
        const size_t sl = std::strlen(r.s);
        if (in_r1(sl)) {
          w.resize(w.size() - sl);
          w += r.rep;
        }
        break;
      }
    }
  }

  // Step 4 (in R2).
  {
    static const char* k4[] = {"ement", "ance", "ence", "able", "ible",
                               "ment",  "ant",  "ent",  "ism",  "ate",
                               "iti",   "ous",  "ive",  "ize",  "ion",
                               "al",    "er",   "ic"};
    for (const char* s : k4) {
      if (!ends_with(w, s)) continue;
      const size_t sl = std::strlen(s);
      if (std::strcmp(s, "ion") == 0) {
        if (in_r2(3) && w.size() >= 4 &&
            (w[w.size() - 4] == 's' || w[w.size() - 4] == 't'))
          w.resize(w.size() - 3);
      } else if (in_r2(sl)) {
        w.resize(w.size() - sl);
      }
      break;
    }
  }

  // Step 5.
  if (ends_with(w, "e")) {
    if (in_r2(1)) {
      w.resize(w.size() - 1);
    } else if (in_r1(1)) {
      string head = w.substr(0, w.size() - 1);
      if (!ends_short_syllable(head)) w.resize(w.size() - 1);
    }
  } else if (ends_with(w, "l")) {
    if (in_r2(1) && w.size() >= 2 && w[w.size() - 2] == 'l')
      w.resize(w.size() - 1);
  }

  if (y_found)
    for (char& c : w)
      if (c == 'Y') c = 'y';
  return w;
}

// ---------------------------------------------------------------------------
// lexer: split on punctuation bitmap, lowercase, stop words, stem
// ---------------------------------------------------------------------------

struct Lexer {
  std::bitset<256> split;
  std::unordered_set<string> stop;
  std::unordered_map<string, string> stem_cache;
  int min_stem_size = 4;
};

}  // namespace

extern "C" {

// stopwords: '\0'-separated, n_stop entries. punctuation: raw byte set.
void* lexer_create(const char* punct, int punct_len, const char* stopwords,
                   int stop_bytes, int n_stop, int min_stem_size) {
  auto* lx = new Lexer();
  for (int i = 0; i < 256; ++i)
    if (i < 33 || i == 127) lx->split.set(i);  // whitespace + control
  for (int i = 0; i < punct_len; ++i)
    lx->split.set((unsigned char)punct[i]);
  const char* p = stopwords;
  const char* end = stopwords + stop_bytes;
  for (int i = 0; i < n_stop && p < end; ++i) {
    string s(p);
    p += s.size() + 1;
    std::transform(s.begin(), s.end(), s.begin(),
                   [](unsigned char c) { return std::tolower(c); });
    lx->stop.insert(std::move(s));
  }
  lx->min_stem_size = min_stem_size;
  return lx;
}

void lexer_free(void* h) { delete (Lexer*)h; }

// Tokenize ASCII text. Output: token '\0' stem '\0' per token (stem empty
// when identical). Returns bytes written, or -1 if out_cap too small.
int lexer_tokenize(void* h, const char* text, int len, char* out,
                   int out_cap) {
  auto* lx = (Lexer*)h;
  int w = 0;
  string word;
  word.reserve(32);
  auto emit = [&](const string& tok) -> bool {
    const string* st = nullptr;
    string computed;
    if ((int)tok.size() >= lx->min_stem_size) {
      auto it = lx->stem_cache.find(tok);
      if (it != lx->stem_cache.end()) {
        st = &it->second;
      } else {
        computed = stem_english(tok);
        if (lx->stem_cache.size() < 500000)
          st = &lx->stem_cache.emplace(tok, computed).first->second;
        else
          st = &computed;
      }
    }
    const string& stem = st ? *st : tok;
    const bool same = (stem == tok);
    const int need = (int)tok.size() + 1 + (same ? 0 : (int)stem.size()) + 1;
    if (w + need > out_cap) return false;
    std::memcpy(out + w, tok.data(), tok.size());
    w += (int)tok.size();
    out[w++] = '\0';
    if (!same) {
      std::memcpy(out + w, stem.data(), stem.size());
      w += (int)stem.size();
    }
    out[w++] = '\0';
    return true;
  };

  int i = 0;
  while (i < len) {
    const unsigned char c = (unsigned char)text[i];
    if (c == '\\' && i + 1 < len) {
      word += (char)std::tolower((unsigned char)text[i + 1]);
      i += 2;
      continue;
    }
    if (lx->split[c]) {
      if (!word.empty()) {
        if (!lx->stop.count(word)) {
          if (!emit(word)) return -1;
        }
        word.clear();
      }
      ++i;
      continue;
    }
    word += (char)std::tolower(c);
    ++i;
  }
  if (!word.empty() && !lx->stop.count(word)) {
    if (!emit(word)) return -1;
  }
  return w;
}

// Direct stemmer access (tests / golden validation).
int stem_word(const char* in, int len, char* out, int out_cap) {
  string s(in, (size_t)len);
  string r = stem_english(std::move(s));
  if ((int)r.size() + 1 > out_cap) return -1;
  std::memcpy(out, r.data(), r.size());
  out[r.size()] = '\0';
  return (int)r.size();
}

}  // extern "C"
