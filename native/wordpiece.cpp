// Native WordPiece matcher — the host-side hot loop of semantic indexing.
//
// Tokenization runs on the host for every transcript chunk and query; at
// indexing scale (millions of chunks) the greedy longest-match inner loop is
// the dominant host cost next to decode (the same reason production stacks
// use native tokenizers). This keeps the Python basic tokenizer (unicode
// normalization) and moves the per-word subword matching into C++.
//
// C ABI (used via ctypes, see eioku_tpu/models/embed/native_tokenizer.py):
//   wp_create(vocab_blob, blob_len, n_entries) -> handle
//     vocab_blob: UTF-8 tokens joined by '\n' in id order (id = line index)
//   wp_encode(handle, words_blob, blob_len, unk_id, out_ids, max_out) -> n
//     words_blob: pre-tokenized words joined by '\n'
//   wp_destroy(handle)
//
// Build: g++ -O2 -shared -fPIC -o libwordpiece.so wordpiece.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
    std::unordered_map<std::string, int32_t> table;
};

}  // namespace

extern "C" {

void* wp_create(const char* blob, int64_t blob_len, int64_t n_entries) {
    auto* v = new Vocab();
    v->table.reserve(static_cast<size_t>(n_entries) * 2);
    const char* p = blob;
    const char* end = blob + blob_len;
    int32_t id = 0;
    while (p < end) {
        const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
        size_t len = nl ? static_cast<size_t>(nl - p)
                        : static_cast<size_t>(end - p);
        v->table.emplace(std::string(p, len), id++);
        p += len + 1;
    }
    return v;
}

void wp_destroy(void* handle) { delete static_cast<Vocab*>(handle); }

// Greedy longest-match WordPiece over '\n'-separated words.
// Returns number of ids written (<= max_out); a word with no match emits
// unk_id (matching the Python implementation).
int64_t wp_encode(void* handle, const char* words, int64_t words_len,
                  int32_t unk_id, int32_t* out_ids, int64_t max_out) {
    const auto& table = static_cast<Vocab*>(handle)->table;
    int64_t n_out = 0;
    const char* p = words;
    const char* end = words + words_len;
    std::string key;
    while (p < end && n_out < max_out) {
        const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
        size_t wlen = nl ? static_cast<size_t>(nl - p)
                         : static_cast<size_t>(end - p);
        std::string_view word(p, wlen);
        p += wlen + 1;
        if (word.empty()) continue;
        if (word.size() > 100) {
            out_ids[n_out++] = unk_id;
            continue;
        }
        // greedy longest-match
        size_t start = 0;
        std::vector<int32_t> ids;
        bool ok = true;
        while (start < word.size()) {
            size_t stop = word.size();
            int32_t cur = -1;
            while (start < stop) {
                key.assign(start > 0 ? "##" : "");
                key.append(word.substr(start, stop - start));
                auto it = table.find(key);
                if (it != table.end()) {
                    cur = it->second;
                    break;
                }
                --stop;
            }
            if (cur < 0) {
                ok = false;
                break;
            }
            ids.push_back(cur);
            start = stop;
        }
        if (!ok) {
            out_ids[n_out++] = unk_id;
        } else {
            for (int32_t id : ids) {
                if (n_out >= max_out) break;
                out_ids[n_out++] = id;
            }
        }
    }
    return n_out;
}

}  // extern "C"
