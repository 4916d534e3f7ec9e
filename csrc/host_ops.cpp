// Native host-side runtime ops for vllm_tpu (TPU-native analog of the
// reference's csrc/ host helpers; device kernels are Pallas, these are the
// per-step HOST hot paths):
//   - chained prefix-cache block hashing
//     (behavior parity: vllm/v1/core/kv_cache_utils.py hash_block_tokens /
//      hash_request_tokens, reference kv_cache_utils.py:527,558)
//   - n-gram draft proposal suffix matching
//     (behavior parity: vllm/v1/spec_decode/ngram_proposer.py)
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this
// image). Build: vllm_tpu/_native/__init__.py invokes g++ -O3 -shared.

#include <cstdint>
#include <cstring>

#include "sha256.h"

extern "C" {

// Compute chained hashes for all full blocks of a token sequence.
//   token_ids:  int32[num_tokens]
//   extra:      bytes (request-level salt: lora name / cache salt), may be
//               null when extra_len == 0
//   out_hashes: int64[num_tokens / block_size] (floor)
// Returns the number of block hashes written.
// Chain seed must match the Python NONE_HASH for cross-impl parity.
int64_t hash_request_tokens(const int32_t* token_ids, int64_t num_tokens,
                            int64_t block_size, int64_t parent_seed,
                            const uint8_t* extra, int64_t extra_len,
                            int64_t* out_hashes) {
  int64_t n_blocks = 0;
  int64_t parent = parent_seed;
  for (int64_t start = 0; start + block_size <= num_tokens;
       start += block_size) {
    vllm_tpu::Sha256 h;
    h.update(&parent, 8);  // little-endian, matches struct.pack("<q")
    h.update(token_ids + start, size_t(block_size) * 4);
    if (extra_len > 0) h.update(extra, size_t(extra_len));
    uint8_t digest[32];
    h.final(digest);
    int64_t v;
    std::memcpy(&v, digest, 8);  // first 8 bytes, little-endian
    out_hashes[n_blocks++] = v;
    parent = v;
  }
  return n_blocks;
}

// Single-block chained hash (for incremental caching as blocks fill).
int64_t hash_block(int64_t parent, const int32_t* token_ids,
                   int64_t num_tokens, const uint8_t* extra,
                   int64_t extra_len) {
  vllm_tpu::Sha256 h;
  h.update(&parent, 8);
  h.update(token_ids, size_t(num_tokens) * 4);
  if (extra_len > 0) h.update(extra, size_t(extra_len));
  uint8_t digest[32];
  h.final(digest);
  int64_t v;
  std::memcpy(&v, digest, 8);
  return v;
}

// Longest-suffix n-gram lookup: find the most recent earlier occurrence
// of the sequence's trailing n-gram (n from max_n down to min_n) and copy
// up to k continuation tokens into out. Returns the number proposed.
int64_t ngram_propose(const int32_t* tokens, int64_t len, int64_t min_n,
                      int64_t max_n, int64_t k, int32_t* out) {
  if (len < min_n + 1) return 0;
  for (int64_t n = max_n; n >= min_n; --n) {
    if (len <= n) continue;
    const int32_t* suffix = tokens + (len - n);
    // scan right-to-left for the most recent match (excluding the
    // suffix's own position)
    for (int64_t start = len - n - 1; start >= 0; --start) {
      if (std::memcmp(tokens + start, suffix, size_t(n) * 4) != 0)
        continue;
      int64_t cont = start + n;
      int64_t take = len - cont;
      if (take > k) take = k;
      if (take <= 0) break;  // suffix only matches at the very end
      std::memcpy(out, tokens + cont, size_t(take) * 4);
      return take;
    }
  }
  return 0;
}

}  // extern "C"
