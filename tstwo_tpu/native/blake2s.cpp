// Native host-side Blake2s-256 for tstwo_tpu.
//
// Batched hashing of equal-length u32-word messages (Merkle layer nodes)
// and the proof-of-work nonce grind.  Semantics identical to
// tstwo_tpu/ops/blake2s.py (standard unkeyed blake2s-256); used as the
// host fallback / verifier-side accelerator where device dispatch
// overhead dominates.  Build: see tstwo_tpu/native/__init__.py.

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr uint32_t IV[8] = {
    0x6A09E667u, 0xBB67AE85u, 0x3C6EF372u, 0xA54FF53Au,
    0x510E527Fu, 0x9B05688Cu, 0x1F83D9ABu, 0x5BE0CD19u,
};

constexpr uint8_t SIGMA[10][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
};

inline uint32_t rotr(uint32_t x, int r) {
  return (x >> r) | (x << (32 - r));
}

inline void g(uint32_t* v, int a, int b, int c, int d, uint32_t x,
              uint32_t y) {
  v[a] = v[a] + v[b] + x;
  v[d] = rotr(v[d] ^ v[a], 16);
  v[c] = v[c] + v[d];
  v[b] = rotr(v[b] ^ v[c], 12);
  v[a] = v[a] + v[b] + y;
  v[d] = rotr(v[d] ^ v[a], 8);
  v[c] = v[c] + v[d];
  v[b] = rotr(v[b] ^ v[c], 7);
}

void compress(uint32_t* h, const uint32_t* m, uint64_t t, bool final_block) {
  uint32_t v[16];
  std::memcpy(v, h, 32);
  std::memcpy(v + 8, IV, 32);
  v[12] ^= static_cast<uint32_t>(t);
  v[13] ^= static_cast<uint32_t>(t >> 32);
  if (final_block) v[14] = ~v[14];
  for (int r = 0; r < 10; r++) {
    const uint8_t* s = SIGMA[r];
    g(v, 0, 4, 8, 12, m[s[0]], m[s[1]]);
    g(v, 1, 5, 9, 13, m[s[2]], m[s[3]]);
    g(v, 2, 6, 10, 14, m[s[4]], m[s[5]]);
    g(v, 3, 7, 11, 15, m[s[6]], m[s[7]]);
    g(v, 0, 5, 10, 15, m[s[8]], m[s[9]]);
    g(v, 1, 6, 11, 12, m[s[10]], m[s[11]]);
    g(v, 2, 7, 8, 13, m[s[12]], m[s[13]]);
    g(v, 3, 4, 9, 14, m[s[14]], m[s[15]]);
  }
  for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[i + 8];
}

void hash_words(const uint32_t* words, size_t n_words, size_t byte_len,
                uint32_t* out) {
  uint32_t h[8] = {IV[0] ^ 0x01010020u, IV[1], IV[2], IV[3],
                   IV[4], IV[5], IV[6], IV[7]};
  size_t n_blocks = byte_len == 0 ? 1 : (byte_len + 63) / 64;
  uint32_t block[16];
  for (size_t b = 0; b < n_blocks; b++) {
    bool final_block = (b == n_blocks - 1);
    uint64_t t = final_block ? byte_len : (b + 1) * 64;
    std::memset(block, 0, sizeof(block));
    size_t off = b * 16;
    size_t take = n_words > off ? (n_words - off < 16 ? n_words - off : 16)
                                : 0;
    if (take) std::memcpy(block, words + off, take * 4);
    compress(h, block, t, final_block);
  }
  std::memcpy(out, h, 32);
}

}  // namespace

extern "C" {

// Hash n_msgs messages of n_words u32 words each (byte_len significant
// bytes); out: n_msgs * 8 u32 digest words.
void blake2s_hash_batch(const uint32_t* words, size_t n_msgs, size_t n_words,
                        size_t byte_len, uint32_t* out) {
  for (size_t i = 0; i < n_msgs; i++) {
    hash_words(words + i * n_words, n_words, byte_len, out + i * 8);
  }
}

// Commit one Merkle layer: prev (2n x 8 digest words, may be null),
// columns (n_cols pointers of n values each) -> out n x 8 words.
void blake2s_merkle_layer(const uint32_t* prev, const uint32_t* const* cols,
                          size_t n_cols, size_t n, uint32_t* out) {
  size_t n_words = (prev ? 16 : 0) + n_cols;
  uint32_t buf[16 + 256];
  for (size_t i = 0; i < n; i++) {
    size_t w = 0;
    if (prev) {
      std::memcpy(buf, prev + (2 * i) * 8, 32);
      std::memcpy(buf + 8, prev + (2 * i + 1) * 8, 32);
      w = 16;
    }
    for (size_t c = 0; c < n_cols; c++) buf[w++] = cols[c][i];
    hash_words(buf, n_words, n_words * 4, out + i * 8);
  }
}

// Grind: find smallest nonce >= start with >= pow_bits trailing zeros of
// blake2s(digest || le64(nonce) padded to 8 bytes as two u32) first 16
// bytes (LE u128).  Returns nonce, or ~0ull if none in [start, start+count).
uint64_t blake2s_grind(const uint32_t* digest_words, uint32_t pow_bits,
                       uint64_t start, uint64_t count) {
  uint32_t msg[10];
  std::memcpy(msg, digest_words, 32);
  for (uint64_t nonce = start; nonce < start + count; nonce++) {
    msg[8] = static_cast<uint32_t>(nonce);
    msg[9] = static_cast<uint32_t>(nonce >> 32);
    uint32_t dig[8];
    hash_words(msg, 10, 40, dig);
    unsigned tz = 0;
    for (int w = 0; w < 4 && tz < 128; w++) {
      if (dig[w] == 0) {
        tz += 32;
        continue;
      }
      tz += __builtin_ctz(dig[w]);
      break;
    }
    if (tz >= pow_bits) return nonce;
  }
  return ~0ull;
}

}  // extern "C"
