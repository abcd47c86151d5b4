// fastio.cpp — native data-tooling fast path for dfu_multimodal_tpu.
//
// The reference hashes every dataset file in Python with hashlib, twice per
// training run (leakage gate) and once per organize pass
// (reference scripts/organize_clean_dataset.py:196-213,
// notebooks/train_rgb_only.py:128-165).  This module provides a threaded
// C++ SHA-256 over file lists, exposed through a C ABI consumed via ctypes
// (no pybind11 in the image).  Build: see native/__init__.py.
//
// SHA-256 per FIPS 180-4.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

struct Sha256 {
  uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                   0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
  uint8_t buf[64];
  uint64_t total = 0;
  size_t buflen = 0;

  void block(const uint8_t* p) {
    uint32_t w[64];
    for (int i = 0; i < 16; ++i)
      w[i] = (uint32_t(p[4 * i]) << 24) | (uint32_t(p[4 * i + 1]) << 16) |
             (uint32_t(p[4 * i + 2]) << 8) | uint32_t(p[4 * i + 3]);
    for (int i = 16; i < 64; ++i) {
      uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
      uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
      w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3];
    uint32_t e = h[4], f = h[5], g = h[6], hh = h[7];
    for (int i = 0; i < 64; ++i) {
      uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
      uint32_t ch = (e & f) ^ (~e & g);
      uint32_t t1 = hh + S1 + ch + K[i] + w[i];
      uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
      uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
      uint32_t t2 = S0 + maj;
      hh = g; g = f; f = e; e = d + t1;
      d = c; c = b; b = a; a = t1 + t2;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
    h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
  }

  void update(const uint8_t* data, size_t len) {
    total += len;
    if (buflen) {
      size_t need = 64 - buflen;
      size_t take = len < need ? len : need;
      memcpy(buf + buflen, data, take);
      buflen += take; data += take; len -= take;
      if (buflen == 64) { block(buf); buflen = 0; }
    }
    while (len >= 64) { block(data); data += 64; len -= 64; }
    if (len) { memcpy(buf, data, len); buflen = len; }
  }

  void final(uint8_t out[32]) {
    uint64_t bits = total * 8;
    uint8_t pad = 0x80;
    update(&pad, 1);
    uint8_t zero = 0;
    while (buflen != 56) update(&zero, 1);
    uint8_t lenb[8];
    for (int i = 0; i < 8; ++i) lenb[i] = uint8_t(bits >> (56 - 8 * i));
    update(lenb, 8);
    for (int i = 0; i < 8; ++i) {
      out[4 * i] = uint8_t(h[i] >> 24);
      out[4 * i + 1] = uint8_t(h[i] >> 16);
      out[4 * i + 2] = uint8_t(h[i] >> 8);
      out[4 * i + 3] = uint8_t(h[i]);
    }
  }
};

bool hash_file(const char* path, char hex_out[65]) {
  FILE* f = fopen(path, "rb");
  if (!f) { hex_out[0] = '\0'; return false; }
  Sha256 ctx;
  std::vector<uint8_t> chunk(1 << 16);
  size_t n;
  while ((n = fread(chunk.data(), 1, chunk.size(), f)) > 0)
    ctx.update(chunk.data(), n);
  // a mid-file read error must NOT yield the digest of the partial
  // content as if it were the file's hash: the leakage gate / dedup
  // would compare a wrong hash and could miss a real cross-split
  // duplicate.  Match the Python fallback (compute_sha256 -> None):
  // report failure, caller emits the empty-string error marker.
  if (ferror(f)) { fclose(f); hex_out[0] = '\0'; return false; }
  fclose(f);
  uint8_t digest[32];
  ctx.final(digest);
  static const char* hexd = "0123456789abcdef";
  for (int i = 0; i < 32; ++i) {
    hex_out[2 * i] = hexd[digest[i] >> 4];
    hex_out[2 * i + 1] = hexd[digest[i] & 0xf];
  }
  hex_out[64] = '\0';
  return true;
}

}  // namespace

extern "C" {

// Hash n files into out (n * 65 bytes, NUL-terminated hex per slot; empty
// string on IO error). Uses `threads` worker threads (<=0: hardware default).
void sha256_files(const char** paths, int n, char* out, int threads) {
  if (threads <= 0) {
    threads = int(std::thread::hardware_concurrency());
    if (threads <= 0) threads = 1;
  }
  if (threads > n) threads = n > 0 ? n : 1;
  std::atomic<int> next{0};
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n)
      hash_file(paths[i], out + size_t(i) * 65);
  };
  if (threads == 1) { worker(); return; }
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Single-buffer hash (for tests / in-memory data).
void sha256_bytes(const uint8_t* data, uint64_t len, char* hex_out) {
  Sha256 ctx;
  ctx.update(data, size_t(len));
  uint8_t digest[32];
  ctx.final(digest);
  static const char* hexd = "0123456789abcdef";
  for (int i = 0; i < 32; ++i) {
    hex_out[2 * i] = hexd[digest[i] >> 4];
    hex_out[2 * i + 1] = hexd[digest[i] & 0xf];
  }
  hex_out[64] = '\0';
}

}  // extern "C"
