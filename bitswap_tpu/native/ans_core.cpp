// Host-side native rANS core.
//
// The reference's only performance-critical host code is the per-symbol
// Python big-int ANS loop (mnist_compress.py:49-68); this is its native
// equivalent for the host half of the framework: container verification,
// CPU-only demo coding, and golden cross-checks against the TPU lane coder.
//
// State machine (identical to ans/reference.py and ans/vectorized.py):
//   - 31-bit frequency precision, rows sum to exactly 2^31
//   - 32-bit stream words on a stack under a 64-bit head in [2^32, 2^64)
//   - encode renormalizes by pushing the low word when x >= p << 33
//   - decode renormalizes by popping a word when x < 2^32
//
// All arithmetic fits uint64 exactly: after encode-renorm x < p*2^33 so
// x/p < 2^33 and (x/p)<<31 + (x%p + c) < 2^64; in decode p*(x>>31) < 2^64.
//
// Tables are exclusive cumulative rows, shape (seq, support+1) row-major;
// pmf[s] = cdf[s+1] - cdf[s].  Batched entry points loop over independent
// lanes (one stream each) with OpenMP when available.

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr int kPrecision = 31;
constexpr uint64_t kMask31 = (1ull << kPrecision) - 1;
constexpr uint64_t kLBound = 1ull << 32;

// Returns 0 on success, -1 on buffer overflow (capacity exhausted).
inline int encode_stream(uint32_t* buf, int32_t* sp, uint64_t* head,
                         const uint32_t* cdf, int64_t seq, int64_t row,
                         const int32_t* symbols, int64_t capacity) {
  uint64_t x = *head;
  int32_t p_sp = *sp;
  for (int64_t i = 0; i < seq; ++i) {
    const uint32_t* r = cdf + i * row;
    const int32_t s = symbols[i];
    const uint64_t c = r[s];
    const uint64_t p = (uint64_t)r[s + 1] - c;
    if (x >= (p << 33)) {
      if (p_sp >= capacity) return -1;
      buf[p_sp++] = (uint32_t)(x & 0xFFFFFFFFull);
      x >>= 32;
    }
    x = ((x / p) << kPrecision) + (x % p) + c;
  }
  *head = x;
  *sp = p_sp;
  return 0;
}

// Branchless-ish binary search: largest s with cdf[s] <= masked, over
// cdf[0..support-1] (support = row-1 entries; cdf[support] == 2^31 always
// satisfies <=, but the reference searches only the first `support` entries
// with side='right' then subtracts 1 — same result since masked < 2^31).
inline int32_t find_symbol(const uint32_t* r, int64_t support, uint64_t masked) {
  int64_t lo = 0, hi = support;  // invariant: cdf[lo] <= masked < cdf[hi]
  while (hi - lo > 1) {
    const int64_t mid = (lo + hi) >> 1;
    if ((uint64_t)r[mid] <= masked)
      lo = mid;
    else
      hi = mid;
  }
  return (int32_t)lo;
}

// Returns 0 on success, -1 on stack underflow.
inline int decode_stream(uint32_t* buf, int32_t* sp, uint64_t* head,
                         const uint32_t* cdf, int64_t seq, int64_t row,
                         int32_t* out_symbols) {
  uint64_t x = *head;
  int32_t p_sp = *sp;
  const int64_t support = row - 1;
  for (int64_t i = seq - 1; i >= 0; --i) {
    const uint32_t* r = cdf + i * row;
    const uint64_t masked = x & kMask31;
    const int32_t s = find_symbol(r, support, masked);
    out_symbols[i] = s;
    const uint64_t c = r[s];
    const uint64_t p = (uint64_t)r[s + 1] - c;
    x = p * (x >> kPrecision) + masked - c;
    if (x < kLBound) {
      if (p_sp <= 0) return -1;
      x = (x << 32) | (uint64_t)buf[--p_sp];
    }
  }
  *head = x;
  *sp = p_sp;
  return 0;
}

}  // namespace

extern "C" {

int bsans_encode(uint32_t* buf, int32_t* sp, uint64_t* head,
                 const uint32_t* cdf, int64_t seq, int64_t row,
                 const int32_t* symbols, int64_t capacity) {
  return encode_stream(buf, sp, head, cdf, seq, row, symbols, capacity);
}

int bsans_decode(uint32_t* buf, int32_t* sp, uint64_t* head,
                 const uint32_t* cdf, int64_t seq, int64_t row,
                 int32_t* out_symbols) {
  return decode_stream(buf, sp, head, cdf, seq, row, out_symbols);
}

// Batched lanes: buf (L, capacity), sp/head (L,), cdf (L, seq, row),
// symbols (L, seq).  Independent streams -> parallel across lanes.
int bsans_encode_lanes(uint32_t* buf, int32_t* sp, uint64_t* head,
                       const uint32_t* cdf, int64_t lanes, int64_t seq,
                       int64_t row, const int32_t* symbols, int64_t capacity) {
  int status = 0;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t l = 0; l < lanes; ++l) {
    const int rc =
        encode_stream(buf + l * capacity, sp + l, head + l,
                      cdf + l * seq * row, seq, row, symbols + l * seq, capacity);
    if (rc != 0) status = rc;
  }
  return status;
}

int bsans_decode_lanes(uint32_t* buf, int32_t* sp, uint64_t* head,
                       const uint32_t* cdf, int64_t lanes, int64_t seq,
                       int64_t row, int32_t* out_symbols, int64_t capacity) {
  int status = 0;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t l = 0; l < lanes; ++l) {
    const int rc = decode_stream(buf + l * capacity, sp + l, head + l,
                                 cdf + l * seq * row, seq, row,
                                 out_symbols + l * seq);
    if (rc != 0) status = rc;
  }
  return status;
}

}  // extern "C"
