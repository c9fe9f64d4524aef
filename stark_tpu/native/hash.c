/* Native host engine for the stark_tpu control plane.
 *
 * Bit-exact C implementation of the commitment hash (contract: reference
 * src/hash.rs:7-99) plus the host-sequential protocol loops built on it:
 * Fiat-Shamir challenges (fiat_shamir.rs:19-25), FRI index sampling
 * (fri.rs:168-213) and Merkle path verification (merkle.rs:82-96).
 *
 * The reference implements these natively (Rust); the TPU framework keeps
 * bulk hashing on device (ops/hash_batch.py) and uses this library for the
 * host-side scalar path, which otherwise dominates verifier wall time.
 *
 * Build: cc -O3 -shared -fPIC -o libstark_host.so hash.c
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static const uint8_t PRIMES[16] = {2, 3, 5, 7, 11, 13, 17, 19,
                                   23, 29, 31, 37, 41, 43, 47, 53};

/* hash.rs:96-99 */
static const uint8_t RC[32] = {
    0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80,
    0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D, 0x9A, 0x2F,
    0x5E, 0xBC, 0x63, 0xC6, 0x97, 0x35, 0x6A, 0xD4,
    0xB3, 0x7D, 0xFA, 0xEF, 0xC5, 0x91, 0x39, 0x72};

static inline uint8_t rotl8(uint8_t x, int n) {
  return (uint8_t)((uint8_t)(x << n) | (x >> (8 - n)));
}

/* One mix round (hash.rs:59-86). */
static void mix_state(uint8_t s[32]) {
  uint8_t t[32];
  int i;
  /* sbox: mul 251 mod 256, rotl 1, xor 0x63 (hash.rs:88-94) */
  for (i = 0; i < 32; i++)
    t[i] = (uint8_t)(rotl8((uint8_t)(s[i] * 251u), 1) ^ 0x63u);
  /* 4-byte-group XOR mixing (hash.rs:63-75) */
  for (i = 0; i < 8; i++) {
    uint8_t a = t[4 * i], b = t[4 * i + 1], c = t[4 * i + 2], d = t[4 * i + 3];
    s[4 * i] = (uint8_t)(a ^ b ^ d);
    s[4 * i + 1] = (uint8_t)(a ^ c ^ d);
    s[4 * i + 2] = (uint8_t)(a ^ b ^ c);
    s[4 * i + 3] = (uint8_t)(b ^ c ^ d);
  }
  /* sequential in-place neighbor diffusion (hash.rs:77-81) */
  for (i = 0; i < 32; i++)
    s[i] = (uint8_t)(s[i] + s[(i + 1) & 31] + s[(i + 31) & 31]);
  /* round constants (hash.rs:83-85) */
  for (i = 0; i < 32; i++) s[i] = (uint8_t)(s[i] + RC[i]);
}

/* 32-byte digest of data (hash.rs:7-30). */
void stark_hash(const uint8_t *data, uint64_t len, uint8_t out[32]) {
  uint8_t s[32];
  uint64_t start;
  int i;
  for (i = 0; i < 32; i++) s[i] = PRIMES[i & 15];
  for (start = 0; start < len; start += 32) {
    uint64_t chunk = len - start < 32 ? len - start : 32;
    for (i = 0; i < (int)chunk; i++) {
      uint8_t v = (uint8_t)(s[i] + data[start + i]);
      v = rotl8(v, 3);
      s[i] = v;
      s[(i + 7) & 31] ^= v;
    }
    mix_state(s);
  }
  for (i = 0; i < 8; i++) mix_state(s);
  memcpy(out, s, 32);
}

/* count digests of fixed-stride inputs (vector amortization for bindings). */
void stark_hash_many(const uint8_t *data, uint64_t in_len, uint64_t count,
                     uint8_t *out) {
  uint64_t i;
  for (i = 0; i < count; i++)
    stark_hash(data + i * in_len, in_len, out + i * 32);
}

/* Hash::combine (hash.rs:41-46). */
void stark_combine(const uint8_t left[32], const uint8_t right[32],
                   uint8_t out[32]) {
  uint8_t buf[64];
  memcpy(buf, left, 32);
  memcpy(buf + 32, right, 32);
  stark_hash(buf, 64, out);
}

/* Fiat-Shamir challenge: u64 LE of the first 8 digest bytes of the whole
 * transcript (fiat_shamir.rs:19-25) — returned raw/unreduced. */
uint64_t stark_challenge(const uint8_t *transcript, uint64_t len) {
  uint8_t d[32];
  uint64_t v = 0;
  int i;
  stark_hash(transcript, len, d);
  for (i = 7; i >= 0; i--) v = (v << 8) | d[i];
  return v;
}

/* Fold 32 digest bytes into a u128 accumulator mod size (fri.rs:168-174). */
static uint64_t sample_index(const uint8_t d[32], uint64_t size) {
  unsigned __int128 acc = 0;
  int i;
  for (i = 0; i < 32; i++) acc = (acc << 8) ^ d[i];
  return (uint64_t)(acc % size);
}

/* sample_indices (fri.rs:176-213): seeded hash + LE u32 counter, dedup on
 * index %% reduced_size, keep the unreduced index.  Returns the number of
 * counter iterations used (indices written to out).  reduced_size must be
 * <= 2^32 (a bitmap is allocated). */
int64_t stark_sample_indices(const uint8_t seed[32], uint64_t size,
                             uint64_t reduced_size, uint64_t number,
                             uint64_t *out) {
  uint8_t buf[36];
  uint8_t d[32];
  uint8_t *seen;
  uint64_t found = 0;
  uint32_t counter = 0;
  if (number > reduced_size) return -1;
  seen = (uint8_t *)calloc((reduced_size + 7) / 8, 1);
  if (!seen) return -2;
  memcpy(buf, seed, 32);
  while (found < number) {
    uint64_t idx, red;
    buf[32] = (uint8_t)(counter & 0xFF);
    buf[33] = (uint8_t)((counter >> 8) & 0xFF);
    buf[34] = (uint8_t)((counter >> 16) & 0xFF);
    buf[35] = (uint8_t)((counter >> 24) & 0xFF);
    stark_hash(buf, 36, d);
    idx = sample_index(d, size);
    red = idx % reduced_size;
    counter++;
    if (!(seen[red >> 3] & (1u << (red & 7)))) {
      seen[red >> 3] |= (uint8_t)(1u << (red & 7));
      out[found++] = idx;
    }
  }
  free(seen);
  return (int64_t)counter;
}

/* Leaf digests of u64 values: Hash::from_field_elements(&[v]) per value
 * (hash.rs:32-39) — 8 LE bytes each. */
void stark_hash_u64s(const uint64_t *values, uint64_t count, uint8_t *out) {
  uint64_t i;
  uint8_t buf[8];
  for (i = 0; i < count; i++) {
    uint64_t v = values[i];
    int b;
    for (b = 0; b < 8; b++) buf[b] = (uint8_t)(v >> (8 * b));
    stark_hash(buf, 8, out + 32 * i);
  }
}

/* All tree levels bottom-up from w leaf digests (merkle.rs:18-29):
 * out receives 2w-1 digests — level 0 (w), level 1 (w/2), ..., root. */
void stark_merkle_levels(const uint8_t *leaves, uint64_t w, uint8_t *out) {
  uint64_t off = 0, i;
  memcpy(out, leaves, w * 32);
  while (w > 1) {
    const uint8_t *cur = out + off * 32;
    uint8_t *nxt = out + (off + w) * 32;
    for (i = 0; i < w / 2; i++)
      stark_combine(cur + 64 * i, cur + 64 * i + 32, nxt + 32 * i);
    off += w;
    w /= 2;
  }
}

/* Merkle path verification (merkle.rs:82-96): refold by index parity. */
int stark_merkle_verify(const uint8_t leaf[32], uint64_t index,
                        const uint8_t *path, uint64_t path_len,
                        const uint8_t root[32]) {
  uint8_t cur[32];
  uint64_t l;
  memcpy(cur, leaf, 32);
  for (l = 0; l < path_len; l++) {
    uint8_t nxt[32];
    if ((index & 1) == 0)
      stark_combine(cur, path + 32 * l, nxt);
    else
      stark_combine(path + 32 * l, cur, nxt);
    memcpy(cur, nxt, 32);
    index >>= 1;
  }
  return memcmp(cur, root, 32) == 0;
}

/* Batched path verification: k paths of equal length, each with its own
 * leaf ROW of c raw u64 values (leaf digest = stark_hash of the 8*c LE
 * bytes, matching Hash::from_field_elements — hash.rs:32-35), index and
 * root.  Returns -1 when every path verifies, else the smallest failing
 * path position (the caller maps it back to the reference's per-path
 * failure reason).  One call replaces k ctypes round trips. */
int64_t stark_merkle_verify_batch(const uint64_t *leaf_values, uint64_t c,
                                  const uint64_t *indices,
                                  const uint8_t *paths, uint64_t path_len,
                                  const uint8_t *roots, uint64_t k) {
  uint64_t q, j;
  uint8_t le[8 * 64];
  if (c == 0 || c > 64) return -2; /* caller falls back */
  for (q = 0; q < k; q++) {
    uint8_t leaf[32];
    int b;
    for (j = 0; j < c; j++) {
      uint64_t v = leaf_values[q * c + j];
      for (b = 0; b < 8; b++) le[8 * j + b] = (uint8_t)(v >> (8 * b));
    }
    stark_hash(le, 8 * c, leaf);
    if (!stark_merkle_verify(leaf, indices[q], paths + q * path_len * 32,
                             path_len, roots + q * 32))
      return (int64_t)q;
  }
  return -1;
}
