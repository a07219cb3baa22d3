// Minimal crypto primitives for PDF standard-security-handler decryption
// (reader-side only): RC4 (V1/V2 handlers) and AES-128/256-CBC decrypt
// (AESV2/AESV3 crypt filters).  The reference delegates encrypted-PDF
// reading to PyMuPDF; our from-scratch reader needs the primitives
// in-tree.  Key derivation (MD5/SHA-2 based, PDF 32000 §7.6.3) happens
// in Python via hashlib; only the bulk ciphers live here.
//
// Built into libjbig2tpu.so alongside jbig2.cpp (see codecs/jbig2.py).

#include <cstdint>
#include <cstring>

namespace {

// ----------------------------------------------------------------- AES core

static const uint8_t kSBox[256] = {
    0x63,0x7c,0x77,0x7b,0xf2,0x6b,0x6f,0xc5,0x30,0x01,0x67,0x2b,0xfe,0xd7,
    0xab,0x76,0xca,0x82,0xc9,0x7d,0xfa,0x59,0x47,0xf0,0xad,0xd4,0xa2,0xaf,
    0x9c,0xa4,0x72,0xc0,0xb7,0xfd,0x93,0x26,0x36,0x3f,0xf7,0xcc,0x34,0xa5,
    0xe5,0xf1,0x71,0xd8,0x31,0x15,0x04,0xc7,0x23,0xc3,0x18,0x96,0x05,0x9a,
    0x07,0x12,0x80,0xe2,0xeb,0x27,0xb2,0x75,0x09,0x83,0x2c,0x1a,0x1b,0x6e,
    0x5a,0xa0,0x52,0x3b,0xd6,0xb3,0x29,0xe3,0x2f,0x84,0x53,0xd1,0x00,0xed,
    0x20,0xfc,0xb1,0x5b,0x6a,0xcb,0xbe,0x39,0x4a,0x4c,0x58,0xcf,0xd0,0xef,
    0xaa,0xfb,0x43,0x4d,0x33,0x85,0x45,0xf9,0x02,0x7f,0x50,0x3c,0x9f,0xa8,
    0x51,0xa3,0x40,0x8f,0x92,0x9d,0x38,0xf5,0xbc,0xb6,0xda,0x21,0x10,0xff,
    0xf3,0xd2,0xcd,0x0c,0x13,0xec,0x5f,0x97,0x44,0x17,0xc4,0xa7,0x7e,0x3d,
    0x64,0x5d,0x19,0x73,0x60,0x81,0x4f,0xdc,0x22,0x2a,0x90,0x88,0x46,0xee,
    0xb8,0x14,0xde,0x5e,0x0b,0xdb,0xe0,0x32,0x3a,0x0a,0x49,0x06,0x24,0x5c,
    0xc2,0xd3,0xac,0x62,0x91,0x95,0xe4,0x79,0xe7,0xc8,0x37,0x6d,0x8d,0xd5,
    0x4e,0xa9,0x6c,0x56,0xf4,0xea,0x65,0x7a,0xae,0x08,0xba,0x78,0x25,0x2e,
    0x1c,0xa6,0xb4,0xc6,0xe8,0xdd,0x74,0x1f,0x4b,0xbd,0x8b,0x8a,0x70,0x3e,
    0xb5,0x66,0x48,0x03,0xf6,0x0e,0x61,0x35,0x57,0xb9,0x86,0xc1,0x1d,0x9e,
    0xe1,0xf8,0x98,0x11,0x69,0xd9,0x8e,0x94,0x9b,0x1e,0x87,0xe9,0xce,0x55,
    0x28,0xdf,0x8c,0xa1,0x89,0x0d,0xbf,0xe6,0x42,0x68,0x41,0x99,0x2d,0x0f,
    0xb0,0x54,0xbb,0x16,
};

uint8_t InvSBoxAt(int i) {
  static uint8_t inv[256];
  static bool init = false;
  if (!init) {
    for (int j = 0; j < 256; ++j) inv[kSBox[j]] = static_cast<uint8_t>(j);
    init = true;
  }
  return inv[i];
}

inline uint8_t Xtime(uint8_t x) {
  return static_cast<uint8_t>((x << 1) ^ ((x >> 7) * 0x1B));
}

inline uint8_t Mul(uint8_t x, uint8_t y) {
  uint8_t r = 0;
  while (y) {
    if (y & 1) r ^= x;
    x = Xtime(x);
    y >>= 1;
  }
  return r;
}

struct AesKey {
  uint8_t rk[15 * 16];  // up to 14 rounds + initial
  int rounds;
};

void ExpandKey(const uint8_t* key, int keybits, AesKey* out) {
  const int nk = keybits / 32;
  out->rounds = nk + 6;
  const int total = 4 * (out->rounds + 1);
  uint8_t* w = out->rk;
  std::memcpy(w, key, nk * 4);
  uint8_t rcon = 1;
  for (int i = nk; i < total; ++i) {
    uint8_t t[4];
    std::memcpy(t, w + (i - 1) * 4, 4);
    if (i % nk == 0) {
      const uint8_t tmp = t[0];
      t[0] = static_cast<uint8_t>(kSBox[t[1]] ^ rcon);
      t[1] = kSBox[t[2]];
      t[2] = kSBox[t[3]];
      t[3] = kSBox[tmp];
      rcon = Xtime(rcon);
    } else if (nk > 6 && i % nk == 4) {
      for (int j = 0; j < 4; ++j) t[j] = kSBox[t[j]];
    }
    for (int j = 0; j < 4; ++j) w[i * 4 + j] = w[(i - nk) * 4 + j] ^ t[j];
  }
}

void DecryptBlock(const AesKey& k, uint8_t* st) {
  auto add_rk = [&](int r) {
    for (int i = 0; i < 16; ++i) st[i] ^= k.rk[r * 16 + i];
  };
  auto inv_shift_sub = [&]() {
    uint8_t t[16];
    static const int kInvShift[16] = {0, 13, 10, 7, 4, 1, 14, 11,
                                      8, 5, 2, 15, 12, 9, 6, 3};
    for (int i = 0; i < 16; ++i) t[i] = InvSBoxAt(st[kInvShift[i]]);
    std::memcpy(st, t, 16);
  };
  auto inv_mix = [&]() {
    for (int c = 0; c < 4; ++c) {
      uint8_t* p = st + c * 4;
      const uint8_t a0 = p[0], a1 = p[1], a2 = p[2], a3 = p[3];
      p[0] = Mul(a0, 14) ^ Mul(a1, 11) ^ Mul(a2, 13) ^ Mul(a3, 9);
      p[1] = Mul(a0, 9) ^ Mul(a1, 14) ^ Mul(a2, 11) ^ Mul(a3, 13);
      p[2] = Mul(a0, 13) ^ Mul(a1, 9) ^ Mul(a2, 14) ^ Mul(a3, 11);
      p[3] = Mul(a0, 11) ^ Mul(a1, 13) ^ Mul(a2, 9) ^ Mul(a3, 14);
    }
  };
  add_rk(k.rounds);
  for (int r = k.rounds - 1; r > 0; --r) {
    inv_shift_sub();
    add_rk(r);
    inv_mix();
  }
  inv_shift_sub();
  add_rk(0);
}

void EncryptBlock(const AesKey& k, uint8_t* st) {
  auto add_rk = [&](int r) {
    for (int i = 0; i < 16; ++i) st[i] ^= k.rk[r * 16 + i];
  };
  auto shift_sub = [&]() {
    uint8_t t[16];
    static const int kShift[16] = {0, 5, 10, 15, 4, 9, 14, 3,
                                   8, 13, 2, 7, 12, 1, 6, 11};
    for (int i = 0; i < 16; ++i) t[i] = kSBox[st[kShift[i]]];
    std::memcpy(st, t, 16);
  };
  auto mix = [&]() {
    for (int c = 0; c < 4; ++c) {
      uint8_t* p = st + c * 4;
      const uint8_t a0 = p[0], a1 = p[1], a2 = p[2], a3 = p[3];
      p[0] = Mul(a0, 2) ^ Mul(a1, 3) ^ a2 ^ a3;
      p[1] = a0 ^ Mul(a1, 2) ^ Mul(a2, 3) ^ a3;
      p[2] = a0 ^ a1 ^ Mul(a2, 2) ^ Mul(a3, 3);
      p[3] = Mul(a0, 3) ^ a1 ^ a2 ^ Mul(a3, 2);
    }
  };
  add_rk(0);
  for (int r = 1; r < k.rounds; ++r) {
    shift_sub();
    mix();
    add_rk(r);
  }
  shift_sub();
  add_rk(k.rounds);
}

}  // namespace

extern "C" {

// RC4 (PDF V1/V2 security): in-place capable (out may equal data).
void apt_rc4(const uint8_t* key, int keylen, const uint8_t* data, long len,
             uint8_t* out) {
  uint8_t s[256];
  for (int i = 0; i < 256; ++i) s[i] = static_cast<uint8_t>(i);
  int j = 0;
  for (int i = 0; i < 256; ++i) {
    j = (j + s[i] + key[i % keylen]) & 0xFF;
    const uint8_t t = s[i];
    s[i] = s[j];
    s[j] = t;
  }
  int a = 0, b = 0;
  for (long i = 0; i < len; ++i) {
    a = (a + 1) & 0xFF;
    b = (b + s[a]) & 0xFF;
    const uint8_t t = s[a];
    s[a] = s[b];
    s[b] = t;
    out[i] = data[i] ^ s[(s[a] + s[b]) & 0xFF];
  }
}

// AES-CBC decrypt (PDF AESV2/AESV3): data starts with the 16-byte IV;
// returns plaintext length after stripping PKCS#7 padding, or -1.
long apt_aes_cbc_decrypt(const uint8_t* key, int keybits,
                         const uint8_t* data, long len, uint8_t* out) {
  if (len < 32 || (len % 16) != 0) return -1;
  AesKey k;
  ExpandKey(key, keybits, &k);
  uint8_t prev[16];
  std::memcpy(prev, data, 16);
  long n = 0;
  for (long off = 16; off < len; off += 16) {
    uint8_t blk[16];
    std::memcpy(blk, data + off, 16);
    uint8_t tmp[16];
    std::memcpy(tmp, blk, 16);
    DecryptBlock(k, blk);
    for (int i = 0; i < 16; ++i) blk[i] ^= prev[i];
    std::memcpy(prev, tmp, 16);
    std::memcpy(out + n, blk, 16);
    n += 16;
  }
  const int pad = out[n - 1];
  if (pad < 1 || pad > 16 || pad > n) return -1;
  return n - pad;
}

// AES-CBC-no-padding encrypt/decrypt of exactly one or more blocks with
// a zero IV — the primitive the AES-256 (R6) password validation needs
// (Algorithm 2.A intermediate keys).
long apt_aes_cbc_nopad(const uint8_t* key, int keybits, const uint8_t* iv,
                       const uint8_t* data, long len, int decrypt,
                       uint8_t* out) {
  if ((len % 16) != 0) return -1;
  AesKey k;
  ExpandKey(key, keybits, &k);
  uint8_t prev[16];
  std::memcpy(prev, iv, 16);
  for (long off = 0; off < len; off += 16) {
    uint8_t blk[16];
    std::memcpy(blk, data + off, 16);
    if (decrypt) {
      uint8_t tmp[16];
      std::memcpy(tmp, blk, 16);
      DecryptBlock(k, blk);
      for (int i = 0; i < 16; ++i) blk[i] ^= prev[i];
      std::memcpy(prev, tmp, 16);
    } else {
      for (int i = 0; i < 16; ++i) blk[i] ^= prev[i];
      EncryptBlock(k, blk);
      std::memcpy(prev, blk, 16);
    }
    std::memcpy(out + off, blk, 16);
  }
  return len;
}

}  // extern "C"
