// JBIG2 generic-region codec (encoder + verification decoder).
//
// Native replacement for the reference's external `jbig2` (jbig2enc)
// binary invocation (reference mrc.py:502-510): produces either a
// PDF-embeddable segment stream (the `-p` mode: page info + immediate
// lossless generic region) or a standalone .jb2 file (file header +
// trailer segments).
//
// Implements ITU-T T.88: the MQ arithmetic coder (Annex E) and generic
// region coding with GBTEMPLATE 0, nominal AT pixels, optional TPGDON
// typical-prediction.  The decoder exists for round-trip validation of
// the encoder's output and for tooling (mask extraction).
//
// Build: g++ -O3 -shared -fPIC -o libjbig2tpu.so jbig2.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------- MQ coder

struct QeEntry { uint16_t qe; uint8_t nmps, nlps, sw; };

static const QeEntry kQe[47] = {
    {0x5601, 1, 1, 1},  {0x3401, 2, 6, 0},  {0x1801, 3, 9, 0},
    {0x0AC1, 4, 12, 0}, {0x0521, 5, 29, 0}, {0x0221, 38, 33, 0},
    {0x5601, 7, 6, 1},  {0x5401, 8, 14, 0}, {0x4801, 9, 14, 0},
    {0x3801, 10, 14, 0},{0x3001, 11, 17, 0},{0x2401, 12, 18, 0},
    {0x1C01, 13, 20, 0},{0x1601, 29, 21, 0},{0x5601, 15, 14, 1},
    {0x5401, 16, 14, 0},{0x5101, 17, 15, 0},{0x4801, 18, 16, 0},
    {0x3801, 19, 17, 0},{0x3401, 20, 18, 0},{0x3001, 21, 19, 0},
    {0x2801, 22, 19, 0},{0x2401, 23, 20, 0},{0x2201, 24, 21, 0},
    {0x1C01, 25, 22, 0},{0x1801, 26, 23, 0},{0x1601, 27, 24, 0},
    {0x1401, 28, 25, 0},{0x1201, 29, 26, 0},{0x1101, 30, 27, 0},
    {0x0AC1, 31, 28, 0},{0x09C1, 32, 29, 0},{0x08A1, 33, 30, 0},
    {0x0521, 34, 31, 0},{0x0441, 35, 32, 0},{0x02A1, 36, 33, 0},
    {0x0221, 37, 34, 0},{0x0141, 38, 35, 0},{0x0111, 39, 36, 0},
    {0x0085, 40, 37, 0},{0x0049, 41, 38, 0},{0x0025, 42, 39, 0},
    {0x0015, 43, 40, 0},{0x0009, 44, 41, 0},{0x0005, 45, 42, 0},
    {0x0001, 45, 43, 0},{0x5601, 46, 46, 0},
};

struct Ctx { uint8_t i = 0, mps = 0; };

class MQEncoder {
 public:
  explicit MQEncoder(std::vector<uint8_t>* out) : out_(out) {}

  void Encode(Ctx* cx, int bit) {
    const QeEntry& q = kQe[cx->i];
    if (bit == cx->mps) {
      a_ -= q.qe;
      if ((a_ & 0x8000) == 0) {
        if (a_ < q.qe) a_ = q.qe; else c_ += q.qe;
        cx->i = q.nmps;
        Renorm();
      } else {
        c_ += q.qe;
      }
    } else {
      a_ -= q.qe;
      if (a_ < q.qe) c_ += q.qe; else a_ = q.qe;
      if (q.sw) cx->mps ^= 1;
      cx->i = q.nlps;
      Renorm();
    }
  }

  // Encode n consecutive MPS symbols for one context in O(renorms):
  // between renormalizations the MPS path is just a_ -= qe; c_ += qe,
  // so all symbols until the next renorm collapse into one multiply.
  // Bit-exact vs n serial Encode(cx, mps) calls by construction — the
  // renorming symbol replays the serial conditional-exchange branch.
  void EncodeMPSRun(Ctx* cx, long n) {
    while (n > 0) {
      const QeEntry& q = kQe[cx->i];
      if (a_ >= 0x8000u + q.qe) {
        uint32_t k = (a_ - 0x8000u) / q.qe;   // >= 1 here
        if (static_cast<long>(k) > n) k = static_cast<uint32_t>(n);
        a_ -= k * q.qe;
        c_ += k * q.qe;
        n -= k;
        if (n == 0) break;
      }
      // this symbol renormalizes (a_ - qe < 0x8000)
      a_ -= q.qe;
      if (a_ < q.qe) a_ = q.qe; else c_ += q.qe;
      cx->i = q.nmps;
      Renorm();
      --n;
    }
  }

  void Flush() {
    // SETBITS
    uint32_t tempc = c_ + a_ - 1;
    c_ |= 0xFFFF;
    if (c_ >= tempc) c_ -= 0x8000;
    c_ <<= ct_; ByteOut();
    c_ <<= ct_; ByteOut();
    // terminating marker (decoders treat 0xFF 0xAC as past-the-end)
    if (!have_b_ || b_ != 0xFF) EmitPending();
    out_->push_back(0xFF);
    out_->push_back(0xAC);
  }

 private:
  void Renorm() {
    do {
      a_ <<= 1;
      c_ <<= 1;
      if (--ct_ == 0) ByteOut();
    } while ((a_ & 0x8000) == 0);
  }

  void EmitPending() {
    if (have_b_) out_->push_back(b_);
    have_b_ = false;
  }

  void ByteOut() {
    if (have_b_ && b_ == 0xFF) {
      EmitPending();
      b_ = static_cast<uint8_t>(c_ >> 20);
      have_b_ = true;
      c_ &= 0xFFFFF;
      ct_ = 7;
    } else {
      if (c_ < 0x8000000) {
        EmitPending();
        b_ = static_cast<uint8_t>(c_ >> 19);
        have_b_ = true;
        c_ &= 0x7FFFF;
        ct_ = 8;
      } else {
        if (have_b_) {
          b_ += 1;  // carry
          if (b_ == 0xFF) {
            c_ &= 0x7FFFFFF;
            EmitPending();
            b_ = static_cast<uint8_t>(c_ >> 20);
            have_b_ = true;
            c_ &= 0xFFFFF;
            ct_ = 7;
            return;
          }
        }
        EmitPending();
        b_ = static_cast<uint8_t>(c_ >> 19);
        have_b_ = true;
        c_ &= 0x7FFFF;
        ct_ = 8;
      }
    }
  }

  std::vector<uint8_t>* out_;
  uint32_t a_ = 0x8000, c_ = 0;
  int ct_ = 12;
  uint8_t b_ = 0;
  bool have_b_ = false;
};

class MQDecoder {
 public:
  MQDecoder(const uint8_t* data, long len) : data_(data), len_(len) {
    b_ = Byte(0);
    c_ = static_cast<uint32_t>(b_) << 16;
    ByteIn();
    c_ <<= 7;
    ct_ -= 7;
    a_ = 0x8000;
  }

  int Decode(Ctx* cx) {
    const QeEntry& q = kQe[cx->i];
    int d;
    a_ -= q.qe;
    if (((c_ >> 16) & 0xFFFF) < q.qe) {
      // LPS exchange
      if (a_ < q.qe) { d = cx->mps; cx->i = q.nmps; }
      else { d = 1 - cx->mps; if (q.sw) cx->mps ^= 1; cx->i = q.nlps; }
      a_ = q.qe;
      RenormD();
    } else {
      c_ -= static_cast<uint32_t>(q.qe) << 16;
      if ((a_ & 0x8000) == 0) {
        if (a_ < q.qe) { d = 1 - cx->mps; if (q.sw) cx->mps ^= 1; cx->i = q.nlps; }
        else { d = cx->mps; cx->i = q.nmps; }
        RenormD();
      } else {
        d = cx->mps;
      }
    }
    return d;
  }

 private:
  uint8_t Byte(long i) const { return i < len_ ? data_[i] : 0xFF; }

  void ByteIn() {
    if (b_ == 0xFF) {
      if (Byte(bp_ + 1) > 0x8F) {
        c_ += 0xFF00;
        ct_ = 8;
      } else {
        bp_ += 1;
        b_ = Byte(bp_);
        c_ += static_cast<uint32_t>(b_) << 9;
        ct_ = 7;
      }
    } else {
      bp_ += 1;
      b_ = Byte(bp_);
      c_ += static_cast<uint32_t>(b_) << 8;
      ct_ = 8;
    }
  }

  void RenormD() {
    do {
      if (ct_ == 0) ByteIn();
      a_ <<= 1;
      c_ <<= 1;
      ct_ -= 1;
    } while ((a_ & 0x8000) == 0);
  }

  const uint8_t* data_;
  long len_, bp_ = 0;
  uint32_t a_ = 0, c_ = 0;
  int ct_ = 0;
  uint8_t b_ = 0;
};

// ------------------------------------- integer arithmetic coding (Annex A)

// One IAx context: 512 MQ contexts indexed by the PREV bit-prefix state.
struct IntCtx {
  Ctx cx[512];
};

inline void UpdatePrev(uint32_t* prev, int bit) {
  *prev = (*prev < 256) ? ((*prev << 1) | bit)
                        : (((((*prev << 1) | bit) & 511) | 256));
}

void EncodeIntBit(MQEncoder* enc, IntCtx* ic, uint32_t* prev, int bit) {
  enc->Encode(&ic->cx[*prev], bit);
  UpdatePrev(prev, bit);
}

// Encode a signed integer per T.88 A.2 (the encoder mirror of the
// decoding procedure): sign bit, range-selector bits, then the offset
// value MSB-first.  oob encodes the out-of-band value ("negative zero").
void EncodeInt(MQEncoder* enc, IntCtx* ic, long v, bool oob = false) {
  uint32_t prev = 1;
  int s = oob ? 1 : (v < 0 ? 1 : 0);
  unsigned long val = oob ? 0 : (v < 0 ? -v : v);
  EncodeIntBit(enc, ic, &prev, s);
  int nbits;
  unsigned long offset;
  if (val <= 3)        { EncodeIntBit(enc, ic, &prev, 0); nbits = 2;  offset = 0; }
  else if (val <= 19)  { EncodeIntBit(enc, ic, &prev, 1);
                         EncodeIntBit(enc, ic, &prev, 0); nbits = 4;  offset = 4; }
  else if (val <= 83)  { EncodeIntBit(enc, ic, &prev, 1);
                         EncodeIntBit(enc, ic, &prev, 1);
                         EncodeIntBit(enc, ic, &prev, 0); nbits = 6;  offset = 20; }
  else if (val <= 339) { for (int k = 0; k < 3; ++k) EncodeIntBit(enc, ic, &prev, 1);
                         EncodeIntBit(enc, ic, &prev, 0); nbits = 8;  offset = 84; }
  else if (val <= 4435){ for (int k = 0; k < 4; ++k) EncodeIntBit(enc, ic, &prev, 1);
                         EncodeIntBit(enc, ic, &prev, 0); nbits = 12; offset = 340; }
  else                 { for (int k = 0; k < 5; ++k) EncodeIntBit(enc, ic, &prev, 1);
                         nbits = 32; offset = 4436; }
  unsigned long rem = val - offset;
  for (int k = nbits - 1; k >= 0; --k)
    EncodeIntBit(enc, ic, &prev, (rem >> k) & 1);
}

// Decode per A.2.  Returns false on OOB.
bool DecodeInt(MQDecoder* dec, IntCtx* ic, long* out) {
  uint32_t prev = 1;
  auto bit = [&]() {
    int b = dec->Decode(&ic->cx[prev]);
    UpdatePrev(&prev, b);
    return b;
  };
  int s = bit();
  int nbits;
  long offset;
  if (!bit())      { nbits = 2;  offset = 0; }
  else if (!bit()) { nbits = 4;  offset = 4; }
  else if (!bit()) { nbits = 6;  offset = 20; }
  else if (!bit()) { nbits = 8;  offset = 84; }
  else if (!bit()) { nbits = 12; offset = 340; }
  else             { nbits = 32; offset = 4436; }
  long v = 0;
  for (int k = 0; k < nbits; ++k) v = (v << 1) | bit();
  v += offset;
  if (s && v == 0) return false;  // OOB
  *out = s ? -v : v;
  return true;
}

// Symbol-ID coding (A.3): SYMCODELEN raw bits through a tree of contexts.
void EncodeID(MQEncoder* enc, Ctx* cx, int codelen, int id) {
  uint32_t prev = 1;
  for (int k = codelen - 1; k >= 0; --k) {
    int b = (id >> k) & 1;
    enc->Encode(&cx[prev], b);
    prev = (prev << 1) | b;
  }
}

int DecodeID(MQDecoder* dec, Ctx* cx, int codelen) {
  uint32_t prev = 1;
  for (int k = 0; k < codelen; ++k) {
    int b = dec->Decode(&cx[prev]);
    prev = (prev << 1) | b;
  }
  return static_cast<int>(prev) - (1 << codelen);
}

// --------------------------------------------- generic region, template 0

// T.88 6.2.5.7 GBTEMPLATE 0 with nominal AT pixels:
//   A1=(+3,-1) A2=(-3,-1) A3=(+2,-2) A4=(-2,-2)
// Context bit layout (bit 15 = raster-first template pixel):
//   15:A4  14:(x-1,y-2) 13:(x,y-2) 12:(x+1,y-2) 11:A3
//   10:A2   9:(x-2,y-1)  8:(x-1,y-1) 7:(x,y-1) 6:(x+1,y-1) 5:(x+2,y-1) 4:A1
//    3:(x-4,y) 2:(x-3,y) 1:(x-2,y) 0:(x-1,y)
constexpr int kTPGDONContext = 0x9B25;

inline int Px(const uint8_t* img, int w, int h, int x, int y) {
  if (x < 0 || x >= w || y < 0 || y >= h) return 0;
  return img[static_cast<long>(y) * w + x] & 1;
}

inline int Context0(const uint8_t* img, int w, int h, int x, int y) {
  int cx = 0;
  cx |= Px(img, w, h, x - 1, y) << 0;
  cx |= Px(img, w, h, x - 2, y) << 1;
  cx |= Px(img, w, h, x - 3, y) << 2;
  cx |= Px(img, w, h, x - 4, y) << 3;
  cx |= Px(img, w, h, x + 3, y - 1) << 4;   // A1
  cx |= Px(img, w, h, x + 2, y - 1) << 5;
  cx |= Px(img, w, h, x + 1, y - 1) << 6;
  cx |= Px(img, w, h, x,     y - 1) << 7;
  cx |= Px(img, w, h, x - 1, y - 1) << 8;
  cx |= Px(img, w, h, x - 2, y - 1) << 9;
  cx |= Px(img, w, h, x - 3, y - 1) << 10;  // A2
  cx |= Px(img, w, h, x + 2, y - 2) << 11;  // A3
  cx |= Px(img, w, h, x + 1, y - 2) << 12;
  cx |= Px(img, w, h, x,     y - 2) << 13;
  cx |= Px(img, w, h, x - 1, y - 2) << 14;
  cx |= Px(img, w, h, x - 2, y - 2) << 15;  // A4
  return cx;
}

// Incremental context update for template 0: when x advances, each of
// the three row groups (bits 15-11 / 10-4 / 3-0) shifts left one slot;
// the entering pixels are (x+3, y-2) at bit 11, (x+4, y-1) at bit 4 and
// the just-coded pixel at bit 0.
constexpr int kShiftMask = 0xF7EE;

// Length of the prefix of p[0..n) whose pixel values (&1) all equal v.
// Word-compares 8 canonical 0/1 bytes at a time; a non-canonical byte
// (e.g. 2) just breaks the word match and the byte loop takes over
// with the &1 semantics the serial coder uses.
inline long SameRun(const uint8_t* p, long n, uint8_t v) {
  long i = 0;
  const uint64_t pat = v ? 0x0101010101010101ull : 0ull;
  for (; i + 8 <= n; i += 8) {
    uint64_t wd;
    std::memcpy(&wd, p + i, 8);
    if (wd != pat) break;
  }
  for (; i < n; ++i)
    if ((p[i] & 1) != v) break;
  return i;
}

void EncodeGenericRegion(const uint8_t* img, int w, int h, bool tpgdon,
                         std::vector<uint8_t>* out) {
  // re-read per region so tests can toggle the serial path in-process
  const bool no_runopt = std::getenv("JBIG2_NO_RUNOPT") != nullptr;
  std::vector<Ctx> ctx(1 << 16);
  MQEncoder enc(out);
  bool ltp = false;
  // rows padded by 4 on the right so lookahead needs no bounds checks
  const int wp = w + 4;
  std::vector<uint8_t> rows(3 * wp, 0);
  uint8_t* r2 = rows.data();            // row y-2
  uint8_t* r1 = rows.data() + wp;       // row y-1
  uint8_t* r0 = rows.data() + 2 * wp;   // row y (coded copy)

  for (int y = 0; y < h; ++y) {
    const uint8_t* src = img + static_cast<long>(y) * w;
    if (tpgdon) {
      bool same;
      if (y == 0) {
        same = true;
        for (int x = 0; x < w; ++x) if (src[x] & 1) { same = false; break; }
      } else {
        same = std::memcmp(src, img + static_cast<long>(y - 1) * w, w) == 0;
      }
      enc.Encode(&ctx[kTPGDONContext], (same != ltp) ? 1 : 0);
      if (same != ltp) ltp = !ltp;
      if (ltp) {
        // row equals the previous one; keep the coded-row ring coherent
        if (y > 0) {
          std::memcpy(r0, r1, wp);
        } else {
          std::memset(r0, 0, wp);
        }
        uint8_t* tmp = r2; r2 = r1; r1 = r0; r0 = tmp;
        continue;
      }
    }
    // seed the context at x = 0 (everything left of x is 0)
    int c = (static_cast<int>(r2[0]) << 13) | (static_cast<int>(r2[1]) << 12)
          | (static_cast<int>(r2[2]) << 11)
          | (static_cast<int>(r1[0]) << 7) | (static_cast<int>(r1[1]) << 6)
          | (static_cast<int>(r1[2]) << 5) | (static_cast<int>(r1[3]) << 4);
    for (int x = 0; x < w; ) {
      const int bit = src[x] & 1;
      // Constant-context run fast path: the all-white (c=0, bit 0) and
      // solid-ink (c=0xFFFF, bit 1) neighbourhoods are fixed points of
      // the shift update, so a run whose source pixels AND entering
      // template pixels all match codes as one batched MPS run.  Text
      // masks are mostly margins/ink blocks, so this covers the bulk
      // of the pixels.  JBIG2_NO_RUNOPT=1 forces the serial path (the
      // byte-identity test in tests/test_jbig2.py A/Bs the two).
      if (!no_runopt &&
          ((c == 0 && bit == 0 && ctx[0].mps == 0) ||
           (c == 0xFFFF && bit == 1 && ctx[0xFFFF].mps == 1))) {
        const uint8_t v = static_cast<uint8_t>(bit);
        long rl = SameRun(src + x, w - x, v);
        rl = std::min(rl, SameRun(r2 + x + 3, static_cast<long>(w) - x, v));
        rl = std::min(rl, SameRun(r1 + x + 4, static_cast<long>(w) - x, v));
        if (rl >= 8) {
          enc.EncodeMPSRun(&ctx[c], rl);
          std::memset(r0 + x, v, rl);
          x += static_cast<int>(rl);
          continue;                       // context unchanged (fixed point)
        }
      }
      enc.Encode(&ctx[c], bit);
      r0[x] = static_cast<uint8_t>(bit);
      c = ((c << 1) & kShiftMask)
        | (static_cast<int>(r2[x + 3]) << 11)
        | (static_cast<int>(r1[x + 4]) << 4)
        | bit;
      ++x;
    }
    uint8_t* tmp = r2; r2 = r1; r1 = r0; r0 = tmp;
  }
  enc.Flush();
}

// Symbol-bitmap variants: same template-0 coding, but the MQ coder and
// the GB context array are shared across all symbols of a dictionary
// (T.88 6.5.8.1 codes every new symbol with one arithmetic coder).
void EncodeGenericInner(const uint8_t* img, int w, int h, MQEncoder* enc,
                        std::vector<Ctx>* ctx) {
  const int wp = w + 4;
  std::vector<uint8_t> rows(3 * wp, 0);
  uint8_t* r2 = rows.data();
  uint8_t* r1 = rows.data() + wp;
  uint8_t* r0 = rows.data() + 2 * wp;
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = img + static_cast<long>(y) * w;
    int c = (static_cast<int>(r2[0]) << 13) | (static_cast<int>(r2[1]) << 12)
          | (static_cast<int>(r2[2]) << 11)
          | (static_cast<int>(r1[0]) << 7) | (static_cast<int>(r1[1]) << 6)
          | (static_cast<int>(r1[2]) << 5) | (static_cast<int>(r1[3]) << 4);
    for (int x = 0; x < w; ++x) {
      const int bit = src[x] & 1;
      enc->Encode(&(*ctx)[c], bit);
      r0[x] = static_cast<uint8_t>(bit);
      c = ((c << 1) & kShiftMask)
        | (static_cast<int>(r2[x + 3]) << 11)
        | (static_cast<int>(r1[x + 4]) << 4)
        | bit;
    }
    uint8_t* tmp = r2; r2 = r1; r1 = r0; r0 = tmp;
  }
}

void DecodeGenericInner(MQDecoder* dec, std::vector<Ctx>* ctx,
                        uint8_t* img, int w, int h) {
  std::memset(img, 0, static_cast<long>(w) * h);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      img[static_cast<long>(y) * w + x] = static_cast<uint8_t>(
          dec->Decode(&(*ctx)[Context0(img, w, h, x, y)]));
    }
  }
}

long DecodeGenericRegion(const uint8_t* data, long len, bool tpgdon,
                         uint8_t* img, int w, int h) {
  std::vector<Ctx> ctx(1 << 16);
  MQDecoder dec(data, len);
  std::memset(img, 0, static_cast<long>(w) * h);
  bool ltp = false;
  for (int y = 0; y < h; ++y) {
    if (tpgdon) {
      if (dec.Decode(&ctx[kTPGDONContext])) ltp = !ltp;
      if (ltp) {
        if (y > 0)
          std::memcpy(img + static_cast<long>(y) * w,
                      img + static_cast<long>(y - 1) * w, w);
        continue;
      }
    }
    for (int x = 0; x < w; ++x) {
      img[static_cast<long>(y) * w + x] =
          static_cast<uint8_t>(dec.Decode(&ctx[Context0(img, w, h, x, y)]));
    }
  }
  return 0;
}

// --------------------------------------- symbol coding (dict + text region)

struct SymBitmap {
  int w = 0, h = 0;
  std::vector<uint8_t> px;  // w*h, one byte per pixel
  uint64_t hash = 0;
};

struct Instance {
  int x = 0, y = 0, id = 0;
};

uint64_t HashBitmap(const SymBitmap& s) {
  uint64_t hv = 1469598103934665603ull ^ (uint64_t(s.w) << 32) ^ uint64_t(s.h);
  for (uint8_t b : s.px) {
    hv ^= b;
    hv *= 1099511628211ull;
  }
  return hv;
}

// Correlation score for lossy classification (jbig2enc -s analogue):
// align the candidate and the class exemplar by centroid, then
// corr = |A AND B|^2 / (|A|*|B|) over the aligned overlap.  Returns the
// centroid-aligned placement shift in (dx, dy).  A 2x2 all-mismatch
// block anywhere vetoes the match (that is how visually distinct glyph
// pairs like e/c or 6/8 differ, per the classic pattern-matching
// literature), preventing character substitution errors.
double CorrelationScore(const SymBitmap& a, const SymBitmap& b,
                        long ones_a, long ones_b, double acx, double acy,
                        double bcx, double bcy, int* dx_out, int* dy_out) {
  const int dx = static_cast<int>(std::lround(acx - bcx));
  const int dy = static_cast<int>(std::lround(acy - bcy));
  *dx_out = dx;
  *dy_out = dy;
  // b placed at (dx, dy) in a's frame; iterate the union bbox
  const int x0 = std::min(0, dx), y0 = std::min(0, dy);
  const int x1 = std::max(a.w, b.w + dx), y1 = std::max(a.h, b.h + dy);
  auto at_a = [&](int x, int y) {
    return x >= 0 && x < a.w && y >= 0 && y < a.h &&
           a.px[static_cast<size_t>(y) * a.w + x] != 0;
  };
  auto at_b = [&](int x, int y) {
    return x - dx >= 0 && x - dx < b.w && y - dy >= 0 && y - dy < b.h &&
           b.px[static_cast<size_t>(y - dy) * b.w + (x - dx)] != 0;
  };
  long inter = 0;
  for (int y = y0; y < y1; ++y)
    for (int x = x0; x < x1; ++x)
      if (at_a(x, y) && at_b(x, y)) ++inter;
  // 2x2 all-mismatch veto
  for (int y = y0; y + 1 < y1; ++y) {
    for (int x = x0; x + 1 < x1; ++x) {
      bool all = true;
      for (int sy = 0; sy < 2 && all; ++sy)
        for (int sx = 0; sx < 2 && all; ++sx)
          if (at_a(x + sx, y + sy) == at_b(x + sx, y + sy)) all = false;
      if (all) return 0.0;
    }
  }
  if (ones_a == 0 || ones_b == 0) return 0.0;
  return static_cast<double>(inter) * static_cast<double>(inter) /
         (static_cast<double>(ones_a) * static_cast<double>(ones_b));
}

void Centroid(const SymBitmap& s, long* ones, double* cx, double* cy) {
  long n = 0, sx = 0, sy = 0;
  for (int y = 0; y < s.h; ++y)
    for (int x = 0; x < s.w; ++x)
      if (s.px[static_cast<size_t>(y) * s.w + x]) {
        ++n; sx += x; sy += y;
      }
  *ones = n;
  *cx = n ? static_cast<double>(sx) / n : 0.0;
  *cy = n ? static_cast<double>(sy) / n : 0.0;
}

// 8-connected component extraction; exact-match classification (identical
// bitmaps share one dictionary symbol, so the coding stays lossless: the
// OR of all placed instances reproduces the input page bit-for-bit).
// corr_thresh_pct > 0 additionally merges near-identical components into
// one class when their centroid-aligned correlation reaches the
// threshold (jbig2enc -s style classification; the coding then becomes
// lossy: instances render the class exemplar).
void ExtractSymbols(const uint8_t* img, int w, int h,
                    std::vector<SymBitmap>* symbols,
                    std::vector<Instance>* instances,
                    int corr_thresh_pct = 0) {
  std::vector<int32_t> label(static_cast<size_t>(w) * h, -1);
  std::vector<int> stack;
  struct CC { int x0, y0, x1, y1; };
  std::vector<CC> ccs;
  for (long i = 0; i < static_cast<long>(w) * h; ++i) {
    if (!(img[i] & 1) || label[i] >= 0) continue;
    const int id = static_cast<int>(ccs.size());
    CC cc{w, h, -1, -1};
    stack.clear();
    stack.push_back(static_cast<int>(i));
    label[i] = id;
    while (!stack.empty()) {
      const int p = stack.back();
      stack.pop_back();
      const int y = p / w, x = p % w;
      if (x < cc.x0) cc.x0 = x;
      if (y < cc.y0) cc.y0 = y;
      if (x > cc.x1) cc.x1 = x;
      if (y > cc.y1) cc.y1 = y;
      for (int dy = -1; dy <= 1; ++dy) {
        const int ny = y + dy;
        if (ny < 0 || ny >= h) continue;
        for (int dx = -1; dx <= 1; ++dx) {
          const int nx = x + dx;
          if (nx < 0 || nx >= w) continue;
          const long np = static_cast<long>(ny) * w + nx;
          if ((img[np] & 1) && label[np] < 0) {
            label[np] = id;
            stack.push_back(static_cast<int>(np));
          }
        }
      }
    }
    ccs.push_back(cc);
  }

  // cut each component's own pixels out of its bbox (overlapping bboxes
  // of distinct components must not bleed into each other's bitmaps)
  std::vector<SymBitmap> raw(ccs.size());
  for (size_t k = 0; k < ccs.size(); ++k) {
    raw[k].w = ccs[k].x1 - ccs[k].x0 + 1;
    raw[k].h = ccs[k].y1 - ccs[k].y0 + 1;
    raw[k].px.assign(static_cast<size_t>(raw[k].w) * raw[k].h, 0);
  }
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int32_t id = label[static_cast<long>(y) * w + x];
      if (id < 0) continue;
      SymBitmap& s = raw[id];
      s.px[static_cast<size_t>(y - ccs[id].y0) * s.w + (x - ccs[id].x0)] = 1;
    }
  }

  // classify: exact match by (w, h, pixels); optionally correlation
  struct Meta { long ones; double cx, cy; };
  std::vector<int> cls(ccs.size());
  std::vector<int> shx(ccs.size(), 0), shy(ccs.size(), 0);
  std::vector<std::pair<uint64_t, int>> seen;  // (hash, symbol index)
  std::vector<Meta> meta;                      // parallel to *symbols
  const double thresh = corr_thresh_pct / 100.0;
  for (size_t k = 0; k < raw.size(); ++k) {
    raw[k].hash = HashBitmap(raw[k]);
    int found = -1;
    for (const auto& hs : seen) {
      if (hs.first != raw[k].hash) continue;
      const SymBitmap& o = (*symbols)[hs.second];
      if (o.w == raw[k].w && o.h == raw[k].h && o.px == raw[k].px) {
        found = hs.second;
        break;
      }
    }
    long ones_k = 0;
    double cxk = 0.0, cyk = 0.0;
    if (corr_thresh_pct > 0 && found < 0) {
      Centroid(raw[k], &ones_k, &cxk, &cyk);
      for (size_t s = 0; s < symbols->size(); ++s) {
        const SymBitmap& ex = (*symbols)[s];
        if (std::abs(ex.w - raw[k].w) > 2 ||
            std::abs(ex.h - raw[k].h) > 2)
          continue;
        int dx = 0, dy = 0;
        const double sc = CorrelationScore(
            raw[k], ex, ones_k, meta[s].ones, cxk, cyk,
            meta[s].cx, meta[s].cy, &dx, &dy);
        if (sc >= thresh) {
          found = static_cast<int>(s);
          shx[k] = dx;
          shy[k] = dy;
          break;
        }
      }
    }
    if (found < 0) {
      found = static_cast<int>(symbols->size());
      if (corr_thresh_pct > 0) {
        if (ones_k == 0) Centroid(raw[k], &ones_k, &cxk, &cyk);
        meta.push_back(Meta{ones_k, cxk, cyk});
      }
      symbols->push_back(std::move(raw[k]));
      seen.emplace_back((*symbols)[found].hash, found);
    }
    cls[k] = found;
  }

  // dictionary order: sort symbols by (height, width); remap classes
  std::vector<int> order(symbols->size());
  for (size_t k = 0; k < order.size(); ++k) order[k] = static_cast<int>(k);
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    const SymBitmap &sa = (*symbols)[a], &sb = (*symbols)[b];
    if (sa.h != sb.h) return sa.h < sb.h;
    if (sa.w != sb.w) return sa.w < sb.w;
    return a < b;
  });
  std::vector<int> rank(order.size());
  std::vector<SymBitmap> sorted(order.size());
  for (size_t k = 0; k < order.size(); ++k) {
    rank[order[k]] = static_cast<int>(k);
    sorted[k] = std::move((*symbols)[order[k]]);
  }
  *symbols = std::move(sorted);

  instances->resize(ccs.size());
  for (size_t k = 0; k < ccs.size(); ++k) {
    // correlation matches place the class exemplar centroid-aligned
    // with the component (shift 0 for exact matches)
    (*instances)[k] = Instance{std::max(ccs[k].x0 + shx[k], 0),
                               std::max(ccs[k].y0 + shy[k], 0),
                               rank[cls[k]]};
  }
  std::sort(instances->begin(), instances->end(),
            [](const Instance& a, const Instance& b) {
              if (a.y != b.y) return a.y < b.y;
              if (a.x != b.x) return a.x < b.x;
              return a.id < b.id;
            });
}

int SymCodeLen(size_t nsyms) {
  int len = 0;
  while ((size_t(1) << len) < nsyms) ++len;
  return len;  // ceil(log2(n)); 0 when n == 1
}

// T.88 6.5 symbol dictionary, SDHUFF=0 SDREFAGG=0 template 0: height
// classes with IADH/IADW deltas, each new symbol's bitmap generic-coded
// with a shared coder, then the export run (everything exported).
void EncodeSymbolDict(const std::vector<SymBitmap>& syms,
                      std::vector<uint8_t>* out) {
  MQEncoder enc(out);
  IntCtx iadh, iadw, iaex;
  std::vector<Ctx> gb(1 << 16);
  size_t i = 0;
  int hc = 0;
  while (i < syms.size()) {
    const int hgt = syms[i].h;
    EncodeInt(&enc, &iadh, hgt - hc);
    hc = hgt;
    int wid = 0;
    while (i < syms.size() && syms[i].h == hgt) {
      EncodeInt(&enc, &iadw, syms[i].w - wid);
      wid = syms[i].w;
      EncodeGenericInner(syms[i].px.data(), syms[i].w, syms[i].h, &enc, &gb);
      ++i;
    }
    EncodeInt(&enc, &iadw, 0, /*oob=*/true);
  }
  EncodeInt(&enc, &iaex, 0);                          // run of not-exported
  EncodeInt(&enc, &iaex, static_cast<long>(syms.size()));  // all exported
  enc.Flush();
}

// T.88 6.4 text region, SBHUFF=0 REFINE=0 SBSTRIPS=1 REFCORNER=TOPLEFT
// TRANSPOSED=0: strips keyed by instance top row, IADT/IAFS/IADS deltas,
// IAID symbol ids.
void EncodeTextRegion(const std::vector<Instance>& inst,
                      const std::vector<SymBitmap>& syms,
                      std::vector<uint8_t>* out) {
  MQEncoder enc(out);
  IntCtx iadt, iafs, iads;
  const int codelen = SymCodeLen(syms.size());
  std::vector<Ctx> iaid(size_t(1) << (codelen + 1));
  EncodeInt(&enc, &iadt, 0);  // initial STRIPT
  int stript = 0, firsts = 0;
  size_t i = 0;
  while (i < inst.size()) {
    const int t = inst[i].y;
    EncodeInt(&enc, &iadt, t - stript);
    stript = t;
    int curs = 0;
    bool first = true;
    while (i < inst.size() && inst[i].y == t) {
      if (first) {
        EncodeInt(&enc, &iafs, inst[i].x - firsts);
        firsts = inst[i].x;
        curs = firsts;
        first = false;
      } else {
        EncodeInt(&enc, &iads, inst[i].x - curs);
        curs = inst[i].x;
      }
      EncodeID(&enc, iaid.data(), codelen, inst[i].id);
      curs += syms[inst[i].id].w - 1;
      ++i;
    }
    EncodeInt(&enc, &iads, 0, /*oob=*/true);
  }
  enc.Flush();
}

// Decoder mirrors: parse a symbol dictionary segment's data into syms.
long DecodeSymbolDict(const uint8_t* data, long len,
                      std::vector<SymBitmap>* syms) {
  if (len < 18) return -1;
  const int flags = (data[0] << 8) | data[1];
  if (flags & 0x0003) return -1;  // only SDHUFF=0, SDREFAGG=0
  if ((flags >> 10) & 3) return -1;  // template 0 only
  long pos = 2 + 8;  // flags + AT pixels
  if (pos + 8 > len) return -1;
  auto u32 = [&](long p) {
    return (static_cast<uint32_t>(data[p]) << 24) |
           (static_cast<uint32_t>(data[p + 1]) << 16) |
           (static_cast<uint32_t>(data[p + 2]) << 8) | data[p + 3];
  };
  const uint32_t numex = u32(pos);
  const uint32_t numnew = u32(pos + 4);
  pos += 8;
  MQDecoder dec(data + pos, len - pos);
  IntCtx iadh, iadw, iaex;
  std::vector<Ctx> gb(1 << 16);
  int hc = 0;
  while (syms->size() < numnew) {
    long dh;
    if (!DecodeInt(&dec, &iadh, &dh)) return -1;
    hc += static_cast<int>(dh);
    int wid = 0;
    for (;;) {
      long dw;
      if (!DecodeInt(&dec, &iadw, &dw)) break;  // OOB ends height class
      wid += static_cast<int>(dw);
      if (wid <= 0 || hc <= 0 || wid > 1 << 20 || hc > 1 << 20) return -1;
      SymBitmap s;
      s.w = wid;
      s.h = hc;
      s.px.assign(static_cast<size_t>(wid) * hc, 0);
      DecodeGenericInner(&dec, &gb, s.px.data(), wid, hc);
      syms->push_back(std::move(s));
      if (syms->size() > numnew) return -1;
    }
  }
  // export flags: we only support the all-exported pattern
  long run0, run1;
  if (!DecodeInt(&dec, &iaex, &run0) || run0 != 0) return -1;
  if (!DecodeInt(&dec, &iaex, &run1) ||
      run1 != static_cast<long>(numnew) || numex != numnew) return -1;
  return 0;
}

// Decode a text region segment's data, OR-ing instances onto the page.
long DecodeTextRegion(const uint8_t* data, long len,
                      const std::vector<SymBitmap>& syms,
                      uint8_t* page, int pw, int ph) {
  if (len < 23) return -1;
  auto u32 = [&](long p) {
    return (static_cast<uint32_t>(data[p]) << 24) |
           (static_cast<uint32_t>(data[p + 1]) << 16) |
           (static_cast<uint32_t>(data[p + 2]) << 8) | data[p + 3];
  };
  const int rx = static_cast<int>(u32(8));
  const int ry = static_cast<int>(u32(12));
  const int flags = (data[17] << 8) | data[18];
  if (flags & 0x0003) return -1;          // SBHUFF=0, REFINE=0 only
  const int logstrips = (flags >> 2) & 3;
  const int refcorner = (flags >> 4) & 3;
  if (logstrips != 0 || refcorner != 1 || (flags >> 6) & 1) return -1;
  const uint32_t ninst = u32(19);
  MQDecoder dec(data + 23, len - 23);
  IntCtx iadt, iafs, iads;
  const int codelen = SymCodeLen(syms.size());
  std::vector<Ctx> iaid(size_t(1) << (codelen + 1));
  long dt;
  if (!DecodeInt(&dec, &iadt, &dt)) return -1;
  long stript = -dt, firsts = 0;
  uint32_t done = 0;
  while (done < ninst) {
    if (!DecodeInt(&dec, &iadt, &dt)) return -1;
    stript += dt;
    long curs = 0;
    bool first = true;
    for (;;) {
      long d;
      if (first) {
        if (!DecodeInt(&dec, &iafs, &d)) return -1;
        firsts += d;
        curs = firsts;
        first = false;
      } else {
        if (!DecodeInt(&dec, &iads, &d)) break;  // OOB: end of strip
        curs += d;
      }
      const int id = DecodeID(&dec, iaid.data(), codelen);
      if (id < 0 || static_cast<size_t>(id) >= syms.size()) return -1;
      const SymBitmap& s = syms[id];
      for (int yy = 0; yy < s.h; ++yy) {
        const long py = ry + stript + yy;
        if (py < 0 || py >= ph) continue;
        for (int xx = 0; xx < s.w; ++xx) {
          const long px = rx + curs + xx;
          if (px < 0 || px >= pw) continue;
          page[py * pw + px] |= s.px[static_cast<size_t>(yy) * s.w + xx];
        }
      }
      curs += s.w - 1;
      if (++done >= ninst) break;
    }
  }
  return 0;
}

// ------------------------------------------------------ segment plumbing

void PutU32(std::vector<uint8_t>* v, uint32_t x) {
  v->push_back(x >> 24); v->push_back(x >> 16);
  v->push_back(x >> 8);  v->push_back(x);
}

void SegmentHeader(std::vector<uint8_t>* v, uint32_t number, int type,
                   uint32_t page, uint32_t data_len) {
  PutU32(v, number);
  v->push_back(static_cast<uint8_t>(type));  // small page assoc, not deferred
  v->push_back(0x00);                        // 0 referred-to segments
  v->push_back(static_cast<uint8_t>(page));
  PutU32(v, data_len);
}

// Header with one referred-to segment (short form; our segment numbers
// stay below 256 so the referred number is a single byte).
void SegmentHeaderRef1(std::vector<uint8_t>* v, uint32_t number, int type,
                       uint32_t referred, uint32_t page, uint32_t data_len) {
  PutU32(v, number);
  v->push_back(static_cast<uint8_t>(type));
  v->push_back(0x20);  // 1 referred-to segment, retain bits 0
  v->push_back(static_cast<uint8_t>(referred));
  v->push_back(static_cast<uint8_t>(page));
  PutU32(v, data_len);
}

// Assemble the symbol-coded page stream (page info + symbol dictionary +
// immediate lossless text region [+ XOR residue region][+ standalone
// trailer]).  A non-null residue (w*h bytes, the XOR of the original
// page with the exemplar rendering) makes a lossy symbol classification
// lossless again: the trailing generic region composites onto the page
// with the XOR operator (T.88 8.2 core composition; the page-info flags
// advertise operator override).
void AssembleSymbolStream(const std::vector<SymBitmap>& syms,
                          const std::vector<Instance>& inst,
                          int w, int h, bool embedded,
                          const uint8_t* residue, int tpgdon,
                          std::vector<uint8_t>* buf) {
  std::vector<uint8_t> dict_mq, text_mq;
  EncodeSymbolDict(syms, &dict_mq);
  EncodeTextRegion(inst, syms, &text_mq);

  uint32_t segnum = 0;
  if (!embedded) {
    static const uint8_t kFileHeader[8] =
        {0x97, 0x4A, 0x42, 0x32, 0x0D, 0x0A, 0x1A, 0x0A};
    buf->insert(buf->end(), kFileHeader, kFileHeader + 8);
    buf->push_back(0x01);
    PutU32(buf, 1);
  }

  SegmentHeader(buf, segnum++, 48, 1, 19);  // page information
  PutU32(buf, static_cast<uint32_t>(w));
  PutU32(buf, static_cast<uint32_t>(h));
  PutU32(buf, 0);
  PutU32(buf, 0);
  // page flags: eventually lossless; operator override allowed when a
  // residue region follows
  buf->push_back(residue ? 0x41 : 0x01);
  buf->push_back(0x00);
  buf->push_back(0x00);

  // symbol dictionary (type 0): flags + 8 AT bytes + numex + numnew + MQ
  const uint32_t dict_seg = segnum;
  const uint32_t dict_len = 2 + 8 + 4 + 4 +
      static_cast<uint32_t>(dict_mq.size());
  SegmentHeader(buf, segnum++, 0, 1, dict_len);
  buf->push_back(0x00);
  buf->push_back(0x00);  // SDHUFF=0 SDREFAGG=0 template 0
  const int8_t at[8] = {3, -1, -3, -1, 2, -2, -2, -2};
  for (int i = 0; i < 8; ++i) buf->push_back(static_cast<uint8_t>(at[i]));
  PutU32(buf, static_cast<uint32_t>(syms.size()));  // SDNUMEXSYMS
  PutU32(buf, static_cast<uint32_t>(syms.size()));  // SDNUMNEWSYMS
  buf->insert(buf->end(), dict_mq.begin(), dict_mq.end());

  // immediate lossless text region (type 7) referring to the dictionary
  const uint32_t text_len = 17 + 2 + 4 +
      static_cast<uint32_t>(text_mq.size());
  SegmentHeaderRef1(buf, segnum++, 7, dict_seg, 1, text_len);
  PutU32(buf, static_cast<uint32_t>(w));
  PutU32(buf, static_cast<uint32_t>(h));
  PutU32(buf, 0);
  PutU32(buf, 0);
  buf->push_back(0x00);  // combination operator OR
  buf->push_back(0x00);
  buf->push_back(0x10);  // flags: REFCORNER=TOPLEFT, everything else 0
  PutU32(buf, static_cast<uint32_t>(inst.size()));
  buf->insert(buf->end(), text_mq.begin(), text_mq.end());

  if (residue != nullptr) {
    // immediate lossless generic region, external combination XOR
    std::vector<uint8_t> res_mq;
    EncodeGenericRegion(residue, w, h, tpgdon != 0, &res_mq);
    const uint32_t region_len = 17 + 1 + 8 +
        static_cast<uint32_t>(res_mq.size());
    SegmentHeader(buf, segnum++, 39, 1, region_len);
    PutU32(buf, static_cast<uint32_t>(w));
    PutU32(buf, static_cast<uint32_t>(h));
    PutU32(buf, 0);
    PutU32(buf, 0);
    buf->push_back(0x02);  // external combination operator: XOR
    buf->push_back(static_cast<uint8_t>(tpgdon ? 0x08 : 0x00));
    const int8_t at[8] = {3, -1, -3, -1, 2, -2, -2, -2};
    for (int i = 0; i < 8; ++i)
      buf->push_back(static_cast<uint8_t>(at[i]));
    buf->insert(buf->end(), res_mq.begin(), res_mq.end());
  }

  if (!embedded) {
    SegmentHeader(buf, segnum++, 49, 1, 0);
    SegmentHeader(buf, segnum++, 51, 0, 0);
  }
}

}  // namespace

extern "C" {

// img: one byte per pixel (nonzero = black). Returns bytes written or
// -needed if cap is too small.  embedded != 0 -> PDF segment stream
// (jbig2enc -p equivalent); else standalone .jb2 with file header.
long jbig2tpu_encode(const uint8_t* img, int w, int h, int tpgdon,
                     int embedded, uint8_t* out, long cap) {
  std::vector<uint8_t> mq;
  EncodeGenericRegion(img, w, h, tpgdon != 0, &mq);

  std::vector<uint8_t> buf;
  buf.reserve(mq.size() + 128);

  uint32_t segnum = 0;
  if (!embedded) {
    static const uint8_t kFileHeader[8] =
        {0x97, 0x4A, 0x42, 0x32, 0x0D, 0x0A, 0x1A, 0x0A};
    buf.insert(buf.end(), kFileHeader, kFileHeader + 8);
    buf.push_back(0x01);  // sequential organisation, known page count
    PutU32(&buf, 1);      // one page
  }

  // page information segment (type 48), 19 data bytes
  SegmentHeader(&buf, segnum++, 48, 1, 19);
  PutU32(&buf, static_cast<uint32_t>(w));
  PutU32(&buf, static_cast<uint32_t>(h));
  PutU32(&buf, 0);  // x resolution (unknown)
  PutU32(&buf, 0);  // y resolution (unknown)
  buf.push_back(0x01);  // page flags: eventually lossless
  buf.push_back(0x00); buf.push_back(0x00);  // no striping

  // immediate lossless generic region (type 39)
  const uint32_t region_len = 17 + 1 + 8 + static_cast<uint32_t>(mq.size());
  SegmentHeader(&buf, segnum++, 39, 1, region_len);
  PutU32(&buf, static_cast<uint32_t>(w));
  PutU32(&buf, static_cast<uint32_t>(h));
  PutU32(&buf, 0);  // region x
  PutU32(&buf, 0);  // region y
  buf.push_back(0x00);  // external combination operator: OR
  buf.push_back(static_cast<uint8_t>(tpgdon ? 0x08 : 0x00));  // GB flags
  // nominal AT pixels for template 0
  const int8_t at[8] = {3, -1, -3, -1, 2, -2, -2, -2};
  for (int i = 0; i < 8; ++i) buf.push_back(static_cast<uint8_t>(at[i]));
  buf.insert(buf.end(), mq.begin(), mq.end());

  if (!embedded) {
    SegmentHeader(&buf, segnum++, 49, 1, 0);  // end of page
    SegmentHeader(&buf, segnum++, 51, 0, 0);  // end of file
  }

  if (static_cast<long>(buf.size()) > cap)
    return -static_cast<long>(buf.size());
  std::memcpy(out, buf.data(), buf.size());
  return static_cast<long>(buf.size());
}

// Packed-row input variant of jbig2tpu_encode: packed holds `stride`
// bytes per row, bits MSB-first (np.packbits convention — the layout
// the device mask transfer already uses, so the host never materializes
// a byte-per-pixel mask).  invert != 0 flips every pixel (the pipeline
// encodes ~mask; row-end padding bits flip too but lie beyond w and are
// never read).
long jbig2tpu_encode_packed(const uint8_t* packed, int stride, int w,
                            int h, int invert, int tpgdon, int embedded,
                            uint8_t* out, long cap) {
  std::vector<uint8_t> img(static_cast<long>(w) * h);
  const uint8_t inv = invert ? 0xFF : 0x00;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = packed + static_cast<long>(y) * stride;
    uint8_t* dst = img.data() + static_cast<long>(y) * w;
    int x = 0;
    for (int b = 0; b < stride && x < w; ++b) {
      const uint8_t v = row[b] ^ inv;
      const int n = (w - x) < 8 ? (w - x) : 8;
      for (int i = 0; i < n; ++i)
        dst[x + i] = (v >> (7 - i)) & 1;
      x += n;
    }
  }
  return jbig2tpu_encode(img.data(), w, h, tpgdon, embedded, out, cap);
}

// Encode ONE immediate lossless generic region segment (type 39) for a
// horizontal band of a larger page: img is (band_h, w) at page row y0.
// Emits only the region segment (no file/page plumbing) with the given
// segment number, so callers can encode bands concurrently and then
// concatenate page-info + band segments into one stream (external
// combination operator OR; bands are disjoint).  Returns bytes written
// or -needed if cap is too small.
long jbig2tpu_encode_band(const uint8_t* img, int w, int band_h, int y0,
                          int tpgdon, unsigned segnum, uint8_t* out,
                          long cap) {
  std::vector<uint8_t> mq;
  EncodeGenericRegion(img, w, band_h, tpgdon != 0, &mq);

  std::vector<uint8_t> buf;
  buf.reserve(mq.size() + 64);
  const uint32_t region_len = 17 + 1 + 8 + static_cast<uint32_t>(mq.size());
  SegmentHeader(&buf, segnum, 39, 1, region_len);
  PutU32(&buf, static_cast<uint32_t>(w));
  PutU32(&buf, static_cast<uint32_t>(band_h));
  PutU32(&buf, 0);  // region x
  PutU32(&buf, static_cast<uint32_t>(y0));  // region y
  buf.push_back(0x00);  // external combination operator: OR
  buf.push_back(static_cast<uint8_t>(tpgdon ? 0x08 : 0x00));  // GB flags
  const int8_t at[8] = {3, -1, -3, -1, 2, -2, -2, -2};
  for (int i = 0; i < 8; ++i) buf.push_back(static_cast<uint8_t>(at[i]));
  buf.insert(buf.end(), mq.begin(), mq.end());

  if (static_cast<long>(buf.size()) > cap)
    return -static_cast<long>(buf.size());
  std::memcpy(out, buf.data(), buf.size());
  return static_cast<long>(buf.size());
}

// Symbol-coded encode (jbig2enc -s equivalent).  mode: 1 = force symbol
// coding, 2 = auto (emit whichever of generic/symbol is smaller),
// 3 = lossy classes + XOR residue region (overall LOSSLESS: the
// residue region composites onto the exemplar rendering with the XOR
// operator, reconstructing the input bit-for-bit — the in-spec
// equivalent of jbig2enc's never-finished refinement mode).
// corr_thresh_pct: 0 = lossless exact-match classes only; > 0 also
// merges components whose centroid-aligned correlation reaches the
// threshold (lossy, like jbig2enc's default classifier; a 2x2
// all-mismatch veto guards against character substitution).  Returns
// bytes written, -needed if cap is too small, or -1 on empty/degenerate
// input in forced-symbol mode (callers fall back to generic).
long jbig2tpu_encode_symbol(const uint8_t* img, int w, int h, int tpgdon,
                            int embedded, int mode, int corr_thresh_pct,
                            uint8_t* out, long cap) {
  std::vector<SymBitmap> syms;
  std::vector<Instance> inst;
  ExtractSymbols(img, w, h, &syms, &inst, corr_thresh_pct);

  std::vector<uint8_t> residue;
  const uint8_t* res_ptr = nullptr;
  if (mode == 3 && !syms.empty()) {
    // exemplar rendering, then residue = render XOR original
    residue.assign(static_cast<size_t>(w) * h, 0);
    for (const Instance& in : inst) {
      const SymBitmap& s = syms[in.id];
      for (int yy = 0; yy < s.h; ++yy) {
        const long py = static_cast<long>(in.y) + yy;
        if (py < 0 || py >= h) continue;
        for (int xx = 0; xx < s.w; ++xx) {
          const long px = static_cast<long>(in.x) + xx;
          if (px < 0 || px >= w) continue;
          residue[py * w + px] |= s.px[static_cast<size_t>(yy) * s.w + xx];
        }
      }
    }
    bool any = false;
    for (long i = 0; i < static_cast<long>(w) * h; ++i) {
      residue[i] = (residue[i] ^ (img[i] & 1)) & 1;
      any = any || residue[i];
    }
    if (any) res_ptr = residue.data();
  }

  std::vector<uint8_t> sym_buf;
  if (!syms.empty())
    AssembleSymbolStream(syms, inst, w, h, embedded != 0, res_ptr,
                         tpgdon, &sym_buf);

  if (mode == 2 || syms.empty()) {
    std::vector<uint8_t> gen_mq;
    EncodeGenericRegion(img, w, h, tpgdon != 0, &gen_mq);
    // generic stream overhead: headers as in jbig2tpu_encode
    const long gen_total = static_cast<long>(gen_mq.size()) + 30 + 37 +
                           (embedded ? 0 : 13 + 22);
    if (syms.empty() ||
        gen_total <= static_cast<long>(sym_buf.size())) {
      return jbig2tpu_encode(img, w, h, tpgdon, embedded, out, cap);
    }
  }
  if (syms.empty()) return -1;
  if (static_cast<long>(sym_buf.size()) > cap)
    return -static_cast<long>(sym_buf.size());
  std::memcpy(out, sym_buf.data(), sym_buf.size());
  return static_cast<long>(sym_buf.size());
}

// Decodes a stream produced by the encoders above (generic and/or
// symbol-coded segments, embedded or standalone).  out must hold w*h
// bytes; (w, h) must match the encoded page.  Returns 0 or -1.
long jbig2tpu_decode(const uint8_t* data, long len, uint8_t* out,
                     int w, int h) {
  long pos = 0;
  if (len >= 9 && data[0] == 0x97 && data[1] == 0x4A && data[2] == 0x42 &&
      data[3] == 0x32) {  // standalone file header
    const uint8_t fflags = data[8];
    pos = 9 + ((fflags & 0x02) ? 0 : 4);
  }
  auto u32 = [&](long p) {
    return (static_cast<uint32_t>(data[p]) << 24) |
           (static_cast<uint32_t>(data[p + 1]) << 16) |
           (static_cast<uint32_t>(data[p + 2]) << 8) | data[p + 3];
  };
  std::memset(out, 0, static_cast<long>(w) * h);
  std::vector<SymBitmap> syms;
  bool decoded_any = false;
  while (pos + 11 <= len) {
    const uint32_t segnum = u32(pos);
    const uint8_t flags = data[pos + 4];
    const int type = flags & 0x3F;
    long hp = pos + 5;
    const uint8_t rt = data[hp];
    uint32_t nrefs;
    if ((rt >> 5) == 7) {
      nrefs = u32(hp) & 0x1FFFFFFF;
      hp += 4 + (nrefs + 8) / 8;  // long form + retain bits
    } else {
      nrefs = rt >> 5;
      hp += 1;
    }
    const int refsize = segnum <= 256 ? 1 : (segnum <= 65536 ? 2 : 4);
    hp += static_cast<long>(nrefs) * refsize;
    hp += (flags & 0x40) ? 4 : 1;  // page association
    if (hp + 4 > len) return -1;
    const uint32_t dlen = u32(hp);
    const long body = hp + 4;
    if (body + dlen > len) return -1;

    if (type == 0) {
      std::vector<SymBitmap> fresh;
      if (DecodeSymbolDict(data + body, dlen, &fresh) != 0) return -1;
      for (auto& s : fresh) syms.push_back(std::move(s));
    } else if (type == 4 || type == 6 || type == 7) {
      if (DecodeTextRegion(data + body, dlen, syms, out, w, h) != 0)
        return -1;
      decoded_any = true;
    } else if (type == 39 || type == 38 || type == 36) {
      if (static_cast<long>(dlen) < 26) return -1;
      const uint32_t rw = u32(body);
      const uint32_t rh = u32(body + 4);
      const uint32_t rx = u32(body + 8);
      const uint32_t ry = u32(body + 12);
      // full-width bands at a row offset (rx always 0 in our streams)
      if (static_cast<int>(rw) != w || rx != 0 ||
          static_cast<long>(ry) + rh > static_cast<long>(h)) return -1;
      const int comb = data[body + 16] & 0x07;
      const bool tpgdon = (data[body + 17] & 0x08) != 0;
      std::vector<uint8_t> tmp(static_cast<size_t>(w) * rh, 0);
      if (DecodeGenericRegion(data + body + 26, dlen - 26, tpgdon,
                              tmp.data(), w,
                              static_cast<int>(rh)) != 0) return -1;
      uint8_t* dst = out + static_cast<long>(ry) * w;
      const long n = static_cast<long>(w) * rh;
      switch (comb) {
        case 0:  // OR
          for (long k = 0; k < n; ++k) dst[k] |= tmp[k];
          break;
        case 1:  // AND
          for (long k = 0; k < n; ++k) dst[k] &= tmp[k];
          break;
        case 2:  // XOR (the refine-mode residue)
          for (long k = 0; k < n; ++k) dst[k] ^= tmp[k];
          break;
        case 3:  // XNOR
          for (long k = 0; k < n; ++k) dst[k] = (dst[k] ^ tmp[k]) ^ 1;
          break;
        default:  // REPLACE
          std::memcpy(dst, tmp.data(), n);
          break;
      }
      decoded_any = true;
    }
    pos = body + dlen;
  }
  return decoded_any ? 0 : -1;
}

}  // extern "C"
