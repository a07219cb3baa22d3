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

#include <cstdint>
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

void EncodeGenericRegion(const uint8_t* img, int w, int h, bool tpgdon,
                         std::vector<uint8_t>* out) {
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
    for (int x = 0; x < w; ++x) {
      const int bit = src[x] & 1;
      enc.Encode(&ctx[c], bit);
      r0[x] = static_cast<uint8_t>(bit);
      c = ((c << 1) & kShiftMask)
        | (static_cast<int>(r2[x + 3]) << 11)
        | (static_cast<int>(r1[x + 4]) << 4)
        | bit;
    }
    uint8_t* tmp = r2; r2 = r1; r1 = r0; r0 = tmp;
  }
  enc.Flush();
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

// Decodes a stream produced by jbig2tpu_encode (embedded form).  out must
// hold w*h bytes; (w, h) must match the encoded page.  Returns 0 or -1.
long jbig2tpu_decode(const uint8_t* data, long len, uint8_t* out,
                     int w, int h) {
  // walk segments: header is 4+1+1+1+4 = 11 bytes in our fixed layout
  long pos = 0;
  while (pos + 11 <= len) {
    int type = data[pos + 4] & 0x3F;
    uint32_t dlen = (static_cast<uint32_t>(data[pos + 7]) << 24) |
                    (static_cast<uint32_t>(data[pos + 8]) << 16) |
                    (static_cast<uint32_t>(data[pos + 9]) << 8) |
                    static_cast<uint32_t>(data[pos + 10]);
    long body = pos + 11;
    if (type == 39 || type == 38 || type == 36) {
      if (body + 26 > len) return -1;
      uint32_t rw = (static_cast<uint32_t>(data[body]) << 24) |
                    (static_cast<uint32_t>(data[body + 1]) << 16) |
                    (static_cast<uint32_t>(data[body + 2]) << 8) |
                    data[body + 3];
      uint32_t rh = (static_cast<uint32_t>(data[body + 4]) << 24) |
                    (static_cast<uint32_t>(data[body + 5]) << 16) |
                    (static_cast<uint32_t>(data[body + 6]) << 8) |
                    data[body + 7];
      if (static_cast<int>(rw) != w || static_cast<int>(rh) != h) return -1;
      bool tpgdon = (data[body + 17] & 0x08) != 0;
      const uint8_t* mq = data + body + 26;
      long mqlen = static_cast<long>(dlen) - 26;
      if (mqlen < 0) return -1;
      return DecodeGenericRegion(mq, mqlen, tpgdon, out, w, h);
    }
    pos = body + dlen;
  }
  return -1;
}

}  // extern "C"
