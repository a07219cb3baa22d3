// JPEG2000 (ITU-T T.800) EBCOT Tier-1 code-block encoder.
//
// Part of the in-tree TPU JPEG2000 implementation: the wavelet transform
// and quantization run on the TPU (codecs/jp2tpu.py); this file codes one
// quantized code block (<= 64x64) with the three-pass context-modelled MQ
// arithmetic coder.  Tier-2 (packet headers, tag trees, markers) and the
// PCRD rate allocation live in Python; truncation is realised by
// re-encoding a block with fewer passes, so every emitted stream is a
// cleanly flushed MQ codeword (no truncation-length estimation games).
//
// The MQ coder matches the JBIG2 one in native/jbig2.cpp (same Qe table,
// ITU-T T.88 == T.800 Annex C); only the flush differs (no 0xFFAC
// trailer; a pending 0xFF byte is dropped per T.800 C.2.9).
//
// Replaces the reference's external Kakadu/OpenJPEG/Grok binaries
// (jpeg2000.py:37-42) for fg/bg layer encoding.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct QeEntry {
  uint16_t qe;
  uint8_t nmps, nlps, sw;
};

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

struct Ctx {
  uint8_t i = 0, mps = 0;
};

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

  // T.800 C.2.9 FLUSH: set as many 1 bits in C as possible, push out,
  // drop a trailing 0xFF.
  void Flush() {
    uint32_t tempc = c_ + a_ - 1;
    c_ |= 0xFFFF;
    if (c_ >= tempc) c_ -= 0x8000;
    c_ <<= ct_;
    ByteOut();
    c_ <<= ct_;
    ByteOut();
    if (have_b_ && b_ != 0xFF) out_->push_back(b_);
    have_b_ = false;
  }

  long ApproxBytes() const {
    return static_cast<long>(out_->size()) + (have_b_ ? 1 : 0) + 1;
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

// --- T1 context tables -------------------------------------------------

// Contexts: 0-8 zero coding, 9-13 sign coding, 14-16 magnitude
// refinement, 17 run-length, 18 uniform.
enum { kCtxRL = 17, kCtxUni = 18, kNumCtx = 19 };

// Orientations: 0 = LL/LH (H primary), 1 = HL (V primary), 2 = HH.
int ZcContext(int orient, int h, int v, int d) {
  if (orient == 1) {
    int t = h;
    h = v;
    v = t;
  }
  if (orient != 2) {
    if (h == 2) return 8;
    if (h == 1) {
      if (v >= 1) return 7;
      return d >= 1 ? 6 : 5;
    }
    if (v == 2) return 4;
    if (v == 1) return 3;
    if (d >= 2) return 2;
    return d;           // 1 -> 1, 0 -> 0
  }
  int hv = h + v;
  if (d >= 3) return 8;
  if (d == 2) return hv >= 1 ? 7 : 6;
  if (d == 1) {
    if (hv >= 2) return 5;
    return hv == 1 ? 4 : 3;
  }
  if (hv >= 2) return 2;
  return hv;            // 1 -> 1, 0 -> 0
}

// Sign-coding: hc/vc in {-1, 0, 1}. Returns context 9..13; *xorbit set.
int ScContext(int hc, int vc, int* xorbit) {
  if (hc == 1) {
    *xorbit = 0;
    if (vc == 1) return 13;
    return vc == 0 ? 12 : 11;
  }
  if (hc == 0) {
    if (vc == 1) { *xorbit = 0; return 10; }
    if (vc == 0) { *xorbit = 0; return 9; }
    *xorbit = 1;
    return 10;
  }
  *xorbit = 1;
  if (vc == 1) return 11;
  return vc == 0 ? 12 : 13;
}

// --- per-coefficient state --------------------------------------------

constexpr uint8_t kSig = 1;      // significant
constexpr uint8_t kVisit = 2;    // coded in current plane's SPP
constexpr uint8_t kRefined = 4;  // refined at least once before

struct BlockCoder {
  int w, h, orient;
  const int32_t* mag;     // |coeff|
  const uint8_t* sgn;     // 1 = negative
  std::vector<uint8_t> state;
  Ctx cx[kNumCtx];
  MQEncoder* enc;

  BlockCoder(const int32_t* m, const uint8_t* s, int w_, int h_, int o)
      : w(w_), h(h_), orient(o), mag(m), sgn(s), state(w_ * h_, 0) {
    // initial context states per T.800: ZC0 = 4, RL = 3, UNI = 46
    cx[0].i = 4;
    cx[kCtxRL].i = 3;
    cx[kCtxUni].i = 46;
  }

  inline int Sig(int x, int y) const {
    if (x < 0 || x >= w || y < 0 || y >= h) return 0;
    return state[y * w + x] & kSig;
  }
  inline int SgnOf(int x, int y) const {  // -1, 0, +1 contribution
    if (x < 0 || x >= w || y < 0 || y >= h) return 0;
    if (!(state[y * w + x] & kSig)) return 0;
    return sgn[y * w + x] ? -1 : 1;
  }

  inline void NeighborCounts(int x, int y, int* hh, int* vv, int* dd) const {
    *hh = Sig(x - 1, y) + Sig(x + 1, y);
    *vv = Sig(x, y - 1) + Sig(x, y + 1);
    *dd = Sig(x - 1, y - 1) + Sig(x + 1, y - 1) + Sig(x - 1, y + 1) +
          Sig(x + 1, y + 1);
  }

  void CodeSign(int x, int y) {
    int hc = SgnOf(x - 1, y) + SgnOf(x + 1, y);
    int vc = SgnOf(x, y - 1) + SgnOf(x, y + 1);
    hc = hc > 0 ? 1 : (hc < 0 ? -1 : 0);
    vc = vc > 0 ? 1 : (vc < 0 ? -1 : 0);
    int xorbit;
    int c = ScContext(hc, vc, &xorbit);
    enc->Encode(&cx[c], sgn[y * w + x] ^ xorbit);
  }

  // distortion bookkeeping: squared-error reduction of coding coeff
  // (x, y) through plane p, assuming midpoint reconstruction.
  double DistDelta(int x, int y, int p) const {
    double v = static_cast<double>(mag[y * w + x]);
    // bits above plane p already known to the decoder after this pass
    double step = static_cast<double>(1u << p);
    double known_before = v - std::fmod(v, step * 2);
    double known_after = v - std::fmod(v, step);
    double rec_before =
        known_before > 0 ? known_before + step : 0.0;  // mid of 2*step bin
    double rec_after = known_after > 0 ? known_after + step * 0.5 : 0.0;
    double eb = v - rec_before, ea = v - rec_after;
    return eb * eb - ea * ea;
  }

  double SigPass(int p) {
    double dist = 0;
    for (int y0 = 0; y0 < h; y0 += 4) {
      for (int x = 0; x < w; ++x) {
        for (int y = y0; y < y0 + 4 && y < h; ++y) {
          uint8_t& st = state[y * w + x];
          if (st & kSig) continue;
          int hh, vv, dd;
          NeighborCounts(x, y, &hh, &vv, &dd);
          int zc = ZcContext(orient, hh, vv, dd);
          if (zc == 0) continue;      // no significant neighbors: CUP's
          int bit = (mag[y * w + x] >> p) & 1;
          enc->Encode(&cx[zc], bit);
          if (bit) {
            CodeSign(x, y);
            st |= kSig;
            dist += DistDelta(x, y, p);
          }
          st |= kVisit;
        }
      }
    }
    return dist;
  }

  double MagPass(int p) {
    double dist = 0;
    for (int y0 = 0; y0 < h; y0 += 4) {
      for (int x = 0; x < w; ++x) {
        for (int y = y0; y < y0 + 4 && y < h; ++y) {
          uint8_t& st = state[y * w + x];
          if (!(st & kSig) || (st & kVisit)) continue;
          int c;
          if (st & kRefined) {
            c = 16;
          } else {
            int hh, vv, dd;
            NeighborCounts(x, y, &hh, &vv, &dd);
            c = (hh + vv + dd) ? 15 : 14;
          }
          enc->Encode(&cx[c], (mag[y * w + x] >> p) & 1);
          st |= kRefined;
          dist += DistDelta(x, y, p);
        }
      }
    }
    return dist;
  }

  double CleanupPass(int p) {
    double dist = 0;
    for (int y0 = 0; y0 < h; y0 += 4) {
      for (int x = 0; x < w; ++x) {
        int y = y0;
        // run-length mode: full stripe column, all four insignificant
        // with no significant neighbors and none visited
        if (y0 + 4 <= h) {
          bool rl = true;
          for (int k = 0; k < 4 && rl; ++k) {
            uint8_t st = state[(y0 + k) * w + x];
            if (st & (kSig | kVisit)) rl = false;
            int hh, vv, dd;
            NeighborCounts(x, y0 + k, &hh, &vv, &dd);
            if (ZcContext(orient, hh, vv, dd) != 0) rl = false;
          }
          if (rl) {
            int first = -1;
            for (int k = 0; k < 4; ++k) {
              if ((mag[(y0 + k) * w + x] >> p) & 1) { first = k; break; }
            }
            if (first < 0) {
              enc->Encode(&cx[kCtxRL], 0);
              continue;  // whole column stays insignificant
            }
            enc->Encode(&cx[kCtxRL], 1);
            enc->Encode(&cx[kCtxUni], (first >> 1) & 1);
            enc->Encode(&cx[kCtxUni], first & 1);
            int yy = y0 + first;
            CodeSign(x, yy);
            state[yy * w + x] |= kSig;
            dist += DistDelta(x, yy, p);
            y = yy + 1;
          }
        }
        for (; y < y0 + 4 && y < h; ++y) {
          uint8_t& st = state[y * w + x];
          if (st & kVisit) { st &= ~kVisit; continue; }
          if (st & kSig) continue;
          int hh, vv, dd;
          NeighborCounts(x, y, &hh, &vv, &dd);
          int zc = ZcContext(orient, hh, vv, dd);
          int bit = (mag[y * w + x] >> p) & 1;
          enc->Encode(&cx[zc], bit);
          if (bit) {
            CodeSign(x, y);
            st |= kSig;
            dist += DistDelta(x, y, p);
          }
        }
      }
    }
    // clear visit flags for the next plane
    for (auto& st : state) st &= ~kVisit;
    return dist;
  }
};

}  // namespace

extern "C" {

// Encode one code block.
//   coeffs: int32 signed quantized coefficients, row-major w*h.
//   orient: 0 = LL/LH, 1 = HL, 2 = HH.
//   max_passes: stop after this many coding passes (-1 = all).
//   max_bytes: stop adding passes once the stream exceeds this many
//   bytes (<= 0 = no cap) — used by the rate allocator to avoid coding
//   planes that can never be included at the target rate.
// Returns the byte length written to out (or -needed if cap too small).
// Outputs: *nbps = magnitude bit planes present; *npasses = passes
// coded; pass_rate[i]/pass_dist[i] = cumulative approximate byte count /
// cumulative distortion reduction after pass i.
long jp2t1_encode_block(const int32_t* coeffs, int w, int h, int orient,
                        int max_passes, long max_bytes, uint8_t* out,
                        long cap, int* nbps, int* npasses, long* pass_rate,
                        double* pass_dist) {
  std::vector<int32_t> mag(w * h);
  std::vector<uint8_t> sgn(w * h);
  int32_t maxmag = 0;
  for (int i = 0; i < w * h; ++i) {
    int32_t v = coeffs[i];
    mag[i] = v < 0 ? -v : v;
    sgn[i] = v < 0 ? 1 : 0;
    if (mag[i] > maxmag) maxmag = v < 0 ? -v : v;
  }
  int planes = 0;
  while ((1 << planes) <= maxmag) ++planes;
  *nbps = planes;
  *npasses = 0;
  if (planes == 0) return 0;   // empty block: no passes, no bytes

  std::vector<uint8_t> buf;
  MQEncoder enc(&buf);
  BlockCoder bc(mag.data(), sgn.data(), w, h, orient);
  bc.enc = &enc;

  double dist = 0;
  int pass = 0;
  int total = 3 * planes - 2;
  if (max_passes >= 0 && max_passes < total) total = max_passes;

  bool over = false;
  for (int p = planes - 1; p >= 0 && pass < total && !over; --p) {
    if (p < planes - 1) {
      if (pass < total && !over) {
        dist += bc.SigPass(p);
        pass_rate[pass] = enc.ApproxBytes();
        pass_dist[pass] = dist;
        over = max_bytes > 0 && pass_rate[pass] > max_bytes;
        ++pass;
      }
      if (pass < total && !over) {
        dist += bc.MagPass(p);
        pass_rate[pass] = enc.ApproxBytes();
        pass_dist[pass] = dist;
        over = max_bytes > 0 && pass_rate[pass] > max_bytes;
        ++pass;
      }
    }
    if (pass < total && !over) {
      dist += bc.CleanupPass(p);
      pass_rate[pass] = enc.ApproxBytes();
      pass_dist[pass] = dist;
      over = max_bytes > 0 && pass_rate[pass] > max_bytes;
      ++pass;
    }
  }
  enc.Flush();
  *npasses = pass;
  long n = static_cast<long>(buf.size());
  if (n > cap) return -n;
  std::memcpy(out, buf.data(), n);
  return n;
}

}  // extern "C"
