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
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <memory>
#include <vector>

#if defined(__x86_64__)
#include <immintrin.h>
#endif

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

  // JP2T1_STUB_MQ=1: count decisions but skip all arithmetic-coder
  // work (timing experiment only — output is WRONG).  Separates the
  // context-modeling pass walks from the MQ coder in profiles.
  static bool StubMQ() {
    static const bool stub = getenv("JP2T1_STUB_MQ") != nullptr;
    return stub;
  }

  void Encode(Ctx* cx, int bit) {
    if (StubMQ()) { ++stub_n_; return; }
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
  // between renormalizations the MPS path is just a_ -= qe; c_ += qe.
  // Bit-exact vs n serial Encode(cx, mps) calls by construction — the
  // renorming symbol replays the serial conditional-exchange branch.
  // Used for runs of insignificant stripe columns on the RL context
  // in the cleanup pass, where the MQ call (not the magnitude loads)
  // dominates the sparse fine bit planes of MRC fg layers.
  void EncodeMPSRun(Ctx* cx, long n) {
    if (StubMQ()) { stub_n_ += n; return; }
    while (n > 0) {
      const QeEntry& q = kQe[cx->i];
      if (a_ >= 0x8000u + q.qe) {
        uint32_t k = (a_ - 0x8000u) / q.qe;   // symbols with no renorm
        if (static_cast<long>(k) > n) k = static_cast<uint32_t>(n);
        a_ -= k * q.qe;
        c_ += k * q.qe;
        n -= k;
        if (n == 0) break;
      }
      a_ -= q.qe;                             // this symbol renormalizes
      if (a_ < q.qe) a_ = q.qe; else c_ += q.qe;
      cx->i = q.nmps;
      Renorm();
      --n;
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
    // single-shift renormalization: the bit-at-a-time loop only
    // pauses to ByteOut when ct_ hits 0, so shifting by
    // min(needed, ct_) at a time is exactly equivalent (a_ >= 1
    // always holds here: it is either q.qe >= 1 or a_ - q.qe with
    // the invariant a_ > q.qe)
    int n = __builtin_clz(a_) - 16;
    while (n >= ct_) {
      a_ <<= ct_;
      c_ <<= ct_;
      n -= ct_;
      ct_ = 0;
      ByteOut();   // resets ct_ to 7 or 8
    }
    a_ <<= n;
    c_ <<= n;
    ct_ -= n;
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
  long stub_n_ = 0;
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
//
// OpenJPEG-style incremental flag words on a (w+2)x(h+2) padded grid:
// when a coefficient becomes significant it pushes bits into its eight
// neighbours' words, so the pass loops read contexts from 256-entry
// LUTs instead of recounting neighbourhoods (5-10x on clean content).

constexpr uint32_t F_SIG_N = 1u << 0;
constexpr uint32_t F_SIG_NE = 1u << 1;
constexpr uint32_t F_SIG_E = 1u << 2;
constexpr uint32_t F_SIG_SE = 1u << 3;
constexpr uint32_t F_SIG_S = 1u << 4;
constexpr uint32_t F_SIG_SW = 1u << 5;
constexpr uint32_t F_SIG_W = 1u << 6;
constexpr uint32_t F_SIG_NW = 1u << 7;
constexpr uint32_t F_NEG_N = 1u << 8;
constexpr uint32_t F_NEG_E = 1u << 9;
constexpr uint32_t F_NEG_S = 1u << 10;
constexpr uint32_t F_NEG_W = 1u << 11;
constexpr uint32_t F_SIG = 1u << 12;
constexpr uint32_t F_VISIT = 1u << 13;
constexpr uint32_t F_REFINED = 1u << 14;

struct T1Luts {
  uint8_t zc[3][256];
  uint8_t sc[256];  // (ctx << 1) | xorbit, indexed by packed NESW bits

  T1Luts() {
    for (int o = 0; o < 3; ++o) {
      for (int f = 0; f < 256; ++f) {
        const int hh = !!(f & F_SIG_W) + !!(f & F_SIG_E);
        const int vv = !!(f & F_SIG_N) + !!(f & F_SIG_S);
        const int dd = !!(f & F_SIG_NE) + !!(f & F_SIG_SE) +
                       !!(f & F_SIG_SW) + !!(f & F_SIG_NW);
        zc[o][f] = static_cast<uint8_t>(ZcContext(o, hh, vv, dd));
      }
    }
    for (int i = 0; i < 256; ++i) {
      auto contrib = [&](int sig_bit, int neg_bit) {
        if (!(i & sig_bit)) return 0;
        return (i & neg_bit) ? -1 : 1;
      };
      int hc = contrib(1 << 1, 1 << 5) + contrib(1 << 3, 1 << 7);  // E, W
      int vc = contrib(1 << 0, 1 << 4) + contrib(1 << 2, 1 << 6);  // N, S
      hc = hc > 0 ? 1 : (hc < 0 ? -1 : 0);
      vc = vc > 0 ? 1 : (vc < 0 ? -1 : 0);
      int xorbit;
      const int c = ScContext(hc, vc, &xorbit);
      sc[i] = static_cast<uint8_t>((c << 1) | xorbit);
    }
  }
};

static const T1Luts kLuts;

// JP2T1_STUB_DIST=1: skip the per-coefficient distortion-delta math
// (timing experiment only — pass_dist/hulls are WRONG, streams stay
// correct).  Separates the D(R) bookkeeping from the walk+MQ work in
// profiles, like JP2T1_STUB_MQ does for the arithmetic coder.
static bool StubDist() {
  static const bool stub = getenv("JP2T1_STUB_DIST") != nullptr;
  return stub;
}

struct BlockCoder {
  int w, h, orient;
  const int32_t* mag;     // |coeff|
  const uint8_t* sgn;     // 1 = negative
  int stride;             // padded flags stride = w + 2
  std::vector<uint32_t> flags;
  Ctx cx[kNumCtx];
  MQEncoder* enc;

  BlockCoder(const int32_t* m, const uint8_t* s, int w_, int h_, int o)
      : w(w_), h(h_), orient(o), mag(m), sgn(s), stride(w_ + 2),
        flags(static_cast<size_t>(w_ + 2) * (h_ + 2), 0) {
    // initial context states per T.800: ZC0 = 4, RL = 3, UNI = 46
    cx[0].i = 4;
    cx[kCtxRL].i = 3;
    cx[kCtxUni].i = 46;
  }

  inline uint32_t* F(int x, int y) {
    return flags.data() + static_cast<size_t>(y + 1) * stride + (x + 1);
  }

  inline void SetSig(int x, int y, int neg) {
    uint32_t* p = F(x, y);
    p[0] |= F_SIG;
    p[-1] |= F_SIG_E | (neg ? F_NEG_E : 0u);
    p[1] |= F_SIG_W | (neg ? F_NEG_W : 0u);
    p[-stride] |= F_SIG_S | (neg ? F_NEG_S : 0u);
    p[stride] |= F_SIG_N | (neg ? F_NEG_N : 0u);
    p[-stride - 1] |= F_SIG_SE;
    p[-stride + 1] |= F_SIG_SW;
    p[stride - 1] |= F_SIG_NE;
    p[stride + 1] |= F_SIG_NW;
  }

  inline void CodeSign(int x, int y, uint32_t f) {
    const int sig_n = !!(f & F_SIG_N), sig_e = !!(f & F_SIG_E);
    const int sig_s = !!(f & F_SIG_S), sig_w = !!(f & F_SIG_W);
    const int neg_n = !!(f & F_NEG_N), neg_e = !!(f & F_NEG_E);
    const int neg_s = !!(f & F_NEG_S), neg_w = !!(f & F_NEG_W);
    const int idx = sig_n | (sig_e << 1) | (sig_s << 2) | (sig_w << 3) |
                    (neg_n << 4) | (neg_e << 5) | (neg_s << 6) |
                    (neg_w << 7);
    const uint8_t e = kLuts.sc[idx];
    enc->Encode(&cx[e >> 1], sgn[y * w + x] ^ (e & 1));
  }

  // squared-error reduction of coding coeff (x, y) through plane p,
  // assuming midpoint reconstruction (integer mask arithmetic)
  inline double DistDelta(int x, int y, int p) const {
    if (StubDist()) return 0.0;
    const uint32_t v = static_cast<uint32_t>(mag[y * w + x]);
    const uint32_t step = 1u << p;
    const uint32_t kb = v & ~((step << 1) - 1);
    const uint32_t ka = v & ~(step - 1);
    const double rec_b = kb ? kb + static_cast<double>(step) : 0.0;
    const double rec_a = ka ? ka + step * 0.5 : 0.0;
    const double eb = v - rec_b, ea = v - rec_a;
    return eb * eb - ea * ea;
  }

  double SigPass(int p) {
    double dist = 0;
    for (int y0 = 0; y0 < h; y0 += 4) {
      const int ymax = y0 + 4 < h ? y0 + 4 : h;
      for (int x = 0; x < w; ++x) {
        // fast skip: no pixel in this stripe column has a significant
        // neighbour -> nothing to code here
        if (ymax == y0 + 4) {
          const uint32_t* f0 = F(x, y0);
          if (!((f0[0] | f0[stride] | f0[2 * stride] | f0[3 * stride])
                & 0xFF))
            continue;
        }
        for (int y = y0; y < ymax; ++y) {
          uint32_t* fp = F(x, y);
          const uint32_t f = *fp;
          if ((f & F_SIG) || !(f & 0xFF)) continue;
          const int bit = (mag[y * w + x] >> p) & 1;
          enc->Encode(&cx[kLuts.zc[orient][f & 0xFF]], bit);
          if (bit) {
            const int neg = sgn[y * w + x];
            CodeSign(x, y, f);
            SetSig(x, y, neg);
            dist += DistDelta(x, y, p);
          }
          *fp |= F_VISIT;
        }
      }
    }
    return dist;
  }

  double MagPass(int p) {
    double dist = 0;
    for (int y0 = 0; y0 < h; y0 += 4) {
      const int ymax = y0 + 4 < h ? y0 + 4 : h;
      for (int x = 0; x < w; ++x) {
        // fast skip: nothing significant in this stripe column
        if (ymax == y0 + 4) {
          const uint32_t* f0 = F(x, y0);
          if (!((f0[0] | f0[stride] | f0[2 * stride] | f0[3 * stride])
                & F_SIG))
            continue;
        }
        for (int y = y0; y < ymax; ++y) {
          uint32_t* fp = F(x, y);
          const uint32_t f = *fp;
          if (!(f & F_SIG) || (f & F_VISIT)) continue;
          int c;
          if (f & F_REFINED) {
            c = 16;
          } else {
            c = (f & 0xFF) ? 15 : 14;
          }
          enc->Encode(&cx[c], (mag[y * w + x] >> p) & 1);
          *fp = f | F_REFINED;
          dist += DistDelta(x, y, p);
        }
      }
    }
    return dist;
  }

  double CleanupPass(int p) {
    double dist = 0;
    for (int y0 = 0; y0 < h; y0 += 4) {
      const int ymax = y0 + 4 < h ? y0 + 4 : h;
      for (int x = 0; x < w; ++x) {
        int y = y0;
        // run-length mode: full stripe column, all four insignificant
        // with no significant neighbours and none visited
        if (y0 + 4 <= h) {
          bool rl = true;
          for (int k = 0; k < 4; ++k) {
            if (*F(x, y0 + k) & (0xFF | F_SIG | F_VISIT)) {
              rl = false;
              break;
            }
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
            const int yy = y0 + first;
            const int neg = sgn[yy * w + x];
            CodeSign(x, yy, *F(x, yy));
            SetSig(x, yy, neg);
            dist += DistDelta(x, yy, p);
            y = yy + 1;
          }
        }
        for (; y < ymax; ++y) {
          uint32_t* fp = F(x, y);
          const uint32_t f = *fp;
          if (f & F_VISIT) { *fp = f & ~F_VISIT; continue; }
          if (f & F_SIG) continue;
          const int bit = (mag[y * w + x] >> p) & 1;
          enc->Encode(&cx[kLuts.zc[orient][f & 0xFF]], bit);
          if (bit) {
            const int neg = sgn[y * w + x];
            CodeSign(x, y, f);
            SetSig(x, y, neg);
            dist += DistDelta(x, y, p);
          }
        }
      }
    }
    // clear visit flags for the next plane
    for (auto& f : flags) f &= ~F_VISIT;
    return dist;
  }
};

// --- stripe-column coder ----------------------------------------------
//
// One 32-bit word per (stripe, column) instead of one per coefficient:
// the standard's passes walk 4-row stripe columns, so packing the whole
// column's neighbourhood state into a single word turns the per-pixel
// flag loads/stores into one load per column and the stripe skip tests
// into one AND.  Layout (own design; the idea is the well-known
// OpenJPEG T1 structure):
//
//   bits 0..17   significance of the 3x6 grid around the column:
//                bit 3*r + c, r = 0..5 (rows y0-1 .. y0+4),
//                c = 0..2 (columns x-1, x, x+1)
//   bits 18..23  sign (negative) of the CENTRE column rows y0-1..y0+4
//   bits 24..27  visited (pass membership) for rows 0..3
//   bits 28..31  refined (had a magnitude pass) for rows 0..3
//
// Row j's 9-bit zero-coding neighbourhood is (word >> 3j) & 0x1FF; the
// centre's own significance is bit 3j+4.  E/W signs are read from the
// neighbour words' centre-column sign bits on demand (sign coding only
// happens when a coefficient first becomes significant).

constexpr uint32_t kSigmaMask = 0x3FFFF;
constexpr uint32_t kCenterMask = (1u << 4) | (1u << 7) | (1u << 10) |
                                 (1u << 13);
constexpr uint32_t kVisitMask = 0x0F000000;

struct T1Luts9 {
  uint8_t zc[3][512];
  T1Luts9() {
    for (int o = 0; o < 3; ++o) {
      for (int s = 0; s < 512; ++s) {
        const int hh = ((s >> 3) & 1) + ((s >> 5) & 1);
        const int vv = ((s >> 1) & 1) + ((s >> 7) & 1);
        const int dd = (s & 1) + ((s >> 2) & 1) + ((s >> 6) & 1) +
                       ((s >> 8) & 1);
        zc[o][s] = static_cast<uint8_t>(ZcContext(o, hh, vv, dd));
      }
    }
  }
};

static const T1Luts9 kLuts9;

// Reusable per-block buffers: the band-batched entry codes thousands
// of 64x64 blocks per call, and per-block vector churn (flag words,
// column-max, occupancy) measurably taxes the one-core hosts this
// pipeline targets.  Zeroed (not reallocated) per block.
struct CoderScratch {
  std::vector<uint32_t> words;
  std::vector<uint32_t> colmax;
  std::vector<uint64_t> occ_nbr, occ_sig;
  std::vector<uint64_t> colbs;   // nstripes x 32: bit x of [s*32+p] =
                                 // stripe-s column x carries plane p
  // the band-batched extraction loop fills colmax itself (fused with
  // the magnitude/sign split — one data pass instead of two); the
  // coder constructor then skips its own build + memset
  bool colmax_ready = false;
};

template <typename Enc>          // MQEncoder | DecisionRecorder
struct StripeCoderT {
  int w, h, orient, nstripes, stride;
  const int32_t* mag;
  const uint8_t* sgn;
  CoderScratch own_;             // used when no shared scratch given
  uint32_t* words;               // (nstripes + 2) x (w + 2)
  uint32_t* colmax;              // nstripes x w: OR of |coeff| per column
  uint64_t* occ_nbr;             // bit x: word (s, x) has sigma bits
  uint64_t* occ_sig;             // bit x: word (s, x) has centre sig bits
  uint64_t* colbs;               // per-stripe plane-occupancy bitsets
  uint64_t wmask;
  Ctx cx[kNumCtx];
  Enc* enc;
  bool no_runopt;                // JP2T1_NO_RUNOPT=1: serial RL (perf A/B)

  StripeCoderT(const int32_t* m, const uint8_t* s, int w_, int h_, int o,
               CoderScratch* scratch = nullptr)
      : w(w_), h(h_), orient(o), nstripes((h_ + 3) / 4), stride(w_ + 2),
        mag(m), sgn(s),
        wmask(w_ >= 64 ? ~0ull : ((1ull << w_) - 1)),
        no_runopt(getenv("JP2T1_NO_RUNOPT") != nullptr) {
    CoderScratch& sc = scratch ? *scratch : own_;
    const size_t nw = static_cast<size_t>(nstripes + 2) * stride;
    const size_t nc = static_cast<size_t>(nstripes) * w;
    if (sc.words.size() < nw) sc.words.resize(nw);
    if (sc.colmax.size() < nc) sc.colmax.resize(nc);
    if (sc.occ_nbr.size() < static_cast<size_t>(nstripes)) {
      sc.occ_nbr.resize(nstripes);
      sc.occ_sig.resize(nstripes);
    }
    if (sc.colbs.size() < static_cast<size_t>(nstripes) * 32)
      sc.colbs.resize(static_cast<size_t>(nstripes) * 32);
    words = sc.words.data();
    colmax = sc.colmax.data();
    occ_nbr = sc.occ_nbr.data();
    occ_sig = sc.occ_sig.data();
    colbs = sc.colbs.data();
    std::memset(words, 0, nw * sizeof(uint32_t));
    std::memset(occ_nbr, 0, nstripes * sizeof(uint64_t));
    std::memset(occ_sig, 0, nstripes * sizeof(uint64_t));
    std::memset(colbs, 0, nstripes * 32 * sizeof(uint64_t));
    if (!(scratch && scratch->colmax_ready)) {
      std::memset(colmax, 0, nc * sizeof(uint32_t));
      for (int y = 0; y < h; ++y) {
        const int32_t* mr = mag + static_cast<long>(y) * w;
        uint32_t* cr = colmax + static_cast<long>(y >> 2) * w;
        for (int x = 0; x < w; ++x)
          cr[x] |= static_cast<uint32_t>(mr[x]);
      }
    }
    // plane-occupancy bitsets, one ctz-skip pass over colmax: replaces
    // the per-plane w-iteration colb rebuild the cleanup pass used to
    // do per stripe (zero columns cost nothing here)
    for (int s = 0; s < nstripes; ++s) {
      const uint32_t* cm = colmax + static_cast<size_t>(s) * w;
      uint64_t* cb = colbs + static_cast<size_t>(s) * 32;
      for (int x = 0; x < w; ++x) {
        uint32_t v = cm[x];
        while (v) {
          cb[__builtin_ctz(v)] |= 1ull << x;
          v &= v - 1;
        }
      }
    }
    cx[0].i = 4;
    cx[kCtxRL].i = 3;
    cx[kCtxUni].i = 46;
  }

  inline uint32_t* W(int s, int x) {
    return words + static_cast<size_t>(s + 1) * stride + (x + 1);
  }

  inline void SetSig(int s, int x, int j, int neg) {
    uint32_t* p = W(s, x);
    p[0] |= (1u << (3 * j + 4)) | (neg ? (1u << (19 + j)) : 0u);
    p[-1] |= 1u << (3 * j + 5);          // we are the E neighbour
    p[1] |= 1u << (3 * j + 3);           // we are the W neighbour
    // occupancy mirrors "word has any sigma bit" exactly: SetSig is
    // the only sigma writer and touches columns x-1..x+1 of stripe s
    // (plus the adjacent stripe at j boundaries); border words
    // (x = -1/w, s = -1/nstripes) are deliberately untracked
    const uint64_t m = x ? (7ull << (x - 1)) : 3ull;
    occ_nbr[s] |= m;
    occ_sig[s] |= 1ull << x;
    if (j == 0) {
      uint32_t* q = p - stride;          // stripe above, its row r=5
      q[0] |= (1u << 16) | (neg ? (1u << 23) : 0u);
      q[-1] |= 1u << 17;
      q[1] |= 1u << 15;
      if (s > 0) occ_nbr[s - 1] |= m;
    } else if (j == 3) {
      uint32_t* q = p + stride;          // stripe below, its row r=0
      q[0] |= (1u << 1) | (neg ? (1u << 18) : 0u);
      q[-1] |= 1u << 2;
      q[1] |= 1u << 0;
      if (s + 1 < nstripes) occ_nbr[s + 1] |= m;
    }
  }

  inline void CodeSign(int s, int x, int j) {
    const uint32_t wd = *W(s, x);
    const uint32_t wdW = *W(s, x - 1);
    const uint32_t wdE = *W(s, x + 1);
    const int idx = ((wd >> (3 * j + 1)) & 1)            // sig N
                  | (((wd >> (3 * j + 5)) & 1) << 1)     // sig E
                  | (((wd >> (3 * j + 7)) & 1) << 2)     // sig S
                  | (((wd >> (3 * j + 3)) & 1) << 3)     // sig W
                  | (((wd >> (18 + j)) & 1) << 4)        // neg N
                  | (((wdE >> (19 + j)) & 1) << 5)       // neg E
                  | (((wd >> (20 + j)) & 1) << 6)        // neg S
                  | (((wdW >> (19 + j)) & 1) << 7);      // neg W
    const uint8_t e = kLuts.sc[idx];
    enc->Encode(&cx[e >> 1], sgn[(4 * s + j) * w + x] ^ (e & 1));
  }

  inline double DistDelta(int x, int y, int p) const {
    if (StubDist()) return 0.0;
    const uint32_t v = static_cast<uint32_t>(mag[y * w + x]);
    const uint32_t step = 1u << p;
    const uint32_t kb = v & ~((step << 1) - 1);
    const uint32_t ka = v & ~(step - 1);
    const double rec_b = kb ? kb + static_cast<double>(step) : 0.0;
    const double rec_a = ka ? ka + step * 0.5 : 0.0;
    const double eb = v - rec_b, ea = v - rec_a;
    return eb * eb - ea * ea;
  }

  double SigPass(int p) {
    double dist = 0;
    for (int s = 0; s < nstripes; ++s) {
      const int jmax = (4 * s + 4 <= h) ? 4 : h - 4 * s;
      uint32_t* row = W(s, 0);
      // visit only occupied columns, in serial (increasing-x) order.
      // occ_nbr is re-read live each step: coding column x can set
      // column x+1's bit, which the serial scan would see — columns
      // LEFT of the cursor are never revisited (matching the serial
      // coder, which has already passed them).
      uint64_t behind = 0;
      for (;;) {
        const uint64_t avail = (occ_nbr[s] & wmask) & ~behind;
        if (!avail) break;
        const int x = __builtin_ctzll(avail);
        behind = (x >= 63) ? ~0ull : ((2ull << x) - 1);
        for (int j = 0; j < jmax; ++j) {
          const uint32_t wd = row[x];
          const uint32_t slice = (wd >> (3 * j)) & 0x1FF;
          if (slice & (1u << 4)) continue;      // already significant
          if (!(slice & 0x1EF)) continue;       // no significant neighbour
          const int y = 4 * s + j;
          const int bit = (mag[y * w + x] >> p) & 1;
          enc->Encode(&cx[kLuts9.zc[orient][slice & ~(1u << 4)]], bit);
          if (bit) {
            CodeSign(s, x, j);
            SetSig(s, x, j, sgn[y * w + x]);
            dist += DistDelta(x, y, p);
          }
          row[x] |= 1u << (24 + j);
        }
      }
    }
    return dist;
  }

  double MagPass(int p) {
    double dist = 0;
    for (int s = 0; s < nstripes; ++s) {
      const int jmax = (4 * s + 4 <= h) ? 4 : h - 4 * s;
      uint32_t* row = W(s, 0);
      // significance is frozen during a magnitude pass, so the
      // occupancy snapshot is exact (occ_sig bit <=> centre sig bits)
      uint64_t rem = occ_sig[s] & wmask;
      while (rem) {
        const int x = __builtin_ctzll(rem);
        rem &= rem - 1;
        uint32_t wd = row[x];
        for (int j = 0; j < jmax; ++j) {
          if (!((wd >> (3 * j + 4)) & 1)) continue;
          if ((wd >> (24 + j)) & 1) continue;   // visited this plane
          const int y = 4 * s + j;
          int c;
          if ((wd >> (28 + j)) & 1) {
            c = 16;
          } else {
            c = (((wd >> (3 * j)) & 0x1EF) != 0) ? 15 : 14;
          }
          enc->Encode(&cx[c], (mag[y * w + x] >> p) & 1);
          wd |= 1u << (28 + j);
          row[x] = wd;
          dist += DistDelta(x, y, p);
        }
      }
    }
    return dist;
  }

  double CleanupPass(int p) {
    double dist = 0;
    for (int s = 0; s < nstripes; ++s) {
      const int jmax = (4 * s + 4 <= h) ? 4 : h - 4 * s;
      uint32_t* row = W(s, 0);
      // bit x: some coefficient of stripe column x carries plane p
      // (precomputed in the constructor from colmax, whose bit p is
      // the OR of the column's plane-p bits)
      const uint64_t colb = colbs[static_cast<size_t>(s) * 32 + p];
      for (int x = 0; x < w; ++x) {
        int j = 0;
        if (jmax == 4 && !((occ_nbr[s] >> x) & 1)) {
          // run-length mode: occupancy clear <=> the column has no
          // sigma bits, and visit bits only ever land on occupied
          // columns, so the word test is implied
          if (!((colb >> x) & 1)) {
            // batched run: consecutive all-zero RL columns each code
            // one MPS 0 on the same context, and nothing they code
            // changes any state word — so collapse the run into one
            // EncodeMPSRun (bit-exact; the BlockCoder double-entry
            // below stays serial and the identity test covers this).
            // occ_nbr is read live: earlier columns' coding this pass
            // may have occupied columns ahead of the cursor.
            if (cx[kCtxRL].mps == 0 && !no_runopt) {
              const uint64_t blocked =
                  ((occ_nbr[s] | colb) & wmask) >> x;
              const uint64_t nz = blocked | ~(wmask >> x);
              const long n = nz ? __builtin_ctzll(nz)
                                : static_cast<long>(w - x);
              enc->EncodeMPSRun(&cx[kCtxRL], n);
              x += static_cast<int>(n) - 1;
              continue;
            }
            enc->Encode(&cx[kCtxRL], 0);
            continue;
          }
          int first = -1;
          for (int k = 0; k < 4; ++k) {
            if ((mag[(4 * s + k) * w + x] >> p) & 1) { first = k; break; }
          }
          enc->Encode(&cx[kCtxRL], 1);
          enc->Encode(&cx[kCtxUni], (first >> 1) & 1);
          enc->Encode(&cx[kCtxUni], first & 1);
          const int yy = 4 * s + first;
          CodeSign(s, x, first);
          SetSig(s, x, first, sgn[yy * w + x]);
          dist += DistDelta(x, yy, p);
          j = first + 1;
        }
        for (; j < jmax; ++j) {
          const uint32_t wd = row[x];
          if ((wd >> (24 + j)) & 1) continue;   // visited: clear below
          const uint32_t slice = (wd >> (3 * j)) & 0x1FF;
          if (slice & (1u << 4)) continue;      // significant already
          const int y = 4 * s + j;
          const int bit = (mag[y * w + x] >> p) & 1;
          enc->Encode(&cx[kLuts9.zc[orient][slice & ~(1u << 4)]], bit);
          if (bit) {
            CodeSign(s, x, j);
            SetSig(s, x, j, sgn[y * w + x]);
            dist += DistDelta(x, y, p);
          }
        }
        row[x] &= ~kVisitMask;
      }
    }
    return dist;
  }
};

// --- decision-stream split coding -------------------------------------
//
// The context-modelling pass walks depend only on the coefficient data
// (the single exception: the cleanup pass peeks at the RL context's MPS
// to choose its batched-run fast path), so modelling and MQ coding can
// be split: record every (context, bit) decision as a token, then feed
// 16 blocks' token streams through one lockstep AVX-512 coder — the MQ
// state machine is serial per block by construction, but blocks are
// independent (T.800 D.1), so 16 of them encode vertically in vector
// lanes.  Token format (uint32):
//   bits 0..4   context index (0..18)
//   bit  5      coded bit
//   bit  6      run flag: a cleanup-pass run of (token >> 7) zero
//               decisions on the RL context (the batched-run fast path
//               is state-dependent, so runs stay symbolic until the
//               per-lane MQ state is known)
struct DecisionRecorder {
  std::vector<uint32_t>* dec;
  const Ctx* base = nullptr;     // the owning coder's cx array

  void Encode(Ctx* cx, int bit) {
    dec->push_back(static_cast<uint32_t>(cx - base) | (bit ? 32u : 0u));
  }
  void EncodeMPSRun(Ctx* cx, long n) {
    (void)cx;
    dec->push_back(64u | (static_cast<uint32_t>(n) << 7));
  }
};

// Run the pass loop in recording mode: fills `dec` with tokens,
// `bounds[p]` with the token count after pass p, and `pass_dist[p]`
// with cumulative distortion.  Only for uncapped blocks (the byte-cap
// early stop needs live byte counts).  Returns npasses.
//
// The recorder leaves the coder's cx array untouched, so the cleanup
// pass always sees RL mps == 0 and emits maximal run tokens; the
// replay expands a run against the live MQ state (fast path while
// mps == 0, one decision at a time across any LPS flips), which is
// exactly the serial coder's per-column behaviour because run extents
// are state-independent (they derive from occupancy + colmax only).
static int ModelBlock(const int32_t* mag, const uint8_t* sgn, int planes,
                      int w, int h, int orient, int max_passes,
                      std::vector<uint32_t>* dec, long* bounds,
                      double* pass_dist, CoderScratch* scratch) {
  DecisionRecorder rec{dec, nullptr};
  StripeCoderT<DecisionRecorder> sc(mag, sgn, w, h, orient, scratch);
  rec.base = sc.cx;
  sc.enc = &rec;
  // bounds are LANE-relative token counts (dec may be a shared group
  // arena that already holds other lanes' streams)
  const long tok0 = static_cast<long>(dec->size());
  double dist = 0;
  int pass = 0;
  int total = 3 * planes - 2;
  if (max_passes >= 0 && max_passes < total) total = max_passes;
  for (int p = planes - 1; p >= 0 && pass < total; --p) {
    if (p < planes - 1) {
      if (pass < total) {
        dist += sc.SigPass(p);
        bounds[pass] = static_cast<long>(dec->size()) - tok0;
        pass_dist[pass] = dist;
        ++pass;
      }
      if (pass < total) {
        dist += sc.MagPass(p);
        bounds[pass] = static_cast<long>(dec->size()) - tok0;
        pass_dist[pass] = dist;
        ++pass;
      }
    }
    if (pass < total) {
      dist += sc.CleanupPass(p);
      bounds[pass] = static_cast<long>(dec->size()) - tok0;
      pass_dist[pass] = dist;
      ++pass;
    }
  }
  return pass;
}

// Scalar token replay: byte-identical to coding the block directly
// (the tokens ARE the direct coder's decision sequence).  Used as the
// per-lane reference, the no-AVX-512 fallback, and for group tails.
static long ReplayTokens(const uint32_t* toks, long n, const long* bounds,
                         int npasses, std::vector<uint8_t>* outbuf,
                         long* pass_rate) {
  MQEncoder enc(outbuf);
  Ctx cx[kNumCtx];
  cx[0].i = 4;
  cx[kCtxRL].i = 3;
  cx[kCtxUni].i = 46;
  int bp = 0;
  for (long i = 0; i < n; ++i) {
    const uint32_t t = toks[i];
    if (t & 64u) {
      long run = static_cast<long>(t >> 7);
      Ctx* rl = &cx[kCtxRL];
      while (run > 0) {
        if (rl->mps == 0) {
          enc.EncodeMPSRun(rl, run);
          run = 0;
        } else {
          enc.Encode(rl, 0);   // LPS; may flip mps back
          --run;
        }
      }
    } else {
      enc.Encode(&cx[t & 31u], (t >> 5) & 1);
    }
    while (bp < npasses && bounds[bp] == i + 1)
      pass_rate[bp++] = enc.ApproxBytes();
  }
  while (bp < npasses)     // empty trailing passes (n == 0 edge)
    pass_rate[bp++] = enc.ApproxBytes();
  enc.Flush();
  return static_cast<long>(outbuf->size());
}

// --- 16-lane vertical MQ coder (AVX-512) ------------------------------
//
// Per-lane state in SoA arrays so one vector step advances 16
// independent block coders by one decision.  The scalar Lane* helpers
// below are EXACT mirrors of MQEncoder (kept in lockstep by the
// APT_T1_MQ byte-identity tests); they serve the divergent cases the
// vector step punts on: run tokens, renorms that cross a byte
// boundary, and final flushes.

struct MQLanes {
  alignas(64) uint32_t A[16];
  alignas(64) uint32_t C[16];
  alignas(64) uint32_t CT[16];
  alignas(64) uint32_t CXS[kNumCtx * 16];   // (index << 1) | mps
  std::vector<uint8_t>* out[16];
  uint8_t b[16];
  bool have_b[16];

  void InitLane(int l, std::vector<uint8_t>* o) {
    A[l] = 0x8000;
    C[l] = 0;
    CT[l] = 12;
    out[l] = o;
    b[l] = 0;
    have_b[l] = false;
    for (int k = 0; k < kNumCtx; ++k) CXS[k * 16 + l] = 0;
    CXS[0 * 16 + l] = 4u << 1;
    CXS[kCtxRL * 16 + l] = 3u << 1;
    CXS[kCtxUni * 16 + l] = 46u << 1;
  }
};

static inline void LaneEmitPending(MQLanes* L, int l) {
  if (L->have_b[l]) L->out[l]->push_back(L->b[l]);
  L->have_b[l] = false;
}

static inline void LaneByteOut(MQLanes* L, int l) {
  uint32_t& c = L->C[l];
  if (L->have_b[l] && L->b[l] == 0xFF) {
    LaneEmitPending(L, l);
    L->b[l] = static_cast<uint8_t>(c >> 20);
    L->have_b[l] = true;
    c &= 0xFFFFF;
    L->CT[l] = 7;
  } else {
    if (c < 0x8000000) {
      LaneEmitPending(L, l);
      L->b[l] = static_cast<uint8_t>(c >> 19);
      L->have_b[l] = true;
      c &= 0x7FFFF;
      L->CT[l] = 8;
    } else {
      if (L->have_b[l]) {
        L->b[l] += 1;  // carry
        if (L->b[l] == 0xFF) {
          c &= 0x7FFFFFF;
          LaneEmitPending(L, l);
          L->b[l] = static_cast<uint8_t>(c >> 20);
          L->have_b[l] = true;
          c &= 0xFFFFF;
          L->CT[l] = 7;
          return;
        }
      }
      LaneEmitPending(L, l);
      L->b[l] = static_cast<uint8_t>(c >> 19);
      L->have_b[l] = true;
      c &= 0x7FFFF;
      L->CT[l] = 8;
    }
  }
}

static inline void LaneRenorm(MQLanes* L, int l) {
  uint32_t n = __builtin_clz(L->A[l]) - 16;
  while (n >= L->CT[l]) {
    L->A[l] <<= L->CT[l];
    L->C[l] <<= L->CT[l];
    n -= L->CT[l];
    L->CT[l] = 0;
    LaneByteOut(L, l);
  }
  L->A[l] <<= n;
  L->C[l] <<= n;
  L->CT[l] -= n;
}

static inline void LaneEncode(MQLanes* L, int l, int ctx, int bit) {
  uint32_t& st = L->CXS[ctx * 16 + l];
  const QeEntry& q = kQe[st >> 1];
  const int mps = st & 1;
  uint32_t& a = L->A[l];
  if (bit == mps) {
    a -= q.qe;
    if ((a & 0x8000) == 0) {
      if (a < q.qe) a = q.qe; else L->C[l] += q.qe;
      st = (static_cast<uint32_t>(q.nmps) << 1) | mps;
      LaneRenorm(L, l);
    } else {
      L->C[l] += q.qe;
    }
  } else {
    a -= q.qe;
    if (a < q.qe) L->C[l] += q.qe; else a = q.qe;
    st = (static_cast<uint32_t>(q.nlps) << 1) | (mps ^ q.sw);
    LaneRenorm(L, l);
  }
}

static inline void LaneMPSRun(MQLanes* L, int l, long n) {
  // only called while the RL context's MPS is 0 (mirror of
  // MQEncoder::EncodeMPSRun coding MPS symbols)
  uint32_t& st = L->CXS[kCtxRL * 16 + l];
  uint32_t& a = L->A[l];
  while (n > 0) {
    const QeEntry& q = kQe[st >> 1];
    if (a >= 0x8000u + q.qe) {
      uint32_t k = (a - 0x8000u) / q.qe;
      if (static_cast<long>(k) > n) k = static_cast<uint32_t>(n);
      a -= k * q.qe;
      L->C[l] += k * q.qe;
      n -= k;
      if (n == 0) break;
    }
    a -= q.qe;
    if (a < q.qe) a = q.qe; else L->C[l] += q.qe;
    st = (static_cast<uint32_t>(q.nmps) << 1) | (st & 1);
    LaneRenorm(L, l);
    --n;
  }
}

static inline void LaneRunToken(MQLanes* L, int l, long run) {
  while (run > 0) {
    if ((L->CXS[kCtxRL * 16 + l] & 1) == 0) {
      LaneMPSRun(L, l, run);
      run = 0;
    } else {
      LaneEncode(L, l, kCtxRL, 0);
      --run;
    }
  }
}

static inline void LaneFlush(MQLanes* L, int l) {
  uint32_t& c = L->C[l];
  uint32_t tempc = c + L->A[l] - 1;
  c |= 0xFFFF;
  if (c >= tempc) c -= 0x8000;
  c <<= L->CT[l];
  LaneByteOut(L, l);
  c <<= L->CT[l];
  LaneByteOut(L, l);
  if (L->have_b[l] && L->b[l] != 0xFF) L->out[l]->push_back(L->b[l]);
  L->have_b[l] = false;
}

static inline long LaneApproxBytes(MQLanes* L, int l) {
  return static_cast<long>(L->out[l]->size()) + (L->have_b[l] ? 1 : 0)
      + 1;
}

struct GroupLane {
  long bi;            // block index in the band
  long start, ntok;   // token range in the group arena
  int npasses;
  const long* bounds; // pass-end token counts (npasses entries)
};

struct T1Group {
  std::vector<uint32_t> arena;
  GroupLane lanes[16];
  long bounds[16][128];
  int n = 0;
};

#if defined(__x86_64__)
__attribute__((target("avx512f,avx512cd,avx512bw,avx512dq,avx512vl")))
static void EncodeGroupSimd(const uint32_t* arena, GroupLane* lanes,
                            int nl, MQLanes* L, long* const* rates) {
  alignas(64) uint32_t starts[16];
  alignas(64) uint32_t nb[16];       // next pass-boundary token count
  int nbp[16];
  long maxtok = 0;
  for (int l = 0; l < 16; ++l) {
    starts[l] = l < nl ? static_cast<uint32_t>(lanes[l].start) : 0;
    nbp[l] = 0;
    nb[l] = 0xFFFFFFFFu;
    if (l < nl) {
      if (lanes[l].ntok > maxtok) maxtok = lanes[l].ntok;
      if (lanes[l].npasses > 0)
        nb[l] = static_cast<uint32_t>(lanes[l].bounds[0]);
    }
  }
  static const struct QePacked {
    alignas(64) uint32_t v[48];
    QePacked() {
      for (int i = 0; i < 47; ++i)
        v[i] = kQe[i].qe | (static_cast<uint32_t>(kQe[i].nmps) << 16) |
               (static_cast<uint32_t>(kQe[i].nlps) << 22) |
               (static_cast<uint32_t>(kQe[i].sw) << 28);
      v[47] = 0;
    }
  } kPacked;

  const __m512i viota = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9,
                                          10, 11, 12, 13, 14, 15);
  const __m512i v31 = _mm512_set1_epi32(31);
  const __m512i v63 = _mm512_set1_epi32(63);
  const __m512i v1 = _mm512_set1_epi32(1);
  const __m512i v16 = _mm512_set1_epi32(16);
  const __m512i vhi = _mm512_set1_epi32(0x8000);
  const __m512i vqmask = _mm512_set1_epi32(0xFFFF);
  const __m512i vstarts = _mm512_load_epi32(starts);
  int act = nl;   // lanes sorted by ntok desc: active = [0, act)

  for (long step = 0; step < maxtok; ++step) {
    while (act > 0 && lanes[act - 1].ntok <= step) --act;
    const __mmask16 m = static_cast<__mmask16>((1u << act) - 1);
    const __m512i idx =
        _mm512_add_epi32(vstarts, _mm512_set1_epi32(
            static_cast<int>(step)));
    const __m512i tok = _mm512_mask_i32gather_epi32(
        _mm512_setzero_si512(), m, idx, arena, 4);
    const __mmask16 runm =
        _mm512_mask_test_epi32_mask(m, tok, _mm512_set1_epi32(64));
    const __mmask16 nm = m & ~runm;
    if (nm) {
      const __m512i ctx = _mm512_and_si512(tok, v31);
      const __m512i cidx =
          _mm512_add_epi32(_mm512_slli_epi32(ctx, 4), viota);
      const __m512i st = _mm512_mask_i32gather_epi32(
          _mm512_setzero_si512(), nm, cidx, L->CXS, 4);
      const __m512i sti = _mm512_srli_epi32(st, 1);
      const __m512i mps = _mm512_and_si512(st, v1);
      const __m512i q = _mm512_mask_i32gather_epi32(
          _mm512_setzero_si512(), nm, sti, kPacked.v, 4);
      const __m512i qe = _mm512_and_si512(q, vqmask);
      const __m512i bit =
          _mm512_and_si512(_mm512_srli_epi32(tok, 5), v1);
      const __mmask16 is_mps =
          _mm512_mask_cmpeq_epi32_mask(nm, bit, mps);
      const __mmask16 lps = nm & ~is_mps;
      __m512i Av = _mm512_load_epi32(L->A);
      __m512i Cv = _mm512_load_epi32(L->C);
      __m512i CTv = _mm512_load_epi32(L->CT);
      const __m512i a1 = _mm512_sub_epi32(Av, qe);
      const __mmask16 hi =
          _mm512_mask_test_epi32_mask(nm, a1, vhi);
      const __mmask16 fast = is_mps & hi;
      const __mmask16 a_lt = _mm512_mask_cmp_epu32_mask(
          nm, a1, qe, _MM_CMPINT_LT);
      const __mmask16 cinc =
          fast | (is_mps & ~hi & ~a_lt) | (lps & a_lt);
      Cv = _mm512_mask_add_epi32(Cv, cinc, Cv, qe);
      const __mmask16 sel_qe =
          (is_mps & ~hi & a_lt) | (lps & ~a_lt);
      __m512i newA = _mm512_mask_mov_epi32(a1, sel_qe, qe);
      // context update + renorm for every non-fast coded lane
      const __mmask16 renorm = nm & ~fast;
      const __m512i nmps_ =
          _mm512_and_si512(_mm512_srli_epi32(q, 16), v63);
      const __m512i nlps_ =
          _mm512_and_si512(_mm512_srli_epi32(q, 22), v63);
      const __m512i sw =
          _mm512_and_si512(_mm512_srli_epi32(q, 28), v1);
      const __m512i newi = _mm512_mask_mov_epi32(nlps_, is_mps, nmps_);
      const __m512i newmps =
          _mm512_xor_si512(mps, _mm512_maskz_mov_epi32(lps, sw));
      const __m512i newst =
          _mm512_or_si512(_mm512_slli_epi32(newi, 1), newmps);
      _mm512_mask_i32scatter_epi32(L->CXS, renorm, cidx, newst, 4);
      // single-shift renorm; lanes whose shift crosses a byte
      // boundary (n >= ct) fall back to the scalar helper
      const __m512i nsh = _mm512_sub_epi32(_mm512_lzcnt_epi32(newA),
                                           v16);
      const __mmask16 over = _mm512_mask_cmp_epu32_mask(
          renorm, nsh, CTv, _MM_CMPINT_NLT);
      const __mmask16 vsh = renorm & ~over;
      newA = _mm512_mask_sllv_epi32(newA, vsh, newA, nsh);
      Cv = _mm512_mask_sllv_epi32(Cv, vsh, Cv, nsh);
      CTv = _mm512_mask_sub_epi32(CTv, vsh, CTv, nsh);
      _mm512_store_epi32(L->A, _mm512_mask_mov_epi32(Av, nm, newA));
      _mm512_store_epi32(L->C, Cv);
      _mm512_store_epi32(L->CT, CTv);
      for (__mmask16 r = over; r; r &= r - 1)
        LaneRenorm(L, __builtin_ctz(r));
    }
    if (runm) {
      for (__mmask16 r = runm; r; r &= r - 1) {
        const int l = __builtin_ctz(r);
        LaneRunToken(L, l, static_cast<long>(
            arena[starts[l] + step] >> 7));
      }
    }
    // pass-boundary byte counts (after this step's byteouts)
    const __mmask16 bm = _mm512_mask_cmpeq_epi32_mask(
        m, _mm512_load_epi32(nb),
        _mm512_set1_epi32(static_cast<int>(step + 1)));
    if (bm) {
      for (__mmask16 r = bm; r; r &= r - 1) {
        const int l = __builtin_ctz(r);
        while (nbp[l] < lanes[l].npasses &&
               lanes[l].bounds[nbp[l]] == step + 1)
          rates[l][nbp[l]++] = LaneApproxBytes(L, l);
        nb[l] = nbp[l] < lanes[l].npasses
            ? static_cast<uint32_t>(lanes[l].bounds[nbp[l]])
            : 0xFFFFFFFFu;
      }
    }
  }
  for (int l = 0; l < nl; ++l) {
    while (nbp[l] < lanes[l].npasses)   // ntok == 0 degenerate
      rates[l][nbp[l]++] = LaneApproxBytes(L, l);
    LaneFlush(L, l);
  }
}
#endif  // __x86_64__

static bool HaveAvx512() {
#if defined(__x86_64__)
  static const bool ok = __builtin_cpu_supports("avx512f") &&
                         __builtin_cpu_supports("avx512cd") &&
                         __builtin_cpu_supports("avx512bw") &&
                         __builtin_cpu_supports("avx512dq") &&
                         __builtin_cpu_supports("avx512vl");
  return ok;
#else
  return false;
#endif
}

#if defined(__x86_64__)
// One block row of the extraction: |v| -> mr, sign -> sr, OR |v| into
// the stripe's colmax row, count nonzeros, track the max.  16-wide;
// the gprofng profile of the capped in-pipeline encode (2026-08-20)
// put the scalar extraction + the coder constructor's second colmax
// scan at ~45% of the whole band-encode wall — more than the pass
// walks — so this data-prep pass is vectorized and fused.
__attribute__((target("avx512f,avx512bw,avx512dq,avx512vl")))
static void ExtractRowAvx512(const int32_t* src, int n, int32_t* mr,
                             uint8_t* sr, uint32_t* cm, long* nnz,
                             int32_t* maxmag) {
  __m512i vmax = _mm512_setzero_si512();
  long cnt = 0;
  for (int x = 0; x < n; x += 16) {
    const __mmask16 m = (n - x >= 16)
        ? static_cast<__mmask16>(0xFFFF)
        : static_cast<__mmask16>((1u << (n - x)) - 1);
    const __m512i v = _mm512_maskz_loadu_epi32(m, src + x);
    const __m512i a = _mm512_abs_epi32(v);
    _mm512_mask_storeu_epi32(mr + x, m, a);
    const __mmask16 neg = _mm512_mask_cmplt_epi32_mask(
        m, v, _mm512_setzero_si512());
    _mm_mask_storeu_epi8(sr + x, m,
                         _mm_maskz_mov_epi8(neg, _mm_set1_epi8(1)));
    vmax = _mm512_mask_max_epi32(vmax, m, vmax, a);
    cnt += __builtin_popcount(_mm512_mask_test_epi32_mask(m, a, a));
    const __m512i c = _mm512_maskz_loadu_epi32(m, cm + x);
    _mm512_mask_storeu_epi32(cm + x, m, _mm512_or_si512(c, a));
  }
  *nnz += cnt;
  const int32_t mx = _mm512_reduce_max_epi32(vmax);
  if (mx > *maxmag) *maxmag = mx;
}
#endif  // __x86_64__

static int T1MQMode() {
  // 0 = direct scalar per block; 1 = model+replay (tests the token
  // split without SIMD); 2 = model + 16-lane AVX-512 group coder
  // (the default where the ISA exists).  Re-read per band call so the
  // in-process identity tests can toggle implementations.
  const char* e = getenv("APT_T1_MQ");
  if (e && strcmp(e, "scalar") == 0) return 0;
  if (e && strcmp(e, "replay") == 0) return 1;
  return HaveAvx512() ? 2 : 0;
}

// Shared core of jp2t1_encode_block / jp2t1_encode_band: codes one
// block from pre-extracted magnitude/sign planes (see the extern "C"
// doc comments below for the contract).  `scratch`, when given, reuses
// the coder's per-block state buffers across a band's blocks.
static long EncodeCore(const int32_t* mag, const uint8_t* sgn, int planes,
                       int w, int h, int orient, int max_passes,
                       long max_bytes, std::vector<uint8_t>* sink,
                       int* nbps, int* npasses, long* pass_rate,
                       double* pass_dist, CoderScratch* scratch) {
  *nbps = planes;
  *npasses = 0;
  if (planes == 0) return 0;   // empty block: no passes, no bytes

  std::vector<uint8_t>& buf = *sink;
  MQEncoder enc(&buf);
  // default: the stripe-column coder (one flags word per 4-row column);
  // APT_T1_IMPL=ref selects the per-pixel-flags coder — outputs are
  // byte-identical (tested), the ref coder exists for that test and as
  // readable documentation of the pass semantics
  // re-read per block so the identity test can toggle impls in-process
  // (a getenv per 64x64 block is noise next to its thousands of MQ ops)
  const char* impl_env = getenv("APT_T1_IMPL");
  const bool use_ref = impl_env && strcmp(impl_env, "ref") == 0;
  // construct only the selected coder (each allocates its full
  // per-block state)
  using StripeCoder = StripeCoderT<MQEncoder>;
  std::unique_ptr<BlockCoder> bc;
  std::unique_ptr<StripeCoder> sc;
  if (use_ref) {
    bc.reset(new BlockCoder(mag, sgn, w, h, orient));
    bc->enc = &enc;
  } else {
    sc.reset(new StripeCoder(mag, sgn, w, h, orient, scratch));
    sc->enc = &enc;
  }

  // JP2T1_STUB_LEVEL timing experiment (output WRONG): 2 = skip the
  // pass loop (times extraction + coder construction), 1 = run passes
  // with the MQ stub (see StubMQ)
  static const int stub_level = [] {
    const char* e = getenv("JP2T1_STUB_LEVEL");
    return e ? atoi(e) : 0;
  }();
  double dist = 0;
  int pass = 0;
  int total = 3 * planes - 2;
  if (max_passes >= 0 && max_passes < total) total = max_passes;
  if (stub_level >= 2) total = 0;

  auto sig_pass = [&](int p) {
    return use_ref ? bc->SigPass(p) : sc->SigPass(p); };
  auto mag_pass = [&](int p) {
    return use_ref ? bc->MagPass(p) : sc->MagPass(p); };
  auto cleanup_pass = [&](int p) {
    return use_ref ? bc->CleanupPass(p) : sc->CleanupPass(p); };

  bool over = false;
  for (int p = planes - 1; p >= 0 && pass < total && !over; --p) {
    if (p < planes - 1) {
      if (pass < total && !over) {
        dist += sig_pass(p);
        pass_rate[pass] = enc.ApproxBytes();
        pass_dist[pass] = dist;
        over = max_bytes > 0 && pass_rate[pass] > max_bytes;
        ++pass;
      }
      if (pass < total && !over) {
        dist += mag_pass(p);
        pass_rate[pass] = enc.ApproxBytes();
        pass_dist[pass] = dist;
        over = max_bytes > 0 && pass_rate[pass] > max_bytes;
        ++pass;
      }
    }
    if (pass < total && !over) {
      dist += cleanup_pass(p);
      pass_rate[pass] = enc.ApproxBytes();
      pass_dist[pass] = dist;
      over = max_bytes > 0 && pass_rate[pass] > max_bytes;
      ++pass;
    }
  }
  enc.Flush();
  *npasses = pass;
  return static_cast<long>(buf.size());
}

inline int PlanesOf(int32_t maxmag) {
  int planes = 0;
  while ((1 << planes) <= maxmag) ++planes;
  return planes;
}

// Per-block entry body: extract magnitude/sign, then code.
static long EncodeOne(const int32_t* coeffs, int w, int h, int orient,
                      int max_passes, long max_bytes, uint8_t* out,
                      long cap, int* nbps, int* npasses, long* pass_rate,
                      double* pass_dist) {
  std::vector<int32_t> mag(w * h);
  std::vector<uint8_t> sgn(w * h);
  int32_t maxmag = 0;
  for (int i = 0; i < w * h; ++i) {
    const int32_t v = coeffs[i];
    const int32_t m = v < 0 ? -v : v;
    mag[i] = m;
    sgn[i] = v < 0 ? 1 : 0;
    if (m > maxmag) maxmag = m;
  }
  std::vector<uint8_t> buf;
  long n = EncodeCore(mag.data(), sgn.data(), PlanesOf(maxmag), w, h,
                      orient, max_passes, max_bytes, &buf, nbps,
                      npasses, pass_rate, pass_dist, nullptr);
  if (n > cap) return -n;
  std::memcpy(out, buf.data(), n);
  return n;
}

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
  return EncodeOne(coeffs, w, h, orient, max_passes, max_bytes, out, cap,
                   nbps, npasses, pass_rate, pass_dist);
}

// Encode every code block of one subband in a single call.
//
// The per-block entry above costs, per block, a Python-side
// ascontiguousarray + ctypes marshalling + a GIL release/reacquire;
// with ~2.4k blocks/page the GIL ping-pong against the pipeline's
// loader/fetch threads dominated the Tier-1 wall inside recode()
// (measured 0.42 ms/block in-pipeline vs 0.10 ms/block in a quiet
// process).  This entry extracts blocks, skips all-zero ones, and
// codes the whole band under ONE GIL release.
//
//   band: int32 quantized subband, row-major bh*bw, contiguous.
//   cbsz: code-block size (grid is ceil(bw/cbsz) x ceil(bh/cbsz),
//   edge blocks clipped).
//   caps: per-block max_bytes in raster order (NULL = uncapped);
//   a NEGATIVE entry skips that block entirely, leaving its output
//   slots untouched (rescue re-encodes only its starved subset).
//   max_passes: stop every block after this many coding passes
//   (<= 0 = all) — the work cap for deep coarse bands, whose final
//   PCRD picks use ~8-12 of ~50 recorded passes (the rate allocator
//   re-encodes the rare block that wants more).
//   out/out_cap: one buffer for every block's stream; block i's bytes
//   land at out+offs[i], length lens[i] (0 for all-zero blocks, which
//   report nbps=npasses=0).
//   nbps/npasses/lens/offs: one entry per block.
//   pass_rate/pass_dist: 128 entries per block (block i at i*128).
//   weight/trunc_margin + hull_*: the PCRD truncation-point hull per
//   block, computed here so the Python allocator never walks passes
//   per block (it was 40% of the post-T1 Python time).  hull_n[i] =
//   segment count m; hull_slopes 64/block (m used); hull_rates and
//   hull_picks 65/block (m+1 used, leading 0).  Segment slopes are
//   the weighted-distortion deltas over byte deltas of the upper
//   convex hull of (rate, dist*weight) truncation points; non-final
//   picks carry trunc_margin in their realized byte cost.
// Returns the number of blocks, or -1 if out_cap is too small (callers
// size out at >= 4*band bytes + 2048/block, far above the MQ coder's
// worst case, so -1 is a programming error, not a data condition).
long jp2t1_encode_band(const int32_t* band, int bw, int bh, int cbsz,
                       int orient, const long* caps, uint8_t* out,
                       long out_cap, int* nbps, int* npasses, long* lens,
                       long* offs, long* pass_rate, double* pass_dist,
                       double weight, long trunc_margin, int* hull_n,
                       double* hull_slopes, long* hull_rates,
                       int* hull_picks, int max_passes) {
  const int nx = bw ? (bw + cbsz - 1) / cbsz : 0;
  const int ny = bh ? (bh + cbsz - 1) / cbsz : 0;
  const long nblocks = static_cast<long>(nx) * ny;
  std::vector<int32_t> mag(static_cast<size_t>(cbsz) * cbsz);
  std::vector<uint8_t> sgn(static_cast<size_t>(cbsz) * cbsz);
  CoderScratch scratch;
  // extraction fills colmax fused with the magnitude/sign split (one
  // pass over the data); size it for the largest block up front
  const int max_stripes = (cbsz + 3) / 4;
  scratch.colmax.resize(static_cast<size_t>(max_stripes) * cbsz);
  scratch.colmax_ready = true;
  const bool use_avx = HaveAvx512();
  int hull[129];
  const int mq_mode = T1MQMode();
  // per-block streams: layout into `out` happens after the grouped
  // lanes (which finish out of block order) are all coded
  std::vector<std::vector<uint8_t>> streams(nblocks);
  T1Group group;

  auto flush_group = [&]() {
    if (!group.n) return;
    // longest stream first: the lockstep loop's active set is a
    // prefix, so sorting minimizes masked-idle lane steps
    std::sort(group.lanes, group.lanes + group.n,
              [](const GroupLane& x, const GroupLane& y) {
                return x.ntok > y.ntok;
              });
#if defined(__x86_64__)
    if (mq_mode == 2) {
      MQLanes L;
      long* rates[16];
      for (int l = 0; l < group.n; ++l) {
        L.InitLane(l, &streams[group.lanes[l].bi]);
        rates[l] = pass_rate + group.lanes[l].bi * 128;
      }
      EncodeGroupSimd(group.arena.data(), group.lanes, group.n, &L,
                      rates);
      for (int l = 0; l < group.n; ++l)
        lens[group.lanes[l].bi] =
            static_cast<long>(streams[group.lanes[l].bi].size());
    } else
#endif
    {
      for (int l = 0; l < group.n; ++l) {
        const GroupLane& ln = group.lanes[l];
        lens[ln.bi] = ReplayTokens(group.arena.data() + ln.start,
                                   ln.ntok, ln.bounds, ln.npasses,
                                   &streams[ln.bi],
                                   pass_rate + ln.bi * 128);
      }
    }
    group.arena.clear();
    group.n = 0;
  };

  long bi = 0;
  for (int by = 0; by < ny; ++by) {
    for (int bx = 0; bx < nx; ++bx, ++bi) {
      if (caps && caps[bi] < 0) {
        // caller-skipped block (rescue re-encodes only starved
        // blocks): leave every output slot untouched
        continue;
      }
      const int w = std::min(cbsz, bw - bx * cbsz);
      const int h = std::min(cbsz, bh - by * cbsz);
      // extraction fused with the magnitude/sign split, bit-plane
      // count AND the coder's colmax build (replaces the Python-side
      // .any(), the former extract-then-split double scan, and the
      // constructor's second pass over mag) — AVX-512 16-wide where
      // the ISA exists
      int32_t maxmag = 0;
      long nnz = 0;
      const int nstr = (h + 3) / 4;
      std::memset(scratch.colmax.data(), 0,
                  static_cast<size_t>(nstr) * w * sizeof(uint32_t));
      for (int y = 0; y < h; ++y) {
        const int32_t* src =
            band + static_cast<long>(by * cbsz + y) * bw + bx * cbsz;
        int32_t* mr = mag.data() + static_cast<long>(y) * w;
        uint8_t* sr = sgn.data() + static_cast<long>(y) * w;
        uint32_t* cr = scratch.colmax.data()
            + static_cast<long>(y >> 2) * w;
#if defined(__x86_64__)
        if (use_avx) {
          ExtractRowAvx512(src, w, mr, sr, cr, &nnz, &maxmag);
          continue;
        }
#endif
        for (int x = 0; x < w; ++x) {
          const int32_t v = src[x];
          const int32_t m = v < 0 ? -v : v;
          mr[x] = m;
          sr[x] = v < 0 ? 1 : 0;
          cr[x] |= static_cast<uint32_t>(m);
          nnz += m != 0;
          if (m > maxmag) maxmag = m;
        }
      }
      if (!maxmag) {
        nbps[bi] = 0;
        npasses[bi] = 0;
        lens[bi] = 0;
        continue;
      }
      const long cap = caps ? caps[bi] : 0;
      const int mp = max_passes > 0 ? max_passes : -1;
      // density routing: sparse blocks are run-token dominated, where
      // the lockstep coder detours to scalar per lane and the token
      // split costs ~5-10% for nothing (measured 2026-08-20, density
      // sweep in RESULTS.md: SIMD crosses scalar at ~10-12% nonzero,
      // 1.54x at full density)
      const bool dense = nnz * 8 >= static_cast<long>(w) * h;
      if (mq_mode != 0 && cap <= 0 && (dense || mq_mode == 1)) {
        // uncapped: record decisions, code 16 blocks per SIMD group
        GroupLane& ln = group.lanes[group.n];
        ln.bi = bi;
        ln.start = static_cast<long>(group.arena.size());
        nbps[bi] = PlanesOf(maxmag);
        ln.npasses = ModelBlock(mag.data(), sgn.data(), nbps[bi], w, h,
                                orient, mp, &group.arena,
                                group.bounds[group.n],
                                pass_dist + bi * 128, &scratch);
        npasses[bi] = ln.npasses;
        ln.ntok = static_cast<long>(group.arena.size()) - ln.start;
        ln.bounds = group.bounds[group.n];
        ++group.n;
        if (group.n == 16) flush_group();
      } else {
        lens[bi] = EncodeCore(mag.data(), sgn.data(), PlanesOf(maxmag),
                              w, h, orient, mp, cap, &streams[bi],
                              nbps + bi, npasses + bi,
                              pass_rate + bi * 128,
                              pass_dist + bi * 128, &scratch);
      }
    }
  }
  flush_group();

  // layout sweep (block order) + PCRD hulls
  long off = 0;
  bi = 0;
  for (int by = 0; by < ny; ++by) {
    for (int bx = 0; bx < nx; ++bx, ++bi) {
      if (caps && caps[bi] < 0) continue;
      offs[bi] = off;
      const long n = lens[bi];
      if (n) {
        if (off + n > out_cap) return -1;
        std::memcpy(out + off, streams[bi].data(), n);
        off += n;
      }
      // PCRD hull (exactly the Python _hull_rows arithmetic: double
      // slope = d-delta / max(1, r-delta), pop while s2 >= s1)
      const int np = npasses[bi];
      const long* pr = pass_rate + bi * 128;
      const double* pd = pass_dist + bi * 128;
      auto rate_at = [&](int i) { return i ? pr[i - 1] : 0L; };
      auto dist_at = [&](int i) { return i ? pd[i - 1] * weight : 0.0; };
      int hn = 1;
      hull[0] = 0;
      for (int i = 1; i <= np; ++i) {
        while (hn >= 2) {
          const int a = hull[hn - 2], b = hull[hn - 1];
          const double s1 = (dist_at(b) - dist_at(a)) /
              std::max(1L, rate_at(b) - rate_at(a));
          const double s2 = (dist_at(i) - dist_at(b)) /
              std::max(1L, rate_at(i) - rate_at(b));
          if (s2 >= s1) --hn; else break;
        }
        hull[hn++] = i;
      }
      const int m = hn - 1;
      hull_n[bi] = m;
      hull_rates[bi * 65] = 0;
      hull_picks[bi * 65] = 0;
      for (int j = 1; j <= m; ++j) {
        const int a = hull[j - 1], b = hull[j];
        hull_slopes[bi * 64 + j - 1] = (dist_at(b) - dist_at(a)) /
            std::max(1L, rate_at(b) - rate_at(a));
        hull_rates[bi * 65 + j] =
            rate_at(b) + (b < np ? trunc_margin : 0);
        hull_picks[bi * 65 + j] = b;
      }
    }
  }
  return bi;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Tier-2 packet-header generation: tag trees + the stuffed bit writer.
// Exact port of the Python _TagTree/_BitWriter/_npasses_code trio in
// codecs/jp2tpu.py (which remains as the readable reference and the
// byte-identity oracle, APT_T2_IMPL=py) — headers for thousands of
// code blocks per page were ~15% of the host encode wall in Python.

namespace {

// Packet-header bit writer with 0xFF bit-stuffing (T.800 B.10.1): a
// byte following an 0xFF carries only 7 bits.  Capacity is fixed when
// the byte starts.
struct BitWriter {
  uint8_t* out;
  long cap, n = 0;
  uint32_t bits = 0;
  int nbits = 0, limit = 8;
  bool overflow = false;

  BitWriter(uint8_t* o, long c) : out(o), cap(c) {}

  void Put(int bit) {
    if (nbits == 0)
      limit = (n > 0 && out[n - 1] == 0xFF) ? 7 : 8;
    bits = (bits << 1) | (bit & 1);
    if (++nbits == limit) {
      if (n >= cap) { overflow = true; return; }
      out[n++] = static_cast<uint8_t>(bits);
      bits = 0;
      nbits = 0;
    }
  }

  void PutBits(uint32_t val, int nb) {
    for (int i = nb - 1; i >= 0; --i) Put((val >> i) & 1);
  }

  long Flush() {
    if (nbits) {
      if (n >= cap) { overflow = true; return -1; }
      out[n++] = static_cast<uint8_t>(bits << (limit - nbits));
      bits = 0;
      nbits = 0;
    }
    if (n > 0 && out[n - 1] == 0xFF) {     // can't end on FF
      if (n >= cap) { overflow = true; return -1; }
      out[n++] = 0;
    }
    return overflow ? -1 : n;
  }
};

// Tag tree (T.800 B.10.2), encoder side, threshold coding with the
// same low/known broadcast semantics as the Python _TagTree.
struct TagTree {
  int nlev;
  std::vector<int> lw, lh, base;       // per-level dims + offsets
  std::vector<int32_t> value, low;
  std::vector<uint8_t> known;

  TagTree(int w, int h) {
    lw.push_back(w);
    lh.push_back(h);
    while (w > 1 || h > 1) {
      w = (w + 1) / 2;
      h = (h + 1) / 2;
      lw.push_back(w);
      lh.push_back(h);
    }
    nlev = static_cast<int>(lw.size());
    int tot = 0;
    for (int li = 0; li < nlev; ++li) {
      base.push_back(tot);
      tot += lw[li] * lh[li];
    }
    value.assign(tot, 0);
    low.assign(tot, 0);
    known.assign(tot, 0);
  }

  int32_t& V(int li, int x, int y) {
    return value[base[li] + y * lw[li] + x];
  }

  void Finalize() {
    for (int li = 1; li < nlev; ++li) {
      for (int y = 0; y < lh[li]; ++y)
        for (int x = 0; x < lw[li]; ++x)
          V(li, x, y) = 1 << 30;
      for (int y = 0; y < lh[li - 1]; ++y)
        for (int x = 0; x < lw[li - 1]; ++x)
          V(li, x / 2, y / 2) =
              std::min(V(li, x / 2, y / 2), V(li - 1, x, y));
    }
  }

  void Encode(BitWriter* bw, int x, int y, int threshold) {
    int32_t lowv = 0;
    for (int li = nlev - 1; li >= 0; --li) {     // root first
      const int lx = x >> li, ly = y >> li;
      const int idx = base[li] + ly * lw[li] + lx;
      if (lowv > low[idx]) low[idx] = lowv; else lowv = low[idx];
      while (lowv < threshold) {
        if (lowv >= value[idx]) {
          if (!known[idx]) {
            bw->Put(1);
            known[idx] = 1;
          }
          break;
        }
        bw->Put(0);
        ++lowv;
      }
      low[idx] = lowv;
    }
  }
};

void NPassesCode(BitWriter* bw, int n) {
  // number-of-coding-passes codeword (T.800 B.10.6)
  if (n == 1) {
    bw->Put(0);
  } else if (n == 2) {
    bw->Put(1);
    bw->Put(0);
  } else if (n <= 5) {
    bw->PutBits(0b11, 2);
    bw->PutBits(n - 3, 2);
  } else if (n <= 36) {
    bw->PutBits(0b1111, 4);
    bw->PutBits(n - 6, 5);
  } else {
    bw->PutBits(0b111111111, 9);
    bw->PutBits(n - 37, 7);
  }
}

}  // namespace

extern "C" {

// Header bits of one non-empty packet (single layer, one precinct).
// Bands are concatenated in HL, LH, HH (or [LL]) order; per band i:
// grid nxs[i] x nys[i] code blocks, whose per-block rows follow in
// raster order within the flattened arrays:
//   incl:   1 = block contributes passes to this packet
//   zbp:    zero-bitplane count (mb - nbps), used when included
//   np:     chosen coding passes (>= 1 when included)
//   lens:   chosen stream bytes
// Writes the stuffed header (leading 1 bit included) to out and
// returns its length, or -1 if cap is too small.
long jp2t2_packet_header(int nbands, const int* nxs, const int* nys,
                         const uint8_t* incl, const int* zbp,
                         const int* np, const long* lens,
                         uint8_t* out, long cap) {
  BitWriter bw(out, cap);
  bw.Put(1);                             // non-empty packet
  long pos = 0;
  for (int b = 0; b < nbands; ++b) {
    const int nx = nxs[b], ny = nys[b], nb = nx * ny;
    if (!nb) continue;
    TagTree it(nx, ny), zt(nx, ny);
    for (int i = 0; i < nb; ++i) {
      it.V(0, i % nx, i / nx) = incl[pos + i] ? 0 : 1;
      zt.V(0, i % nx, i / nx) = incl[pos + i] ? zbp[pos + i] : 0;
    }
    it.Finalize();
    zt.Finalize();
    for (int i = 0; i < nb; ++i) {
      const int x = i % nx, y = i / nx;
      it.Encode(&bw, x, y, 1);
      if (!incl[pos + i]) continue;
      zt.Encode(&bw, x, y, zbp[pos + i] + 1);
      NPassesCode(&bw, np[pos + i]);
      int lb = 3;
      const long ln = lens[pos + i];
      const int chosen = np[pos + i];
      int full = lb + (31 - __builtin_clz(
          static_cast<unsigned>(chosen)));
      int need = 1;
      while ((ln >> need) != 0) ++need;   // max(1, bit_length(ln))
      while (full < need) {
        bw.Put(1);
        ++lb;
        ++full;
      }
      bw.Put(0);
      bw.PutBits(static_cast<uint32_t>(ln), full);
    }
    pos += nb;
  }
  return bw.Flush();
}

}  // extern "C"

// ---------------------------------------------------------------------
// Host-side 9/7 DWT + deadzone quantizer (for machines where shipping
// coefficients from an accelerator costs more than computing them on
// the host; the device path in codecs/jp2tpu.py is the default).
// Matches the jnp lifting formulation (whole-sample symmetric
// extension, low *= 1/K, high *= K) in f32.

namespace {

constexpr float kAlpha = -1.586134342059924f;
constexpr float kBeta = -0.052980118572961f;
constexpr float kGamma = 0.882911075530934f;
constexpr float kDelta = 0.443506852043971f;
constexpr float kK = 1.230174104914001f;
// f32 round of the f64 quotient, like jnp's weak-typed (1.0 / K):
// f32(1.0f) / kK differs in the last ulp.
const float kInvK = static_cast<float>(1.0 / 1.230174104914001);

// One analysis lift of x[0..n) (stride between samples), packed back
// as low[0..ne) then high[0..no) using scratch (n floats).
// Each update is a single-rounding fmaf(coef, sum, dst): XLA-CPU
// contracts `dst + coef * sum` to an FMA, so the host path must too
// for byte-identical coefficients (the TU is built -ffp-contract=off;
// only these explicit fmaf calls fuse).
void Lift1D(float* x, int n, long stride, float* tmp) {
  const int ne = (n + 1) / 2, no = n / 2;
  float* even = tmp;
  float* odd = tmp + ne;
  for (int i = 0; i < ne; ++i) even[i] = x[(2 * i) * stride];
  for (int i = 0; i < no; ++i) odd[i] = x[(2 * i + 1) * stride];
  auto er = [&](int i) { return even[i + 1 < ne ? i + 1 : ne - 1]; };
  auto ol = [&](int i) { return odd[i > 0 ? i - 1 : 0]; };
  auto orr = [&](int i) { return odd[i < no ? i : no - 1]; };
  for (int i = 0; i < no; ++i)
    odd[i] = std::fmaf(kAlpha, even[i] + er(i), odd[i]);
  for (int i = 0; i < ne; ++i)
    even[i] = std::fmaf(kBeta, ol(i) + orr(i), even[i]);
  for (int i = 0; i < no; ++i)
    odd[i] = std::fmaf(kGamma, even[i] + er(i), odd[i]);
  for (int i = 0; i < ne; ++i)
    even[i] = std::fmaf(kDelta, ol(i) + orr(i), even[i]);
  for (int i = 0; i < ne; ++i) x[i * stride] = even[i] * kInvK;
  for (int i = 0; i < no; ++i) x[(ne + i) * stride] = odd[i] * kK;
}

// Row-wise vertical lift: identical per-element arithmetic to Lift1D
// down each column (same fmaf single-roundings), but organised as whole
// row operations — contiguous, auto-vectorized — instead of a strided
// walk per column (which thrashes cache at page widths).  Deinterleaves
// even/odd rows into buf, lifts, scales, packs back low-then-high.
void LiftVerticalBlock(float* plane, long stride, int ww, int hh,
                       float* buf) {
  const int ne = (hh + 1) / 2, no = hh / 2;
  for (int i = 0; i < ne; ++i)
    std::memcpy(buf + static_cast<size_t>(i) * ww,
                plane + static_cast<size_t>(2 * i) * stride,
                sizeof(float) * ww);
  for (int i = 0; i < no; ++i)
    std::memcpy(buf + static_cast<size_t>(ne + i) * ww,
                plane + static_cast<size_t>(2 * i + 1) * stride,
                sizeof(float) * ww);
  float* even = buf;
  float* odd = buf + static_cast<size_t>(ne) * ww;
  auto R = [ww](float* base, int i) {
    return base + static_cast<size_t>(i) * ww;
  };
  if (no > 0) {
    for (int i = 0; i < no; ++i) {
      const float* e0 = R(even, i);
      const float* e1 = R(even, i + 1 < ne ? i + 1 : ne - 1);
      float* o = R(odd, i);
      for (int x = 0; x < ww; ++x)
        o[x] = std::fmaf(kAlpha, e0[x] + e1[x], o[x]);
    }
    for (int i = 0; i < ne; ++i) {
      const float* ol = R(odd, i > 0 ? i - 1 : 0);
      const float* orr = R(odd, i < no ? i : no - 1);
      float* e = R(even, i);
      for (int x = 0; x < ww; ++x)
        e[x] = std::fmaf(kBeta, ol[x] + orr[x], e[x]);
    }
    for (int i = 0; i < no; ++i) {
      const float* e0 = R(even, i);
      const float* e1 = R(even, i + 1 < ne ? i + 1 : ne - 1);
      float* o = R(odd, i);
      for (int x = 0; x < ww; ++x)
        o[x] = std::fmaf(kGamma, e0[x] + e1[x], o[x]);
    }
    for (int i = 0; i < ne; ++i) {
      const float* ol = R(odd, i > 0 ? i - 1 : 0);
      const float* orr = R(odd, i < no ? i : no - 1);
      float* e = R(even, i);
      for (int x = 0; x < ww; ++x)
        e[x] = std::fmaf(kDelta, ol[x] + orr[x], e[x]);
    }
  }
  for (int i = 0; i < ne; ++i) {
    const float* e = R(even, i);
    float* dst = plane + static_cast<size_t>(i) * stride;
    for (int x = 0; x < ww; ++x) dst[x] = e[x] * kInvK;
  }
  for (int i = 0; i < no; ++i) {
    const float* o = R(odd, i);
    float* dst = plane + static_cast<size_t>(ne + i) * stride;
    for (int x = 0; x < ww; ++x) dst[x] = o[x] * kK;
  }
}

void QuantBand(const float* src, long stride, int bw, int bh, double step,
               int32_t* out) {
  // Multiply by the f32 round of the f64 reciprocal — the same constant
  // and correctly-rounded f32 multiply the jitted path uses (XLA's f32
  // *divide* is reciprocal+Newton and not IEEE, so a divide here would
  // NOT match it; see _device_transform in codecs/jp2tpu.py).
  const float inv = static_cast<float>(1.0 / step);
  for (int y = 0; y < bh; ++y) {
    const float* row = src + y * stride;
    for (int x = 0; x < bw; ++x) {
      out[static_cast<long>(y) * bw + x] =
          static_cast<int32_t>(row[x] * inv);
    }
  }
}

}  // namespace

extern "C" {

// Debug: gray DC shift + `levels` full levels (+ one extra vertical
// lift if half_extra), dumping the raw f32 plane — used by tests to
// localize any numeric divergence vs the jitted transform.
long jp2dwt_debug(const uint8_t* img, int w, int h, int levels,
                  int half_extra, float* out) {
  std::vector<float> plane(static_cast<size_t>(w) * h);
  std::vector<float> tmp(static_cast<size_t>(w > h ? w : h) + 2);
  for (long i = 0; i < static_cast<long>(w) * h; ++i)
    plane[i] = static_cast<float>(img[i]) - 128.0f;
  int ww = w, hh = h;
  for (int l = 0; l < levels; ++l) {
    for (int x = 0; x < ww; ++x)
      Lift1D(plane.data() + x, hh, w, tmp.data());
    for (int y = 0; y < hh; ++y)
      Lift1D(plane.data() + static_cast<long>(y) * w, ww, 1, tmp.data());
    ww = (ww + 1) / 2;
    hh = (hh + 1) / 2;
  }
  if (half_extra) {
    for (int x = 0; x < ww; ++x)
      Lift1D(plane.data() + x, hh, w, tmp.data());
  }
  std::memcpy(out, plane.data(), sizeof(float) * w * h);
  return 0;
}

// img: uint8, ncomp=1 (h*w) or 3 (h*w*3 interleaved, ICT applied).
// steps: per-band quantizer steps in codestream order (3*levels+1).
// out: int32, per component the concatenated bands in codestream
// order (LL, then coarsest->finest HL, LH, HH).  Returns 0.
long jp2dwt_quantize(const uint8_t* img, int w, int h, int ncomp,
                     int levels, const double* steps, int32_t* out) {
  std::vector<float> plane(static_cast<size_t>(w) * h);
  std::vector<float> tmp(static_cast<size_t>(w > h ? w : h) + 2);
  std::vector<float> vbuf(static_cast<size_t>(w) * h);
  long out_pos = 0;

  for (int c = 0; c < ncomp; ++c) {
    // DC shift (+ ICT for RGB)
    if (ncomp == 1) {
      for (long i = 0; i < static_cast<long>(w) * h; ++i)
        plane[i] = static_cast<float>(img[i]) - 128.0f;
    } else {
      // exact int32 fixed-point ICT (2^-16), identical to ICT_FIX in
      // codecs/jp2tpu.py — integer math is bit-stable on every
      // backend, unlike a float mul+add tree whose FMA contraction is
      // compiler-dependent.
      static const int32_t kIct[3][3] = {
          {19595, 38470, 7471},      // round(c * 65536)
          {-11059, -21709, 32768},
          {32768, -27439, -5329}};
      for (long i = 0; i < static_cast<long>(w) * h; ++i) {
        const int32_t r = static_cast<int32_t>(img[3 * i]) - 128;
        const int32_t g = static_cast<int32_t>(img[3 * i + 1]) - 128;
        const int32_t b = static_cast<int32_t>(img[3 * i + 2]) - 128;
        const int32_t s = kIct[c][0] * r + kIct[c][1] * g + kIct[c][2] * b;
        plane[i] = static_cast<float>(s) * 0x1p-16f;
      }
    }

    // in-place Mallat decomposition on the active top-left region
    int ww = w, hh = h;
    std::vector<int> lws(levels + 1), lhs(levels + 1);
    lws[0] = w; lhs[0] = h;
    for (int l = 0; l < levels; ++l) {
      // vertical first, then horizontal — the same composition order as
      // dwt97() in codecs/jp2tpu.py (_lift_axis(-2) then _lift_axis(-1));
      // the order changes f32 rounding, so it must match for the native
      // path to be byte-identical with the jitted transform.
      LiftVerticalBlock(plane.data(), w, ww, hh, vbuf.data());
      for (int y = 0; y < hh; ++y)                 // rows: horizontal
        Lift1D(plane.data() + static_cast<long>(y) * w, ww, 1,
               tmp.data());
      ww = (ww + 1) / 2;
      hh = (hh + 1) / 2;
      lws[l + 1] = ww; lhs[l + 1] = hh;
    }

    // emit bands in codestream order with the per-band steps
    // LL at the deepest level
    QuantBand(plane.data(), w, lws[levels], lhs[levels], steps[0],
              out + out_pos);
    out_pos += static_cast<long>(lws[levels]) * lhs[levels];
    for (int r = 0; r < levels; ++r) {             // coarsest first
      const int lvl = levels - r;                  // 1-based level
      const int pw = lws[lvl - 1], ph = lhs[lvl - 1];
      const int lw = lws[lvl], lh = lhs[lvl];
      const int hw = pw - lw, hhg = ph - lh;
      // HL: horizontal high, vertical low -> columns [lw, pw), rows [0, lh)
      QuantBand(plane.data() + lw, w, hw, lh, steps[1 + 3 * r],
                out + out_pos);
      out_pos += static_cast<long>(hw) * lh;
      // LH: rows [lh, ph), columns [0, lw)
      QuantBand(plane.data() + static_cast<long>(lh) * w, w, lw, hhg,
                steps[2 + 3 * r], out + out_pos);
      out_pos += static_cast<long>(lw) * hhg;
      // HH
      QuantBand(plane.data() + static_cast<long>(lh) * w + lw, w, hw,
                hhg, steps[3 + 3 * r], out + out_pos);
      out_pos += static_cast<long>(hw) * hhg;
    }
  }
  return 0;
}

}  // extern "C"
