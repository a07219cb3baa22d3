"""In-tree TPU JPEG2000 encoder (irreversible 9/7, Part-1 codestream).

The reference drives external Kakadu/OpenJPEG/Grok binaries through
tempfiles (``jpeg2000.py:37-42``, ``mrc.py:553-570``).  This module is a
self-contained encoder with the compute split the TPU way:

  device (jnp)   DC shift, ICT colour transform, the L-level CDF 9/7
                 lifting DWT and per-subband deadzone quantization —
                 pure elementwise/roll arithmetic that XLA fuses; pages
                 can be batched.
  host (C++)     EBCOT Tier-1 context-modelled MQ coding per 64x64 code
                 block (native/jp2t1.cpp via ctypes, GIL released, one
                 thread per block batch).
  host (python)  PCRD-style rate allocation (convex-hull slopes over
                 per-pass rate/distortion, global threshold), Tier-2
                 packet headers with inclusion/zero-bitplane tag trees,
                 markers, JP2 boxes.

Truncation is realised by re-encoding each block with its chosen pass
count, so every emitted code-block stream is a cleanly flushed MQ
codeword.  Output verifies against Pillow's OpenJPEG decoder
(tests/test_jp2tpu.py).
"""

import ctypes
import functools
import math
import os
import struct
import threading

from concurrent.futures import ThreadPoolExecutor

import numpy as np

# APT_T1_STATS=1: accumulate per-encode Tier-1 work counters (initial/
# rescue/final phase wall time, block and byte counts) in T1_STATS for
# perf attribution — the rescue rounds are the content-dependent part
# of the encode cost and invisible to stage-level timing.
T1_STATS = {}
_T1_STATS_LOCK = threading.Lock()


def _stat(key, dt=0.0, n=0):
    # Pages encode concurrently on the pipeline's thread pool; the
    # read-modify-write must be atomic or counter updates are lost.
    if os.environ.get('APT_T1_STATS'):
        with _T1_STATS_LOCK:
            t, c = T1_STATS.get(key, (0.0, 0))
            T1_STATS[key] = (t + dt, c + n)


# --- CDF 9/7 lifting constants (ITU-T T.800 Annex F) ---
ALPHA = -1.586134342059924
BETA = -0.052980118572961
GAMMA = 0.882911075530934
DELTA = 0.443506852043971
K = 1.230174104914001

CB = 64            # code-block side

# ICT (T.800 irreversible colour transform) coefficients in 2^-16 fixed
# point — shared verbatim by the device transform and native/jp2t1.cpp
# so both compute the identical exact-integer ICT (see _device_transform).
ICT_FIX = [[round(c * 65536) for c in row] for row in
           [[0.299, 0.587, 0.114],
            [-0.16875, -0.33126, 0.5],
            [0.5, -0.41869, -0.08131]]]
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'libjp2t1.so')
_lib = None


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, 'jp2t1.cpp')
    # -ffp-contract=off: only the explicit fmaf calls in Lift1D may
    # fuse, so the DWT numerics exactly mirror the jitted XLA-CPU
    # path; -mfma makes those fmaf calls single instructions
    # (fallback build without it still computes the same values via
    # libm fmaf, just slower).
    from ..utils.nativebuild import ensure_so
    flags = ['-O3', '-fPIC', '-std=c++17', '-ffp-contract=off']
    ensure_so(_SO_PATH, [src], [flags + ['-mfma'], flags])
    lib = ctypes.CDLL(_SO_PATH)
    lib.jp2t1_encode_block.restype = ctypes.c_long
    lib.jp2t1_encode_block.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double)]
    lib.jp2t1_encode_band.restype = ctypes.c_long
    lib.jp2t1_encode_band.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.jp2dwt_quantize.restype = ctypes.c_long
    lib.jp2dwt_quantize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32)]
    lib.jp2t2_packet_header.restype = ctypes.c_long
    lib.jp2t2_packet_header.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long]
    _lib = lib
    return lib


def _band_shapes(w, h, levels):
    """Per-band (bh, bw) in codestream order, matching the lifting
    sizes (low = ceil(n/2))."""
    lws, lhs = [w], [h]
    for _ in range(levels):
        lws.append((lws[-1] + 1) // 2)
        lhs.append((lhs[-1] + 1) // 2)
    shapes = [(lhs[levels], lws[levels])]
    for r in range(levels):
        lvl = levels - r
        pw, ph = lws[lvl - 1], lhs[lvl - 1]
        lw, lh = lws[lvl], lhs[lvl]
        shapes += [(lh, pw - lw), (ph - lh, lw), (ph - lh, pw - lw)]
    return shapes


# --- device transform ---------------------------------------------------

def _lift_indices(n):
    """Neighbour index vectors realizing whole-sample symmetric
    extension for the even/odd split of a length-n signal."""
    ne = (n + 1) // 2
    no = n // 2
    idx_er = np.minimum(np.arange(no) + 1, ne - 1)   # even[k+1] for odd k
    idx_ol = np.maximum(np.arange(ne) - 1, 0)        # odd[k-1] for even k
    idx_or = np.minimum(np.arange(ne), max(no - 1, 0))  # odd[k]
    return idx_er, idx_ol, idx_or


def _lift_axis(x, axis):
    """One 9/7 analysis level along ``axis`` (any length >= 2): returns
    (low, high) with sizes ceil(n/2), floor(n/2) — the T.800 subband
    size convention for origin 0."""
    import jax.numpy as jnp
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    idx_er, idx_ol, idx_or = _lift_indices(n)
    even = x[..., 0::2]
    odd = x[..., 1::2]

    no = odd.shape[-1]
    odd = odd + ALPHA * (even[..., :no] + even[..., idx_er])
    even = even + BETA * (odd[..., idx_ol] + odd[..., idx_or])
    odd = odd + GAMMA * (even[..., :no] + even[..., idx_er])
    even = even + DELTA * (odd[..., idx_ol] + odd[..., idx_or])
    low = even * (1.0 / K)
    high = odd * K
    return (jnp.moveaxis(low, -1, axis), jnp.moveaxis(high, -1, axis))


def dwt97(img, levels):
    """Forward L-level 9/7 DWT of (..., H, W) f32 (H, W even multiples).
    Returns the list of per-level subband dicts, finest first:
    [{'HL','LH','HH'}, ...] plus the final 'LL'."""
    bands = []
    ll = img
    for _ in range(levels):
        lo_r, hi_r = _lift_axis(ll, -2)       # rows (vertical)
        ll_, hl = _lift_axis(lo_r, -1)        # cols of the low rows
        lh, hh = _lift_axis(hi_r, -1)
        bands.append({'HL': hl, 'LH': lh, 'HH': hh})
        ll = ll_
    return bands, ll


def idwt97_np(bands, ll):
    """Numpy inverse (test oracle for the forward transform)."""
    def unlift(low, high, axis):
        low = np.moveaxis(np.asarray(low), axis, -1)
        high = np.moveaxis(np.asarray(high), axis, -1)
        n = low.shape[-1] + high.shape[-1]
        idx_er, idx_ol, idx_or = _lift_indices(n)
        even = low * K
        odd = high * (1.0 / K)
        no = odd.shape[-1]
        even = even - DELTA * (odd[..., idx_ol] + odd[..., idx_or])
        odd = odd - GAMMA * (even[..., :no] + even[..., idx_er])
        even = even - BETA * (odd[..., idx_ol] + odd[..., idx_or])
        odd = odd - ALPHA * (even[..., :no] + even[..., idx_er])
        out = np.zeros(even.shape[:-1] + (n,), even.dtype)
        out[..., 0::2] = even
        out[..., 1::2] = odd
        return np.moveaxis(out, -1, axis)

    ll = np.asarray(ll)
    for lvl in reversed(bands):
        lo = unlift(ll, lvl['HL'], -1)
        hi = unlift(lvl['LH'], lvl['HH'], -1)
        ll = unlift(lo, hi, -2)
    return ll


# --- quantization -------------------------------------------------------

def _band_norm(level, orient):
    """Approximate L2 norm of the synthesis basis (distortion weight);
    doubles per decomposition level."""
    base = {'LL': 1.0, 'LH': 0.56, 'HL': 0.56, 'HH': 0.31}[orient]
    return base * (2.0 ** level)


def _step_to_eps_mu(step, gain):
    """Quantizer step -> (eps, mu) per T.800 E.1.1 with R_b = 8 + gain
    (8-bit input): step = 2^(R_b - eps) * (1 + mu / 2^11)."""
    rb = 8 + gain
    e = rb - math.floor(math.log2(step))
    m = step / (2.0 ** (rb - e)) - 1.0
    mu = int(round(m * 2048))
    if mu > 2047:
        mu = 0
        e -= 1
    eps = max(0, min(31, e))
    return eps, mu


def band_layout(levels, base_delta):
    """Static per-subband metadata in codestream order (LL first, then
    per resolution HL, LH, HH): (orient, level, gain, eps, mu, step)."""
    out = [None] * (3 * levels + 1)
    def meta(level, orient, gain):
        delta = base_delta / _band_norm(level, orient)
        eps, mu = _step_to_eps_mu(delta, gain)
        # actual step implied by (eps, mu) so encoder/decoder agree
        step = (2.0 ** (8 + gain - eps)) * (1.0 + mu / 2048.0)
        return (orient, level, gain, eps, mu, step)
    out[0] = meta(levels, 'LL', 0)
    for r in range(levels):                  # coarsest first
        level = levels - r
        out[1 + 3 * r] = meta(level, 'HL', 1)
        out[2 + 3 * r] = meta(level, 'LH', 1)
        out[3 + 3 * r] = meta(level, 'HH', 2)
    return out


import jax


@functools.partial(jax.jit,
                   static_argnames=('levels', 'rgb', 'base_delta'))
def _device_transform(arr, levels, rgb, base_delta):
    """DC shift + (ICT) + DWT + quantize, one jit per (shape, levels,
    rgb, base_delta) — a single device dispatch per encode."""
    import jax.numpy as jnp
    if rgb:
        # ICT in exact int32 fixed point (2^-16 coefficients): float
        # mul+add trees get FMA-contracted by the backend compiler in
        # expression-shape-dependent ways (not even optimization_barrier
        # reaches that level), so a float ICT can never be bit-stable
        # across backends/the native host path.  Integer arithmetic is
        # exact everywhere; |sum| <= 2^23 so the f32 conversion and the
        # power-of-two scale are exact too.  Coefficient rounding is
        # ~1.5e-5 (<0.01 gray level through the transform) — far below
        # the finest quantizer step.
        xi = arr.astype(jnp.int32) - 128
        r, g, b = xi[..., 0], xi[..., 1], xi[..., 2]
        comps = [
            (c[0] * r + c[1] * g + c[2] * b).astype(jnp.float32) *
            np.float32(2.0 ** -16) for c in ICT_FIX]
    else:
        comps = [arr.astype(jnp.float32) - 128.0]
    layout = band_layout(levels, base_delta)
    out = []
    for comp in comps:
        bands, ll = dwt97(comp, levels)
        arrs = [ll]
        for lvl in reversed(bands):
            arrs += [lvl['HL'], lvl['LH'], lvl['HH']]
        # int32 throughout: coarse-band quantized magnitudes reach ~1e5
        # at fine steps, so an int16 transfer would clip structure.
        # Quantize by multiplying with the f32-rounded reciprocal, NOT
        # dividing: XLA's f32 divide is reciprocal+Newton and differs
        # from IEEE divide in ~1% of cases (backend-dependent), while
        # f32 multiply is correctly rounded everywhere — so the native
        # host path (QuantBand in native/jp2t1.cpp) multiplies by the
        # identical constant and the two paths agree bit-for-bit.
        # The barrier pins each band's f32 bits before the quantize
        # multiply: without it XLA's algebraic simplifier may fold the
        # lift's final *K (or *1/K) scaling into the reciprocal (one
        # multiply instead of two -> different rounding than the
        # native path's two).
        from jax import lax
        out.append(tuple(
            jnp.trunc(lax.optimization_barrier(a) *
                      np.float32(1.0 / m[5])).astype(jnp.int32)
            for m, a in zip(layout, arrs)))
    return tuple(out)


def _native_transform(arr, levels, rgb, base_delta):
    """Pure-host DWT + quantize (native/jp2t1.cpp): for machines where
    shipping coefficients back from an accelerator costs more than
    computing them on the host."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 3 + (1 if rgb else 0):          # batched: per page,
        pages = [_native_transform(a, levels, rgb, base_delta)
                 for a in arr]                     # stacked like the jit
        return tuple(
            tuple(np.stack([pg[c][k] for pg in pages])
                  for k in range(len(pages[0][c])))
            for c in range(len(pages[0])))
    lib = _get_lib()
    h, w = arr.shape[:2]
    ncomp = 3 if rgb else 1
    layout = band_layout(levels, float(base_delta))
    steps = np.array([m[5] for m in layout], np.float64)
    shapes = _band_shapes(w, h, levels)
    total = sum(a * b for (a, b) in shapes)
    out = np.empty(total * ncomp, np.int32)
    img = np.ascontiguousarray(arr)
    lib.jp2dwt_quantize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        ncomp, levels,
        steps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    comps = []
    pos = 0
    for _c in range(ncomp):
        bands = []
        for (bh, bw) in shapes:
            bands.append(out[pos:pos + bh * bw].reshape(bh, bw))
            pos += bh * bw
        comps.append(tuple(bands))
    return tuple(comps)


def _run_device_transform(arr, levels, rgb, base_delta):
    """Dispatch the transform, honoring APT_JP2_DEVICE: 'native' = the
    C++ host path, any JAX backend name (e.g. 'cpu') = run there (for
    hosts whose device link is too slow to ship coefficients back);
    unset = the session's default accelerator, or the native path when
    the default backend is plain CPU.

    Determinism: the native path is bit-identical with the XLA-CPU
    jitted transform (fmaf lifts + exact-integer ICT + pinned quantize;
    tested on noisy full pages), so the CPU auto-switch never changes
    emitted bytes.  A real TPU's f32 multiply-add rounds differently in
    ~0.1% of coefficients (+-1 quantizer step, measured on v5e) — the
    TPU path produces equally valid but not byte-identical streams; do
    not diff outputs across accelerator generations."""
    dev = os.environ.get('APT_JP2_DEVICE')
    if dev == 'native':
        return _native_transform(arr, levels, rgb, base_delta)
    import jax
    if dev:
        with jax.default_device(jax.local_devices(backend=dev)[0]):
            return _device_transform(arr, levels, rgb, base_delta)
    try:
        on_cpu = jax.devices()[0].platform == 'cpu'
    except Exception:
        on_cpu = True
    if on_cpu:
        return _native_transform(arr, levels, rgb, base_delta)
    return _device_transform(arr, levels, rgb, base_delta)


# --- Tier-1 driver ------------------------------------------------------

_ORIENT_CODE = {'LL': 0, 'LH': 0, 'HL': 1, 'HH': 2}


def _encode_block(lib, blk, orient_code, max_passes=-1, max_bytes=0):
    h, w = blk.shape
    cap = max(4096, w * h * 4)
    out = np.empty(cap, np.uint8)
    nbps = ctypes.c_int()
    npasses = ctypes.c_int()
    rates = np.zeros(128, np.int64)
    dists = np.zeros(128, np.float64)
    blk = np.ascontiguousarray(blk, np.int32)
    n = lib.jp2t1_encode_block(
        blk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), w, h,
        orient_code, max_passes, max_bytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        ctypes.byref(nbps), ctypes.byref(npasses),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        dists.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if n < 0:
        raise RuntimeError('jp2t1 buffer overflow')
    np_ = npasses.value
    return (out[:n].tobytes(), nbps.value, np_,
            rates[:np_].copy(), dists[:np_].copy())


class _CodeBlock:
    __slots__ = ('data', 'nbps', 'npasses', 'rates', 'dists', 'arr',
                 'orient_code', 'weight', 'chosen', 'chosen_bytes',
                 'capped', 'pass_capped', 'hull_rows')

    def __init__(self, arr, orient_code, weight):
        self.arr = arr
        self.orient_code = orient_code
        self.weight = weight
        self.chosen = 0
        self.chosen_bytes = b''
        # capped: a BYTE cap cut this block's passes mid-plane — the
        # hull near the cut is unreliable, so rescue uses a slack.
        # pass_capped: a PASS-count cap stopped it at an exact pass
        # boundary — the recorded hull is exact below the cap, so
        # rescue triggers only when the pick reaches the cap itself.
        self.capped = False
        self.pass_capped = False
        self.hull_rows = None


def _hull_rows(cb):
    """Per-block PCRD candidate rows, cached on the block (rescue
    rounds re-run the threshold search over thousands of unchanged
    blocks — only re-encoded blocks rebuild their hull).

    Returns (seg_slopes, pt_rates, pt_picks) lists: the convex hull of
    (rate, weighted distortion) truncation points, as decreasing
    segment slopes plus the realized byte cost / pass pick per hull
    point (truncated picks cost the truncation margin too)."""
    if cb.hull_rows is not None:
        return cb.hull_rows
    pts = [(0, 0.0)]
    for i in range(cb.npasses):
        pts.append((int(cb.rates[i]), cb.dists[i] * cb.weight))
    hull = [0]
    for i in range(1, len(pts)):
        while len(hull) >= 2:
            a, b = hull[-2], hull[-1]
            s1 = (pts[b][1] - pts[a][1]) / max(1, pts[b][0] - pts[a][0])
            s2 = (pts[i][1] - pts[b][1]) / max(1, pts[i][0] - pts[b][0])
            if s2 >= s1:
                hull.pop()
            else:
                break
        hull.append(i)
    slopes, rates_, picks = [], [0], [0]
    for j in range(1, len(hull)):
        a, b = hull[j - 1], hull[j]
        slopes.append((pts[b][1] - pts[a][1]) /
                      max(1, pts[b][0] - pts[a][0]))
        rates_.append(pts[b][0] +
                      (_TRUNC_MARGIN if hull[j] < cb.npasses else 0))
        picks.append(hull[j])
    cb.hull_rows = (slopes, rates_, picks)
    return cb.hull_rows


def _pcrd_choose(blocks, target_bytes):
    """PCRD core: one global slope threshold over every block's
    convex-hull segments; sets cb.chosen per block.

    Exact closed form: per block the hull slopes are strictly
    decreasing, so a threshold L includes precisely a per-block prefix
    of segments.  Flattening all segments, sorting by slope once and
    scanning slope-class boundaries yields the largest-inclusion
    feasible threshold directly — replacing the former 48-iteration
    vectorized bisection (~33 ms per encode at realistic block counts;
    measured 2026-08-20) with one argsort.  Equal slopes stay an
    all-or-nothing class, matching the threshold semantics the
    bisection converged to."""
    rows_data = [_hull_rows(cb) for cb in blocks]
    for cb in blocks:
        cb.chosen = 0
    nseg = [len(r[0]) for r in rows_data]
    total_seg = sum(nseg)
    if total_seg == 0 or target_bytes <= 0:
        return
    slopes = np.empty(total_seg, np.float64)
    deltas = np.empty(total_seg, np.int64)    # realized bytes/segment
    picks = np.empty(total_seg, np.int32)
    owner = np.empty(total_seg, np.int32)
    pos = 0
    for bi, (s, r, p) in enumerate(rows_data):
        n = nseg[bi]
        if not n:
            continue
        slopes[pos:pos + n] = s
        rr = np.asarray(r, np.int64)
        deltas[pos:pos + n] = rr[1:] - rr[:-1]
        picks[pos:pos + n] = np.asarray(p)[1:]
        owner[pos:pos + n] = bi
        pos += n
    # the bisection never tested thresholds at/below 1e-9: segments
    # that flat never get included (they carry ~no distortion anyway)
    live = np.flatnonzero(slopes >= 1e-9)
    if live.size == 0:
        return
    order = live[np.argsort(-slopes[live], kind='stable')]
    ls = slopes[order]
    csum = np.cumsum(deltas[order])
    # slope-class ends (inclusion cannot split an equal-slope class)
    ends = np.flatnonzero(np.diff(ls) < 0)
    ends = np.append(ends, ls.size - 1)
    feas = ends[csum[ends] <= target_bytes]
    if feas.size == 0:
        return
    k = int(feas[-1]) + 1
    # per block keep the deepest included segment's pass pick (picks
    # increase along each block's hull, so max == last)
    chosen = np.zeros(len(blocks), np.int64)
    np.maximum.at(chosen, owner[order[:k]], picks[order[:k]])
    for bi in np.flatnonzero(chosen):
        blocks[bi].chosen = int(chosen[bi])


def _allocate_rate(blocks, target_bytes, lib, workers, bands=None):
    """PCRD with starved-block recovery: blocks are T1-coded under a
    work cap (_t1_all), so when the threshold search wants EVERY
    recorded pass of a cap-cut block, its true optimum may lie beyond
    the cap — re-encode just those uncapped and re-run the search.
    Converges to the uncapped allocation while coding a fraction of
    the passes (at ratio 750 the cap floor saves ~10x the pass work).

    bands: the _Band list owning `blocks`; when given, rescue
    re-encodes ride the band-batched native entry (skip-capped) instead
    of per-block ctypes calls."""
    slack = int(os.environ.get('APT_T1_STARVE_SLACK', '3'))
    max_rounds = int(os.environ.get('APT_T1_MAX_RESCUE_ROUNDS', '3'))
    kcap = max(48, len(blocks) // 32)

    def tail_slope(cb):
        if cb.npasses < 2:
            return float('inf')
        return (cb.dists[-1] - cb.dists[-2]) * cb.weight / \
            max(1, int(cb.rates[-1]) - int(cb.rates[-2]))

    for _round in range(max_rounds + 1):
        _pcrd_choose(blocks, target_bytes)
        # byte-capped blocks rescue within `slack` passes of the cut
        # (the hull near a mid-plane cut is unreliable); pass-capped
        # blocks have an exact hull below the cap, so only a pick AT
        # the cap means the optimum may lie beyond it
        starved = [cb for cb in blocks
                   if (cb.capped and cb.chosen >= cb.npasses - slack)
                   or (cb.pass_capped and cb.chosen >= cb.npasses)]
        if not starved or _round == max_rounds:
            break
        if len(starved) > kcap:
            # noise-like content: nearly every block sits at the cap
            # and blocks are fungible (the threshold barely moves if a
            # few stay truncated) — rescue only the highest-slope ones
            # so re-encode work stays bounded
            starved.sort(key=tail_slope, reverse=True)
            starved = starved[:kcap]
        import time as _t
        _r0 = _t.time()
        if bands is not None:
            band_of = {id(cb): band for band in bands
                       for cb in band.blocks}
            by_band = {}
            for cb in starved:
                band = band_of[id(cb)]
                by_band.setdefault(id(band), (band, set()))[1].add(id(cb))
            for band, ids in by_band.values():
                _encode_band_blocks(lib, band, only=ids)
        else:
            _encode_blocks(starved, lib, workers, caps=None)
        _stat('rescue', _t.time() - _r0, len(starved))
    _final_encode(blocks, lib, workers)


# Safety margin added to a pass-end rate when truncating the MQ stream
# there: the decoder's register holds up to two bytes of lookahead
# beyond the encoder's emitted count, and it feeds 0xFF past the end of
# a truncated stream (T.800 J.10.2 behaviour all conformant decoders
# implement).  rates[] already includes the pending byte + 1; +2 covers
# the lookahead.  Validated empirically against full decodes in
# tests/test_jp2tpu.py::test_truncation_matches_reencode.
_TRUNC_MARGIN = 2


def _final_encode(blocks, lib, workers):
    """Realize each block's chosen pass count by TRUNCATING its fully
    coded stream at the recorded pass-end rate (+margin) — no
    re-encode.  Round 1 re-encoded every truncated block (25% of the
    clean-page encode time); truncation is what OpenJPEG/Kakadu ship
    and is decodable by construction: the included passes' decisions
    use only bytes before the cut."""
    for cb in blocks:
        if cb.chosen <= 0:
            cb.chosen_bytes = b''
            cb.chosen = 0
        elif cb.chosen >= cb.npasses:
            cb.chosen = cb.npasses
            cb.chosen_bytes = cb.data
        else:
            cut = min(len(cb.data),
                      int(cb.rates[cb.chosen - 1]) + _TRUNC_MARGIN)
            cb.chosen_bytes = cb.data[:cut]


# --- Tier-2: tag trees and packet headers ------------------------------

class _BitWriter:
    """Packet-header bit writer with 0xFF bit-stuffing: a byte following
    an 0xFF carries only 7 bits (MSB forced 0).  The per-byte capacity
    is fixed when the byte starts, not re-evaluated per bit."""

    def __init__(self):
        self.bytes = bytearray()
        self.bits = 0
        self.nbits = 0
        self.limit = 8

    def put(self, bit):
        if self.nbits == 0:
            self.limit = 7 if (self.bytes and self.bytes[-1] == 0xFF) \
                else 8
        self.bits = (self.bits << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == self.limit:
            self.bytes.append(self.bits)
            self.bits = 0
            self.nbits = 0

    def put_bits(self, val, n):
        for i in range(n - 1, -1, -1):
            self.put((val >> i) & 1)

    def flush(self):
        if self.nbits:
            self.bytes.append(self.bits << (self.limit - self.nbits))
            self.bits = 0
            self.nbits = 0
        if self.bytes and self.bytes[-1] == 0xFF:   # can't end on FF
            self.bytes.append(0)
        return bytes(self.bytes)


class _TagTree:
    """Tag tree (T.800 B.10.2), encoder side.  Per node: the value
    (min over its leaves), a broadcast lower bound ``low`` and a
    ``known`` flag; threshold coding emits 0 for "value above current
    bound", 1 when the node's value is reached."""

    def __init__(self, w, h):
        self.levels = [(w, h)]
        while w > 1 or h > 1:
            w = (w + 1) // 2
            h = (h + 1) // 2
            self.levels.append((w, h))
        self.value = [np.zeros((lh, lw), np.int32)
                      for (lw, lh) in self.levels]
        self.low = [np.zeros((lh, lw), np.int32)
                    for (lw, lh) in self.levels]
        self.known = [np.zeros((lh, lw), bool)
                      for (lw, lh) in self.levels]

    def set(self, x, y, v):
        self.value[0][y, x] = v

    def finalize(self):
        for li in range(1, len(self.levels)):
            prev = self.value[li - 1]
            lw, lh = self.levels[li]
            # min-pool 2x2 (ragged edges padded with the +inf sentinel)
            pad = np.full((lh * 2, lw * 2), 2 ** 30, np.int32)
            pad[:prev.shape[0], :prev.shape[1]] = prev
            self.value[li] = np.minimum(
                np.minimum(pad[0::2, 0::2], pad[0::2, 1::2]),
                np.minimum(pad[1::2, 0::2], pad[1::2, 1::2]))

    def encode(self, bw, x, y, threshold):
        path = []
        lx, ly = x, y
        for li in range(len(self.levels)):
            path.append((li, lx, ly))
            lx //= 2
            ly //= 2
        low = 0
        for (li, lx, ly) in reversed(path):      # root first
            if low > self.low[li][ly, lx]:
                self.low[li][ly, lx] = low
            else:
                low = self.low[li][ly, lx]
            while low < threshold:
                if low >= self.value[li][ly, lx]:
                    if not self.known[li][ly, lx]:
                        bw.put(1)
                        self.known[li][ly, lx] = True
                    break
                bw.put(0)
                low += 1
            self.low[li][ly, lx] = low


# --- packet / codestream assembly --------------------------------------

def _npasses_code(bw, n):
    """Number-of-coding-passes codeword (T.800 B.10.6)."""
    if n == 1:
        bw.put(0)
    elif n == 2:
        bw.put(1)
        bw.put(0)
    elif n <= 5:
        bw.put_bits(0b11, 2)
        bw.put_bits(n - 3, 2)
    elif n <= 36:
        bw.put_bits(0b1111, 4)
        bw.put_bits(n - 6, 5)
    else:
        bw.put_bits(0b111111111, 9)
        bw.put_bits(n - 37, 7)


class _Band:
    """One subband of one component: quantized array + code blocks.

    plane_budget: planes the transfer shipped for this band (pack4),
    None for full-precision bands.  Plane-budgeted blocks have at most
    3K-2 passes, so the T1 byte cap saves nothing on them and its
    starved-block rescue would fire on every ordinary fully-coded
    block (measured: a 1287-block rescue storm on one 8-page batch) —
    _t1_all skips caps for them."""

    plane_budget = None

    def __init__(self, orient, level, gain, eps, mu, step, arr):
        self.orient = orient
        self.level = level
        self.gain = gain
        self.eps = eps
        self.mu = mu
        self.step = step
        self.arr = arr
        h, w = arr.shape
        self.nx = -(-w // CB) if w else 0
        self.ny = -(-h // CB) if h else 0
        self.blocks = []          # raster order
        weight = (step * _band_norm(level, orient)) ** 2
        for by in range(self.ny):
            for bx in range(self.nx):
                # store the VIEW; _encode_block makes the contiguous
                # int32 copy only for blocks that actually encode (on
                # pack4 fg layers most fine-band blocks are all-zero)
                blk = arr[by * CB:(by + 1) * CB, bx * CB:(bx + 1) * CB]
                self.blocks.append(_CodeBlock(
                    blk, _ORIENT_CODE[orient], weight))


def _encode_blocks(blocks, lib, workers, caps=None, max_passes=-1):
    """T1-encode blocks (optionally byte- or pass-capped), recording
    whether a cap actually cut passes so the allocator can re-encode
    starved blocks uncapped."""
    def run(cb):
        if not cb.arr.any():
            # all-zero block: no planes, no passes, no bytes — skip the
            # int32 copy and the native call (the common case for fine
            # bands of pack4 MRC layers)
            cb.data, cb.nbps, cb.npasses = b'', 0, 0
            cb.rates = np.zeros(0, np.int64)
            cb.dists = np.zeros(0, np.float64)
            cb.capped = False
            cb.pass_capped = False
            cb.hull_rows = None
            return
        cap = caps.get(id(cb), 0) if caps else 0
        (cb.data, cb.nbps, cb.npasses, cb.rates, cb.dists) = \
            _encode_block(lib, cb.arr, cb.orient_code,
                          max_passes=max_passes if max_passes > 0 else -1,
                          max_bytes=cap)
        short = cb.npasses < 3 * cb.nbps - 2
        cb.capped = bool(cap) and short
        cb.pass_capped = (not cb.capped and max_passes > 0
                          and cb.npasses >= max_passes and short)
        cb.hull_rows = None

    if workers > 1 and len(blocks) > 1:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(run, blocks))
    else:
        for cb in blocks:
            run(cb)


def _encode_band_blocks(lib, band, caps=None, only=None, max_passes=-1):
    """T1-encode every block of one band with ONE native call.

    only: optional set of block ids — the native call skips every
    other block (caps entry -1) and their recorded state is left
    untouched; used by the starved-block rescue so re-encodes stay on
    this batched entry instead of the per-block ctypes path (which
    cost ~1 ms/block of marshalling + GIL churn, measured 2026-08-20).

    max_passes: pass-count work cap applied to every block of the
    band (<= 0 = all passes); blocks it actually cuts are flagged
    capped so the rate allocator's starved rescue covers them.

    The per-block path costs, per block, an ascontiguousarray + a
    ctypes call + a GIL release/reacquire; inside recode() the GIL
    ping-pong against the loader/qband-fetch threads inflated Tier-1
    from a measured 0.10 ms/block (quiet process, tools/t1_profile.py)
    to 0.42 ms/block (e2e A/B 'initial' stat).  Batching the band into
    native/jp2t1.cpp:jp2t1_encode_band holds the GIL handoff count at
    one per band and moves the all-zero-block test into the same C++
    scan that extracts the block.  Streams are byte-identical with the
    per-block path (tests/test_jp2tpu.py)."""
    blocks = band.blocks
    nb = len(blocks)
    if nb == 0:
        return
    arr = np.ascontiguousarray(band.arr, np.int32)
    bh, bw = arr.shape
    caps_arr = None
    if only is not None:
        caps_arr = np.full(nb, -1, np.int64)      # -1 = native skip
        for i, cb in enumerate(blocks):
            if id(cb) in only:
                caps_arr[i] = caps.get(id(cb), 0) if caps else 0
    elif caps:
        caps_arr = np.zeros(nb, np.int64)
        for i, cb in enumerate(blocks):
            caps_arr[i] = caps.get(id(cb), 0)
        if not caps_arr.any():
            caps_arr = None
    out_cap = arr.size * 4 + 2048 * nb + 4096
    out = np.empty(out_cap, np.uint8)
    nbps = np.zeros(nb, np.int32)
    npasses = np.zeros(nb, np.int32)
    lens = np.zeros(nb, np.int64)
    offs = np.zeros(nb, np.int64)
    rates = np.zeros((nb, 128), np.int64)
    dists = np.zeros((nb, 128), np.float64)
    hull_n = np.zeros(nb, np.int32)
    hull_slopes = np.zeros((nb, 64), np.float64)
    hull_rates = np.zeros((nb, 65), np.int64)
    hull_picks = np.zeros((nb, 65), np.int32)
    i64p = ctypes.POINTER(ctypes.c_long)
    intp = ctypes.POINTER(ctypes.c_int)
    n = lib.jp2t1_encode_band(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), bw, bh, CB,
        blocks[0].orient_code,
        caps_arr.ctypes.data_as(i64p) if caps_arr is not None else None,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_cap,
        nbps.ctypes.data_as(intp), npasses.ctypes.data_as(intp),
        lens.ctypes.data_as(i64p), offs.ctypes.data_as(i64p),
        rates.ctypes.data_as(i64p),
        dists.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        blocks[0].weight, _TRUNC_MARGIN,
        hull_n.ctypes.data_as(intp),
        hull_slopes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hull_rates.ctypes.data_as(i64p), hull_picks.ctypes.data_as(intp),
        int(max_passes))
    if n != nb:
        raise RuntimeError('jp2t1_encode_band overflow (%d != %d)'
                           % (n, nb))
    for i, cb in enumerate(blocks):
        if only is not None and id(cb) not in only:
            continue                      # skipped block: state untouched
        npi = int(npasses[i])
        o = int(offs[i])
        cb.data = out[o:o + int(lens[i])].tobytes()
        cb.nbps = int(nbps[i])
        cb.npasses = npi
        cb.rates = rates[i, :npi]
        cb.dists = dists[i, :npi]
        cap = int(caps_arr[i]) if caps_arr is not None else 0
        short = npi < 3 * cb.nbps - 2
        cb.capped = cap > 0 and short
        cb.pass_capped = (not cb.capped and max_passes > 0
                          and npi >= max_passes and short)
        m = int(hull_n[i])
        cb.hull_rows = (hull_slopes[i, :m], hull_rates[i, :m + 1],
                        hull_picks[i, :m + 1])


def _t1_all(bands, lib, workers, target_bytes=None):
    blocks = [cb for band in bands for cb in band.blocks]
    # rate-aware work cap: when a byte target exists, almost no block's
    # passes survive PCRD beyond ~4x its fair share of the budget, so
    # stop its T1 encode there (the big speedup at high ratios).  The
    # floor keeps enough recorded passes for PCRD to rank blocks; the
    # allocator re-encodes the rare block it exhausts (see
    # _allocate_rate), so a low floor costs quality nothing.
    caps = {}
    pass_caps = {}
    # APT_T1_CAPS: auto (default policy below) | all (cap every band,
    # the r3 behavior) | off — the A/B knob for tools/t1_cap_ab.py
    cap_mode = os.environ.get('APT_T1_CAPS', 'auto')
    if target_bytes and cap_mode != 'off':
        # floor 512 (was 96): on the realistic corpus the 96-byte floor
        # sat exactly at the int8 level-3 blocks' typical chosen size,
        # so their rescue re-encoded ~35 blocks/job every page — pure
        # double work.  512 uncaps those small producers (initial +0.08
        # s/3pages, rescue -0.54) and stays byte-identical; A/B
        # 2026-08-20: floor 96 0.741 s, 256 0.712, 512 0.617 (3 pages).
        floor = int(os.environ.get('APT_T1_CAP_FLOOR', '512'))
        total_px = sum(cb.arr.size for cb in blocks) or 1
        for band in bands:
            if cap_mode == 'all':
                for cb in band.blocks:
                    caps[id(cb)] = max(
                        floor, 4 * target_bytes * cb.arr.size // total_px)
                continue
            # pack4 plane-budgeted bands (<= 7 passes): a byte cap saves
            # ~nothing and rescue-storms (measured: 1287 blocks on one
            # 8-page batch), but their FINEST plane is the expensive one
            # and final picks almost never reach it (avg chosen 0-0.1 of
            # 4-5 recorded passes, per-band pick capture 2026-08-20) —
            # pass-cap at the top two planes; the exact-boundary rescue
            # realizes the rare block that wants more.
            if band.plane_budget is not None and band.plane_budget <= 4:
                fine = int(os.environ.get('APT_T1_FINE_PASSES', '4'))
                if fine > 0:
                    pass_caps[id(band)] = fine
                continue
            # small (coarse) full-precision bands: a byte cap starves
            # them structurally (at high ratios the byte budget
            # CONCENTRATES in the few coarse blocks — an LL block takes
            # ~target/16 while its pixel share says ~96 B, so byte caps
            # rescue-stormed).  But their DEEP planes are pure waste:
            # on the realistic corpus these blocks record ~41-53 passes
            # and PCRD keeps ~0-12 (measured 2026-08-20, per-band pick
            # capture).  Cap by PASS COUNT instead — the top
            # APT_T1_COARSE_PLANES (default 7) bit planes, 19 passes —
            # which cuts the dense deep planes where the cost lives
            # while the starved rescue still guarantees the uncapped
            # allocation when a block wants more.
            if band.arr.dtype != np.int8 and len(band.blocks) <= 64:
                pass_caps[id(band)] = 3 * int(os.environ.get(
                    'APT_T1_COARSE_PLANES', '7')) - 2
                continue
            for cb in band.blocks:
                caps[id(cb)] = max(
                    floor, 4 * target_bytes * cb.arr.size // total_px)
    import time as _t
    _i0 = _t.time()

    def enc(band):
        _encode_band_blocks(lib, band, caps,
                            max_passes=pass_caps.get(id(band), -1))

    if workers > 1 and len(bands) > 1:
        # multi-core hosts: band-level calls release the GIL for their
        # whole duration, so a thread per band parallelizes in C++
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(enc, bands))
    else:
        for band in bands:
            enc(band)
    _stat('initial', _t.time() - _i0, len(blocks))
    return blocks


def _packet(bands_at_res, mb):
    """One packet (single layer, one precinct): header + body bytes.
    bands_at_res: list of _Band in HL, LH, HH (or [LL]) order.

    The header (tag trees + stuffed bit writer) is generated by
    native/jp2t1.cpp:jp2t2_packet_header; the Python path below is the
    readable reference and byte-identity oracle (APT_T2_IMPL=py,
    tests/test_jp2tpu.py)."""
    if not any(band.blocks for band in bands_at_res):
        return b''                      # no blocks at all: no packet
    included = [cb for band in bands_at_res for cb in band.blocks
                if cb.chosen > 0 and len(cb.chosen_bytes)]
    if not included:
        bw = _BitWriter()
        bw.put(0)                       # empty packet
        return bw.flush()

    if _lib is not None and os.environ.get('APT_T2_IMPL') != 'py':
        bands = [b for b in bands_at_res if b.blocks]
        nb_tot = sum(len(b.blocks) for b in bands)
        nxs = np.array([b.nx for b in bands], np.int32)
        nys = np.array([b.ny for b in bands], np.int32)
        incl = np.zeros(nb_tot, np.uint8)
        zbp = np.zeros(nb_tot, np.int32)
        np_ = np.zeros(nb_tot, np.int32)
        lens = np.zeros(nb_tot, np.int64)
        body = []
        pos = 0
        for band in bands:
            mbb = mb[band]
            for i, cb in enumerate(band.blocks):
                if cb.chosen > 0 and len(cb.chosen_bytes):
                    incl[pos + i] = 1
                    zbp[pos + i] = max(0, mbb - cb.nbps)
                    np_[pos + i] = cb.chosen
                    lens[pos + i] = len(cb.chosen_bytes)
                    body.append(cb.chosen_bytes)
            pos += len(band.blocks)
        # worst-case header bits per included block: two tag-tree
        # walks (<= ~2 bits/level + threshold zeros), npasses (<= 16),
        # Lblock ones + length (<= ~40) — 64 bytes/block is generous
        cap = 64 * nb_tot + 1024
        out = np.empty(cap, np.uint8)
        intp = ctypes.POINTER(ctypes.c_int)
        n = _lib.jp2t2_packet_header(
            len(bands), nxs.ctypes.data_as(intp),
            nys.ctypes.data_as(intp),
            incl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            zbp.ctypes.data_as(intp), np_.ctypes.data_as(intp),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if n < 0:
            raise RuntimeError('jp2t2_packet_header overflow')
        return out[:n].tobytes() + b''.join(body)

    bw = _BitWriter()
    bw.put(1)
    body = bytearray()
    for band in bands_at_res:
        if not band.blocks:
            continue
        incl = _TagTree(band.nx, band.ny)
        zbt = _TagTree(band.nx, band.ny)
        for i, cb in enumerate(band.blocks):
            x, y = i % band.nx, i // band.nx
            ok = cb.chosen > 0 and len(cb.chosen_bytes)
            incl.set(x, y, 0 if ok else 1)
            zbt.set(x, y, max(0, mb[band] - cb.nbps) if ok else 0)
        incl.finalize()
        zbt.finalize()
        lblock = {}
        for i, cb in enumerate(band.blocks):
            x, y = i % band.nx, i // band.nx
            ok = cb.chosen > 0 and len(cb.chosen_bytes)
            incl.encode(bw, x, y, 1)
            if not ok:
                continue
            zbt.encode(bw, x, y, max(0, mb[band] - cb.nbps) + 1)
            _npasses_code(bw, cb.chosen)
            lb = lblock.get(i, 3)
            ln = len(cb.chosen_bytes)
            full = lb + int(math.floor(math.log2(cb.chosen)))
            need = max(1, ln.bit_length())
            while full < need:
                bw.put(1)
                lb += 1
                full += 1
            bw.put(0)
            lblock[i] = lb
            bw.put_bits(ln, full)
            body += cb.chosen_bytes
    return bw.flush() + bytes(body)


def _assemble(w, h, ncomp, levels, guard, comp_bands, mct):
    """Markers + tile + packets (LRCP, one layer, one precinct/res)."""
    out = bytearray()
    out += b'\xff\x4f'                                   # SOC
    # SIZ
    siz = struct.pack('>HIIIIIIIIH', 0, w, h, 0, 0, w, h, 0, 0, ncomp)
    for _ in range(ncomp):
        siz += struct.pack('>BBB', 7, 1, 1)
    out += b'\xff\x51' + struct.pack('>H', 2 + len(siz)) + siz
    # COD
    cod = struct.pack('>BBHBBBBBB', 0, 0, 1, 1 if mct else 0,
                      levels, 4, 4, 0, 0)
    out += b'\xff\x52' + struct.pack('>H', 2 + len(cod)) + cod
    # QCD (scalar expounded; same for every component)
    qcd = struct.pack('>B', 0x02 | (guard << 5))
    for band in comp_bands[0]:
        qcd += struct.pack('>H', (band.eps << 11) | band.mu)
    out += b'\xff\x5c' + struct.pack('>H', 2 + len(qcd)) + qcd

    # packets, LRCP: layer(1) -> res -> comp
    mb = {band: guard + band.eps - 1
          for bands in comp_bands for band in bands}
    packets = bytearray()
    for r in range(levels + 1):
        for c in range(ncomp):
            bands = comp_bands[c]
            if r == 0:
                at_res = [bands[0]]
            else:
                at_res = bands[1 + 3 * (r - 1): 1 + 3 * r]
            packets += _packet(at_res, mb)

    psot = 12 + 2 + len(packets)
    out += b'\xff\x90' + struct.pack('>HHIBB', 10, 0, psot, 0, 1)  # SOT
    out += b'\xff\x93'                                   # SOD
    out += packets
    out += b'\xff\xd9'                                   # EOC
    return bytes(out)


def _jp2_wrap(codestream, w, h, ncomp):
    def box(tag, payload):
        return struct.pack('>I', 8 + len(payload)) + tag + payload

    sig = box(b'jP  ', b'\x0d\x0a\x87\x0a')
    ftyp = box(b'ftyp', b'jp2 ' + b'\x00' * 4 + b'jp2 ')
    ihdr = box(b'ihdr', struct.pack('>IIHBBBB', h, w, ncomp, 7, 7, 0, 0))
    colr = box(b'colr', struct.pack('>BBBI', 1, 0, 0,
                                    16 if ncomp == 3 else 17))
    jp2h = box(b'jp2h', ihdr + colr)
    jp2c = box(b'jp2c', codestream)
    return sig + ftyp + jp2h + jp2c


def encode_jp2_tpu(img, ratio=None, base_delta=1.0 / 64, levels=5,
                   workers=None, wrap_jp2=True):
    """Encode a uint8 image ((H, W) gray or (H, W, 3) RGB) to JPEG2000.

    ratio: target compression ratio vs the raw bytes (OpenJPEG ``-r``
    semantics, jpeg2000.py:192-197) via PCRD pass truncation; None = no
    truncation (quality set by base_delta alone).
    base_delta: finest-band quantizer step in DC-shifted units (LL gets
    base_delta / 2^levels via the norm weighting).
    Returns .jp2 bytes (or a raw codestream with wrap_jp2=False).
    """
    lib = _get_lib()
    arr = np.asarray(img, np.uint8)
    rgb = arr.ndim == 3
    h, w = arr.shape[:2]
    ncomp = 3 if rgb else 1
    if workers is None:
        workers = min(8, os.cpu_count() or 1)
    levels = max(1, min(levels,
                        max(1, int(math.floor(math.log2(min(h, w) / 4))))))

    # numpy in: _run_device_transform only ships to a device on the
    # branches that actually run the jitted transform, so the native
    # host path never pays a host->device->host round trip.
    qbands = _run_device_transform(arr, levels, rgb, float(base_delta))
    qbands = [[np.asarray(q) for q in qb] for qb in qbands]
    return _host_encode(qbands, w, h, ncomp, levels, float(base_delta),
                        ratio, rgb, lib, workers, wrap_jp2)


def _host_encode(qbands, w, h, ncomp, levels, base_delta, ratio, rgb,
                 lib, workers, wrap_jp2, shifts=None, kplanes=None,
                 refetch=None, page_idx=None):
    """Tier-1 + rate allocation + Tier-2 for one image's quantized
    subbands (numpy).

    kplanes/refetch/page_idx: pack4 plane-budget support — kplanes maps
    band index -> planes shipped; when rate allocation exhausts a
    band's shipped planes (a block coded all 3K-2 available passes and
    the threshold still wanted it whole), ``refetch(k)`` pulls that
    band at int8 from the device and the band is re-encoded at its
    smaller shift before assembly.  The budget is a transfer
    optimization, never a quality ceiling."""
    base_layout = band_layout(levels, base_delta)
    shifts = [int(s) for s in shifts] if shifts is not None \
        else [0] * len(base_layout)

    def adjusted(k):
        # requantized band k uses step 2^s * delta_b (exact trunc-shift
        # on device/host), so its QCD exponent drops by s — a plain
        # standard coarser quantizer, nothing custom on the decode side
        orient, level, gain, eps, mu, step = base_layout[k]
        s = shifts[k]
        if s and eps - s < 0:
            raise ValueError('pack shift %d exceeds eps %d' % (s, eps))
        return (orient, level, gain, eps - s, mu, step * (1 << s))

    comp_bands = [[_Band(*adjusted(k), q) for k, q in enumerate(qb)]
                  for qb in qbands]
    if kplanes:
        for bands in comp_bands:
            for k, K in kplanes.items():
                bands[k].plane_budget = K

    target = None
    if ratio is not None and ratio > 1:
        target = int(h * w * ncomp / float(ratio))
    all_bands = [band for bands in comp_bands for band in bands]
    _t1_all(all_bands, lib, workers, target_bytes=target)

    for _round in range(2):
        blocks = [cb for bands in comp_bands
                  for band in bands for cb in band.blocks]
        if target is not None:
            _allocate_rate(blocks, target, lib, workers,
                           bands=all_bands)
        else:
            for cb in blocks:
                cb.chosen = cb.npasses
                cb.chosen_bytes = cb.data

        if _round or target is None or refetch is None or not kplanes:
            break
        # pack4 starvation check: a band whose shipped planes the
        # allocator fully consumed may have wanted deeper data
        starved = []
        for k, K in sorted(kplanes.items()):
            if shifts[k] <= 0:
                continue
            hungry = any(
                cb.nbps >= K and cb.npasses
                and cb.chosen >= cb.npasses
                and cb.npasses >= 3 * cb.nbps - 2
                for bands in comp_bands for cb in bands[k].blocks)
            if hungry:
                starved.append(k)
        if not starved:
            break
        for k in starved:
            vals, s8 = refetch(k)
            shifts[k] = s8
            for c in range(ncomp):
                q = vals[c] if page_idx is None else vals[c][page_idx]
                comp_bands[c][k] = _Band(*adjusted(k),
                                         np.asarray(q, np.int32))
            _stat('pack4_refetch', 0.0, 1)
            for c in range(ncomp):
                _encode_band_blocks(lib, comp_bands[c][k])

    # guard bits: Mb = guard + eps - 1 must cover every block's planes
    guard = 2
    for bands in comp_bands:
        for band in bands:
            for cb in band.blocks:
                guard = max(guard, cb.nbps - band.eps + 1)
    if guard > 7:
        # A silent clamp here would make Mb undercount the coded planes
        # and desync the decoder into a corrupt block; unreachable for
        # 8-bit input with the current band norms, so fail loudly if a
        # future base_delta/norm change ever trips it.
        raise ValueError(
            'jp2tpu: required guard bits %d > 7 (eps too small for a '
            'block with %d bitplanes); renormalize base_delta' % (
                guard, max(cb.nbps for bands in comp_bands
                           for b in bands for cb in b.blocks)))

    stream = _assemble(w, h, ncomp, levels, guard, comp_bands, rgb)
    return _jp2_wrap(stream, w, h, ncomp) if wrap_jp2 else stream


@functools.partial(jax.jit,
                   static_argnames=('levels', 'rgb', 'base_delta'))
def _device_transform_packed(arr, levels, rgb, base_delta):
    """`_device_transform` plus an int16 copy of every band and a
    per-band max|q| vector: the host fetches each band at the smallest
    EXACT dtype (fine bands fit int16 on real content; only the few
    tiny coarse bands exceed it, measured maxabs ~2.5e5 at LL vs ~1e4
    at level 1).  On thin hosts the readback link, not the transform,
    bounds the batched '-J tpu' path, so halving the bytes halves the
    stage."""
    import jax.numpy as jnp
    q32 = _device_transform(arr, levels, rgb, base_delta)
    q16 = tuple(tuple(b.astype(jnp.int16) for b in qb) for qb in q32)
    mx = jnp.stack([jnp.max(jnp.abs(b)).astype(jnp.int32)
                    for qb in q32 for b in qb])
    return q32, q16, mx


@functools.partial(jax.jit,
                   static_argnames=('levels', 'rgb', 'base_delta',
                                    'fine_levels'))
def _device_transform_packed8(arr, levels, rgb, base_delta,
                              fine_levels=2):
    """Rate-adaptive variant of `_device_transform_packed`: the FINE
    bands (finest `fine_levels` resolutions — ~94% of all
    coefficients) are requantized ON DEVICE to fit int8 and cross the
    link at 1 byte/coeff.

    The requantize is an exact trunc-shift: q' = sign(q)*(|q| >> s)
    equals trunc(x / (2^s * delta)), i.e. the band simply uses the
    coarser standard quantizer step 2^s*delta (eps_b -= s in the QCD)
    — the stream stays fully conformant T.800.  The shift s is the
    smallest making max|q'| <= 127, shared across components so the
    single QCD stays valid.  Intended for rate-targeted encodes
    (ratio >= ~200) where PCRD discards those low planes anyway; the
    win is link bytes AND Tier-1 bit-plane work.  Coarse bands keep
    full precision (int32; they are <2% of the bytes and carry the
    structure).  Returns (bands, shifts) where fine bands are int8."""
    import jax.numpy as jnp
    q32 = _device_transform(arr, levels, rgb, base_delta)
    layout = band_layout(levels, base_delta)
    nb = len(q32[0])
    n_fine = 3 * min(fine_levels, levels)
    thresholds = 128 << jnp.arange(24, dtype=jnp.int32)  # monotone
    out = []
    shifts = []
    for k in range(nb):
        m = q32[0][k]
        mx = jnp.max(jnp.abs(m))
        for qb in q32[1:]:
            mx = jnp.maximum(mx, jnp.max(jnp.abs(qb[k])))
        if k >= nb - n_fine:
            s = jnp.sum((mx >= thresholds).astype(jnp.int32))
            # eps - s must stay >= 0 in the QCD: clamp to the band's
            # exponent (content-dependent extreme coefficients then
            # clip to int8 range via the saturating cast below, instead
            # of aborting the whole page encode)
            s = jnp.minimum(s, jnp.int32(layout[k][3]))
            shifts.append(s)
        else:
            shifts.append(jnp.zeros((), jnp.int32))
    for qb in q32:
        comp = []
        for k, q in enumerate(qb):
            if k >= nb - n_fine:
                s = shifts[k]
                comp.append((jnp.sign(q) *
                             jnp.minimum(jnp.abs(q) >> s, 127)
                             ).astype(jnp.int8))
            else:
                comp.append(q)
        out.append(tuple(comp))
    return tuple(out), jnp.stack(shifts)


_SPARSE_CHUNK = 1 << 20      # comp-value transfer granularity (1 MB)


def _sparse_pack_band(flat):
    """In-jit zero-suppression of one flattened int8 band: returns
    (bits, comp2d, count) where ``bits`` is the MSB-first significance
    bitmap (np.unpackbits convention), ``comp2d`` holds the nonzero
    values stream-compacted in original order and reshaped to fixed
    1 MB chunk rows (so the host can fetch ceil(count/CHUNK) rows
    through one compiled dynamic-index executable), and ``count`` is
    the number of nonzeros.  Exact: positions come from the bitmap,
    values from the compacted stream.

    Why: the pack8 fine bands are 6-35% nonzero on MRC fg layers
    (edges only — the radiate fill is smooth between glyphs), so
    bitmap + values is ~0.2-0.5x the dense bytes, and on thin-link
    hosts the band readback bounds the whole '-J tpu' encode."""
    import jax.numpy as jnp
    n = flat.shape[0]
    # chunk rows scale with the band (>= ~16 chunks) so small bands /
    # small batches don't pay a full megabyte for a few kilobytes of
    # values; n is static at trace time
    chunk = min(_SPARSE_CHUNK,
                max(1 << 16, 1 << (max(n // 16, 1) - 1).bit_length()))
    npad8 = -(-n // 8) * 8
    nz = jnp.pad(flat != 0, (0, npad8 - n))
    w8 = (jnp.int32(1) << jnp.arange(7, -1, -1, dtype=jnp.int32))
    bits = (nz.reshape(-1, 8).astype(jnp.int32) @ w8).astype(jnp.uint8)
    pos = jnp.cumsum(nz[:n].astype(jnp.int32)) - 1
    nchunks = -(-n // chunk)
    comp = jnp.zeros((nchunks * chunk,), jnp.int8)
    comp = comp.at[jnp.where(nz[:n], pos, nchunks * chunk)].set(
        flat, mode='drop')
    count = nz[:n].sum(dtype=jnp.int32)
    return bits, comp.reshape(nchunks, chunk), count


@jax.jit
def _take_chunk(a, i):
    return a[i]


@functools.partial(jax.jit,
                   static_argnames=('levels', 'rgb', 'base_delta',
                                    'fine_levels'))
def _device_transform_packed8_sparse(arr, levels, rgb, base_delta,
                                     fine_levels=2):
    """`_device_transform_packed8` plus per-fine-band sparse forms
    (see `_sparse_pack_band`).  The dense int8 bands are still
    returned: the host fetches whichever form is fewer bytes per band
    (noisy bg bands can be dense); unfetched outputs only cost HBM."""
    import jax.numpy as jnp
    bands, shifts = _device_transform_packed8(arr, levels, rgb,
                                              base_delta, fine_levels)
    nb = len(bands[0])
    n_fine = 3 * min(fine_levels, levels)
    sparse = []
    for k in range(nb - n_fine, nb):
        flat = jnp.concatenate([qb[k].reshape(-1) for qb in bands])
        sparse.append(_sparse_pack_band(flat))
    return bands, shifts, tuple(sparse)


# --- pack4: kept-planes budgets at high rate targets --------------------
#
# Evidence (tools/jp2_plane_stats.py on the e2e corpus): at ratio 750
# the PCRD-chosen stream codes ZERO planes of the level-1 bands, <= 2
# planes of level 2 and <= 1 plane of level 3 — while the pack8 int8
# form still ships 7 magnitude planes for ~94% of all coefficients, and
# the untouched level-3 bands ship full int32.  pack4 requantizes the
# finest two resolutions to _PACK4_K_FINE planes (nibble-packed: 2
# coefficients/byte, or bitmap+values when sparser) and level 3 to int8.
# Like pack8 this is an exact coarser standard quantizer step (eps_b
# drops by the shift), so the stream stays plain T.800.  A band whose
# blocks exhaust the shipped planes during rate allocation is REFETCHED
# from device at int8 and re-encoded (see _host_encode) — the plane
# budget is a transfer optimization, never a quality ceiling.

_PACK4_K_FINE = 3


def _pack4_sets(nb, levels):
    """Band-index sets for the pack4 plane budgets: (k3, k7) = finest
    two resolutions (K=_PACK4_K_FINE, nibble) and the third-finest
    (K=7, int8)."""
    n3 = 3 * min(2, levels)
    n7 = 3 * min(1, max(0, levels - 2))
    return (list(range(nb - n3, nb)),
            list(range(nb - n3 - n7, nb - n3)))


def _pack4_dense_plan(nb, levels):
    """Static dtype plan for the fused dense readback: band-k ->
    bytes/coeff.  LL and the coarsest resolution ship 3 bytes (int24 —
    measured maxabs ~2.5e5 at LL, far under 2^23; a per-band maxabs
    rides the fused meta vector and the drain falls back to an int32
    refetch if content ever exceeds it), the remaining full-precision
    bands 2 bytes (maxabs ~1e4, same guard), the int8-budget (k7)
    bands 1 byte."""
    k3, k7 = _pack4_sets(nb, levels)
    plan = {}
    for k in range(nb):
        if k in k3:
            continue
        if k in k7:
            plan[k] = 1
        elif k <= 3:
            plan[k] = 3
        else:
            plan[k] = 2
    return plan


def _pack4_byte_planes(q, nbytes):
    """Portable little-endian byte-plane encoding of an integer band
    (two's complement mod 2^(8*nbytes)); avoids bitcast_convert_type
    whose byte order is backend-defined."""
    import jax.numpy as jnp
    u = q.astype(jnp.int32).reshape(-1)
    return jnp.stack([((u >> (8 * i)) & 0xFF).astype(jnp.uint8)
                      for i in range(nbytes)]).reshape(-1)


def _pack4_decode_planes(buf, nbytes, n):
    """Host inverse of _pack4_byte_planes -> int32[n]."""
    planes = buf.reshape(nbytes, n)
    u = planes[0].astype(np.uint32)
    for i in range(1, nbytes):
        u |= planes[i].astype(np.uint32) << (8 * i)
    span = np.uint32(1) << (8 * nbytes)
    v = u.astype(np.int64)
    v -= (u >= (span >> 1)).astype(np.int64) * int(span)
    return v.astype(np.int32)


@functools.partial(jax.jit,
                   static_argnames=('levels', 'rgb', 'base_delta',
                                    'k_fine'))
def _device_transform_pack4(arr, levels, rgb, base_delta,
                            k_fine=_PACK4_K_FINE):
    """Transform + per-band plane-budget requantize + FUSED transfer
    forms.  Every dispatch-synchronizing host readback on this path
    costs ~30-50 ms through a thin tunnel, so the whole batch drains
    in 3-4 transfers instead of ~25-30 (r4):

    Returns (shipped, meta_vec, re8, fused, nib3, bits3, comp3):
      shipped  per-comp band tuples — coarse bands int32 (retained in
               HBM as the exactness fallback), budgeted bands int8
               holding q >> shift clipped to 2^K - 1
      meta_vec int32[3*nb+1]: shifts | shifts8 | per-band maxabs |
               superband nonzero count — ONE small transfer
      re8      per k3-band per-comp int8 arrays at shifts8 (stay in
               HBM; fetched only if rate allocation starves a band)
      fused    uint8 byte-plane buffer of every dense band (see
               _pack4_dense_plan) in (k asc, comp) segment order —
               ONE transfer for all coarse + int8 bands
      nib3/bits3/comp3  nibble and sparse (bitmap + compacted values)
               forms of the K=3 SUPERBAND — the finest-two-resolution
               bands of all comps concatenated flat in (k, comp)
               order; the drain fetches whichever form is fewer bytes
    """
    import jax.numpy as jnp
    q32 = _device_transform(arr, levels, rgb, base_delta)
    layout = band_layout(levels, base_delta)
    nb = len(q32[0])
    k3, k7 = _pack4_sets(nb, levels)
    kmap = {k: k_fine for k in k3}
    kmap.update({k: 7 for k in k7})

    def shift_for(mx, K, eps):
        thr = (jnp.int32(1) << K) << jnp.arange(24, dtype=jnp.int32)
        s = jnp.sum((mx >= thr).astype(jnp.int32))
        return jnp.minimum(s, jnp.int32(eps))

    shifts, shifts8, maxabs = [], [], []
    for k in range(nb):
        mx = jnp.max(jnp.abs(q32[0][k]))
        for qb in q32[1:]:
            mx = jnp.maximum(mx, jnp.max(jnp.abs(qb[k])))
        maxabs.append(mx.astype(jnp.int32))
        eps = layout[k][3]
        if k in kmap:
            shifts.append(shift_for(mx, kmap[k], eps))
            shifts8.append(shift_for(mx, 7, eps))
        else:
            shifts.append(jnp.zeros((), jnp.int32))
            shifts8.append(jnp.zeros((), jnp.int32))

    def requant(q, s, K):
        return (jnp.sign(q) *
                jnp.minimum(jnp.abs(q) >> s, (1 << K) - 1)
                ).astype(jnp.int8)

    shipped = []
    for qb in q32:
        comp = []
        for k, q in enumerate(qb):
            comp.append(requant(q, shifts[k], kmap[k])
                        if k in kmap else q)
        shipped.append(tuple(comp))
    shipped = tuple(shipped)

    re8 = tuple(tuple(requant(qb[k], shifts8[k], 7) for qb in q32)
                for k in k3)

    plan = _pack4_dense_plan(nb, levels)
    segs = [_pack4_byte_planes(shipped[c][k], nbytes)
            for k in sorted(plan) for c in range(len(shipped))
            for nbytes in (plan[k],)]
    fused = (jnp.concatenate(segs) if segs
             else jnp.zeros((0,), jnp.uint8))

    flat3 = jnp.concatenate([qb[k].reshape(-1)
                             for k in k3 for qb in shipped])
    bits3, comp3, count = _sparse_pack_band(flat3)
    n3 = flat3.shape[0]
    npad = -(-n3 // 2) * 2
    u = jnp.pad((flat3.astype(jnp.int32) + 8).astype(jnp.uint8),
                (0, npad - n3))
    nib3 = (u[0::2] | (u[1::2] << 4)).astype(jnp.uint8)

    meta_vec = jnp.concatenate([jnp.stack(shifts), jnp.stack(shifts8),
                                jnp.stack(maxabs), count[None]])
    return shipped, meta_vec, re8, fused, nib3, bits3, comp3


def _unpack_nibbles(u, n):
    """Invert the device nibble packing: uint8 pairs -> int8 values."""
    flat = np.empty(u.shape[0] * 2, np.int8)
    flat[0::2] = (u & 15).astype(np.int8) - 8
    flat[1::2] = (u >> 4).astype(np.int8) - 8
    return flat[:n]


def _packK_shifts_np(qbands, layout, kmap):
    """Host twin of the pack4 shift choice: per-band smallest shift
    making max|q| >> s <= 2^K - 1, clamped to the band's eps."""
    nb = len(qbands[0])
    shifts = np.zeros(nb, np.int32)
    for k, K in kmap.items():
        mx = max(int(np.abs(qb[k]).max()) if qb[k].size else 0
                 for qb in qbands)
        s = 0
        while (mx >> s) > (1 << K) - 1:
            s += 1
        shifts[k] = min(s, int(layout[k][3]))
    return shifts


def _packK_apply_np(qbands, shifts, kmap):
    out = []
    for qb in qbands:
        comp = []
        for k, q in enumerate(qb):
            K = kmap.get(k)
            if K is None:
                comp.append(np.asarray(q))
            else:
                s = int(shifts[k])
                comp.append((np.sign(q) *
                             np.minimum(np.abs(q) >> s, (1 << K) - 1)
                             ).astype(np.int8))
        out.append(comp)
    return out


def _fetch_sparse_band(bits_dev, comp_dev, count, dense_dev, shape,
                       ncomp):
    """Host side of `_sparse_pack_band`: fetch bitmap + just-enough
    comp chunks and rebuild the dense int8 band stack; falls back to
    the dense transfer when the band isn't sparse enough to win."""
    n = int(np.prod(shape)) * ncomp
    chunk = int(comp_dev.shape[1])
    k = -(-count // chunk) if count else 0
    sparse_bytes = n // 8 + k * chunk
    if sparse_bytes >= n:
        return [np.asarray(d) for d in dense_dev]
    bits = np.asarray(bits_dev)
    vals = [np.asarray(_take_chunk(comp_dev, i)) for i in range(k)]
    flat = np.zeros(n, np.int8)
    mask = np.unpackbits(bits)[:n].view(bool)
    if count:
        flat[mask] = np.concatenate(vals)[:count]
    per = n // ncomp
    return [flat[c * per:(c + 1) * per].reshape(shape)
            for c in range(ncomp)]


def _pack8_shifts_np(qbands, n_fine, layout):
    """Host-side twin of the device shift choice (native-transform
    path): same maxabs -> same shifts (incl. the eps clamp) ->
    identical streams."""
    nb = len(qbands[0])
    shifts = np.zeros(nb, np.int32)
    for k in range(nb - n_fine, nb):
        mx = max(int(np.abs(qb[k]).max()) if qb[k].size else 0
                 for qb in qbands)
        s = 0
        while (mx >> s) > 127:
            s += 1
        shifts[k] = min(s, int(layout[k][3]))
    return shifts


def _pack8_apply_np(qbands, shifts, n_fine):
    nb = len(qbands[0])
    out = []
    for qb in qbands:
        comp = []
        for k, q in enumerate(qb):
            if k >= nb - n_fine:
                s = int(shifts[k])
                comp.append((np.sign(q) *
                             np.minimum(np.abs(q) >> s, 127)
                             ).astype(np.int8))
            else:
                comp.append(np.asarray(q))
        out.append(comp)
    return out


def _fetch_device_qbands(q32, q16, mx):
    """Transfer every band at its minimal exact dtype (int16 when
    max|q| <= 32767, else int32).  One small maxabs sync, then one
    bulk transfer per band."""
    mx = np.asarray(mx)
    out, k = [], 0
    for qb32, qb16 in zip(q32, q16):
        comp = []
        for b32, b16 in zip(qb32, qb16):
            comp.append(np.asarray(b16 if int(mx[k]) <= 32767 else b32))
            k += 1
        out.append(comp)
    return out


def _transform_shape(imgs):
    arr = np.stack(imgs) if isinstance(imgs, (list, tuple)) else imgs
    rgb = arr.ndim == 4
    b, h, w = (int(s) for s in arr.shape[:3])
    return arr, rgb, b, h, w


class _AsyncMeta(dict):
    """Transform meta whose 'shifts' entry is populated by the
    background drain thread: reading it blocks until the drain ran.
    Every in-tree consumer calls fetch() (which waits) before touching
    meta, but a future caller reading meta['shifts'] first would
    otherwise see None and emit a stream whose QCD exponents don't
    match the pack8-requantized bands (ADVICE r3)."""

    _event = None

    def __getitem__(self, k):
        if k == 'shifts' and self._event is not None:
            self._event.wait()
        return dict.__getitem__(self, k)

    def get(self, k, default=None):
        if k == 'shifts' and self._event is not None:
            self._event.wait()
        return dict.get(self, k, default)


def transform_jp2_batch_async(imgs, base_delta=1.0 / 64, levels=5,
                              pack8=False, ratio=None):
    """Stage 1 of a batched encode: DWT/ICT/quantize of a whole uint8
    (B, H, W) or (B, H, W, 3) stack as ONE device dispatch (pages ride
    the leading axis through the lifting steps).  ``imgs`` may be a
    numpy stack or a DEVICE array (e.g. fg/bg layers straight out of
    ``decompose_layers(device=True)`` — they then never cross the link
    as uint8 at all).

    ratio: the rate target the pages will be encoded at.  At
    ratio >= 400 the pack4 plane-budget transfer kicks in (fine bands
    at _PACK4_K_FINE planes, nibble/sparse packed; level 3 at int8)
    with band-level int8 refetch as the starvation escape hatch —
    APT_JP2_PACK4=0/1 forces.  pack8 stays the 200-400 form.

    Returns (fetch, meta): ``fetch(i)`` blocks until page i's numpy
    qbands are ready for ``encode_jp2_from_qbands``.  Band readbacks
    run on a background thread at the smallest exact per-band dtype,
    so the encode pool's mask/Tier-1 host work overlaps the link
    transfer instead of waiting on it."""
    arr, rgb, b, h, w = _transform_shape(imgs)
    ncomp = 3 if rgb else 1
    levels = max(1, min(levels,
                        max(1, int(math.floor(math.log2(min(h, w) / 4))))))
    env4 = os.environ.get('APT_JP2_PACK4')
    pack4 = (env4 == '1') if env4 is not None else (
        ratio is not None and float(ratio) >= 400)
    if pack4:
        pack8 = False
    # the nibble form holds value+8 in 4 bits, so K is capped at 3
    k_fine = max(1, min(3, int(os.environ.get('APT_JP2_PACK4_K',
                                              str(_PACK4_K_FINE)))))
    n_fine = 3 * min(2, levels) if pack8 else 0
    meta = _AsyncMeta({'w': w, 'h': h, 'ncomp': ncomp, 'levels': levels,
                       'rgb': rgb, 'base_delta': float(base_delta),
                       'shifts': None})

    dev = os.environ.get('APT_JP2_DEVICE')
    native = dev == 'native'
    if not native and not dev:
        try:
            import jax
            native = jax.devices()[0].platform == 'cpu'
        except Exception:
            native = True

    if native:
        host = np.asarray(arr).astype(np.uint8, copy=False)
        qb = _native_transform(host, levels, rgb, float(base_delta))
        layout = band_layout(levels, float(base_delta))
        if pack4:
            nb = len(qb[0])
            k3, k7 = _pack4_sets(nb, levels)
            kmap = {k: k_fine for k in k3}
            kmap.update({k: 7 for k in k7})
            shifts = _packK_shifts_np(qb, layout, kmap)
            shifts8 = _packK_shifts_np(qb, layout, {k: 7 for k in k3})
            shipped = _packK_apply_np(qb, shifts, kmap)
            meta['shifts'] = shifts.tolist()
            meta['kplanes'] = {k: k_fine for k in k3}
            q_keep = qb          # retained full-precision bands

            def refetch(k):
                got = _packK_apply_np(
                    q_keep, shifts8, {k: 7})
                return [got[c][k] for c in range(ncomp)], int(shifts8[k])

            meta['refetch'] = refetch
            qb = shipped
        elif pack8:
            shifts = _pack8_shifts_np(qb, n_fine, layout)
            qb = _pack8_apply_np(qb, shifts, n_fine)
            meta['shifts'] = shifts.tolist()
        pages = [[[q[i] for q in comp] for comp in qb] for i in range(b)]
        return (lambda i: pages[i]), meta

    import jax
    sparse = pack8 and os.environ.get('APT_JP2_SPARSE', '1') != '0'
    xform = (_device_transform_pack4 if pack4 else
             _device_transform_packed8_sparse if sparse else
             _device_transform_packed8 if pack8 else
             _device_transform_packed)
    xargs = (arr, levels, rgb, float(base_delta))
    if pack4:
        xargs += (k_fine,)
    if dev:
        with jax.default_device(jax.local_devices(backend=dev)[0]):
            packed = xform(*xargs)
    else:
        packed = xform(*xargs)

    state = {'pages': None, 'err': None}
    done = threading.Event()
    meta._event = done

    if pack4:
        shipped_d, meta_vec_d, re8_d = packed[0], packed[1], packed[2]
        nb4 = len(shipped_d[0])
        k3_set, _ = _pack4_sets(nb4, levels)
        meta['kplanes'] = {k: k_fine for k in k3_set}
        _re_cache = {}
        _re_lock = threading.Lock()

        def refetch(k):
            """Band k at int8 (7 planes) for every page: fetched from
            HBM only when rate allocation starves the plane budget.
            Only reachable from encode_jp2_from_qbands, i.e. after
            fetch() — the drained meta vector is available by then."""
            with _re_lock:
                if k not in _re_cache:
                    j = k3_set.index(k)
                    meta._event.wait()
                    s8 = int(state['shifts8'][k])
                    _re_cache[k] = (
                        [np.asarray(a) for a in re8_d[j]], s8)
                return _re_cache[k]

        meta['refetch'] = refetch

    def _drain():
        try:
            if pack4:
                # FUSED drain: one small meta vector, one byte-plane
                # buffer for every dense band, and one superband form
                # for the K=3 fine bands — 3-4 link syncs total (each
                # dispatch-synchronizing readback costs ~30-50 ms on a
                # thin tunnel; the per-band drain made ~25-30 of them)
                _, meta_vec_d2, _, fused_d, nib3_d, bits3_d, comp3_d = \
                    packed
                nb = len(shipped_d[0])
                k3, _k7 = _pack4_sets(nb, levels)
                meta_np = np.asarray(meta_vec_d2)
                state['shifts8'] = meta_np[nb:2 * nb]
                mx_np = meta_np[2 * nb:3 * nb]
                count = int(meta_np[3 * nb])
                meta['shifts'] = meta_np[:nb].tolist()
                comps = [[None] * nb for _ in range(ncomp)]
                xfer = meta_np.nbytes
                shapes = _band_shapes(w, h, levels)
                plan = _pack4_dense_plan(nb, levels)
                fused_np = np.asarray(fused_d)
                xfer += fused_np.nbytes
                off = 0
                for k in sorted(plan):
                    nbytes = plan[k]
                    bh, bw = shapes[k]
                    npx = b * bh * bw
                    exact = int(mx_np[k]) < (1 << (8 * nbytes - 1))
                    for c in range(ncomp):
                        seg = fused_np[off:off + nbytes * npx]
                        off += nbytes * npx
                        if nbytes == 1:
                            comps[c][k] = seg.view(np.int8) \
                                .reshape(b, bh, bw)
                        elif exact:
                            comps[c][k] = _pack4_decode_planes(
                                seg, nbytes, npx).reshape(b, bh, bw)
                        else:
                            # content exceeded the static byte plan
                            # (never observed; maxabs guard): refetch
                            # the retained int32 band
                            comps[c][k] = np.asarray(shipped_d[c][k])
                            xfer += comps[c][k].nbytes
                            _stat('pack4_dense_fallback', 0.0, 1)
                # K=3 superband: sparse vs nibble by total bytes
                n3 = sum(b * shapes[k][0] * shapes[k][1]
                         for k in k3) * ncomp
                chunk = int(comp3_d.shape[1])
                kch = -(-count // chunk) if count else 0
                sparse_bytes = -(-n3 // 8) + kch * chunk
                if sparse_bytes < (n3 + 1) // 2:
                    bits = np.asarray(bits3_d)
                    nzmask = np.unpackbits(bits)[:n3].astype(bool)
                    flat = np.zeros(n3, np.int8)
                    if kch:
                        vals = np.concatenate(
                            [np.asarray(_take_chunk(comp3_d, i))
                             for i in range(kch)])[:count]
                        flat[nzmask] = vals
                    xfer += sparse_bytes
                else:
                    flat = _unpack_nibbles(np.asarray(nib3_d), n3)
                    xfer += (n3 + 1) // 2
                off3 = 0
                for k in k3:
                    bh, bw = shapes[k]
                    npx = b * bh * bw
                    for c in range(ncomp):
                        comps[c][k] = flat[off3:off3 + npx] \
                            .reshape(b, bh, bw)
                        off3 += npx
                _stat('pack4_xfer_bytes', 0.0, xfer)
            elif sparse:
                bands, shifts, sp = packed
                meta['shifts'] = np.asarray(shifts).tolist()
                nb = len(bands[0])
                comps = [[None] * nb for _ in range(ncomp)]
                for k in range(nb - n_fine):          # coarse: dense
                    for c in range(ncomp):
                        comps[c][k] = np.asarray(bands[c][k])
                for j in range(n_fine):               # fine: sparse
                    k = nb - n_fine + j
                    bits_d, comp_d, cnt_d = sp[j]
                    got = _fetch_sparse_band(
                        bits_d, comp_d, int(np.asarray(cnt_d)),
                        [qb[k] for qb in bands], bands[0][k].shape,
                        ncomp)
                    for c in range(ncomp):
                        comps[c][k] = got[c]
            elif pack8:
                bands, shifts = packed
                meta['shifts'] = np.asarray(shifts).tolist()
                comps = [[np.asarray(q) for q in qb] for qb in bands]
            else:
                comps = _fetch_device_qbands(*packed)
            state['pages'] = [[[q[i] for q in comp] for comp in comps]
                              for i in range(b)]
        except BaseException as exc:
            state['err'] = exc
        finally:
            done.set()

    threading.Thread(target=_drain, daemon=True,
                     name='jp2-qband-fetch').start()

    def fetch(i):
        done.wait()
        if state['err'] is not None:
            raise state['err']
        return state['pages'][i]

    return fetch, meta


def transform_jp2_batch(imgs, base_delta=1.0 / 64, levels=5,
                        pack8=False, ratio=None):
    """Synchronous wrapper of ``transform_jp2_batch_async``: returns
    (per_page_qbands, meta)."""
    _, _, b, _, _ = _transform_shape(imgs)
    fetch, meta = transform_jp2_batch_async(imgs, base_delta=base_delta,
                                            levels=levels, pack8=pack8,
                                            ratio=ratio)
    return [fetch(i) for i in range(b)], meta


def encode_jp2_from_qbands(page_qbands, meta, ratio=None, workers=None,
                           wrap_jp2=True, page_idx=None):
    """Stage 2: Tier-1 + rate allocation + Tier-2 for one page's
    quantized subbands (from transform_jp2_batch).  page_idx selects
    this page in the batch for the pack4 starvation refetch (the
    refetched device band carries the whole batch)."""
    lib = _get_lib()
    if workers is None:
        workers = min(8, os.cpu_count() or 1)
    return _host_encode(page_qbands, meta['w'], meta['h'],
                        meta['ncomp'], meta['levels'],
                        meta['base_delta'], ratio, meta['rgb'], lib,
                        workers, wrap_jp2,
                        shifts=meta.get('shifts'),
                        kplanes=meta.get('kplanes'),
                        refetch=meta.get('refetch'),
                        page_idx=page_idx)


def encode_jp2_tpu_batch(imgs, ratio=None, base_delta=1.0 / 64, levels=5,
                         workers=None, wrap_jp2=True, pack8=False):
    """Batched encode: uint8 (B, H, W) or (B, H, W, 3) -> list of .jp2
    byte strings.  One device dispatch for the whole batch's transform,
    then per-page host Tier-1 (see transform_jp2_batch)."""
    pages, meta = transform_jp2_batch(imgs, base_delta=base_delta,
                                      levels=levels, pack8=pack8,
                                      ratio=ratio)
    return [encode_jp2_from_qbands(p, meta, ratio=ratio,
                                   workers=workers, wrap_jp2=wrap_jp2,
                                   page_idx=i)
            for i, p in enumerate(pages)]
