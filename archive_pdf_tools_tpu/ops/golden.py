"""Reference-exact numpy oracles for the hot kernels.

These reproduce, in plain vectorized numpy, the *semantics* of the
reference's Cython kernels (``cython/sauvola.pyx``, ``cython/optimiser.pyx``)
including their C-integer-division quirks and sequential update order.
They exist so the JAX/TPU kernels can be validated against ground truth
without the reference being importable, and double as slow CPU fallbacks.

They are deliberately written in a different (vectorized, 2-D) style from
the reference's flat serial loops; only the mathematical contract is shared.
"""

import numpy as np


# ---------------------------------------------------------------------------
# Sauvola (sauvola.pyx:29-222 semantics)
# ---------------------------------------------------------------------------

def sauvola_mask_ref(img, window_width, window_height, k, R=128.0):
    """Exact Sauvola ink mask (already inverted, per mrc.py:85).

    Window: rows [y-o+1, y+u], cols [x-l+1, x+r] clamped, with
    o=(wh+1)//2, u=wh//2, l=(ww+1)//2, r=ww//2.  mean and E[x^2] use
    integer floor division by the clamped pixel count; the threshold
    test runs in float64 like the reference's C doubles.
    """
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    o = (window_height + 1) // 2
    u = window_height // 2
    l = (window_width + 1) // 2
    r = window_width // 2

    x = img.astype(np.int64)
    # clamped window sums via padded cumsum differences
    def win_sum(a, lo_off, hi_off, axis):
        n = a.shape[axis]
        cs = np.cumsum(a, axis=axis)
        pad = [(0, 0), (0, 0)]
        pad[axis] = (1, 0)
        cs = np.pad(cs, pad)
        idx = np.arange(n)
        hi = np.minimum(idx + hi_off, n)
        lo = np.maximum(idx + lo_off, 0)
        return np.take(cs, hi, axis=axis) - np.take(cs, lo, axis=axis)

    s = win_sum(win_sum(x, -o + 1, u + 1, 0), -l + 1, r + 1, 1)
    s2 = win_sum(win_sum(x * x, -o + 1, u + 1, 0), -l + 1, r + 1, 1)
    rc = (np.minimum(np.arange(h) + u + 1, h)
          - np.maximum(np.arange(h) - o + 1, 0))
    cc = (np.minimum(np.arange(w) + r + 1, w)
          - np.maximum(np.arange(w) - l + 1, 0))
    cnt = np.outer(rc, cc).astype(np.int64)

    mean_i = s // cnt
    var_i = s2 // cnt - mean_i * mean_i

    mean = mean_i.astype(np.float64)
    var = var_i.astype(np.float64)
    px = img.astype(np.float64)

    k2 = k * k / R / R
    t = px + mean * (k - 1.0)
    rhs = mean * mean * k2 * var
    if k >= 0:
        return np.logical_or(t <= 0.0, t * t <= rhs)
    return np.logical_and(t <= 0.0, t * t >= rhs)


# ---------------------------------------------------------------------------
# fg/bg optimise (optimiser.pyx:153-429 semantics)
# ---------------------------------------------------------------------------

def optimise_ref(mask, img, n_size):
    """Exact sequential 'radiate' fill, gray or RGB by img.ndim.

    Per pixel (row-major order), for non-mask pixels:
      FIR: sum/count of img over masked pixels in the clamped window
           rows [y-n, y+n) x cols [x-n, x+n)
      IIR: sum over the *already produced* output rows [y-n, y) x
           cols [x-n, x), counted as (y-ys)*(x-xs) regardless of mask
      out = (fir_sum + iir_sum) // (fir_cnt + iir_cnt)   (0 if cnt==0)
    Mask pixels keep img.  Rows only depend on previous finished rows,
    so we vectorize per row.
    """
    mask = np.asarray(mask).astype(bool)
    img = np.asarray(img, dtype=np.uint8)
    h, w = mask.shape
    chans = 1 if img.ndim == 2 else img.shape[2]
    imgi = img.reshape(h, w, chans).astype(np.int64)
    m = mask.astype(np.int64)

    # FIR windowed sums of masked values / counts, precomputed for all pixels
    def win_sum2d(a):
        out = a
        for axis in (0, 1):
            nax = out.shape[axis]
            cs = np.cumsum(out, axis=axis)
            pad = [(0, 0)] * out.ndim
            pad[axis] = (1, 0)
            cs = np.pad(cs, pad)
            idx = np.arange(nax)
            hi = np.minimum(idx + n_size, nax)
            lo = np.maximum(idx - n_size, 0)
            out = np.take(cs, hi, axis=axis) - np.take(cs, lo, axis=axis)
        return out

    fir_val = win_sum2d(imgi * m[:, :, None])
    fir_cnt = win_sum2d(m)

    out = imgi.copy()
    xs = np.maximum(np.arange(w) - n_size, 0)
    iir_w = (np.arange(w) - xs).astype(np.int64)          # x - xs

    for y in range(h):
        ys = max(0, y - n_size)
        iir_h = y - ys
        # column sums of finished rows [ys, y)
        col = out[ys:y].sum(axis=0) if iir_h else np.zeros((w, chans), np.int64)
        pref = np.concatenate([np.zeros((1, chans), np.int64),
                               np.cumsum(col, axis=0)])
        iir_sum = pref[np.arange(w)] - pref[xs]           # cols [xs, x)
        iir_cnt = iir_h * iir_w

        cnt = fir_cnt[y] + iir_cnt
        val = fir_val[y] + iir_sum
        with np.errstate(divide='ignore', invalid='ignore'):
            filled = np.where(cnt[:, None] > 0, val // np.maximum(cnt, 1)[:, None], 0)
        row = np.where(mask[y][:, None], imgi[y], filled)
        out[y] = row

    out = out.astype(np.uint8)
    return out[:, :, 0] if img.ndim == 2 else out


# ---------------------------------------------------------------------------
# wavelet MAD noise estimate (numpy mirror of ops/sigma.py)
# ---------------------------------------------------------------------------

_DB2_LO = np.array([-0.12940952255092145, 0.22414386804185735,
                    0.836516303737469, 0.48296291314469025])
_DB2_HI = np.array([-0.48296291314469025, 0.836516303737469,
                    -0.22414386804185735, -0.12940952255092145])
_MAD_DENOM = 0.6744897501960817


def pywt_dwt1d(a, filt, axis):
    """pywt-exact single-level 1-D DWT pass (float64): symmetric
    half-sample extension, ``y[o] = sum_j filt[j] * x_sym[2o+1-j]``,
    output length ``(n + F - 1) // 2`` — the conventions of pywt's
    ``downsampling_convolution`` with MODE_SYMMETRIC, validated against
    the documented db1 dwt examples."""
    k = np.asarray(filt, np.float64)[::-1]
    L = len(k)
    a = np.moveaxis(np.asarray(a, np.float64), axis, -1)
    n = a.shape[-1]
    ap = np.pad(a, [(0, 0)] * (a.ndim - 1) + [(L - 2, L - 1)],
                mode='symmetric')
    nout = (n + L - 1) // 2
    out = np.zeros(a.shape[:-1] + (nout,))
    for j in range(L):
        out += k[j] * ap[..., j:j + 2 * nout:2][..., :nout]
    return np.moveaxis(out, -1, axis)


def pywt_dwt2_db2(x):
    """pywt.dwt2(x, 'db2', mode='symmetric') bands as (aa, ad, da, dd),
    axes applied in pywt.dwtn order (axis 0, then axis 1)."""
    lo0 = pywt_dwt1d(x, _DB2_LO, -2)
    hi0 = pywt_dwt1d(x, _DB2_HI, -2)
    return (pywt_dwt1d(lo0, _DB2_LO, -1), pywt_dwt1d(lo0, _DB2_HI, -1),
            pywt_dwt1d(hi0, _DB2_LO, -1), pywt_dwt1d(hi0, _DB2_HI, -1))


def estimate_sigma_np(img):
    """skimage ``estimate_sigma`` ground truth: pywt-exact db2 diagonal
    detail, zeros dropped, ``median(|dd|) / Phi^-1(0.75)``."""
    dd = pywt_dwt1d(pywt_dwt1d(np.asarray(img, np.float64),
                               _DB2_HI, -2), _DB2_HI, -1)
    flat = np.abs(dd).ravel()
    nz = flat[flat > 0]
    if nz.size == 0:
        return 0.0
    return float(np.median(nz) / _MAD_DENOM)


# ---------------------------------------------------------------------------
# fast mask despeckle (optimiser.pyx:436-472 semantics)
# ---------------------------------------------------------------------------

def fast_mask_denoise_ref(mask, mincnt, n_size):
    """Exact sequential in-place despeckle: scan order row-major over the
    interior (n_size margin untouched); a set pixel survives iff its
    (2n+1)^2 neighbourhood in the *current partially-updated* mask has at
    least mincnt other set pixels."""
    m = np.asarray(mask).astype(np.uint8).copy()
    h, w = m.shape
    for y in range(n_size, h - n_size):
        for x in range(n_size, w - n_size):
            if m[y, x]:
                cnt = int(m[y - n_size:y + n_size + 1,
                            x - n_size:x + n_size + 1].sum()) - 1
                m[y, x] = 1 if cnt >= mincnt else 0
    return m.astype(bool)
