"""Sauvola adaptive binarisation, TPU-native.

Re-derivation of the reference kernel (``cython/sauvola.pyx:29-222``,
itself based on arXiv:1905.13038): for every pixel, the mean/variance of
the clamped window rows ``[y-o+1, y+u]`` x cols ``[x-l+1, x+r]`` (with
``o=(wh+1)//2, u=wh//2, l=(ww+1)//2, r=ww//2``) decide the squared-form
Sauvola test

    t = px + mean*(k-1)
    k >= 0:  text  <=>  t <= 0  or  t*t <= mean^2 * (k/R)^2 * var
    k <  0:  text  <=>  t <= 0  and t*t >= mean^2 * (k/R)^2 * var

The reference's serial rolling integral arrays become exact clamped
window sums via cumulative sums (see ops/window.py).  Two numerical
quirks of the reference are reproduced deliberately:

* ``mean`` and ``E[x^2]`` use C *integer* division by the pixel count
  (``sauvola.pyx:144-145`` under ``cdivision``), so we floor-divide in
  integer space before any float math.
* the final comparison runs in floating point; the reference uses f64,
  we use f32 on TPU.  mean (<=255), var (<=16256) and px are integers
  exactly representable in f32, so only genuinely borderline pixels can
  flip (measured < 1e-5 of pixels; the parity budget is 0.1%).

Returns the *mask* polarity (True = foreground/ink), i.e. the inversion
at ``mrc.py:85`` is fused in.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .window import box_sum_2d, box_count_2d


def sauvola_window(dpi):
    """Window size policy of the reference (``mrc.py:70-75``): dpi/4 rounded
    up to odd; 51 when dpi is unknown."""
    if dpi is None:
        return 51
    w = int(dpi / 4)
    if w % 2 == 0:
        w += 1
    return w


def _offsets(window_width, window_height):
    l = (window_width + 1) // 2
    r = window_width // 2
    o = (window_height + 1) // 2
    u = window_height // 2
    # inclusive [y-o+1, y+u] -> half-open [y-o+1, y+u+1)
    return (-o + 1, u + 1), (-l + 1, r + 1)


@functools.partial(jax.jit, static_argnames=('window_width', 'window_height'))
def sauvola_mask(img, window_width, window_height, k, R=128.0):
    """Batched Sauvola mask. img: uint8 (..., H, W). Returns bool mask
    (True = ink). k, R may be python floats or 0-d arrays."""
    h, w = img.shape[-2], img.shape[-1]
    row_off, col_off = _offsets(window_width, window_height)

    x = img.astype(jnp.uint32)
    s = box_sum_2d(x, row_off, col_off)
    s2 = box_sum_2d(x * x, row_off, col_off)
    cnt = jnp.asarray(box_count_2d(h, w, row_off, col_off, dtype=np.uint32))

    mean_i = s // cnt                       # C integer division (floor)
    ex2_i = s2 // cnt
    var_i = ex2_i - mean_i * mean_i         # nonneg by Cauchy-Schwarz on ints

    mean = mean_i.astype(jnp.float32)
    var = var_i.astype(jnp.float32)
    px = img.astype(jnp.float32)

    k = jnp.float32(k)
    R = jnp.float32(R)
    k2 = k * k / R / R
    t = px + mean * (k - 1.0)
    rhs = mean * mean * k2 * var
    t2 = t * t

    pos = jnp.logical_or(t <= 0.0, t2 <= rhs)       # k >= 0 branch
    neg = jnp.logical_and(t <= 0.0, t2 >= rhs)      # k < 0 branch
    return jnp.where(k >= 0.0, pos, neg)


def threshold_image(img, dpi, k=0.34):
    """Drop-in equivalent of ``mrc.threshold_image`` (``mrc.py:58-87``):
    window from DPI, k default 0.34, R=128, returns bool ink mask."""
    win = sauvola_window(dpi)
    return sauvola_mask(img, win, win, k, 128.0)


@functools.partial(jax.jit, static_argnames=('window_width', 'window_height'))
def sauvola_mask_valid(img, valid_h, valid_w, window_width, window_height,
                       k, R=128.0):
    """Sauvola over a *dynamic* valid region of a padded buffer.

    img: uint8 (B, H, W) buffers; each crop occupies the top-left
    (valid_h[b], valid_w[b]) region.  Window sums count only valid
    pixels, which reproduces the reference's border clamping at the true
    crop boundary (used for per-hOCR-line thresholds, ``mrc.py:230``).
    Pixels outside the valid region return False.
    """
    h, w = img.shape[-2], img.shape[-1]
    row_off, col_off = _offsets(window_width, window_height)

    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    vr = rows[None, :] < valid_h[:, None]                  # (B, H)
    vc = cols[None, :] < valid_w[:, None]                  # (B, W)
    valid = (vr[:, :, None] & vc[:, None, :])

    x = jnp.where(valid, img, 0).astype(jnp.uint32)
    s = box_sum_2d(x, row_off, col_off)
    s2 = box_sum_2d(x * x, row_off, col_off)
    cnt = box_sum_2d(valid.astype(jnp.uint32), row_off, col_off)
    cnt = jnp.maximum(cnt, 1)

    mean_i = s // cnt
    var_i = s2 // cnt - mean_i * mean_i

    mean = mean_i.astype(jnp.float32)
    var = var_i.astype(jnp.float32)
    px = img.astype(jnp.float32)

    k = jnp.float32(k)
    R = jnp.float32(R)
    k2 = k * k / R / R
    t = px + mean * (k - 1.0)
    rhs = mean * mean * k2 * var
    t2 = t * t

    pos = jnp.logical_or(t <= 0.0, t2 <= rhs)
    neg = jnp.logical_and(t <= 0.0, t2 >= rhs)
    out = jnp.where(k >= 0.0, pos, neg)
    return jnp.logical_and(out, valid)
