"""Antialiased resize as MXU matmuls (PIL-equivalent weights).

The reference downsamples with PIL: whole-image ``thumbnail(...,
resample=LANCZOS, reducing_gap=None)`` (``recode.py:370``) and per-layer
``thumbnail(...)`` with the BICUBIC default (``mrc.py:427,461``).

PIL's resample is a separable filter whose support scales with the
downsampling ratio: for output pixel i, center = (i+0.5)*scale,
support = filter.support * max(scale, 1), weights
``filter((j+0.5-center)/filterscale)`` normalized over the clamped input
range.  That is a dense (out, in) matrix per axis, so the whole resize is
two matmuls — exactly what the MXU wants.  We keep weights in f32 instead
of PIL's 8-bit fixed point; values match PIL within +-1 LSB.

``thumbnail_size`` reproduces PIL's aspect-fit box rounding so output
*dimensions* are bit-identical to the reference pipeline.
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


def _bicubic(x, a=-0.5):
    x = abs(x)
    if x < 1.0:
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    if x < 2.0:
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return 0.0


def _lanczos(x, a=3.0):
    if x == 0.0:
        return 1.0
    if abs(x) >= a:
        return 0.0
    px = math.pi * x
    return a * math.sin(px) * math.sin(px / a) / (px * px)


_FILTERS = {
    'bicubic': (_bicubic, 2.0),
    'lanczos': (_lanczos, 3.0),
    'bilinear': (lambda x: max(0.0, 1.0 - abs(x)), 1.0),
}


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size, out_size, filt='bicubic'):
    """(out_size, in_size) float32 PIL-convention resampling matrix."""
    fn, support = _FILTERS[filt]
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    sup = support * fscale
    mat = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        center = (i + 0.5) * scale
        jmin = max(int(center - sup + 0.5), 0)
        jmax = min(int(center + sup + 0.5), in_size)
        w = np.array([fn((j + 0.5 - center) / fscale)
                      for j in range(jmin, jmax)], np.float64)
        s = w.sum()
        if s != 0:
            w /= s
        mat[i, jmin:jmax] = w
    return mat


@functools.partial(jax.jit, static_argnames=('out_h', 'out_w', 'filt'))
def resize(img, out_h, out_w, filt='bicubic'):
    """Resize uint8/float (..., H, W) or (..., H, W, C) to (out_h, out_w)."""
    # channels iff ndim>=3 and last dim looks like one (1, 3 or 4)
    chan = img.ndim >= 3 and img.shape[-1] in (1, 3, 4)
    h_ax, w_ax = (-3, -2) if chan else (-2, -1)
    in_h, in_w = img.shape[h_ax], img.shape[w_ax]
    ah = jnp.asarray(resize_matrix(in_h, out_h, filt))
    aw = jnp.asarray(resize_matrix(in_w, out_w, filt))
    x = img.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    is_int = jnp.issubdtype(img.dtype, jnp.integer)

    def quant(a):
        # PIL stores the intermediate pass as uint8 (round half away, clip)
        return jnp.clip(jnp.floor(a + 0.5), 0, 255) if is_int else a

    if chan:
        y = quant(jnp.einsum('pw,...hwc->...hpc', aw, x, precision=hp))
        y = quant(jnp.einsum('oh,...hpc->...opc', ah, y, precision=hp))
    else:
        y = quant(jnp.einsum('pw,...hw->...hp', aw, x, precision=hp))
        y = quant(jnp.einsum('oh,...hp->...op', ah, y, precision=hp))
    return y.astype(img.dtype) if is_int else y


def thumbnail_size(w, h, box_w, box_h):
    """PIL Image.thumbnail aspect-fit target size (PIL/Image.py semantics).
    Returns None when the image already fits (PIL leaves it untouched)."""
    x, y = math.floor(box_w), math.floor(box_h)
    if x >= w and y >= h:
        return None

    def round_aspect(number, key):
        return max(min(math.floor(number), math.ceil(number), key=key), 1)

    aspect = w / h
    if x / y >= aspect:
        x = round_aspect(y * aspect, key=lambda n: abs(aspect - n / y))
    else:
        y = round_aspect(x / aspect,
                         key=lambda n: 0 if n == 0 else abs(aspect - x / n))
    return x, y


def downsample_layer(img, factor, filt='bicubic'):
    """Reference layer-downsample semantics (``mrc.py:420-434``): target box
    (w//f, h//f) via int(), aspect-fit thumbnail, no-op when degenerate.
    Returns (resized_or_original, did_resize)."""
    chan = img.ndim >= 3 and img.shape[-1] in (1, 3, 4)
    h, w = (img.shape[-3], img.shape[-2]) if chan else (img.shape[-2], img.shape[-1])
    bw, bh = int(w / factor), int(h / factor)
    if bw <= 0 or bh <= 0:
        return img, False
    tgt = thumbnail_size(w, h, bw, bh)
    if tgt is None:
        return img, True
    tw, th = tgt
    return resize(img, th, tw, filt), True
