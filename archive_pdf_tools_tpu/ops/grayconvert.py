"""Special RGB->gray conversion (reference ``grayconvert.py``), TPU-native.

Semantics of ``special_gray_convert`` (``grayconvert.py:38-66``), a port of
IA's color2Gray.sh: per-channel level stretch whose thresholds derive from
whole-channel statistics, then the HSL 'L' (as L = V * (1 - S/2)) of the
stretched image.  Channel statistics are data-dependent scalars, so the
whole op stays on device and jits cleanly.
"""

import jax
import jax.numpy as jnp


def _level(chan, low, high):
    """``level_arr`` (grayconvert.py:24-31) in exact integer arithmetic.

    The reference stretches with float thresholds minv=low*255/100,
    maxv=high*255/100 and truncates to uint8; since low/high are integer
    percentages the stretched value is the exact rational
    (100*px - 255*low) / (high - low), whose truncation is an integer
    floor division.  (The reference's f64 path can differ by 1 LSB when
    the exact value lands on an integer; we keep the exact answer.)
    """
    px = chan.astype(jnp.int32)
    num = 100 * px - 255 * low
    out = (num // jnp.maximum(high - low, 1)).astype(jnp.int32)
    out = jnp.where(20 * px < 51 * low, 0, out)      # px < minv
    out = jnp.where(20 * px > 51 * high, 255, out)   # px > maxv
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


@jax.jit
def special_gray_convert(img):
    """img: uint8 (..., H, W, 3) -> uint8 (..., H, W)."""
    f = img.astype(jnp.float32) / 255.0
    axes = (-2, -1)   # (H, W) of the per-channel view

    def stats(c):
        ch = f[..., c]
        return (jnp.min(ch, axis=axes), jnp.max(ch, axis=axes),
                jnp.mean(ch, axis=axes),
                jnp.std(ch, axis=axes))

    r_min, r_max, r_mean, r_std = stats(0)
    g_min, g_max, g_mean, g_std = stats(1)
    b_min, b_max, b_mean, b_std = stats(2)

    bright = (r_mean * g_mean * b_mean /
              (b_max * (1 - r_std) * (1 - g_std) * (1 - b_std)))
    bright = jnp.round(bright * 1e4) / 1e4          # round(x, 4)

    low = jnp.minimum(jnp.floor(196.0 * r_min + 14.5), 50.0).astype(jnp.int32)
    hi_r = jnp.minimum(jnp.floor(35.66 * bright + 48.5), 95.0).astype(jnp.int32)
    hi_g = jnp.minimum(jnp.floor(39.22 * bright + 44.5), 95.0).astype(jnp.int32)
    hi_b = jnp.minimum(jnp.floor(45.16 * bright + 36.5), 95.0).astype(jnp.int32)

    lo_v = low[..., None, None]
    out_r = _level(img[..., 0], lo_v, hi_r[..., None, None])
    out_g = _level(img[..., 1], lo_v, hi_g[..., None, None])
    out_b = _level(img[..., 2], lo_v, hi_b[..., None, None])

    # HSL 'L' of the stretched image: with S=(V-mn)/V and L=V*(1-S/2)
    # this collapses exactly to (V+mn)/2 on the 0..255 integer scale
    v = jnp.maximum(jnp.maximum(out_r, out_g), out_b).astype(jnp.int32)
    mn = jnp.minimum(jnp.minimum(out_r, out_g), out_b).astype(jnp.int32)
    return ((v + mn) // 2).astype(jnp.uint8)
