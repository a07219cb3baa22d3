"""fg/bg 'optimise' (mask-directed radiate/inpaint), TPU-native and exact.

Re-derivation of ``optimiser.pyx:153-429`` (optimise_gray2 / optimise_rgb2):
for every non-mask pixel the output is

    out[y,x] = (FIR_sum + IIR_sum) // (FIR_cnt + IIR_cnt)    (0 if cnt==0)

    FIR: sum/count of *img* over masked pixels in the clamped window
         rows [y-n, y+n) x cols [x-n, x+n)
    IIR: sum of already-produced *output* over rows [y-n, y) x cols
         [x-n, x), counted as (y-ys)*(x-xs) pixels irrespective of mask

Masked pixels pass img through unchanged.

The reference computes this with serial incremental cursors.  The key
structural fact (visible at ``optimiser.pyx:213-220``: the IIR column
accumulators are only updated in the row-loop head) is that the IIR term
never reads the *current* row — every output row depends only on finished
rows.  That makes the whole kernel an exact ``lax.scan`` over rows with a
ring buffer of the last n output rows as carry; each step is fully
vectorized over (batch, channels, width).  The FIR term is precomputed
for the entire image with exact clamped window sums (ops/window.py).

Integer floor division matches the reference's C ``cdivision`` on
non-negative operands.  Output is bit-exact vs. the reference semantics
(validated against ops/golden.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .window import box_sum_2d


@functools.partial(jax.jit, static_argnames=('n_size',))
def optimise(mask, img, n_size):
    """Batched exact optimise.

    Args:
      mask: bool (B, H, W) — pixels to keep verbatim and radiate from.
      img:  uint8 (B, H, W) or (B, H, W, C).
      n_size: static window parameter (reference uses 3 for fg, 10 for bg
              with the mask inverted; see mrc.py:413,447).

    Returns uint8 array of img's shape.
    """
    gray = img.ndim == 3
    if gray:
        img = img[..., None]
    b, h, w, c = img.shape
    n = int(n_size)

    mi = mask.astype(jnp.int32)[:, None]              # (B, 1, H, W)
    xi = jnp.moveaxis(img.astype(jnp.int32), -1, 1)   # (B, C, H, W)

    fir_val = box_sum_2d(xi * mi, (-n, n), (-n, n))   # (B, C, H, W)
    fir_cnt = box_sum_2d(mi, (-n, n), (-n, n))        # (B, 1, H, W)

    # static per-column IIR geometry: xs = max(x-n, 0), width = x - xs
    xs_idx = np.maximum(np.arange(w) - n, 0)
    iir_w = jnp.asarray((np.arange(w) - xs_idx).astype(np.int32))
    xs_idx = jnp.asarray(xs_idx)

    # scan inputs as rows: (H, B, C, W)
    def rows(a):
        return jnp.moveaxis(a, 2, 0)

    scan_xs = (rows(fir_val), rows(fir_cnt), rows(xi),
               rows(mi.astype(bool)), jnp.arange(h, dtype=jnp.int32))

    ring0 = jnp.zeros((n, b, c, w), jnp.int32)
    colsum0 = jnp.zeros((b, c, w), jnp.int32)

    def step(carry, xs):
        ring, colsum = carry
        fv, fc, im_row, m_row, y = xs
        # IIR prefix over columns of the finished-rows column sums
        pref = jnp.pad(jnp.cumsum(colsum, axis=-1), ((0, 0), (0, 0), (1, 0)))
        iir_sum = (jnp.take(pref, jnp.arange(w), axis=-1)
                   - jnp.take(pref, xs_idx, axis=-1))          # cols [xs, x)
        iir_cnt = jnp.minimum(y, n) * iir_w                    # (W,)

        cnt = fc + iir_cnt[None, None, :]                      # (B, 1, W)
        val = fv + iir_sum                                     # (B, C, W)
        filled = jnp.where(cnt > 0, val // jnp.maximum(cnt, 1), 0)
        out_row = jnp.where(m_row, im_row, filled)

        slot = y % n
        oldest = jax.lax.dynamic_index_in_dim(ring, slot, 0, keepdims=False)
        colsum = colsum + out_row - oldest
        ring = jax.lax.dynamic_update_index_in_dim(ring, out_row, slot, 0)
        return (ring, colsum), out_row

    _, out_rows = jax.lax.scan(step, (ring0, colsum0), scan_xs)
    out = jnp.moveaxis(out_rows, 0, 2).astype(jnp.uint8)       # (B, C, H, W)
    out = jnp.moveaxis(out, 1, -1)                             # (B, H, W, C)
    return out[..., 0] if gray else out
