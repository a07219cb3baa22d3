"""Clamped sliding-window sums, TPU-first.

The three hot kernels of the reference (Sauvola binarisation,
``sauvola.pyx``; fg/bg optimise FIR term, ``optimiser.pyx:153-429``; mask
despeckle, ``optimiser.pyx:436-472``) are all built on border-clamped
rectangular window sums over uint8 images.  The reference computes them
with serial rolling integral arrays; on TPU we instead compute exact
integer window sums from cumulative sums.

Exactness note: cumulative sums are taken in (u)int32 and *may wrap*
(two's-complement / modular).  The windowed sum is recovered as a
difference of two cumsum entries; modular arithmetic guarantees the
difference is exact as long as the true window sum fits the dtype, which
holds for every window size the pipeline uses (window <= 256 even at
800 DPI; 255**2 * 256**2 < 2**32).

All functions operate on the trailing two dims (H, W) and broadcast over
leading batch dims, so they vmap/shard trivially.
"""

import numpy as np
import jax.numpy as jnp


def _edge_indices(n, lo_off, hi_off):
    """Per-position clamped [a, b) bounds for windows [i+lo_off, i+hi_off).

    Returns static numpy index vectors (lo, hi) with lo = max(i+lo_off, 0)
    and hi = min(i+hi_off, n); these index the zero-prepended cumsum.
    """
    i = np.arange(n)
    lo = np.maximum(i + lo_off, 0)
    hi = np.minimum(i + hi_off, n)
    return lo, hi


def sliding_sum(x, lo_off, hi_off, axis):
    """Exact clamped sliding-window sum along one axis.

    out[i] = sum(x[max(i+lo_off,0) : min(i+hi_off,n)]) along ``axis``.
    x must already be an integer jnp array (int32/uint32).
    """
    n = x.shape[axis]
    cs = jnp.cumsum(x, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    cs = jnp.pad(cs, pad)  # cs[k] = sum of first k entries
    lo, hi = _edge_indices(n, lo_off, hi_off)
    return jnp.take(cs, hi, axis=axis) - jnp.take(cs, lo, axis=axis)


def window_count(n, lo_off, hi_off):
    """Static per-position clamped window lengths as a numpy int32 vector."""
    lo, hi = _edge_indices(n, lo_off, hi_off)
    return (hi - lo).astype(np.int32)


def box_sum_2d(x, row_off, col_off):
    """Exact clamped 2D window sum over the last two axes.

    row_off/col_off are (lo, hi) offset pairs defining the half-open
    window [i+lo, i+hi) per axis, clamped to the image.
    """
    s = sliding_sum(x, row_off[0], row_off[1], axis=-2)
    return sliding_sum(s, col_off[0], col_off[1], axis=-1)


def box_count_2d(h, w, row_off, col_off, dtype=np.int32):
    """Static (H, W) array of clamped 2D window pixel counts."""
    rc = window_count(h, row_off[0], row_off[1])
    cc = window_count(w, col_off[0], col_off[1])
    return np.asarray(np.outer(rc, cc), dtype=dtype)
