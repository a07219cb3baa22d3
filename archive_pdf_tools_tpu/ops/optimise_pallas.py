"""Fused Pallas TPU kernel for the fg/bg 'optimise' radiate fill.

Same exact semantics as ops/optimise.py (see there for the derivation
from ``optimiser.pyx:153-429``), but implemented as a single Mosaic
kernel that walks rows once with all pages and channels riding the
vector registers (layout (H, C, B, W): one row block per grid step,
batch on sublanes, width on lanes):

  grid = (H + n - 1,): n-1 warmup steps prime the FIR column
  accumulators, then one output row per step.  VMEM scratch carries the
  incremental state the reference keeps in serial cursors: masked-FIR
  column sums/counts (window rows [y-n, y+n)), the IIR column sums of
  the last n produced rows, and an n-row ring buffer.  Per step: three
  log-shift windowed lane sums (widths 2n, 2n, n), zero-filled window
  shifts, and the count-weighted fill.

Integer division note: the fill is floor(val / cnt) with val < 2^17 and
cnt <= (2n)^2 + n^2; both are exact in f32, and a non-integer rational
val/cnt is at least 1/cnt ~ 2e-3 away from an integer while the f32
quotient errs by ~2e-5, so floor of the f32 divide equals the exact
integer floor everywhere.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_right_zero(x, k):
    """y[i] = x[i-k] with zero fill (k static)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lanes >= k, jnp.roll(x, k, axis=x.ndim - 1), 0)


def _shift_left_zero(x, k, width):
    """y[i] = x[i+k] with zero fill (k static)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lanes < width - k, jnp.roll(x, -k, axis=x.ndim - 1), 0)


def _window_sum_lanes(x, win, zero_beyond=None):
    """W[i] = sum of x[i-win+1 .. i] (entries left of 0 count as zero).

    Built by shift-doubling to the powers of two in ``win`` then binary
    composition — ceil(log2 win) + popcount(win) - 1 shift+adds, vs
    ceil(log2 W) for a full prefix sum.  Unlike the prefix-difference
    trick this never wraps modulo 2^32, so it is safe even when the
    full-row prefix total would overflow int32.

    zero_beyond: optional lane index past which ``x`` is known to be
    all zero.  TPU rolls wrap, so each shift normally needs a
    zero-fill select; when the zero tail is long enough the wrapped-in
    lanes are provably zero already and the select is skipped (the
    proof tracks each intermediate's own zero-tail).  Roughly halves
    the vector ops of the hot Sauvola window sums.
    """
    width = x.shape[-1]

    def sr(y, k, zy):
        """roll right by k; returns (result, its zero_beyond or None)."""
        r = jnp.roll(y, k, axis=y.ndim - 1)
        if zy is not None and width - k >= zy:
            return r, min(zy + k, width)
        lanes = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1)
        return jnp.where(lanes >= k, r, 0), \
            (None if zy is None else min(zy + k, width))

    pow2 = {1: (x, zero_beyond)}
    k = 1
    while k * 2 <= win:
        y, zy = pow2[k]
        s, zs = sr(y, k, zy)
        pow2[k * 2] = (y + s, zs)
        k *= 2
    total = None
    acc = 0
    for p in sorted((b for b in pow2 if win & b), reverse=True):
        if total is None:
            total, acc = pow2[p][0], p
        else:
            s, _zs = sr(pow2[p][0], acc, pow2[p][1])
            total = total + s
            acc += p
    return total


def _floor_div_exact(q, c):
    """Exact floor(q / c) for int32 q >= 0, c > 0 with q/c < 2^17.

    f32 divide + one-step integer correction: the f32 quotient's
    absolute error is < 3 * (q/c) * 2^-24 < 0.02 for q/c <= 65025, so
    the floored estimate is off by at most one; the exact i32 remainder
    fixes it.  Avoids Mosaic's slow vector integer division.
    """
    t = jnp.floor(q.astype(jnp.float32) /
                  c.astype(jnp.float32)).astype(jnp.int32)
    r = q - t * c
    return t + jnp.where(r >= c, 1, 0) - jnp.where(r < 0, 1, 0)


def _make_kernel(n, h, wp):
    rn = 2 * n + 1   # input rows stay live from FIR-add to FIR-remove

    def kernel(img_a_ref, msk_a_ref, out_ref,
               fir_val, fir_cnt, colsum, ring, in_img, in_msk):
        s = pl.program_id(0)
        y = s - (n - 1)

        @pl.when(s == 0)
        def _():
            fir_val[...] = jnp.zeros_like(fir_val)
            fir_cnt[...] = jnp.zeros_like(fir_cnt)
            colsum[...] = jnp.zeros_like(colsum)
            ring[...] = jnp.zeros_like(ring)

        # FIR add: row s enters the window (rows [y-n, y+n)); the raw
        # row also goes into a VMEM ring so the FIR-remove (2n steps
        # later) and the output row (n-1 steps later) re-read VMEM
        # instead of streaming three HBM copies.
        @pl.when(s < h)
        def _():
            in_img[pl.ds(s % rn, 1)] = img_a_ref[...]
            in_msk[pl.ds(s % rn, 1)] = msk_a_ref[...]
            m = msk_a_ref[0].astype(jnp.int32)          # (1, B, Wp)
            v = img_a_ref[0].astype(jnp.int32)          # (C, B, Wp)
            fir_val[...] = fir_val[...] + v * m
            fir_cnt[...] = fir_cnt[...] + m

        # FIR remove: row s - 2n leaves the window
        @pl.when(s - 2 * n >= 0)
        def _():
            slot = (s - 2 * n) % rn
            m = in_msk[pl.ds(slot, 1)][0].astype(jnp.int32)
            v = in_img[pl.ds(slot, 1)][0].astype(jnp.int32)
            fir_val[...] = fir_val[...] - v * m
            fir_cnt[...] = fir_cnt[...] - m

        @pl.when(y >= 0)
        def _():
            yslot = y % rn
            img_row = in_img[pl.ds(yslot, 1)][0].astype(jnp.int32)
            msk_row = in_msk[pl.ds(yslot, 1)][0].astype(jnp.int32)

            # horizontal FIR window [x-n, x+n): direct windowed lane
            # sums (zero outside the data clamps for free; wp >= w+n-1
            # keeps the left shift in-range)
            fir_v = _shift_left_zero(
                _window_sum_lanes(fir_val[...], 2 * n), n - 1, wp)
            fir_c = _shift_left_zero(
                _window_sum_lanes(fir_cnt[...], 2 * n), n - 1, wp)

            # IIR: finished-rows column sums over cols [x-n, x)
            iir_v = _shift_right_zero(
                _window_sum_lanes(colsum[...], n), 1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, msk_row.shape, 2)
            iir_c = jnp.minimum(y, n) * jnp.minimum(lanes, n)

            cnt = fir_c + iir_c                          # (1, B, Wp)
            val = fir_v + iir_v                          # (C, B, Wp)
            q = val.astype(jnp.float32) / \
                jnp.maximum(cnt, 1).astype(jnp.float32)
            filled = jnp.where(cnt > 0, jnp.floor(q).astype(jnp.int32), 0)
            out_row = jnp.where(msk_row > 0, img_row, filled)

            out_ref[0] = out_row.astype(jnp.uint8)

            slot = y % n
            oldest = ring[pl.ds(slot, 1)][0]
            colsum[...] = colsum[...] + out_row - oldest
            ring[pl.ds(slot, 1)] = out_row[None]

    return kernel


def _max_batch(n, c):
    """VMEM budget: scratch is ~(n*c + 2c + 1) * B * Wp * 4 bytes; cap it
    near 24MB (this chip compiles ~23MB of scratch comfortably; chunking
    a batch costs more than the larger rings)."""
    per_page = ((n * c + 2 * c + 1) * 4 + (2 * n + 1) * (c + 1)) * 2816
    return max(4, (24 * 1024 * 1024) // per_page)


def optimise_pallas(mask, img, n_size, interpret=False):
    """Drop-in for ops.optimise.optimise, Pallas TPU implementation.

    mask: bool (B, H, W); img: uint8 (B, H, W) or (B, H, W, C).
    Batches beyond the VMEM scratch budget run as chunked kernel calls
    (RGB at n=10 caps near 24 pages; gray fits 64+).
    """
    c = 1 if img.ndim == 3 else img.shape[-1]
    b = img.shape[0]
    cap = _max_batch(int(n_size), c)
    if b > cap:
        # equal chunks: one compiled shape, best utilization
        n_chunks = -(-b // cap)
        step = -(-b // n_chunks)
        outs = [_optimise_impl(mask[i:i + step], img[i:i + step], n_size,
                               interpret)
                for i in range(0, b, step)]
        return jnp.concatenate(outs, axis=0)
    return _optimise_impl(mask, img, n_size, interpret)


@functools.partial(jax.jit, static_argnames=('n_size', 'interpret'))
def _optimise_impl(mask, img, n_size, interpret=False):
    gray = img.ndim == 3
    if gray:
        img = img[..., None]
    b, h, w, c = img.shape
    n = int(n_size)
    wp = -(-(w + n - 1) // 128) * 128  # headroom for the window shift

    # layout (H, C, B, Wp) / (H, 1, B, Wp): rows lead, lanes on width
    xi = jnp.transpose(img, (1, 3, 0, 2))
    mi = mask.astype(jnp.uint8)[:, None].transpose(2, 1, 0, 3)
    if wp != w:
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
        mi = jnp.pad(mi, ((0, 0), (0, 0), (0, 0), (0, wp - w)))

    add_row = lambda s: jnp.minimum(s, h - 1)
    out_row = lambda s: jnp.maximum(s - (n - 1), 0)

    def img_spec(f):
        return pl.BlockSpec((1, c, b, wp), lambda s: (f(s), 0, 0, 0))

    def msk_spec(f):
        return pl.BlockSpec((1, 1, b, wp), lambda s: (f(s), 0, 0, 0))

    out = pl.pallas_call(
        _make_kernel(n, h, wp),
        grid=(h + n - 1,),
        in_specs=[img_spec(add_row), msk_spec(add_row)],
        out_specs=pl.BlockSpec((1, c, b, wp),
                               lambda s: (out_row(s), 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, c, b, wp), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((c, b, wp), jnp.int32),     # fir_val
            pltpu.VMEM((1, b, wp), jnp.int32),     # fir_cnt
            pltpu.VMEM((c, b, wp), jnp.int32),     # colsum
            pltpu.VMEM((n, c, b, wp), jnp.int32),  # ring (produced rows)
            pltpu.VMEM((2 * n + 1, c, b, wp), jnp.uint8),  # input rows
            pltpu.VMEM((2 * n + 1, 1, b, wp), jnp.uint8),  # input mask
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xi, mi)

    out = jnp.transpose(out[..., :w], (2, 0, 3, 1))    # (B, H, W, C)
    return out[..., 0] if gray else out
