"""Fused Pallas kernel: noise-adaptive gaussian blur + global Sauvola.

Replaces the XLA pipeline of ``mrc/decompose.py:global_threshold_input``
+ ``global_threshold`` (reference semantics ``mrc.py:300-329`` +
``mrc.py:58-87``) with one streamed row walk:

  reflect-padded uint8 rows stream in; a 128-slot VMEM ring holds the
  vertical blur window; each step produces one blurred row (97-tap
  vertical MAC with per-step rotated per-page weights, then 97-tap
  horizontal MAC), truncates it to uint8 exactly like the reference's
  f32->u8 cast, feeds it into rolling Sauvola column sums (+squares),
  and 50 rows later emits the thresholded mask row from windowed lane
  sums with exact clamped counts.

The per-page gaussian weights come from the XLA side (data-dependent
sigma; scipy-truncated, identity when sigma_est <= 1, matching
``mrc.py:309``); taps are static loop indices, ring slots dynamic.

Numerics: mean = floor(sum/cnt) is exact in f32 for window sums
< 2^24; the sum of squares exceeds f32 mantissa so E[x^2] uses integer
division (Mosaic i32 div); the final squared-form comparison runs in
f32 like ops/sauvola.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .optimise_pallas import _window_sum_lanes, _shift_left_zero, \
    _floor_div_exact

MAX_BLUR_RADIUS = 48             # supports sigma_est up to ~120
# compile-time taps chosen from the data; 4 covers the common 400-DPI
# case (sigma_est ~8 -> scipy radius 3), halving the blur MACs vs the
# old smallest bucket of 8
RADIUS_BUCKETS = (4, 8, 16, 48)


def _max_batch(radius, w=2550):
    """VMEM budget: the f32 input ring is (2r+2 rounded to 8) rows, the
    u8 blurred ring window+3 rounded to 8; cap scratch near 24MB."""
    wpp = -(-(w + max(2 * radius, 51)) // 128) * 128
    ring_in = -(-(2 * radius + 2) // 8) * 8
    per_page = (ring_in * 4 + 104 + 8) * wpp
    return max(4, (24 * 1024 * 1024) // per_page)


def _make_kernel(h, w, wpp, window, k, R, radius):
    o = (window + 1) // 2
    u = window // 2
    taps = 2 * radius + 1
    ring_in = -(-(taps + 1) // 8) * 8
    pre = 2 * radius           # input warmup steps
    ring_blur = -(-(window + 1) // 8) * 8

    def kernel(img_ref, whor_ref, out_ref,
               in_ring, blur_ring, colsum, colsumsq):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            in_ring[...] = jnp.zeros_like(in_ring)
            blur_ring[...] = jnp.zeros_like(blur_ring)
            colsum[...] = jnp.zeros_like(colsum)
            colsumsq[...] = jnp.zeros_like(colsumsq)

        # ingest padded input row s (guarded past the end); the ring
        # holds f32 so the 2*radius+1 tap reads skip the u8->i32->f32
        # conversion (bit-identical: same values, converted once)
        @pl.when(s < h + 2 * radius)
        def _():
            in_ring[pl.ds(s % ring_in, 1)] = \
                img_ref[...].astype(jnp.int32).astype(jnp.float32)

        bs = s - pre    # blurred row index produced this step
        whor = whor_ref[0]                          # (B, 128) f32

        @pl.when(jnp.logical_and(bs >= 0, bs < h))
        def _():
            # vertical MAC: tap t is padded row bs+t, ring slot
            # (bs+t) % ring_in (static tap index, dynamic slot).
            # Gaussian taps are symmetric (w[t] == w[2r-t], identity row
            # included), so fold mirrored taps to halve the multiplies.
            vrow = whor[:, radius:radius + 1] * \
                in_ring[pl.ds((bs + radius) % ring_in, 1)][0]
            for t in range(radius):
                pair = in_ring[pl.ds((bs + t) % ring_in, 1)][0] + \
                    in_ring[pl.ds((bs + 2 * radius - t) % ring_in, 1)][0]
                vrow = vrow + whor[:, t:t + 1] * pair

            # horizontal MAC (same separable weights, same fold)
            brow = whor[:, radius:radius + 1] * vrow
            for t in range(radius):
                sh = radius - t
                pair = jnp.roll(vrow, sh, axis=-1) + \
                    jnp.roll(vrow, -sh, axis=-1)
                brow = brow + whor[:, t:t + 1] * pair

            # re-base lanes to original columns; truncate like the
            # reference's float->uint8 cast; zero the padding lanes
            lanes = jax.lax.broadcasted_iota(jnp.int32, brow.shape, 1)
            brow = jnp.roll(brow, -radius, axis=-1)
            b_u8 = jnp.where(lanes < w, brow.astype(jnp.int32), 0)
            b_u8 = jnp.clip(b_u8, 0, 255)

            blur_ring[pl.ds(bs % ring_blur, 1)] = b_u8[None].astype(jnp.uint8)
            colsum[...] = colsum[...] + b_u8
            colsumsq[...] = colsumsq[...] + b_u8 * b_u8

        # sauvola window row removal: row bs - window leaves
        rem = bs - window

        @pl.when(jnp.logical_and(rem >= 0, rem < h))
        def _():
            old = blur_ring[pl.ds(rem % ring_blur, 1)][0].astype(jnp.int32)
            colsum[...] = colsum[...] - old
            colsumsq[...] = colsumsq[...] - old * old

        y = bs - u      # mask row emitted this step

        @pl.when(jnp.logical_and(y >= 0, y < h))
        def _():
            px = blur_ring[pl.ds(y % ring_blur, 1)][0].astype(jnp.int32).astype(jnp.float32)

            # cols [x-l+1, x+r] inclusive, clamped to [0, w): direct
            # windowed lane sums (colsum is zero outside [0, w), so the
            # clamping is free; wpp >= w + u keeps the final left shift
            # in-range)
            # zero_beyond=w: column sums are zeroed past lane w, and the
            # lane headroom (wpp - w >= window + 27 by construction)
            # proves each shift's wrap-in lanes are zero — the window
            # sums then run select-free (pure roll+add)
            s_win = _shift_left_zero(
                _window_sum_lanes(colsum[...], window, zero_beyond=w),
                u, wpp)
            q_win = _shift_left_zero(
                _window_sum_lanes(colsumsq[...], window, zero_beyond=w),
                u, wpp)

            lanes = jax.lax.broadcasted_iota(jnp.int32, px.shape, 1)
            cols_in = (jnp.minimum(lanes + u, w - 1)
                       - jnp.maximum(lanes - o, -1))
            rows_in = (jnp.minimum(y + u, h - 1)
                       - jnp.maximum(y - o, -1))
            cnt = jnp.maximum(rows_in * cols_in, 1)

            cnt_f = cnt.astype(jnp.float32)
            mean = jnp.floor(s_win.astype(jnp.float32) / cnt_f)
            ex2 = _floor_div_exact(q_win, cnt).astype(jnp.float32)
            var = ex2 - mean * mean

            kf = jnp.float32(k)
            k2 = kf * kf / jnp.float32(R) / jnp.float32(R)
            t = px + mean * (kf - 1.0)
            rhs = mean * mean * k2 * var
            ink = jnp.logical_or(t <= 0.0, t * t <= rhs)
            out_ref[...] = jnp.where(ink, 1, 0)[None].astype(jnp.uint8)

    return kernel


def blur_sauvola_pallas(img, weights, window, k=0.34, R=128.0,
                        interpret=False, radius=MAX_BLUR_RADIUS):
    """img: uint8 (B, H, W); weights: f32 (B, 2*radius+1) separable blur
    taps (identity row = delta when no blur).  ``radius`` is the static
    tap bucket (pick the smallest RADIUS_BUCKETS entry covering the
    per-page scipy radii; the MAC cost is linear in it).  Returns bool
    (B, H, W) ink mask of the blurred-then-truncated image.  Batches
    beyond the VMEM ring budget run as chunked kernel calls."""
    b = img.shape[0]
    cap = _max_batch(radius, img.shape[2])
    if b > cap:
        # equal chunks: one compiled shape, best utilization
        n_chunks = -(-b // cap)
        step = -(-b // n_chunks)
        outs = [_blur_sauvola_impl(img[i:i + step], weights[i:i + step],
                                   window, k, R, interpret, radius)
                for i in range(0, b, step)]
        return jnp.concatenate(outs, axis=0)
    return _blur_sauvola_impl(img, weights, window, k, R, interpret, radius)


@functools.partial(jax.jit, static_argnames=('window', 'k', 'R', 'interpret',
                                             'radius'))
def _blur_sauvola_impl(img, weights, window, k=0.34, R=128.0,
                       interpret=False, radius=MAX_BLUR_RADIUS):
    b, h, w = img.shape
    o = (window + 1) // 2
    u = window // 2
    taps = 2 * radius + 1
    # lane headroom: blur needs w + 2*radius, the windowed-sum left
    # shift needs w + window//2
    wpp = -(-(w + max(2 * radius, window // 2)) // 128) * 128

    # reflect-pad rows and columns; lanes beyond w+2r zero-padded
    xp = jnp.pad(img, ((0, 0), (radius, radius),
                       (radius, radius)), mode='symmetric')
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wpp - (w + 2 * radius))))
    xp = jnp.transpose(xp, (1, 0, 2))        # (Hp, B, Wpp)

    pre = 2 * radius
    steps = pre + h + u

    whor = jnp.zeros((b, 128), jnp.float32).at[:, :taps].set(weights)
    whor = jnp.broadcast_to(whor[None], (1, b, 128))

    out = pl.pallas_call(
        _make_kernel(h, w, wpp, window, float(k), float(R), radius),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, b, wpp),
                         lambda s: (jnp.minimum(s, h + pre - 1), 0, 0)),
            pl.BlockSpec((1, b, 128), lambda s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, b, wpp), lambda s: (jnp.maximum(s - 2 * radius - u, 0),
                                    0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, b, wpp), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((-(-(taps + 1) // 8) * 8, b, wpp),
                       jnp.float32),      # input ring (pre-converted)
            pltpu.VMEM((-(-(window + 1) // 8) * 8, b, wpp),
                       jnp.uint8),                             # blurred ring
            pltpu.VMEM((b, wpp), jnp.int32),         # colsum
            pltpu.VMEM((b, wpp), jnp.int32),         # colsumsq
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, whor)

    return jnp.transpose(out, (1, 0, 2))[:, :, :w].astype(bool)
