"""Fused Pallas kernel: noise-adaptive gaussian blur + global Sauvola.

Replaces the XLA pipeline of ``mrc/decompose.py:global_threshold_input``
+ ``global_threshold`` (reference semantics ``mrc.py:300-329`` +
``mrc.py:58-87``) with one streamed row walk:

  reflect-padded uint8 rows stream in; a VMEM ring holds the vertical
  blur window; each walked row produces one blurred row (vertical MAC
  with per-page rotated weights, then horizontal MAC), truncates it to
  uint8 exactly like the reference's f32->u8 cast, feeds it into
  rolling Sauvola column sums (+squares), and ``window`` rows later
  emits the thresholded mask row from windowed lane sums with exact
  clamped counts.

Round-2 restructure: the grid walks RB=8 rows per step.  A measured
passthrough kernel costs ~17 us of pure machinery per grid step on v5e
(DMA issue + grid bookkeeping, independent of batch and body), so a
3300-row page paid ~55 ms of overhead per walk; blocking 8 rows per
step amortizes it 8x while the per-row arithmetic stays identical —
each step executes exactly the original per-row triple
(blur+accumulate, window-row removal, emit) for its 8 rows in order.

Ring layout: the ingest and blur rings use RB-aligned capacities so
every block write is one contiguous dynamic slice; the taps read uses
a doubled ingest ring (each row written at slot p%K and p%K+K) so the
(2r + RB)-row tap window is a single contiguous slice with static
per-row tap offsets.

Numerics (unchanged): mean = floor(sum/cnt) is exact in f32 for window
sums < 2^24; E[x^2] uses an exact f32-assisted integer division; the
squared-form comparison runs in f32 like ops/sauvola.py.
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
# case (sigma_est ~8 -> scipy radius 3)
RADIUS_BUCKETS = (4, 8, 16, 48)
RB = 8                           # rows walked per grid step


def _max_batch(radius, w=2550, window=101):
    """VMEM budget: doubled f32 ingest ring (2*K2 rows), u8 blur ring
    (~window + 2*RB rows), two i32 column-sum planes; cap near 28MB."""
    wpp = -(-(w + max(2 * radius, window // 2)) // 128) * 128
    k2 = -(-(2 * radius + 2 * RB) // RB) * RB
    kb = -(-(window + 2 * RB) // RB) * RB
    per_page = (2 * k2 * 4 + kb + 2 * 4) * wpp
    return max(4, (28 * 1024 * 1024) // per_page)


def _make_kernel(h, w, wpp, window, k, R, radius, pre, k2, kb):
    o = (window + 1) // 2
    u = window // 2
    taps = 2 * radius + 1

    def kernel(img_ref, whor_ref, out_ref,
               in_ring, blur_ring, colsum, colsumsq):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            in_ring[...] = jnp.zeros_like(in_ring)
            blur_ring[...] = jnp.zeros_like(blur_ring)
            colsum[...] = jnp.zeros_like(colsum)
            colsumsq[...] = jnp.zeros_like(colsumsq)

        # ingest this step's RB padded input rows (f32, converted once);
        # rows past the meaningful range are zeros (harmless: their
        # blur/emit turns are guarded off).  Double write keeps any
        # (2r + RB)-row window contiguous.
        base = s * RB
        rows = img_ref[...].astype(jnp.int32).astype(jnp.float32)
        b0 = base % k2
        in_ring[pl.ds(b0, RB)] = rows
        in_ring[pl.ds(b0 + k2, RB)] = rows

        whor = whor_ref[0]                          # (B, 128) f32
        bs0 = base - pre                            # first blur row
        # one contiguous slice covers all RB blur rows' taps: slot
        # (bs0 % k2) + i is row bs0+i's canonical slot or its mirror
        # (doubled ring), and k2 >= taps + RB - 1 keeps it in range.
        # Early steps read zeros (bs0 < 0); their use is guarded off.
        tap_blk = in_ring[pl.ds(bs0 % k2, taps + RB - 1)]

        for j in range(RB):
            bs = bs0 + j

            @pl.when(jnp.logical_and(bs >= 0, bs < h))
            def _(bs=bs, j=j):
                # vertical MAC: static tap offsets into the slice.
                # Gaussian taps are symmetric (w[t] == w[2r-t]), fold
                # mirrored taps to halve the multiplies.
                vrow = whor[:, radius:radius + 1] * tap_blk[j + radius]
                for t in range(radius):
                    pair = tap_blk[j + t] + tap_blk[j + 2 * radius - t]
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

                blur_ring[pl.ds(bs % kb, 1)] = b_u8[None].astype(jnp.uint8)
                colsum[...] = colsum[...] + b_u8
                colsumsq[...] = colsumsq[...] + b_u8 * b_u8

            rem = bs - window

            @pl.when(jnp.logical_and(rem >= 0, rem < h))
            def _(rem=rem):
                old = blur_ring[pl.ds(rem % kb, 1)][0].astype(jnp.int32)
                colsum[...] = colsum[...] - old
                colsumsq[...] = colsumsq[...] - old * old

            y = bs - u      # mask row emitted for this sub-row

            @pl.when(jnp.logical_and(y >= 0, y < h))
            def _(y=y, j=j):
                px = blur_ring[pl.ds(y % kb, 1)][0] \
                    .astype(jnp.int32).astype(jnp.float32)

                # cols [x-l+1, x+r] inclusive, clamped to [0, w):
                # column sums are zeroed past lane w and the headroom
                # proves each shift's wrap-ins zero -> select-free sums
                s_win = _shift_left_zero(
                    _window_sum_lanes(colsum[...], window,
                                      zero_beyond=w), u, wpp)
                q_win = _shift_left_zero(
                    _window_sum_lanes(colsumsq[...], window,
                                      zero_beyond=w), u, wpp)

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
                k2f = kf * kf / jnp.float32(R) / jnp.float32(R)
                t = px + mean * (kf - 1.0)
                rhs = mean * mean * k2f * var
                ink = jnp.logical_or(t <= 0.0, t * t <= rhs)
                out_ref[pl.ds(j, 1)] = \
                    jnp.where(ink, 1, 0)[None].astype(jnp.uint8)

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
    cap = _max_batch(radius, img.shape[2], window)
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
    u = window // 2
    taps = 2 * radius + 1
    # lane headroom: blur needs w + 2*radius, the windowed-sum left
    # shift needs w + window//2
    wpp = -(-(w + max(2 * radius, window // 2)) // 128) * 128

    # warmup rows: >= 2*radius, and (pre + u) % RB == 0 so the emitted
    # rows of one step are an RB-aligned output block
    pre = 2 * radius + ((-(2 * radius + u)) % RB)
    steps = -(-(pre + h + u) // RB)
    # ingest ring capacity: oldest row needed at step s is s*RB - pre,
    # newest written is s*RB + RB - 1 -> span pre + RB; RB-multiple so
    # block writes never wrap; doubled so the tap slice never wraps
    k2 = -(-(pre + RB) // RB) * RB
    # blur ring: a row lives from its blur turn to its removal turn
    # (window rows later), plus this step's RB in-flight rows
    kb = -(-(window + 2 * RB) // RB) * RB

    # reflect-pad rows and columns; lanes beyond w+2r zero-padded; rows
    # padded to the full walked range
    xp = jnp.pad(img, ((0, 0), (radius, radius),
                       (radius, radius)), mode='symmetric')
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wpp - (w + 2 * radius))))
    xp = jnp.transpose(xp, (1, 0, 2))        # (Hp, B, Wpp)
    xp = jnp.pad(xp, ((0, steps * RB - xp.shape[0]), (0, 0), (0, 0)))

    whor = jnp.zeros((b, 128), jnp.float32).at[:, :taps].set(weights)
    whor = jnp.broadcast_to(whor[None], (1, b, 128))

    off = (pre + u) // RB
    out_blocks = steps - off

    out = pl.pallas_call(
        _make_kernel(h, w, wpp, window, float(k), float(R), radius,
                     pre, k2, kb),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((RB, b, wpp), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, b, 128), lambda s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (RB, b, wpp), lambda s: (jnp.maximum(s - off, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((out_blocks * RB, b, wpp),
                                       jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2 * k2, b, wpp), jnp.float32),  # ingest ring
            pltpu.VMEM((kb, b, wpp), jnp.uint8),        # blurred ring
            pltpu.VMEM((b, wpp), jnp.int32),            # colsum
            pltpu.VMEM((b, wpp), jnp.int32),            # colsumsq
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, whor)

    return jnp.transpose(out[:h], (1, 0, 2))[:, :, :w].astype(bool)
