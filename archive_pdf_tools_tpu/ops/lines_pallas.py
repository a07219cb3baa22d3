"""Pallas kernel: per-hOCR-line dual Sauvola thresholds (bbox-clamped).

Replaces the integral-image + per-pixel-gather formulation of
``mrc/decompose.py:hocr_line_thresholds`` (reference semantics
``mrc.py:188-270``: each line bbox crop is thresholded independently at
k=0.1, both polarities, with windows clamped to the crop).

GROUP (8) lines ride the VPU sublanes; the walk axis advances RB (8)
rows per grid step: each line streams one (8, W) row block per step
through a scalar-prefetch-indexed input (crop rows are 8-aligned in
page coordinates, so the block fetch starts on a tile boundary), and
the kernel unrolls the 8 row sub-steps internally — ~8x fewer grid
steps than a row-at-a-time walk for the same stream count, which
matters here because per-row compute is tiny (the per-step fixed cost
dominated the row-at-a-time version).  The leave and centre rows are
re-read from a VMEM row ring instead of streaming more HBM copies.

Lines in a group have independent bboxes, so row validity uses masked
adds rather than predication.  Lanes outside a line's [l, r) are zeroed
on ingest so the windowed lane sums self-clamp horizontally; the
scalar-prefetched bbox clamps vertically.  The inverted crop's
statistics are derived algebraically (S' = 255C - S, Q' = 65025C - 510S
+ Q), so both masks cost one walk.  Outputs are per-line crop buffers
(8-aligned rows: crop row k is page row (t & ~7) + k); the paste kernel
(ops/paste_pallas.py) or the XLA scan places them into page maps in
document order.

Lines taller than the largest height bucket take the XLA fallback path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .optimise_pallas import _window_sum_lanes, _shift_left_zero, \
    _floor_div_exact

MAX_LINE_H = 128          # default bucket
LINE_H_BUCKETS = (64, 128, 256, 512)
GROUP = 8                 # lines per grid step (sublane packing).
                          # GROUP=16 with 8-row blocks measured 94 vs
                          # 101 ms standalone, but the fused-step
                          # compile blew past 10 minutes (16 streams x
                          # 8 unrolled sub-rows); not worth it.
RB = 8                    # walk rows per grid step (matches the 8-row
                          # crop alignment, so input blocks are aligned)


def _make_kernel(wpp, window, k, R, max_h, ring_n, e, out_off, steps):
    o = (window + 1) // 2
    u = window // 2

    def kernel(t_ref, b_ref, l_ref, r_ref, page_ref, *refs):
        add_refs = refs[0:GROUP]
        out_t_ref, out_i_ref, cnt_t_ref, cnt_i_ref = refs[GROUP:GROUP + 4]
        ring, colsum, colsumsq, acc_t, acc_i = refs[GROUP + 4:]

        i = pl.program_id(0)
        s = pl.program_id(1)

        def scal(ref):
            return jnp.stack(
                [ref[i * GROUP + j] for j in range(GROUP)])[:, None]

        t = scal(t_ref)            # (G, 1) int32
        bb = scal(b_ref)
        ll = scal(l_ref)
        rr = scal(r_ref)
        off = t % 8                # crop rows sit 8-aligned: crop row x
        height = bb - t            # is page row (t & ~7) + x

        @pl.when(s == 0)
        def _():
            colsum[...] = jnp.zeros_like(colsum)
            colsumsq[...] = jnp.zeros_like(colsumsq)
            acc_t[...] = jnp.zeros_like(acc_t)
            acc_i[...] = jnp.zeros_like(acc_i)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (GROUP, wpp), 1)
        in_cols = jnp.logical_and(lanes >= ll, lanes < rr)

        for r in range(RB):
            v = s * RB + r         # virtual walk step
            s2 = v - e             # row offset from each line's t & ~7

            # window enter: each line's page row t_al + s2 (masked add);
            # input blocks hold padded rows t_al + v (e zero rows on
            # top), so sub-row r of the block is exactly this row.  The
            # raw rows go into a VMEM ring so the window-leave row and
            # the centre row are re-read from VMEM.
            raw_u8 = jnp.concatenate(
                [ref[0, r:r + 1] for ref in add_refs], axis=0)
            ring[pl.ds(v % ring_n, 1)] = raw_u8[None]
            add_rows = jnp.where(in_cols, raw_u8.astype(jnp.int32), 0)
            add_rows = jnp.where(
                jnp.logical_and(s2 >= off, s2 < off + height),
                add_rows, 0)
            colsum[...] = colsum[...] + add_rows
            colsumsq[...] = colsumsq[...] + add_rows * add_rows

            # window leave: row t_al + s2 - u - o (masked subtract);
            # that row was ingested at virtual step v - window - 1 + ...
            rem = s2 - u - o
            rem_slot = jnp.maximum(rem + e, 0) % ring_n
            rem_raw = ring[pl.ds(rem_slot, 1)][0].astype(jnp.int32)
            rem_rows = jnp.where(in_cols, rem_raw, 0)
            rem_rows = jnp.where(
                jnp.logical_and(rem >= off, rem < off + height),
                rem_rows, 0)
            colsum[...] = colsum[...] - rem_rows
            colsumsq[...] = colsumsq[...] - rem_rows * rem_rows

            r_loc = s2 - u      # crop row emitted this sub-step;
                                # r_loc = RB*(s - out_off) + r

            @pl.when(jnp.logical_and(r_loc >= 0, r_loc < max_h))
            def _(r=r, r_loc=r_loc):
                # windowed lane sums over cols [x-o+1, x+u]; colsum is
                # zero outside [l, r) so the horizontal clamp is free,
                # and wpp >= w + u keeps the final left shift in-range
                s_win = _shift_left_zero(
                    _window_sum_lanes(colsum[...], window), u, wpp)
                q_win = _shift_left_zero(
                    _window_sum_lanes(colsumsq[...], window), u, wpp)

                y = (t - off) + r_loc
                rows_in = (jnp.minimum(y + u, bb - 1)
                           - jnp.maximum(y - o, t - 1))       # (G, 1)
                cols_in = (jnp.minimum(lanes + u, rr - 1)
                           - jnp.maximum(lanes - o, ll - 1))
                cnt = jnp.maximum(rows_in * cols_in, 1)

                px_raw = ring[pl.ds((r_loc + e) % ring_n, 1)][0] \
                    .astype(jnp.int32)
                px = jnp.where(in_cols, px_raw, 0)

                kf = jnp.float32(k)
                k2 = kf * kf / jnp.float32(R) / jnp.float32(R)
                cnt_f = cnt.astype(jnp.float32)

                def sauvola(s_v, q_v, px_v):
                    mean = jnp.floor(s_v.astype(jnp.float32) / cnt_f)
                    ex2 = _floor_div_exact(q_v, cnt).astype(jnp.float32)
                    var = ex2 - mean * mean
                    tt = px_v.astype(jnp.float32) + mean * (kf - 1.0)
                    rhs = mean * mean * k2 * var
                    return jnp.logical_or(tt <= 0.0, tt * tt <= rhs)

                ink = sauvola(s_win, q_win, px)
                s_inv = 255 * cnt - s_win
                q_inv = 65025 * cnt - 510 * s_win + q_win
                ink_inv = sauvola(s_inv, q_inv, 255 - px)

                valid = jnp.logical_and(
                    in_cols, jnp.logical_and(r_loc >= off,
                                             r_loc < off + height))
                bit_t = jnp.where(jnp.logical_and(valid, ink), 1, 0)
                bit_i = jnp.where(jnp.logical_and(valid, ink_inv), 1, 0)
                out_t_ref[0, r] = bit_t.astype(jnp.uint8)
                out_i_ref[0, r] = bit_i.astype(jnp.uint8)
                # fused ink counts: per-lane accumulate, reduce on the
                # group's last step (saves a separate pass)
                acc_t[...] = acc_t[...] + bit_t
                acc_i[...] = acc_i[...] + bit_i

            if r == RB - 1:
                @pl.when(s == steps - 1)
                def _():
                    cnt_t_ref[0] = jnp.broadcast_to(
                        jnp.sum(acc_t[...], axis=-1, keepdims=True),
                        (GROUP, 128))
                    cnt_i_ref[0] = jnp.broadcast_to(
                        jnp.sum(acc_i[...], axis=-1, keepdims=True),
                        (GROUP, 128))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=('window', 'k', 'R', 'interpret',
                                    'max_line_h'))
def line_thresholds_pallas(gray, boxes, pages, window, k=0.1, R=128.0,
                           interpret=False, max_line_h=MAX_LINE_H):
    """gray: uint8 (B, H, W); boxes: (4, n) int32 rows t,b,l,r (n a
    multiple of 8); pages: (n,) int32 page of each line.  Returns
    (thres, thres_inv, ones, ones_inv): uint8 crop buffers of shape
    (n, max_line_h, Wp) holding each line's mask rows 8-aligned: crop
    row x is page row (t & ~7) + x, valid rows [t%8, t%8 + (b-t))
    (lanes are page columns; only [l, r) is meaningful) plus fused
    int32 per-line ink counts for both polarities."""
    bsz, h, w = gray.shape
    n = boxes.shape[1]
    if n % GROUP:
        pad = GROUP - n % GROUP
        boxes = jnp.pad(boxes, ((0, 0), (0, pad)))
        pages = jnp.pad(pages, (0, pad))
        n += pad
    o = (window + 1) // 2
    u = window // 2
    wpp = -(-(w + u) // 128) * 128   # headroom for the windowed-sum shift
    max_h = int(max_line_h)
    assert max_h % RB == 0

    e = (-u) % RB                 # virtual shift: emissions 8-aligned
    out_off = (u + e) // RB
    steps = -(-(max_h + u + e) // RB)

    # padded input (B, HP, Wp): e zero rows on top (so sub-row r of the
    # fetched block is page row t_al + v - e), zero rows below so the
    # tail fetches stay in range
    hp = 8 * ((h - 1) // 8 + steps + 1)
    gp = jnp.zeros((bsz, hp, wpp), jnp.uint8)
    gp = jax.lax.dynamic_update_slice(
        gp, jnp.pad(gray, ((0, 0), (0, 0), (0, wpp - w))), (0, e, 0))

    t, bb, ll, rr = boxes[0], boxes[1], boxes[2], boxes[3]

    def mk_index(j):
        def index_map(i, s, t_ref, b_ref, l_ref, r_ref, page_ref):
            line = i * GROUP + j
            return (page_ref[line], t_ref[line] // 8 + s, 0)
        return index_map

    ring_n = window + 1          # enter row must outlive the leave read
    in_specs = [pl.BlockSpec((1, RB, wpp), mk_index(j))
                for j in range(GROUP)]

    def out_map(i, s, t_ref, b_ref, l_ref, r_ref, page_ref):
        return (i, jnp.maximum(s - out_off, 0), 0, 0)

    def cnt_map(i, s, t_ref, b_ref, l_ref, r_ref, page_ref):
        return (i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n // GROUP, steps),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, RB, GROUP, wpp), out_map),
            pl.BlockSpec((1, RB, GROUP, wpp), out_map),
            pl.BlockSpec((1, GROUP, 128), cnt_map),
            pl.BlockSpec((1, GROUP, 128), cnt_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((ring_n, GROUP, wpp), jnp.uint8),
            pltpu.VMEM((GROUP, wpp), jnp.int32),
            pltpu.VMEM((GROUP, wpp), jnp.int32),
            pltpu.VMEM((GROUP, wpp), jnp.int32),   # ink count acc (plain)
            pltpu.VMEM((GROUP, wpp), jnp.int32),   # ink count acc (inv)
        ],
    )

    out_t, out_i, cnt_t, cnt_i = pl.pallas_call(
        _make_kernel(wpp, window, float(k), float(R), max_h, ring_n,
                     e, out_off, steps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n // GROUP, max_h, GROUP, wpp),
                                 jnp.uint8),
            jax.ShapeDtypeStruct((n // GROUP, max_h, GROUP, wpp),
                                 jnp.uint8),
            jax.ShapeDtypeStruct((n // GROUP, GROUP, 128), jnp.int32),
            jax.ShapeDtypeStruct((n // GROUP, GROUP, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(t, bb, ll, rr, pages, *([gp] * GROUP))

    # (n/G, max_h, G, wpp) -> (n, max_h, wpp)
    out_t = jnp.transpose(out_t, (0, 2, 1, 3)).reshape(n, max_h, wpp)
    out_i = jnp.transpose(out_i, (0, 2, 1, 3)).reshape(n, max_h, wpp)
    ones = cnt_t[:, :, 0].reshape(n)
    ones_inv = cnt_i[:, :, 0].reshape(n)
    return out_t, out_i, ones, ones_inv
