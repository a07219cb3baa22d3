"""Pallas kernel: per-hOCR-line dual Sauvola thresholds (bbox-clamped).

Replaces the integral-image + per-pixel-gather formulation of
``mrc/decompose.py:hocr_line_thresholds`` (reference semantics
``mrc.py:188-270``: each line bbox crop is thresholded independently at
k=0.1, both polarities, with windows clamped to the crop).

Grid (n_lines, MAX_LINE_H + u): the kernel walks each line's rows with
``u`` warmup steps and three scalar-prefetch-indexed row streams (window
enter, window leave, centre row).  Rolling column sums/squares keep
lanes outside [l, r) zeroed so the lane prefix sums self-clamp
horizontally; the scalar-prefetched bbox clamps vertically.  The
inverted crop's statistics are derived algebraically (S' = 255C - S,
Q' = 65025C - 510S + Q), so both masks cost one walk.  Outputs are
per-line crop buffers; the XLA side pastes them into page-shaped maps in
document order (last line wins, matching the reference's sequential
overwrite).

Lines taller than MAX_LINE_H take the XLA fallback path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .optimise_pallas import _cumsum_lanes, _shift_right_zero, \
    _shift_left_edge

MAX_LINE_H = 128          # default bucket
LINE_H_BUCKETS = (64, 128, 256, 512)


def _make_kernel(wpp, window, k, R, max_h):
    o = (window + 1) // 2
    u = window // 2

    def kernel(t_ref, b_ref, l_ref, r_ref, page_ref,
               add_ref, rem_ref, px_ref, out_t_ref, out_i_ref,
               colsum, colsumsq):
        i = pl.program_id(0)
        s2 = pl.program_id(1)
        t = t_ref[i]
        bb = b_ref[i]
        ll = l_ref[i]
        rr = r_ref[i]
        height = bb - t

        @pl.when(s2 == 0)
        def _():
            colsum[...] = jnp.zeros_like(colsum)
            colsumsq[...] = jnp.zeros_like(colsumsq)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, wpp), 1)
        in_cols = jnp.logical_and(lanes >= ll, lanes < rr)

        # window enter: global row t + s2
        @pl.when(s2 < height)
        def _():
            row = jnp.where(in_cols, add_ref[0].astype(jnp.int32), 0)
            colsum[...] = colsum[...] + row
            colsumsq[...] = colsumsq[...] + row * row

        # window leave: global row y - o = t + s2 - u - o
        rem = s2 - u - o

        @pl.when(jnp.logical_and(rem >= 0, rem < height))
        def _():
            row = jnp.where(in_cols, rem_ref[0].astype(jnp.int32), 0)
            colsum[...] = colsum[...] - row
            colsumsq[...] = colsumsq[...] - row * row

        r_loc = s2 - u          # local output row; global y = t + r_loc

        @pl.when(jnp.logical_and(
                r_loc >= 0, jnp.logical_and(r_loc < height,
                                            r_loc < max_h)))
        def _():
            cs = _cumsum_lanes(colsum[...], wpp)
            cq = _cumsum_lanes(colsumsq[...], wpp)
            s_win = (_shift_left_edge(cs, u, wpp)
                     - _shift_right_zero(cs, o))
            q_win = (_shift_left_edge(cq, u, wpp)
                     - _shift_right_zero(cq, o))

            y = t + r_loc
            rows_in = (jnp.minimum(y + u, bb - 1)
                       - jnp.maximum(y - o, t - 1))
            cols_in = (jnp.minimum(lanes + u, rr - 1)
                       - jnp.maximum(lanes - o, ll - 1))
            cnt = jnp.maximum(rows_in * cols_in, 1)

            px = jnp.where(in_cols, px_ref[0].astype(jnp.int32), 0)

            kf = jnp.float32(k)
            k2 = kf * kf / jnp.float32(R) / jnp.float32(R)
            cnt_f = cnt.astype(jnp.float32)

            def sauvola(s_v, q_v, px_v):
                mean = jnp.floor(s_v.astype(jnp.float32) / cnt_f)
                ex2 = (q_v // cnt).astype(jnp.float32)
                var = ex2 - mean * mean
                tt = px_v.astype(jnp.float32) + mean * (kf - 1.0)
                rhs = mean * mean * k2 * var
                return jnp.logical_or(tt <= 0.0, tt * tt <= rhs)

            ink = sauvola(s_win, q_win, px)
            s_inv = 255 * cnt - s_win
            q_inv = 65025 * cnt - 510 * s_win + q_win
            ink_inv = sauvola(s_inv, q_inv, 255 - px)

            out_t_ref[...] = jnp.where(
                jnp.logical_and(in_cols, ink), 1, 0)[None] \
                .astype(jnp.uint8)
            out_i_ref[...] = jnp.where(
                jnp.logical_and(in_cols, ink_inv), 1, 0)[None] \
                .astype(jnp.uint8)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=('window', 'k', 'R', 'interpret',
                                    'max_line_h'))
def line_thresholds_pallas(gray, boxes, pages, window, k=0.1, R=128.0,
                           interpret=False, max_line_h=MAX_LINE_H):
    """gray: uint8 (B, H, W); boxes: (4, n) int32 rows t,b,l,r; pages:
    (n,) int32 page of each line.  Returns (thres, thres_inv) uint8 crop
    buffers of shape (n, max_line_h, Wp) holding each line's mask rows
    at [0:b-t] (lanes are page columns; only [l, r) is meaningful)."""
    bsz, h, w = gray.shape
    n = boxes.shape[1]
    u = window // 2
    wpp = -(-w // 128) * 128

    gp = jnp.pad(gray, ((0, 0), (0, 0), (0, wpp - w)))
    gp = jnp.transpose(gp, (1, 0, 2)).reshape(h * bsz, 1, wpp)
    # row-major (H, B) flattening: global row of (page, y) = y * B + page
    # -> keep (H*B, 1, wpp) so index = row * bsz + page

    t, bb, ll, rr = boxes[0], boxes[1], boxes[2], boxes[3]

    def mk_index(offset_fn):
        def index_map(i, s2, t_ref, b_ref, l_ref, r_ref, page_ref):
            row = offset_fn(t_ref[i], s2)
            row = jnp.clip(row, 0, h - 1)
            return (row * bsz + page_ref[i], 0, 0)
        return index_map

    add_map = mk_index(lambda tt, s2: tt + s2)
    rem_map = mk_index(lambda tt, s2: tt + s2 - u - ((window + 1) // 2))
    px_map = mk_index(lambda tt, s2: tt + s2 - u)

    max_h = int(max_line_h)

    def out_map(i, s2, t_ref, b_ref, l_ref, r_ref, page_ref):
        # outputs are (n*max_h, 1, wpp): dynamic row leads so the
        # trailing block dims equal the array dims (Mosaic constraint)
        return (i * max_h + jnp.clip(s2 - u, 0, max_h - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n, max_h + u),
        in_specs=[
            pl.BlockSpec((1, 1, wpp), add_map),
            pl.BlockSpec((1, 1, wpp), rem_map),
            pl.BlockSpec((1, 1, wpp), px_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, wpp), out_map),
            pl.BlockSpec((1, 1, wpp), out_map),
        ],   # noqa: trailing block dims equal the (1, wpp) array dims
        scratch_shapes=[
            pltpu.VMEM((1, wpp), jnp.int32),
            pltpu.VMEM((1, wpp), jnp.int32),
        ],
    )

    out_t, out_i = pl.pallas_call(
        _make_kernel(wpp, window, float(k), float(R), max_h),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n * max_h, 1, wpp), jnp.uint8),
            jax.ShapeDtypeStruct((n * max_h, 1, wpp), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(t, bb, ll, rr, pages, gp, gp, gp)

    return (out_t.reshape(n, max_h, wpp),
            out_i.reshape(n, max_h, wpp))
