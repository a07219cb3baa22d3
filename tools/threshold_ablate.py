#!/usr/bin/env python3
"""Ablation profile of the fused blur+Sauvola kernel on the real chip.

The stage is ~55% of the standalone decompose sum (RESULTS.md) and
jax.profiler isn't usable through the axon tunnel, so this localizes
the cost by timing kernel variants with pieces disabled (same grid,
same rings, same DMA pattern — only the arithmetic differs):

  full      the shipped kernel body
  no_hmac   horizontal MAC skipped (brow = vrow)
  no_vmac   vertical MAC skipped (center tap only)
  no_blur   both MACs skipped (raw row feeds the rings/sums)
  no_emit   threshold emit skipped (blur + column sums only)
  machinery ingest + ring writes + an output store only

All variants are throwaway copies of ops/threshold_pallas.py's body —
keep them in sync by hand if that kernel changes (this is a debug tool,
not a parity surface).

Usage: python tools/threshold_ablate.py [batch] [reps]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')

import numpy as np


def _build(ablate):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from archive_pdf_tools_tpu.ops.optimise_pallas import (
        _window_sum_lanes, _shift_left_zero, _floor_div_exact)
    from archive_pdf_tools_tpu.ops.threshold_pallas import RB

    def make_kernel(h, w, wpp, window, k, R, radius, pre, k2, kb):
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

            if ablate == 'passthru':
                # input DMA + output store + grid bookkeeping only
                out_ref[...] = img_ref[...].astype(jnp.uint8)
                return

            base = s * RB
            b0 = base % k2
            if ablate == 'u8ring':
                # doubled ring writes kept, but u8 instead of f32:
                # isolates ring write BANDWIDTH from conversion cost
                rows8 = img_ref[...].astype(jnp.uint8)
                blur_ring[pl.ds(b0 % kb, RB)] = rows8
                blur_ring[pl.ds((b0 + RB) % kb, RB)] = rows8
                out_ref[...] = rows8
                return

            rows = img_ref[...].astype(jnp.int32).astype(jnp.float32)
            in_ring[pl.ds(b0, RB)] = rows
            in_ring[pl.ds(b0 + k2, RB)] = rows

            if ablate == 'machinery':
                out_ref[...] = img_ref[...].astype(jnp.uint8)
                return

            whor = whor_ref[0]
            bs0 = base - pre
            tap_blk = in_ring[pl.ds(bs0 % k2, taps + RB - 1)]

            for j in range(RB):
                bs = bs0 + j

                @pl.when(jnp.logical_and(bs >= 0, bs < h))
                def _(bs=bs, j=j):
                    if ablate in ('no_vmac', 'no_blur'):
                        vrow = tap_blk[j + radius]
                    else:
                        vrow = whor[:, radius:radius + 1] \
                            * tap_blk[j + radius]
                        for t in range(radius):
                            pair = tap_blk[j + t] \
                                + tap_blk[j + 2 * radius - t]
                            vrow = vrow + whor[:, t:t + 1] * pair

                    if ablate in ('no_hmac', 'no_blur'):
                        brow = vrow
                    else:
                        brow = whor[:, radius:radius + 1] * vrow
                        for t in range(radius):
                            sh = radius - t
                            pair = jnp.roll(vrow, sh, axis=-1) + \
                                jnp.roll(vrow, -sh, axis=-1)
                            brow = brow + whor[:, t:t + 1] * pair

                    lanes = jax.lax.broadcasted_iota(
                        jnp.int32, brow.shape, 1)
                    brow = jnp.roll(brow, -radius, axis=-1)
                    b_u8 = jnp.where(lanes < w, brow.astype(jnp.int32), 0)
                    b_u8 = jnp.clip(b_u8, 0, 255)

                    blur_ring[pl.ds(bs % kb, 1)] = \
                        b_u8[None].astype(jnp.uint8)
                    colsum[...] = colsum[...] + b_u8
                    colsumsq[...] = colsumsq[...] + b_u8 * b_u8

                rem = bs - window

                @pl.when(jnp.logical_and(rem >= 0, rem < h))
                def _(rem=rem):
                    old = blur_ring[pl.ds(rem % kb, 1)][0] \
                        .astype(jnp.int32)
                    colsum[...] = colsum[...] - old
                    colsumsq[...] = colsumsq[...] - old * old

                y = bs - u

                @pl.when(jnp.logical_and(y >= 0, y < h))
                def _(y=y, j=j):
                    if ablate == 'no_emit':
                        out_ref[pl.ds(j, 1)] = \
                            blur_ring[pl.ds(y % kb, 1)]
                        return
                    px = blur_ring[pl.ds(y % kb, 1)][0] \
                        .astype(jnp.int32).astype(jnp.float32)
                    s_win = _shift_left_zero(
                        _window_sum_lanes(colsum[...], window,
                                          zero_beyond=w), u, wpp)
                    q_win = _shift_left_zero(
                        _window_sum_lanes(colsumsq[...], window,
                                          zero_beyond=w), u, wpp)
                    lanes = jax.lax.broadcasted_iota(
                        jnp.int32, px.shape, 1)
                    cols_in = (jnp.minimum(lanes + u, w - 1)
                               - jnp.maximum(lanes - o, -1))
                    rows_in = (jnp.minimum(y + u, h - 1)
                               - jnp.maximum(y - o, -1))
                    cnt = jnp.maximum(rows_in * cols_in, 1)
                    cnt_f = cnt.astype(jnp.float32)
                    mean = jnp.floor(s_win.astype(jnp.float32) / cnt_f)
                    ex2 = _floor_div_exact(q_win, cnt) \
                        .astype(jnp.float32)
                    var = ex2 - mean * mean
                    kf = jnp.float32(k)
                    k2f = kf * kf / jnp.float32(R) / jnp.float32(R)
                    t = px + mean * (kf - 1.0)
                    rhs = mean * mean * k2f * var
                    ink = jnp.logical_or(t <= 0.0, t * t <= rhs)
                    out_ref[pl.ds(j, 1)] = \
                        jnp.where(ink, 1, 0)[None].astype(jnp.uint8)

        return kernel

    @functools.partial(jax.jit, static_argnames=('window', 'radius'))
    def run(img, weights, window, radius):
        b, h, w = img.shape
        u = window // 2
        taps = 2 * radius + 1
        wpp = -(-(w + max(2 * radius, window // 2)) // 128) * 128
        pre = 2 * radius + ((-(2 * radius + u)) % RB)
        steps = -(-(pre + h + u) // RB)
        k2 = -(-(pre + RB) // RB) * RB
        kb = -(-(window + 2 * RB) // RB) * RB
        xp = jnp.pad(img, ((0, 0), (radius, radius),
                           (radius, radius)), mode='symmetric')
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wpp - (w + 2 * radius))))
        xp = jnp.transpose(xp, (1, 0, 2))
        xp = jnp.pad(xp, ((0, steps * RB - xp.shape[0]), (0, 0), (0, 0)))
        whor = jnp.zeros((b, 128), jnp.float32).at[:, :taps].set(weights)
        whor = jnp.broadcast_to(whor[None], (1, b, 128))
        off = (pre + u) // RB
        out_blocks = steps - off
        out = pl.pallas_call(
            make_kernel(h, w, wpp, window, 0.34, 128.0, radius,
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
                pltpu.VMEM((2 * k2, b, wpp), jnp.float32),
                pltpu.VMEM((kb, b, wpp), jnp.uint8),
                pltpu.VMEM((b, wpp), jnp.int32),
                pltpu.VMEM((b, wpp), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp, whor)
        return jnp.transpose(out[:h], (1, 0, 2))[:, :, :w]

    return run


def main():
    import jax

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = 3300, 2550
    window = 101
    radius = 4

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    img = jax.device_put(img)
    from scipy import ndimage  # noqa: F401  (parity of env with bench)
    taps = np.zeros((batch, 2 * radius + 1), np.float32)
    g = np.exp(-0.5 * (np.arange(-radius, radius + 1) / 1.5) ** 2)
    taps[:] = (g / g.sum()).astype(np.float32)
    taps = jax.device_put(taps)

    variants = ('full', 'no_emit', 'no_hmac', 'no_vmac', 'no_blur',
                'machinery', 'u8ring', 'passthru')
    runs = {v: [] for v in variants}
    fns = {v: _build(v) for v in variants}
    for v in variants:
        out = fns[v](img, taps, window, radius)
        jax.block_until_ready(out)
        _ = np.asarray(out.ravel()[:1])
        print('%9s compiled' % v, flush=True)
    for r in range(reps):
        for v in variants:
            t0 = time.perf_counter()
            out = fns[v](img, taps, window, radius)
            jax.block_until_ready(out)
            _ = np.asarray(out.ravel()[:1])
            runs[v].append(time.perf_counter() - t0)
    for v in variants:
        t = sorted(runs[v])
        print('%9s  best %6.1f ms  median %6.1f ms' % (
            v, t[0] * 1e3, t[len(t) // 2] * 1e3), flush=True)


if __name__ == '__main__':
    main()
