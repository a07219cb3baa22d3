#!/usr/bin/env python3
"""Same-process fused-step A/B of the despeckle prefix implementations.

Compiles mrc_full_step_pallas twice (despeckle_bitplane False/True) and
interleaves timed reps, so box noise and compile-cache state hit both
sides equally — the multi-process bench.py ABAB pays minutes of data
prep + transfer per sample and can't amortize it.

Usage: python tools/fused_ab.py [batch] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')

import numpy as np


def sync(out):
    import jax
    jax.block_until_ready(out)
    _ = np.asarray(out[0][:, -1, -1])


def main():
    import jax
    from archive_pdf_tools_tpu.mrc.step import mrc_full_step_pallas
    from archive_pdf_tools_tpu.ops.paste_pallas import build_paste_plan
    from archive_pdf_tools_tpu.mrc.decompose import pick_blur_radius

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = 3300, 2550
    window = 101
    lines_per_page = 40
    n_seg = -(-(batch * lines_per_page + 1) // 64) * 64

    rng = np.random.default_rng(0)
    images = np.full((batch, h, w), 235, np.uint8)
    for b in range(batch):
        ys = rng.integers(20, h - 60, size=400)
        xs = rng.integers(20, w - 400, size=400)
        for y, x in zip(ys, xs):
            images[b, y:y + 8, x:x + int(rng.integers(80, 380))] = 40
    noise = rng.standard_normal((batch, h, w), dtype=np.float32) * 8
    images = np.clip(images.astype(np.float32) + noise, 0, 255) \
        .astype(np.uint8)

    boxes = np.zeros((4, n_seg), np.int32)
    boxes[1, 0] = 1
    boxes[3, 0] = 1
    pages_vec = np.zeros((n_seg,), np.int32)
    lid = 0
    for b in range(batch):
        for i in range(lines_per_page):
            lid += 1
            t = 30 + i * (h - 80) // lines_per_page
            boxes[:, lid] = (t, t + 50, 40, w - 40)
            pages_vec[lid] = b
    selector = np.zeros(n_seg, np.int32)
    selector[1:lid + 1] = 1

    dev = jax.device_put
    args = tuple(dev(a) for a in (images, boxes, pages_vec, selector))
    plan = build_paste_plan(boxes, pages_vec, selector, batch)
    plan_dev = tuple(dev(plan[k]) for k in
                     ('li', 't', 'b', 'l', 'r', 'sel', 'gpage', 'gfirst'))
    radius = pick_blur_radius(args[0])

    def step(bp):
        return mrc_full_step_pallas(*args, window=window, rgb=False,
                                    denoise='fast', max_line_h=64,
                                    blur_radius=radius,
                                    paste_plan=plan_dev,
                                    despeckle_bitplane=bp)

    runs = {False: [], True: []}
    for bp in (False, True):
        t0 = time.perf_counter()
        sync(step(bp))
        print('%8s compile+warm %.1f s' % (bp, time.perf_counter() - t0),
              flush=True)
    for r in range(reps):
        for bp in (False, True):
            t0 = time.perf_counter()
            sync(step(bp))
            runs[bp].append(time.perf_counter() - t0)
    for bp in (False, True):
        v = sorted(runs[bp])
        best = v[0]
        print('%8s  best %.3f s (%.1f pages/s)  median %.3f s' % (
            'bitplane' if bp else 'tables',
            best, batch / best, v[len(v) // 2]), flush=True)


if __name__ == '__main__':
    main()
