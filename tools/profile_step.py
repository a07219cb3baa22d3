#!/usr/bin/env python3
"""Per-stage timing of the flagship Pallas step on the real chip.

Times each sub-kernel of mrc_full_step_pallas separately (same shapes
as bench.py) so perf work targets the biggest bucket. Not a test; a
dev tool. Usage: python tools/profile_step.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.block_until_ready(leaf)
    _ = np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=3, **kw):
    out = fn(*args, **kw)
    sync(out)
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp
    from archive_pdf_tools_tpu.mrc import decompose as D
    from archive_pdf_tools_tpu.ops.lines_pallas import line_thresholds_pallas
    from archive_pdf_tools_tpu.ops.optimise_pallas import optimise_pallas
    from archive_pdf_tools_tpu.ops.denoise_pallas import fast_mask_denoise_pallas
    from bench import main as _  # noqa: F401  (reuse nothing; shapes inline)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
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
    noise = rng.normal(0, 8, (batch, h, w))
    images = np.clip(images.astype(np.float32) + noise, 0, 255).astype(np.uint8)

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

    gray = jax.device_put(images)
    boxes_d = jax.device_put(boxes)
    pages_d = jax.device_put(pages_vec)
    sel_d = jax.device_put(selector)

    from archive_pdf_tools_tpu.mrc.decompose import pick_blur_radius
    radius = pick_blur_radius(gray)
    print(f'batch={batch} radius={radius}', flush=True)

    lines_f = jax.jit(lambda g, bx, pg: line_thresholds_pallas(
        g, bx, pg, window, max_line_h=64))
    t, (crops_t, crops_i, _o, _oi) = timeit(lines_f, gray, boxes_d, pages_d)
    print(f'lines      {t*1e3:8.1f} ms', flush=True)

    gthr_f = jax.jit(lambda g: D.global_threshold_fused_static(
        g, window, radius))
    t, (gmask, _s) = timeit(gthr_f, gray)
    print(f'blur+thr   {t*1e3:8.1f} ms', flush=True)

    from archive_pdf_tools_tpu.ops.paste_pallas import (build_paste_plan,
                                                        paste_crops_pallas)
    plan = build_paste_plan(boxes, pages_vec, selector, batch)
    plan_d = tuple(jax.device_put(plan[k]) for k in
                   ('li', 't', 'b', 'l', 'r', 'sel', 'gpage', 'gfirst'))
    paste_f = jax.jit(lambda ct, ci, gm: paste_crops_pallas(
        ct, ci, *plan_d, gm))
    t, mask = timeit(paste_f, crops_t, crops_i, gmask)
    print(f'paste      {t*1e3:8.1f} ms', flush=True)

    den_f = jax.jit(lambda m: fast_mask_denoise_pallas(m, 4, 2))
    t, mask = timeit(den_f, mask)
    print(f'despeckle  {t*1e3:8.1f} ms', flush=True)

    fg_f = jax.jit(lambda m, im: optimise_pallas(m, im, 3))
    t, _fg = timeit(fg_f, mask, gray)
    print(f'fg n=3     {t*1e3:8.1f} ms', flush=True)

    bg_f = jax.jit(lambda m, im: optimise_pallas(jnp.logical_not(m), im, 10))
    t, _bg = timeit(bg_f, mask, gray)
    print(f'bg n=10    {t*1e3:8.1f} ms', flush=True)



if __name__ == '__main__':
    main()
