#!/usr/bin/env python3
"""Same-process A/B of the paste-kernel stream layouts.

Times paste_crops_pallas with the separate-stream PG=4 form and the
combined-polarity PG=8 form (APT_PASTE=combined8) interleaved on
bench-shaped inputs, so box noise hits both sides equally.

Usage: python tools/paste_ab.py [batch] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')

import numpy as np


def sync(x):
    import jax
    jax.block_until_ready(x)
    _ = np.asarray(x.ravel()[:1])


def main():
    import jax
    import jax.numpy as jnp
    from archive_pdf_tools_tpu.ops.paste_pallas import (build_paste_plan,
                                                        paste_crops_pallas)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = 3300, 2550
    lines_per_page = 40
    n_seg = -(-(batch * lines_per_page + 1) // 64) * 64

    rng = np.random.default_rng(0)
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

    mh = 64                                  # bench max_line_h bucket
    wpp = -(-w // 128) * 128
    ct = jax.device_put((rng.random((n_seg, mh, wpp)) < 0.2)
                        .astype(np.uint8))
    ci = jax.device_put((rng.random((n_seg, mh, wpp)) < 0.2)
                        .astype(np.uint8))
    gmask = jax.device_put(rng.random((batch, h, w)) < 0.05)

    cfgs = {}
    for name, (comb, pg) in (('pg4', (False, 4)), ('comb8', (True, 8))):
        plan = build_paste_plan(boxes, pages_vec, selector, batch, pg=pg)
        args = tuple(jax.device_put(jnp.asarray(plan[k])) for k in
                     ('li', 't', 'b', 'l', 'r', 'sel', 'gpage', 'gfirst'))
        cfgs[name] = (comb, args)

    outs = {}
    runs = {name: [] for name in cfgs}
    for name, (comb, args) in cfgs.items():
        out = paste_crops_pallas(ct, ci, *args, gmask, combined=comb)
        sync(out)
        outs[name] = np.asarray(out[:, ::37, ::41])
    assert (outs['pg4'] == outs['comb8']).all(), 'VARIANTS DISAGREE'
    print('variants agree on sampled output', flush=True)

    for r in range(reps):
        for name, (comb, args) in cfgs.items():
            t0 = time.perf_counter()
            out = paste_crops_pallas(ct, ci, *args, gmask, combined=comb)
            sync(out)
            runs[name].append(time.perf_counter() - t0)
    for name in cfgs:
        v = sorted(runs[name])
        print('%8s  best %.1f ms  median %.1f ms' % (
            name, v[0] * 1e3, v[len(v) // 2] * 1e3), flush=True)


if __name__ == '__main__':
    main()
