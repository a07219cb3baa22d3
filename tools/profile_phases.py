#!/usr/bin/env python3
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
"""Per-phase TPU timing of the MRC decompose step."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
import numpy as np
import jax

from archive_pdf_tools_tpu.mrc import decompose as D
from archive_pdf_tools_tpu.ops.optimise import optimise
from archive_pdf_tools_tpu.ops.denoise import (fast_mask_denoise_exact,
                                               fast_mask_denoise_jacobi)
from bench import main as _  # noqa: F401  (path setup)


def sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]
    return x


def timeit(name, fn, *args, iters=2, **kw):
    out = fn(*args, **kw)
    sync(out)
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    print('%-28s %8.1f ms' % (name, best * 1000))
    return out


def main():
    batch, h, w = int(os.environ.get('B', '8')), 3300, 2550
    window = 101
    n_seg = 512
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    line_id = np.zeros((batch, h, w), np.int32)
    boxes = np.zeros((4, n_seg), np.int32)
    boxes[1, 0] = 1
    boxes[3, 0] = 1
    lid = 0
    for b in range(batch):
        for i in range(40):
            lid += 1
            t = 30 + i * (h - 80) // 40
            line_id[b, t:t + 50, 40:w - 40] = lid
            boxes[:, lid] = (t, t + 50, 40, w - 40)
    use_plain = np.zeros(n_seg, bool)
    use_plain[1:lid + 1] = True
    use_inv = np.zeros(n_seg, bool)

    gray = jax.device_put(images)
    line_id_d = jax.device_put(line_id)
    boxes_d = jax.device_put(boxes)

    thres, thres_inv, ones, ones_inv, size = timeit(
        'hocr_line_thresholds', D.hocr_line_thresholds,
        gray, line_id_d, boxes_d, window, n_seg)
    blurred, sig = timeit('global_threshold_input',
                          D.global_threshold_input, gray)
    gmask = timeit('global_threshold', D.global_threshold, blurred, window)
    mask = timeit('compose_mask', D.compose_mask, thres, thres_inv,
                  jax.device_put(use_plain), jax.device_put(use_inv),
                  line_id_d, gmask)
    timeit('denoise_exact', fast_mask_denoise_exact, mask, 4, 2)
    timeit('denoise_jacobi', fast_mask_denoise_jacobi, mask, 4, 2)
    mask_dn = fast_mask_denoise_jacobi(mask, 4, 2)
    timeit('optimise_fg_n3', optimise, mask_dn, gray, 3)
    timeit('optimise_bg_n10', optimise, ~np.asarray(mask_dn), gray, 10)


if __name__ == '__main__':
    main()
