#!/usr/bin/env python3
"""Same-process A/B of the despeckle in-row prefix implementations.

Times fast_mask_denoise_pallas with the packed-table and bit-plane
prefixes interleaved (rep pairs), on bench-shaped masks, so box noise
hits both sides equally.  Also the first real-chip compile check of
the bit-plane path's in-kernel MXU matmuls.

Usage: python tools/despeckle_ab.py [batch] [reps]
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
    from archive_pdf_tools_tpu.ops.denoise_pallas import \
        fast_mask_denoise_pallas

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = 3300, 2550
    rng = np.random.default_rng(0)
    base = rng.random((batch, h, w)) < 0.12
    mask = jax.device_put(base)

    runs = {True: [], False: []}
    outs = {}
    for bp in (False, True):
        out = fast_mask_denoise_pallas(mask, 4, 2, bitplane=bp)
        sync(out)
        outs[bp] = np.asarray(out[:, ::37, ::41])   # sampled readback
    assert (outs[True] == outs[False]).all(), 'VARIANTS DISAGREE'
    print('variants agree on sampled output', flush=True)

    for r in range(reps):
        for bp in (False, True):
            t0 = time.perf_counter()
            out = fast_mask_denoise_pallas(mask, 4, 2, bitplane=bp)
            sync(out)
            runs[bp].append(time.perf_counter() - t0)
    for bp in (False, True):
        v = sorted(runs[bp])
        print('%8s  best %.1f ms  median %.1f ms' % (
            'bitplane' if bp else 'tables',
            v[0] * 1e3, v[len(v) // 2] * 1e3), flush=True)


if __name__ == '__main__':
    main()
