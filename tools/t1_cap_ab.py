#!/usr/bin/env python3
"""Host-only A/B of the T1 byte-cap policy on fixed pack4 qbands.

The caps exist to skip deep-plane T1 work PCRD will discard; with
pack4's plane budgets most bands are already shallow and the cap's
starved-block rescue can double-encode.  This times the full
_host_encode (T1 + allocation + assembly) per APT_T1_CAPS policy on
the SAME transformed data, interleaved ABAB, so the decision doesn't
ride the e2e harness's tunnel noise.

Usage: python tools/t1_cap_ab.py [reps] [variant]
"""
import os
import sys
import time

os.environ.setdefault('APT_PLATFORM', 'cpu')
os.environ['APT_JP2_DEVICE'] = 'native'
os.environ['APT_T1_STATS'] = '1'
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    variant = sys.argv[2] if len(sys.argv) > 2 else 'v1'
    from glob import glob
    from PIL import Image
    from tools.e2e_bench import make_realistic_book
    from archive_pdf_tools_tpu.codecs import jp2tpu as J

    pat, _hocr, sha = make_realistic_book(variant=variant)
    files = sorted(glob(pat))[:2]
    # fg-like: the realistic page itself (noisy text); bg-like: its 3x
    # box downsample
    fg = []
    bg = []
    for f in files:
        with Image.open(f) as im:
            a = np.asarray(im.convert('L'))
        fg.append(a)
        h3, w3 = a.shape[0] // 3 * 3, a.shape[1] // 3 * 3
        bg.append(a[:h3, :w3].reshape(h3 // 3, 3, w3 // 3, 3)
                  .mean((1, 3)).astype(np.uint8))

    jobs = []       # (qbands, meta, ratio)
    for arr, ratio in [(f, 750) for f in fg] + [(b, 500) for b in bg]:
        os.environ['APT_JP2_PACK4'] = '1'
        pages, meta = J.transform_jp2_batch(arr[None], ratio=ratio)
        jobs.append((pages[0], meta, ratio))

    def run(mode):
        os.environ['APT_T1_CAPS'] = mode
        before = {k: v for k, v in J.T1_STATS.items()}
        t0 = time.perf_counter()
        sizes = [len(J.encode_jp2_from_qbands(q, m, ratio=r, workers=1,
                                              page_idx=0))
                 for q, m, r in jobs]
        dt = time.perf_counter() - t0
        delta = {k: (round(v[0] - before.get(k, (0, 0))[0], 2),
                     v[1] - before.get(k, (0, 0))[1])
                 for k, v in J.T1_STATS.items()}
        return dt, sizes, delta

    for mode in ('auto', 'all', 'off'):
        run(mode)                       # warm page cache etc.
    times = {m: [] for m in ('auto', 'all', 'off')}
    sizes0 = None
    for _ in range(reps):
        for mode in ('auto', 'all', 'off'):
            dt, sizes, delta = run(mode)
            times[mode].append(dt)
            if sizes0 is None:
                sizes0 = sizes
            print('%-5s %6.2f s  sizes %s  %s' % (mode, dt, sizes,
                                                  delta), flush=True)
    print('corpus %s' % sha)
    for mode, ts in times.items():
        print('%-5s best %.2f s  median %.2f s'
              % (mode, min(ts), sorted(ts)[len(ts) // 2]), flush=True)


if __name__ == '__main__':
    main()
