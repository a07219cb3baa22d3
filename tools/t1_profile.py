#!/usr/bin/env python3
"""Per-band Tier-1 time profile on the frozen realistic corpus.

The round-4 e2e A/B put T1 'initial' at ~8.0 s of the 9.3 s warm wall
(86%) — before optimizing, find WHERE inside T1 the time goes: which
bands (level/orient/planes), zero-block skips vs coded blocks, and how
much of the stage is PCRD/assembly vs the native block coder.

Host-only (APT_PLATFORM=cpu, native transform).
Usage: python tools/t1_profile.py
"""
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault('APT_PLATFORM', 'cpu')
os.environ['APT_JP2_DEVICE'] = 'native'
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    from glob import glob
    from PIL import Image
    from tools.e2e_bench import make_realistic_book
    from archive_pdf_tools_tpu.codecs import jp2tpu as J

    pat, _hocr, sha = make_realistic_book()
    files = sorted(glob(pat))[:2]
    fg, bg = [], []
    for f in files:
        with Image.open(f) as im:
            a = np.asarray(im.convert('L'))
        fg.append(a)
        h3, w3 = a.shape[0] // 3 * 3, a.shape[1] // 3 * 3
        bg.append(a[:h3, :w3].reshape(h3 // 3, 3, w3 // 3, 3)
                  .mean((1, 3)).astype(np.uint8))

    jobs = []
    os.environ['APT_JP2_PACK4'] = '1'
    for name, arr, ratio in [('fg', fg[0], 750), ('fg', fg[1], 750),
                             ('bg', bg[0], 500), ('bg', bg[1], 500)]:
        pages, meta = J.transform_jp2_batch(arr[None], ratio=ratio)
        jobs.append((name, pages[0], meta, ratio))

    # full-encode wall time for scale (T1 + PCRD + rescue + assembly)
    t0 = time.perf_counter()
    for name, q, meta, ratio in jobs:
        J.encode_jp2_from_qbands(q, meta, ratio=ratio, workers=1,
                                 page_idx=0)
    full_dt = time.perf_counter() - t0

    # instrumented pass: rebuild the bands exactly as _host_encode does,
    # bucket every native _encode_block call by band identity
    buckets = defaultdict(lambda: [0, 0, 0.0, 0])   # calls, zeros, t, px
    key_of = {}
    orig = J._encode_band_blocks

    def timed(lib, band, caps=None):
        t0 = time.perf_counter()
        out = orig(lib, band, caps)
        dt = time.perf_counter() - t0
        b = buckets[key_of.get(id(band.arr), ('?',) * 4)]
        b[0] += sum(1 for cb in band.blocks if cb.npasses)
        b[1] += sum(1 for cb in band.blocks if not cb.npasses)
        b[2] += dt
        b[3] += band.arr.size
        return out

    J._encode_band_blocks = timed
    try:
        t1_total = 0.0
        for name, qbands, meta, ratio in jobs:
            levels = meta['levels']
            layout = J.band_layout(levels, meta['base_delta'])
            shifts = [int(s) for s in (meta.get('shifts')
                                       or [0] * len(layout))]
            kplanes = meta.get('kplanes') or {}

            def adjusted(k):
                orient, level, gain, eps, mu, step = layout[k]
                s = shifts[k]
                return (orient, level, gain, eps - s, mu,
                        step * (1 << s))

            comp_bands = [[J._Band(*adjusted(k), q)
                           for k, q in enumerate(qb)] for qb in qbands]
            for bands in comp_bands:
                for k, K in kplanes.items():
                    bands[k].plane_budget = K
            for bands in comp_bands:
                for band in bands:
                    key_of[id(band.arr)] = (name, band.level,
                                            band.orient,
                                            band.plane_budget or 0)
            target = int(meta['h'] * meta['w'] * meta['ncomp']
                         / float(ratio))
            allb = [b for bands in comp_bands for b in bands]
            t0 = time.perf_counter()
            J._t1_all(allb, J._get_lib(), 1, target_bytes=target)
            t1_total += time.perf_counter() - t0
    finally:
        J._encode_band_blocks = orig

    print('corpus %s   full encode (4 jobs) %.2f s   '
          'instrumented _t1_all sum %.2f s' % (sha, full_dt, t1_total))
    print('%-3s %-3s %-3s %-4s %7s %6s %9s %9s %8s'
          % ('lyr', 'lvl', 'ori', 'K', 'coded', 'zeros',
             't1_ms', 'ms/blk', 'px'))
    rows = sorted(buckets.items(),
                  key=lambda kv: -kv[1][2])
    coded_sum = sum(v[2] for _, v in rows)
    for (lyr, lvl, ori, K), (calls, zeros, t, px) in rows:
        if calls == 0 and zeros == 0:
            continue
        print('%-3s %-3s %-3s %-4s %7d %6d %9.1f %9.3f %8d'
              % (lyr, lvl, ori, K, calls, zeros, t * 1e3,
                 t * 1e3 / max(1, calls), px))
    print('band-call coder time total %.2f s  (%.0f%% of _t1_all; '
          'the rest is cap setup + PCRD hull bookkeeping)' % (coded_sum, 100 * coded_sum
                                 / max(1e-9, t1_total)))


if __name__ == '__main__':
    main()
