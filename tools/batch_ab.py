#!/usr/bin/env python3
"""Same-process interleaved A/B of recode() batch_pages on the e2e book.

The 8-page book at batch_pages=8 is ONE batch: the loader's per-page
device uploads, the device decompose/transform, and the host Tier-1 all
serialize.  Smaller batches pipeline those phases (loader uploads batch
k+1 while the pool encodes batch k).  This harness measures warm wall
s/page for each candidate batch size, interleaved ABAB so tunnel drift
cancels.

Usage: python tools/batch_ab.py [reps] [sizes...]   (default 3 reps, 8 4 2)
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sizes = [int(s) for s in sys.argv[2:]] or [8, 4, 2]
    from tools.e2e_bench import make_book
    from archive_pdf_tools_tpu.pipeline.recode import recode

    tmp = tempfile.mkdtemp(prefix='batch_ab_')
    print('building book in %s ...' % tmp, flush=True)
    glob_pat, hocr_path = make_book(tmp)

    def run(bp, tag, verbose=False):
        t0 = time.time()
        recode(from_imagestack=glob_pat, hocr_file=hocr_path,
               out_pdf=os.path.join(tmp, 'out_%s.pdf' % tag), dpi=400,
               jbig2=True, bg_downsample=3,
               jpeg2000_implementation='tpu',
               bg_compression_flags=['ratio:500'],
               fg_compression_flags=['ratio:750'],
               batch_pages=bp, verbose=verbose)
        dt = (time.time() - t0) / 8.0
        print('  bp=%d %s: %.2f s/page' % (bp, tag, dt), flush=True)
        return dt

    # cold compile pass per size (remote compile service; slow once)
    for bp in sizes:
        run(bp, 'cold%d' % bp)

    results = {bp: [] for bp in sizes}
    for r in range(reps):
        for bp in sizes:
            results[bp].append(run(bp, 'r%d' % r, verbose=(r == reps - 1)))
    for bp in sizes:
        v = sorted(results[bp])
        print('bp=%d: best %.2f median %.2f all %s'
              % (bp, v[0], v[len(v) // 2],
                 ' '.join('%.2f' % x for x in results[bp])), flush=True)


if __name__ == '__main__':
    main()
