#!/usr/bin/env python3
"""Chip A/B: small-document batch split (APT_SPLIT_SMALL) on the frozen
realistic corpus.

With every page in one batch, the loader's decode+upload and the device
decompose/drain cannot overlap any host Tier-1/JBIG2 work; the split
(pipeline/recode.py) halves single-batch documents so the second half's
link+device time hides behind the first half's host encode.  This
harness interleaves the two arms in ONE process (same caches, same
tunnel weather) and reports warm s/page per arm.

Usage: python tools/split_ab.py [reps]
"""
import os
import sys
import tempfile
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from tools.e2e_bench import make_realistic_book
    from archive_pdf_tools_tpu.pipeline.recode import recode

    glob_pat, hocr, sha = make_realistic_book()
    tmp = tempfile.mkdtemp(prefix='split_ab_')
    n_pages = 8

    def run(tag):
        t0 = time.perf_counter()
        res = recode(from_imagestack=glob_pat, hocr_file=hocr,
                     out_pdf=os.path.join(tmp, 'out.pdf'), dpi=400,
                     jbig2=True, bg_downsample=3,
                     jpeg2000_implementation='tpu',
                     bg_compression_flags=['ratio:500'],
                     fg_compression_flags=['ratio:750'])
        dt = (time.perf_counter() - t0) / n_pages
        print('%-8s %.3f s/page  ratio %.1f' % (
            tag, dt, res.get('compression_ratio', -1)), flush=True)
        return dt

    print('corpus', sha)
    # cold pass per arm (compiles both shapes), then interleaved reps
    for arm in ('1', '0'):
        os.environ['APT_SPLIT_SMALL'] = arm
        run('cold-%s' % arm)
    results = {'1': [], '0': []}
    for _ in range(reps):
        for arm in ('1', '0'):
            os.environ['APT_SPLIT_SMALL'] = arm
            results[arm].append(run('split=%s' % arm))
    for arm in ('1', '0'):
        r = results[arm]
        print('ARM split=%s: best %.3f  all %s'
              % (arm, min(r), [round(x, 3) for x in r]))


if __name__ == '__main__':
    main()
