#!/usr/bin/env python3
"""Warm-pass phase breakdown of recode() on the FROZEN realistic corpus
(the corpus BENCH_E2E.json measures).  Cold run for compiles, then N
timed warm runs printing recode's own timing summary plus the Tier-1
phase stats — the attribution tool for the 8-page e2e gap vs the
64-page steady state (r4: 1.82 vs 0.85 s/page at the same HEAD).

Usage: python tools/e2e_realistic_profile.py [n_warm]
"""
import os
import sys
import tempfile
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')
os.environ['APT_T1_STATS'] = '1'
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from tools.e2e_bench import make_realistic_book
    from archive_pdf_tools_tpu.pipeline.recode import recode
    from archive_pdf_tools_tpu.codecs import jp2tpu

    glob_pat, hocr, sha = make_realistic_book()
    tmp = tempfile.mkdtemp(prefix='e2e_real_prof_')
    n_pages = 8

    def run(tag):
        jp2tpu.T1_STATS.clear()
        t0 = time.perf_counter()
        res = recode(from_imagestack=glob_pat, hocr_file=hocr,
                     out_pdf=os.path.join(tmp, 'out.pdf'), dpi=400,
                     jbig2=True, bg_downsample=3,
                     jpeg2000_implementation='tpu',
                     bg_compression_flags=['ratio:500'],
                     fg_compression_flags=['ratio:750'],
                     verbose=True)
        dt = time.perf_counter() - t0
        print('%s: %.2f s/page  ratio %.1f' % (
            tag, dt / n_pages, res.get('compression_ratio', -1)))
        print('  t1 stats:', {k: (round(v[0], 2), v[1])
                              for k, v in sorted(jp2tpu.T1_STATS.items())})
        sys.stdout.flush()

    run('cold')
    for i in range(n_warm):
        run('warm%d' % i)


if __name__ == '__main__':
    main()
