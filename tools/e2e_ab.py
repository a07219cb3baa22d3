#!/usr/bin/env python3
"""Interleaved same-process e2e A/B over an env knob.

Usage: python tools/e2e_ab.py ENVVAR A_VALUE B_VALUE [reps]
  e.g.  python tools/e2e_ab.py APT_JP2_PACK4 1 0 2

Runs recode() on the 8-page synthetic book alternating the env value
ABAB..., printing warm s/page per run plus T1 stats deltas.  Only
same-process interleaved numbers are comparable on this box (the
tunnel drifts on ~10-minute scales)."""
import os
import sys
import tempfile
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')
os.environ.setdefault('APT_T1_STATS', '1')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    var, a_val, b_val = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    from tools.e2e_bench import make_book
    from archive_pdf_tools_tpu.pipeline.recode import recode
    from archive_pdf_tools_tpu.codecs.jp2tpu import T1_STATS

    tmp = tempfile.mkdtemp(prefix='e2e_ab_')
    glob_pat, hocr = make_book(tmp)

    def run(tag, val):
        os.environ[var] = val
        before = dict(T1_STATS)
        t0 = time.perf_counter()
        res = recode(
            from_imagestack=glob_pat, hocr_file=hocr,
            out_pdf=os.path.join(tmp, 'out.pdf'), dpi=400,
            jbig2=True, bg_downsample=3,
            jpeg2000_implementation='tpu',
            bg_compression_flags=['ratio:500'],
            fg_compression_flags=['ratio:750'])
        dt = (time.perf_counter() - t0) / 8.0
        delta = {k: (round(v[0] - before.get(k, (0, 0))[0], 2),
                     v[1] - before.get(k, (0, 0))[1])
                 for k, v in T1_STATS.items()}
        print('%s=%s: %.2f s/page  ratio %.1f  stats %s'
              % (var, val, dt, res.get('compression_ratio', -1), delta),
              flush=True)
        return dt

    # one warmup per arm (compiles + caches)
    run('warmup-a', a_val)
    run('warmup-b', b_val)
    times = {a_val: [], b_val: []}
    for _ in range(reps):
        times[a_val].append(run('a', a_val))
        times[b_val].append(run('b', b_val))
    print('A %s=%s best %.2f all %s' % (var, a_val, min(times[a_val]),
                                        [round(t, 2) for t in
                                         times[a_val]]), flush=True)
    print('B %s=%s best %.2f all %s' % (var, b_val, min(times[b_val]),
                                        [round(t, 2) for t in
                                         times[b_val]]), flush=True)


if __name__ == '__main__':
    main()
