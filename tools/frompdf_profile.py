#!/usr/bin/env python3
"""Stage breakdown of the --from-pdf recode flow (BASELINE config 4).

bench.py r5 measured from-pdf at ~7.5 s/page warm vs ~1.1 for the
same pages via --from-imagestack — this harness shows where the gap
lives: src-PDF image extraction/decode, per-page DPI resolution, or
the decompose/encode pipeline (whose shapes are shared with e2e).

Usage: python tools/frompdf_profile.py [n_pages] [reps]
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    import shutil
    import tempfile
    from glob import glob
    from tools.e2e_bench import make_realistic_book
    from archive_pdf_tools_tpu.pipeline.recode import recode

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    glob_pat, hocr, sha = make_realistic_book()
    src_pages = sorted(glob(glob_pat))[:n_pages]
    tmp = tempfile.mkdtemp(prefix='frompdf_prof_')
    for i, p in enumerate(src_pages):
        shutil.copy(p, os.path.join(tmp, 'page_%04d.png' % i))
    with open(hocr, encoding='utf-8') as fp:
        text = fp.read()
    head, sep, rest = text.partition('<div class="ocr_page"')
    pages_markup = (sep + rest).rsplit('</body>', 1)[0]
    parts = pages_markup.split('<div class="ocr_page"')[1:n_pages + 1]
    tail = '</body>' + text.rsplit('</body>', 1)[1]
    sub_hocr = os.path.join(tmp, 'sub.hocr')
    with open(sub_hocr, 'w', encoding='utf-8') as fp:
        fp.write(head + ''.join('<div class="ocr_page"' + p
                                for p in parts) + tail)

    # scanned-style source: one JPEG per page (the typical config-4
    # input); MRC-style source: bg+fg+mask per page, which forces the
    # multi-image full-page composite through the Python rasterizer
    from bench import make_scanned_pdf
    src_pdf = os.path.join(tmp, 'src.pdf')
    make_scanned_pdf([os.path.join(tmp, 'page_%04d.png' % i)
                      for i in range(n_pages)], src_pdf)
    mrc_pdf = os.path.join(tmp, 'src_mrc.pdf')
    recode(from_imagestack=os.path.join(tmp, 'page_*.png'),
           hocr_file=sub_hocr, out_pdf=mrc_pdf, dpi=400,
           mrc_image_format='jpeg', mask_compression='ccitt',
           bg_compression_flags=['-S40'], fg_compression_flags=['-S30'])
    print('src.pdf %d bytes, src_mrc.pdf %d bytes, corpus %s' %
          (os.path.getsize(src_pdf), os.path.getsize(mrc_pdf), sha),
          flush=True)

    for tag, kw in (('from-pdf(scan)', dict(from_pdf=src_pdf)),
                    ('from-pdf(mrc) ', dict(from_pdf=mrc_pdf)),
                    ('imagestack    ', dict(
                        from_imagestack=os.path.join(tmp, 'page_*.png')))):
        for r in range(reps + 1):
            t0 = time.perf_counter()
            recode(out_pdf=os.path.join(tmp, 'out.pdf'),
                   hocr_file=sub_hocr, dpi=400, jbig2=True,
                   bg_downsample=3, jpeg2000_implementation='tpu',
                   bg_compression_flags=['ratio:500'],
                   fg_compression_flags=['ratio:750'],
                   verbose=(r == reps), **kw)
            print('%s run %d: %.2f s/page' %
                  (tag, r, (time.perf_counter() - t0) / n_pages),
                  flush=True)


if __name__ == '__main__':
    main()
