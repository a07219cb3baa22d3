#!/usr/bin/env python3
"""JBIG2 mode decision table (VERDICT r3 #7): generic region vs
symbol coding (exact / auto / lossy / refine) on the realistic e2e
corpus masks — size and encode time per mode.

Host-only: decompose runs on XLA-CPU (APT_PLATFORM=cpu), the JBIG2
encoder is the in-tree C++.  The decision this records: whether
--jbig2-symbol-coding should become the default for text masks.

Usage: python tools/jbig2_mode_ab.py [n_pages] [variant]
  variant: v1 (default) | repglyph (shared-letterform corpus arm,
  VERDICT r4 #7 — the case symbol coding is built for)
"""
import os
import sys
import time

os.environ.setdefault('APT_PLATFORM', 'cpu')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    variant = sys.argv[2] if len(sys.argv) > 2 else 'v1'
    from glob import glob
    from PIL import Image
    from tools.e2e_bench import make_realistic_book
    from archive_pdf_tools_tpu.inputs.hocr import (hocr_page_iterator,
                                                   hocr_page_to_word_data)
    from archive_pdf_tools_tpu.mrc.api import decompose_masks
    from archive_pdf_tools_tpu.codecs.jbig2 import (encode_jbig2,
                                                    decode_jbig2)

    pat, hocr, sha = make_realistic_book(variant=variant)
    files = sorted(glob(pat))[:n_pages]
    wds = [hocr_page_to_word_data(p)
           for p in hocr_page_iterator(hocr)][:n_pages]
    masks = []
    for f, wd in zip(files, wds):
        with Image.open(f) as im:
            arr = np.asarray(im.convert('L'))
        m, _ = decompose_masks([arr], [wd], dpi=400)
        masks.append(np.asarray(m)[0])
    print('corpus %s, %d pages %s' % (sha, len(masks), masks[0].shape),
          flush=True)

    modes = [('generic', dict()),
             ('symbol', dict(symbol_mode=True)),
             ('auto', dict(symbol_mode='auto')),
             ('lossy', dict(symbol_mode='lossy')),
             ('refine', dict(symbol_mode='refine'))]
    print('%-8s %10s %9s %9s' % ('mode', 'bytes', 's/page', 'lossless'))
    for name, kw in modes:
        total = 0
        t0 = time.perf_counter()
        lossless = True
        for m in masks:
            src = ~m if name == 'generic' else m
            data = encode_jbig2(src, embedded=True, **kw)
            total += len(data)
            if name in ('generic', 'symbol', 'refine'):
                dec = decode_jbig2(data, m.shape[1], m.shape[0])
                if not np.array_equal(dec, src):
                    lossless = False
        dt = (time.perf_counter() - t0) / len(masks)
        print('%-8s %10d %9.2f %9s' % (name, total, dt,
                                       lossless), flush=True)


if __name__ == '__main__':
    main()
