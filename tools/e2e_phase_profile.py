#!/usr/bin/env python3
"""Host-phase wall-clock profile of the warm '-J tpu' e2e path.

Builds the same 8-page book as tools/e2e_bench.py, then times each
phase of one warm pass-2 SERIALLY (no thread pool) so the numbers are
attributable on this one-core box:

  decompose (device)   mask + fg/bg layers, device-resident
  mask fetch           packed-bit transfer + host unpack
  jp2 dispatch         batched DWT/quantize dispatch (async)
  qband drain          the device->host coefficient transfer (+ bytes)
  tier1 fg / bg        per-page host Tier-1 + rate + Tier-2
  mask jbig2           per-page native JBIG2 encode

Usage: python tools/e2e_phase_profile.py [n_pages]
"""
import os
import sys
import tempfile
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from tools.e2e_bench import make_book
    from PIL import Image
    import jax

    tmp = tempfile.mkdtemp(prefix='e2e_phase_')
    glob_pat, hocr = make_book(tmp, n_pages=n_pages)
    from glob import glob as _g
    files = sorted(_g(glob_pat))
    from archive_pdf_tools_tpu.inputs.hocr import (hocr_page_iterator,
                                                   hocr_page_to_word_data)
    word_datas = [hocr_page_to_word_data(p)
                  for p in hocr_page_iterator(hocr)]
    arrs = []
    for f in files:
        with Image.open(f) as im:
            arrs.append(np.asarray(im))

    from archive_pdf_tools_tpu.mrc.api import (decompose_masks,
                                               decompose_layers)
    from archive_pdf_tools_tpu.utils.backend import (pack_mask_bits,
                                                     unpack_mask_bits)
    from archive_pdf_tools_tpu.codecs.jp2tpu import (
        transform_jp2_batch_async, encode_jp2_from_qbands)
    from archive_pdf_tools_tpu.codecs.jbig2 import encode_jbig2

    def once(tag):
        print('--- %s ---' % tag, flush=True)
        t0 = time.perf_counter()

        def mark(name):
            nonlocal t0
            t1 = time.perf_counter()
            print('%-22s %7.0f ms' % (name, (t1 - t0) * 1000), flush=True)
            t0 = t1

        mask_dev, dev_imgs = decompose_masks(arrs, word_datas, dpi=400)
        fg, bg = decompose_layers(mask_dev, dev_imgs, bg_downsample=3,
                                  device=True)
        jax.block_until_ready((mask_dev, fg, bg))
        _ = np.asarray(fg[:1, :1, :1])
        mark('decompose (device)')

        ffetch, fmeta = transform_jp2_batch_async(fg, levels=5,
                                                  pack8=True, ratio=750)
        bfetch, bmeta = transform_jp2_batch_async(bg, levels=5,
                                                  pack8=True, ratio=500)
        mark('jp2 dispatch (async)')

        masks = unpack_mask_bits(pack_mask_bits(mask_dev),
                                 mask_dev.shape[-1])
        mark('mask fetch+unpack')

        pages_f = [ffetch(i) for i in range(n_pages)]
        pages_b = [bfetch(i) for i in range(n_pages)]
        nbytes = sum(q.nbytes for p in pages_f + pages_b
                     for c in p for q in c)
        mark('qband drain wait')
        print('%-22s %7.1f MB (%.1f MB/page fg+bg)'
              % ('  qband host bytes', nbytes / 1e6,
                 nbytes / 1e6 / n_pages), flush=True)

        szs = []
        for i in range(n_pages):
            szs.append(len(encode_jp2_from_qbands(pages_f[i], fmeta,
                                                  ratio=750)))
        mark('tier1 fg x%d' % n_pages)
        for i in range(n_pages):
            encode_jp2_from_qbands(pages_b[i], bmeta, ratio=500)
        mark('tier1 bg x%d' % n_pages)

        jsz = []
        for i in range(n_pages):
            jsz.append(len(encode_jbig2(~masks[i], embedded=True)))
        mark('mask jbig2 x%d' % n_pages)
        print('fg jp2 sizes: %s  jbig2: %s' % (szs[:3], jsz[:3]),
              flush=True)

    once('cold (compiles)')
    once('warm 1')
    once('warm 2')


if __name__ == '__main__':
    main()
