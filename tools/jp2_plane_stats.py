#!/usr/bin/env python3
"""Evidence for rate-adaptive requantization: per band, how many
magnitude planes does the final PCRD-chosen stream actually code?

Encodes a realistic synthetic fg/bg layer pair at the e2e rate targets
through the NATIVE host path (no chip needed) and reports, per band:
  nbps      max bit planes over the band's blocks (after pack8 shift)
  coded     max planes any chosen block actually codes
            (chosen passes p -> planes = (p + 2) // 3)
  bytes     chosen bytes the band contributes to the stream

If coded << 7 (the int8 budget) for the fine bands, shipping them at
int4 (3 planes) loses nothing at this rate target.

Usage: python tools/jp2_plane_stats.py [ratio_fg] [ratio_bg]
"""
import os
import sys

os.environ.setdefault('APT_JP2_DEVICE', 'native')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def report(tag, img, ratio):
    from archive_pdf_tools_tpu.codecs import jp2tpu as J
    lib = J._get_lib()
    h, w = img.shape[:2]
    rgb = img.ndim == 3
    ncomp = 3 if rgb else 1
    levels = 5
    base_delta = 1.0 / 64
    qb = J._native_transform(img, levels, rgb, base_delta)
    layout = J.band_layout(levels, base_delta)
    n_fine = 6
    shifts = J._pack8_shifts_np(qb, n_fine, layout)
    qb = J._pack8_apply_np(qb, shifts, n_fine)

    adj = []
    for (orient, level, gain, eps, mu, step), s in zip(layout, shifts):
        adj.append((orient, level, gain, eps - int(s), mu,
                    step * (1 << int(s))))
    comp_bands = [[J._Band(*m, np.asarray(q, np.int32))
                   for m, q in zip(adj, qbc)] for qbc in qb]
    all_bands = [b for bands in comp_bands for b in bands]
    target = int(h * w * ncomp / float(ratio))
    blocks = J._t1_all(all_bands, lib, 1, target_bytes=target)
    J._allocate_rate(blocks, target, lib, 1)

    print('--- %s %dx%d ratio %s target %d B ---'
          % (tag, w, h, ratio, target))
    print('%-4s %-5s %5s %5s %6s %6s %8s %8s'
          % ('band', 'lvl', 'shift', 'nbps', 'coded', 'blks',
             'nz_blks', 'bytes'))
    for c, bands in enumerate(comp_bands):
        for k, band in enumerate(bands):
            nbps = max((cb.nbps for cb in band.blocks), default=0)
            coded = max((0 if cb.chosen <= 0 else (cb.chosen + 2) // 3
                         for cb in band.blocks), default=0)
            nz = sum(1 for cb in band.blocks if cb.chosen > 0)
            byt = sum(len(cb.chosen_bytes) for cb in band.blocks)
            print('%-4s %-5s %5d %5d %6d %6d %8d %8d'
                  % (band.orient, band.level, shifts[k], nbps, coded,
                     len(band.blocks), nz, byt))
        break   # components look alike; print first


def main():
    rf = float(sys.argv[1]) if len(sys.argv) > 1 else 750
    rb = float(sys.argv[2]) if len(sys.argv) > 2 else 500
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import tempfile
    from tools.e2e_bench import make_book
    from glob import glob
    from PIL import Image
    tmp = tempfile.mkdtemp(prefix='plane_stats_')
    pat, hocr = make_book(tmp, n_pages=1)
    img = np.asarray(Image.open(sorted(glob(pat))[0]))

    from archive_pdf_tools_tpu.inputs.hocr import (hocr_page_iterator,
                                                   hocr_page_to_word_data)
    wd = [hocr_page_to_word_data(p) for p in hocr_page_iterator(hocr)]
    os.environ['APT_PLATFORM'] = 'cpu'
    from archive_pdf_tools_tpu.mrc.api import (decompose_masks,
                                               decompose_layers)
    mask, devs = decompose_masks([img], wd, dpi=400)
    fg, bg = decompose_layers(mask, devs, bg_downsample=3)

    report('fg', np.asarray(fg[0]), rf)
    report('bg', np.asarray(bg[0]), rb)


if __name__ == '__main__':
    main()
