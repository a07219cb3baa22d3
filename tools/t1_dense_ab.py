#!/usr/bin/env python3
"""Tier-1 work attribution + policy A/B on a DENSE e2e-book page.

The round-2 T1 work-cap rework was only A/B'd on single scanfix pages;
the judge's round-2 chip run showed fg_jp2 ~4 s/page on the dense e2e
book (40 full-width text lines + noise), ~8x the clean-page number.
This harness isolates the host Tier-1 (native DWT via
APT_JP2_DEVICE=native, no device link) on exactly that content and
reports the initial/rescue phase split under different cap/rescue
policies, interleaved ABAB so box drift cancels.

Usage: python tools/t1_dense_ab.py [iters]
"""

import os
import sys
import time

os.environ.setdefault('APT_PLATFORM', 'cpu')
os.environ['APT_JP2_DEVICE'] = 'native'
os.environ['APT_T1_STATS'] = '1'

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dense_fg(w=2550, h=3300):
    """The e2e book page's fg layer, reproduced: radiated text strokes
    on the mask complement (what actually reaches encode_mrc_img)."""
    from tools.e2e_bench import make_book
    import tempfile, glob
    from PIL import Image
    tmp = tempfile.mkdtemp(prefix='t1ab_')
    make_book(tmp, n_pages=1, w=w, h=h)
    img = np.asarray(Image.open(sorted(glob.glob(
        os.path.join(tmp, 'page_*.png')))[0]))
    # decompose via the real API on CPU for fidelity
    from archive_pdf_tools_tpu.mrc.api import decompose_pages
    from tests.fixtures import words_to_hocr_page  # noqa - path check
    # reuse the page's own hOCR word boxes: re-derive from the book
    # builder is overkill; a plain threshold mask gives the same fg
    # statistics for T1 purposes (strokes + radiated fill)
    mask = img < 128
    from archive_pdf_tools_tpu.mrc import api as A
    fg, bg = A.decompose_layers(
        np.asarray(mask)[None], np.asarray(img)[None])
    return np.asarray(fg[0])


def run_once(arr, ratio, env):
    from archive_pdf_tools_tpu.codecs import jp2tpu
    for k, v in env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = str(v)
    jp2tpu.T1_STATS.clear()
    t0 = time.time()
    data = jp2tpu.encode_jp2_tpu(arr, ratio=ratio)
    dt = time.time() - t0
    stats = dict(jp2tpu.T1_STATS)
    return dt, len(data), stats


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    arr = make_dense_fg()
    print('fg layer: %s  mean %.1f' % (arr.shape, arr.mean()), flush=True)

    policies = {
        'HEAD(floor96)': {'APT_T1_CAP_FLOOR': None},
        'floor512': {'APT_T1_CAP_FLOOR': '512'},
        'no-rescue': {'APT_T1_CAP_FLOOR': None,
                      'APT_T1_MAX_RESCUE_ROUNDS': '0'},
    }
    acc = {k: [] for k in policies}
    for it in range(iters):
        for name, env in policies.items():
            dt, nbytes, st = run_once(arr, 750, env)
            acc[name].append(dt)
            print('%d %-14s %.3fs  %6dB  init %.3fs/%d  rescue %.3fs/%d'
                  % (it, name, dt, nbytes,
                     st.get('initial', (0, 0))[0],
                     st.get('initial', (0, 0))[1],
                     st.get('rescue', (0, 0))[0],
                     st.get('rescue', (0, 0))[1]), flush=True)
    print()
    for name, ts in acc.items():
        print('%-14s median %.3fs  min %.3fs' % (
            name, sorted(ts)[len(ts) // 2], min(ts)))


if __name__ == '__main__':
    main()
