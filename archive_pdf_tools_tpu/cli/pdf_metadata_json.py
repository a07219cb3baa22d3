"""pdf-metadata-json: analyse a PDF into a JSON report.

Capability parity with the reference's ``bin/pdf-metadata-json``:
per-page image inventory (object number, size, mode, mask, filter),
page colour-mode classification, scale/PPI estimation from image-vs-page
dimensions, text-layer presence, hyperlink detection, and a recommended
imagestack format (``bin/pdf-metadata-json:61-258``).

One divergence: the reference classifies colour mode by *rendering* the
page with images removed (PyMuPDF); without a raster engine we classify
from the image data itself plus content-stream inspection, which covers
the scanned-book corpus this tool targets.
"""

import argparse
import io
import json
import re
import sys

import numpy as np
from PIL import Image

from ..pdf.reader import PdfReader


def _classify_pixels(arr):
    """Bitonal / Grayscale / RGB from decoded pixels."""
    if arr.ndim == 3:
        if (arr[..., 0] == arr[..., 1]).all() and \
                (arr[..., 1] == arr[..., 2]).all():
            arr = arr[..., 0]
        else:
            return 'RGB'
    vals = np.unique(arr)
    if len(vals) <= 2:
        return 'Bitonal'
    return 'Grayscale'


def analyse_page(reader, idx, sample_pixels=True):
    page_w, page_h = reader.page_size(idx)
    images = []
    modes = set()
    for name, num, stream in reader.page_images(idx):
        raw, filt, w, h, cs = reader.extract_image(stream)
        smask = reader.resolve(stream.dict.get('SMask'))
        bpc = reader.resolve(stream.dict.get('BitsPerComponent'))
        entry = {
            'name': name,
            'xref': num,
            'width': w,
            'height': h,
            'filter': filt,
            'colorspace': cs,
            'bpc': bpc,
            'has-mask': smask is not None,
            'size': len(raw),
        }
        mode = None
        if bpc == 1:
            mode = 'Bitonal'
        elif cs == 'DeviceRGB':
            mode = 'RGB'
        elif cs == 'DeviceGray':
            mode = 'Grayscale'
        if sample_pixels and filt in ('DCTDecode', 'JPXDecode'):
            try:
                img = Image.open(io.BytesIO(raw))
                img.thumbnail((256, 256))
                mode = _classify_pixels(np.asarray(img))
            except Exception:
                pass
        entry['mode'] = mode
        if mode:
            modes.add(mode)
        images.append(entry)

    contents = reader.page_contents(idx)
    has_text = bool(re.search(rb'\bTj\b|\bTJ\b', contents))

    # vector/text colour: render the page with image XObjects skipped
    # (reference parity, bin/pdf-metadata-json:61-114) and classify the
    # remaining marks.  All-white pages classify Bitonal, exactly like
    # the reference's min/max test on a blank pixmap.
    from ..pdf.raster import page_colour_mode
    try:
        vec_mode = page_colour_mode(reader, idx)
    except Exception:
        vec_mode = None
    if vec_mode is not None:
        # union with the image modes; the widest wins below (a blank
        # render classifies Bitonal, matching the reference's min/max
        # test on an empty pixmap)
        modes.add(vec_mode)
    # estimated PPI if the page is one full-bleed image
    ppi = None
    if images:
        big = max(images, key=lambda i: i['width'] * i['height'])
        if page_w > 0:
            ppi = round(big['width'] / (page_w / 72.0), 2)

    if 'RGB' in modes:
        colour = 'RGB'
    elif 'Grayscale' in modes:
        colour = 'Grayscale'
    elif 'Bitonal' in modes:
        colour = 'Bitonal'
    else:
        colour = 'Unknown'

    return {
        'page': idx,
        'width': page_w,
        'height': page_h,
        'images': images,
        'colour-mode': colour,
        'has-text': has_text,
        'estimated-ppi': ppi,
    }


def recommended_format(page_reports):
    """Imagestack recommendation (``bin/pdf-metadata-json:223-258``
    policy): all-bitonal -> CCITT TIFFs, otherwise JPEG2000."""
    modes = {p['colour-mode'] for p in page_reports}
    if modes <= {'Bitonal', 'Unknown'}:
        return 'tiff'
    return 'jp2'


def analyse(path, sample_pixels=True):
    reader = PdfReader(path)
    pages = [analyse_page(reader, i, sample_pixels=sample_pixels)
             for i in range(reader.page_count())]
    info = reader.info()

    def _s(v):
        if isinstance(v, bytes):
            return v.decode('utf-8', 'replace')
        return v

    links = []
    for idx in range(reader.page_count()):
        annots = reader.resolve(reader.pages()[idx].get('Annots')) or []
        for a in annots:
            a = reader.resolve(a)
            if a and str(reader.resolve(a.get('Subtype'))) == 'Link':
                links.append({'page': idx})

    return {
        'pages': pages,
        'page-count': reader.page_count(),
        'metadata': {str(k): _s(reader.resolve(v))
                     for k, v in info.items()},
        'has-xmp': reader.xmp_metadata() is not None,
        'hyperlinks': links,
        'recommended-imagestack-format': recommended_format(pages),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Analyse a PDF and emit a JSON metadata report.')
    parser.add_argument('infile')
    parser.add_argument('outfile', nargs='?', default=None)
    parser.add_argument('--no-sample', action='store_true',
                        help='skip decoding image pixels for mode detection')
    args = parser.parse_args(argv)

    report = analyse(args.infile, sample_pixels=not args.no_sample)
    out = json.dumps(report, indent=2)
    if args.outfile:
        with open(args.outfile, 'w') as fp:
            fp.write(out)
    else:
        print(out)
    return 0


if __name__ == '__main__':
    sys.exit(main())
