"""Synthetic book fixtures: imagestack pages + matching hOCR + scandata."""

import numpy as np
from PIL import Image, ImageDraw


def render_book_page(w, h, n_lines=6, seed=0, rgb=False, noise=8):
    """A page image with dark text-ish bars, plus the word boxes drawn."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 232.0)
    words = []   # (x1, y1, x2, y2, text)
    y = int(h * 0.08)
    lh = max(12, h // (n_lines + 4))
    for li in range(n_lines):
        x = int(w * 0.08)
        for wi in range(4):
            ww = int(rng.integers(w // 12, w // 6))
            if x + ww > w * 0.92:
                break
            hh = int(lh * 0.6)
            img[y:y + hh, x:x + ww] = int(rng.integers(15, 60))
            words.append((x, y, x + ww, y + hh, 'word%d%d' % (li, wi)))
            x += ww + int(w * 0.02)
        y += lh
        if y + lh >= h:
            break
    img += rng.normal(0, noise, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    if rgb:
        img = np.stack([img, np.clip(img + 4, 0, 255),
                        np.clip(img - 4, 0, 255)], -1).astype(np.uint8)
    return img, words


def words_to_hocr_page(words, w, h, page_no=0, dpi=None):
    lines = {}
    for (x1, y1, x2, y2, text) in words:
        lines.setdefault(y1, []).append((x1, y1, x2, y2, text))
    parts = []
    scan_res = '; scan_res %d %d' % (dpi, dpi) if dpi else ''
    parts.append('<div class="ocr_page" id="page_%d" title="image x; '
                 'bbox 0 0 %d %d; ppageno %d%s">' % (page_no, w, h,
                                                     page_no, scan_res))
    parts.append('<div class="ocr_carea" title="bbox 0 0 %d %d">' % (w, h))
    parts.append('<p class="ocr_par" dir="ltr" title="bbox 0 0 %d %d">'
                 % (w, h))
    for y in sorted(lines):
        ws = lines[y]
        lx1 = min(t[0] for t in ws)
        ly1 = min(t[1] for t in ws)
        lx2 = max(t[2] for t in ws)
        ly2 = max(t[3] for t in ws)
        parts.append('<span class="ocr_line" title="bbox %d %d %d %d; '
                     'baseline 0 0; x_size %d; x_descenders 3; '
                     'x_ascenders 5">' % (lx1, ly1, lx2, ly2, ly2 - ly1))
        for (x1, y1, x2, y2, text) in ws:
            parts.append('<span class="ocrx_word" title="bbox %d %d %d %d; '
                         'x_wconf 95">%s</span> ' % (x1, y1, x2, y2, text))
        parts.append('</span>')
    parts.append('</p></div></div>')
    return '\n'.join(parts)


HOCR_TEMPLATE = '''<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN"
 "http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">
<html xmlns="http://www.w3.org/1999/xhtml">
<head><title></title>
<meta name="ocr-system" content="tesseract 5" />
<meta name="ocr-capabilities" content="ocr_page ocr_carea ocr_par ocr_line ocrx_word" />
</head>
<body>
%s
</body>
</html>
'''


def make_book(tmp_path, n_pages=3, w=400, h=560, rgb=False, dpi=None,
              fmt='png'):
    """Write an imagestack + hocr file; returns (glob, hocr_path, pages)."""
    pages = []
    hocr_pages = []
    for i in range(n_pages):
        img, words = render_book_page(w, h, seed=i, rgb=rgb)
        im = Image.fromarray(img)
        path = tmp_path / ('page_%04d.%s' % (i, fmt))
        if fmt == 'jp2':
            im.save(str(path), format='JPEG2000', quality_mode='rates',
                    quality_layers=[20])
        else:
            im.save(str(path))
        pages.append((img, words))
        hocr_pages.append(words_to_hocr_page(words, w, h, page_no=i,
                                             dpi=dpi))
    hocr_path = tmp_path / 'book.hocr'
    hocr_path.write_text(HOCR_TEMPLATE % '\n'.join(hocr_pages),
                         encoding='utf-8')
    return str(tmp_path / ('page_*.%s' % fmt)), str(hocr_path), pages


SCANDATA_TEMPLATE = '''<?xml version="1.0" encoding="UTF-8"?>
<book>
  <bookData>
    <dpi>%(dpi)d</dpi>
  </bookData>
  <pageData>
%(pages)s
  </pageData>
</book>
'''


def make_scandata(tmp_path, n_pages, dpi=300, skip=(), numbers=None):
    rows = []
    for i in range(n_pages):
        num = ''
        if numbers and numbers[i] is not None:
            num = '<pageNumber>%s</pageNumber>' % numbers[i]
        skipped = '<addToAccessFormats>false</addToAccessFormats>' \
            if i in skip else '<addToAccessFormats>true</addToAccessFormats>'
        rows.append('    <page leafNum="%d">%s%s<ppi>%d</ppi></page>'
                    % (i, num, skipped, dpi))
    path = tmp_path / 'scandata.xml'
    path.write_text(SCANDATA_TEMPLATE % {'dpi': dpi,
                                         'pages': '\n'.join(rows)})
    return str(path)
