"""Vertical writing mode (Type0 Identity-V / WMode 1) tests.

The reference renders and extracts vertical CJK text through PyMuPDF's
MuPDF engine; our rasterizer implements ISO 32000-1 9.7.4.3 directly:
glyphs are drawn displaced by the position vector v from the vertical
origin, advance is the vertical displacement w1 (/W2, default /DW2
[880 -1000]), and the extractor derives the top-to-bottom reading
direction from the true advance vector, ordering columns right to left.

Geometry is exact: the test font's glyph is a rectangle x:100..500,
y:0..700 (units/1000), so every device pixel is predictable.
"""

import io
import re

import numpy as np
import pytest

pytest.importorskip('fontTools')

from tests.test_glyphs import _build_ttf, _dark

from archive_pdf_tools_tpu.pdf.writer import PdfWriter, Name, Stream
from archive_pdf_tools_tpu.pdf.reader import PdfReader
from archive_pdf_tools_tpu.pdf.raster import Rasterizer


def _vertical_doc(content, w2=None, dw2=None, tounicode=None,
                  encoding='Identity-V', w=200, h=150):
    wr = PdfWriter()
    cat = wr.reserve()
    pages = wr.reserve()
    data = _build_ttf({'boxA': 700})
    ff = wr.add(Stream({Name('Length1'): len(data)}, data,
                       deflate=True))
    descr = wr.add({Name('Type'): Name('FontDescriptor'),
                    Name('FontName'): Name('TV'), Name('Flags'): 4,
                    Name('FontFile2'): ff, Name('ItalicAngle'): 0,
                    Name('Ascent'): 800, Name('Descent'): -200,
                    Name('CapHeight'): 700, Name('StemV'): 80,
                    Name('FontBBox'): [0, -200, 600, 800]})
    c2g = np.zeros(16, '>u2')
    for cid in range(5, 16):
        c2g[cid] = 1                      # every test CID -> boxA
    c2g_ref = wr.add(Stream({}, c2g.tobytes(), deflate=True))
    cid = {Name('Type'): Name('Font'),
           Name('Subtype'): Name('CIDFontType2'),
           Name('BaseFont'): Name('TV'),
           Name('CIDSystemInfo'): {Name('Registry'): b'Adobe',
                                   Name('Ordering'): b'Identity',
                                   Name('Supplement'): 0},
           Name('FontDescriptor'): descr,
           Name('DW'): 600,
           Name('CIDToGIDMap'): c2g_ref}
    if w2 is not None:
        cid[Name('W2')] = w2
    if dw2 is not None:
        cid[Name('DW2')] = dw2
    cid_ref = wr.add(cid)
    font = {Name('Type'): Name('Font'),
            Name('Subtype'): Name('Type0'),
            Name('BaseFont'): Name('TV'),
            Name('Encoding'): Name(encoding),
            Name('DescendantFonts'): [cid_ref]}
    if tounicode is not None:
        font[Name('ToUnicode')] = wr.add(Stream({}, tounicode))
    fref = wr.add(font)
    cref = wr.add(Stream({}, content))
    page = wr.add({Name('Type'): Name('Page'), Name('Parent'): pages,
                   Name('MediaBox'): [0, 0, w, h],
                   Name('Contents'): cref,
                   Name('Resources'): {Name('Font'):
                                       {Name('F1'): fref}}})
    wr.set(pages, {Name('Type'): Name('Pages'), Name('Kids'): [page],
                   Name('Count'): 1})
    wr.set(cat, {Name('Type'): Name('Catalog'), Name('Pages'): pages})
    buf = io.BytesIO()
    wr.save(buf, cat, None, b'0123456789abcdef')
    return PdfReader(buf.getvalue())


class TestVerticalRendering:
    def test_position_vector_default(self):
        # fs 50, DW 600 -> v = (0.3 em, 0.88 em) = (15, 44) pt.
        # Glyph rect (x 100..500, y 0..700)/1000 em at origin (100,120):
        # x 100-15+5..100-15+25 = 90..110, y 120-44..120-44+35 = 76..111
        r = _vertical_doc(b'BT /F1 50 Tf 100 120 Td <0005> Tj ET')
        a = Rasterizer(r).render_page(0)
        d = _dark(a)
        assert abs(int(d.sum()) - 700) <= 60
        ys, xs = np.nonzero(d)
        assert abs(xs.min() - 90) <= 1 and abs(xs.max() - 109) <= 1
        assert abs(ys.min() - (150 - 111)) <= 1
        assert abs(ys.max() - (150 - 77)) <= 1

    def test_default_advance_one_em_down(self):
        # second glyph's vertical origin 50 pt below the first
        r = _vertical_doc(b'BT /F1 50 Tf 100 120 Td <00050005> Tj ET')
        a = Rasterizer(r).render_page(0)
        d = _dark(a)
        assert abs(int(d.sum()) - 1400) <= 120
        ys, _xs = np.nonzero(d)
        assert abs(ys.min() - (150 - 111)) <= 1
        assert abs(ys.max() - (150 - 27)) <= 1

    def test_w2_overrides_displacement(self):
        # W2: w1 = -500 -> half-em advance (25 pt at fs 50)
        r = _vertical_doc(b'BT /F1 50 Tf 100 120 Td <00050005> Tj ET',
                          w2=[5, [-500, 300, 880]])
        a = Rasterizer(r).render_page(0)
        ys, _xs = np.nonzero(_dark(a))
        assert abs(ys.max() - (150 - 52)) <= 1

    def test_dw2_overrides_defaults(self):
        # DW2 [0 -1000]: v_y = 0 -> glyph sits above the origin
        r = _vertical_doc(b'BT /F1 50 Tf 100 70 Td <0005> Tj ET',
                          dw2=[0, -1000])
        a = Rasterizer(r).render_page(0)
        ys, _xs = np.nonzero(_dark(a))
        # y user 70..105 -> device rows 45..80
        assert abs(ys.min() - (150 - 105)) <= 1
        assert abs(ys.max() - (150 - 71)) <= 1

    def test_tj_offset_moves_vertically(self):
        # TJ numbers are SUBTRACTED from the coordinate in both modes
        # (9.4.3), so +1000 = one extra em downward between the glyphs
        r = _vertical_doc(
            b'BT /F1 50 Tf 100 120 Td [<0005> 1000 <0005>] TJ ET')
        a = Rasterizer(r).render_page(0)
        d = _dark(a)
        ys, _xs = np.nonzero(d)
        # second glyph origin at 120 - 50 - 50 = 20: rect y user
        # -24..11 -> device rows 139..149 (clipped at page bottom)
        assert ys.max() == 149
        assert abs(int(d[139:].sum()) - 20 * 11) <= 40

    def test_embedded_cmap_wmode(self):
        # WMode taken from the embedded CMap stream's dict
        wr_cmap = (b'/CIDInit /ProcSet findresource begin\n'
                   b'/WMode 1 def\n'
                   b'1 begincidrange <0000> <ffff> 0 endcidrange\n'
                   b'end')
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        data = _build_ttf({'boxA': 700})
        ff = wr.add(Stream({Name('Length1'): len(data)}, data,
                           deflate=True))
        descr = wr.add({Name('Type'): Name('FontDescriptor'),
                        Name('FontName'): Name('TV'), Name('Flags'): 4,
                        Name('FontFile2'): ff, Name('ItalicAngle'): 0,
                        Name('Ascent'): 800, Name('Descent'): -200,
                        Name('CapHeight'): 700, Name('StemV'): 80,
                        Name('FontBBox'): [0, -200, 600, 800]})
        c2g = np.zeros(16, '>u2')
        c2g[5] = 1
        c2g_ref = wr.add(Stream({}, c2g.tobytes(), deflate=True))
        cid_ref = wr.add({Name('Type'): Name('Font'),
                          Name('Subtype'): Name('CIDFontType2'),
                          Name('BaseFont'): Name('TV'),
                          Name('FontDescriptor'): descr,
                          Name('DW'): 600,
                          Name('CIDToGIDMap'): c2g_ref})
        enc_ref = wr.add(Stream({Name('WMode'): 1}, wr_cmap))
        fref = wr.add({Name('Type'): Name('Font'),
                       Name('Subtype'): Name('Type0'),
                       Name('BaseFont'): Name('TV'),
                       Name('Encoding'): enc_ref,
                       Name('DescendantFonts'): [cid_ref]})
        cref = wr.add(Stream(
            {}, b'BT /F1 50 Tf 100 120 Td <0005> Tj ET'))
        page = wr.add({Name('Type'): Name('Page'),
                       Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, 200, 150],
                       Name('Contents'): cref,
                       Name('Resources'): {Name('Font'):
                                           {Name('F1'): fref}}})
        wr.set(pages, {Name('Type'): Name('Pages'),
                       Name('Kids'): [page], Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'),
                     Name('Pages'): pages})
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        a = Rasterizer(PdfReader(buf.getvalue())).render_page(0)
        ys, xs = np.nonzero(_dark(a))
        # same geometry as the Identity-V default-v test
        assert abs(xs.min() - 90) <= 1
        assert abs(ys.min() - (150 - 111)) <= 1


class TestVerticalExtraction:
    _TU = (b'/CIDInit /ProcSet findresource begin\n'
           b'4 beginbfchar\n'
           b'<0005> <0041>\n<0006> <0042>\n'
           b'<0007> <0043>\n<0008> <0044>\n'
           b'endbfchar\nend')

    def test_columns_read_right_to_left(self):
        # two vertical columns: "AB" at x=150, "CD" at x=50 -- the
        # right column must come first in the extracted reading order
        content = (b'BT /F1 20 Tf 150 130 Td <00050006> Tj ET\n'
                   b'BT /F1 20 Tf 50 130 Td <00070008> Tj ET')
        r = _vertical_doc(content, tounicode=self._TU)
        from archive_pdf_tools_tpu.pdf.textextract import page_to_hocr
        hocr = page_to_hocr(r, 0).decode('utf-8')
        words = re.findall(r"class='ocrx_word'[^>]*>([^<]*)<", hocr)
        assert words == ['AB', 'CD']

    def test_vertical_word_geometry(self):
        content = b'BT /F1 20 Tf 100 130 Td <00050006> Tj ET'
        r = _vertical_doc(content, tounicode=self._TU)
        from archive_pdf_tools_tpu.pdf.textextract import (
            extract_page_glyphs, group_words)
        glyphs, _w, _h = extract_page_glyphs(r, 0)
        words = group_words(glyphs)
        assert len(words) == 1
        text, bbox, _base, _fs, ddir = words[0]
        assert text == 'AB' and ddir == 1
        # taller than wide: two stacked em cells vs one em width
        assert (bbox[3] - bbox[1]) > 1.5 * (bbox[2] - bbox[0]) > 10
        # roughly centred on the x=100 column
        assert bbox[0] < 100 < bbox[2]
