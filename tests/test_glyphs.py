"""Glyph-outline rendering tests (pdf/glyphs.py + raster integration).

The reference gets real text rendering from PyMuPDF/FreeType
(``bin/pdf-metadata-json:61-114``); ours comes from fontTools-parsed
outlines scanline-filled by the rasterizer.  Test fonts are synthesized
with fontTools.fontBuilder so glyph geometry is known exactly.
"""

import io

import numpy as np
import pytest

fontTools = pytest.importorskip('fontTools')

from fontTools.fontBuilder import FontBuilder
from fontTools.pens.t2CharStringPen import T2CharStringPen
from fontTools.pens.ttGlyphPen import TTGlyphPen
from fontTools.ttLib import TTFont

from archive_pdf_tools_tpu.pdf.writer import PdfWriter, Name, Stream
from archive_pdf_tools_tpu.pdf.reader import PdfReader
from archive_pdf_tools_tpu.pdf.raster import Rasterizer


def _build_ttf(glyph_heights, upm=1000):
    """TTF whose glyphs are exact rectangles x:100..500, y:0..h."""
    names = ['.notdef'] + list(glyph_heights)
    fb = FontBuilder(upm, isTTF=True)
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord(n[-1]): n for n in glyph_heights})
    glyphs = {}
    for name in names:
        pen = TTGlyphPen(None)
        h = glyph_heights.get(name, 0)
        if h:
            pen.moveTo((100, 0))
            pen.lineTo((500, 0))
            pen.lineTo((500, h))
            pen.lineTo((100, h))
            pen.closePath()
        glyphs[name] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (600, 100) for n in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({'familyName': 'T', 'styleName': 'R'})
    fb.setupOS2()
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    return buf.getvalue()


def _build_cff(triangle_heights):
    """OTF/CFF whose glyphs are triangles (50,0)-(550,0)-(300,h)."""
    names = ['.notdef'] + list(triangle_heights)
    fb = FontBuilder(1000, isTTF=False)
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord(n[-1]): n for n in triangle_heights})
    css = {}
    for name in names:
        pen = T2CharStringPen(600, None)
        h = triangle_heights.get(name, 0)
        if h:
            pen.moveTo((50, 0))
            pen.lineTo((550, 0))
            pen.lineTo((300, h))
            pen.closePath()
        css[name] = pen.getCharString()
    fb.setupCFF('TCFF', {}, css, {})
    fb.setupHorizontalMetrics({n: (600, 50) for n in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({'familyName': 'TCFF', 'styleName': 'R'})
    fb.setupOS2()
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    return buf.getvalue()


def _render(font_dict_fn, content, extra_objs=None, w=200, h=150,
            scale=1.0):
    wr = PdfWriter()
    cat = wr.reserve()
    pages = wr.reserve()
    fref = font_dict_fn(wr)
    cref = wr.add(Stream({}, content))
    page = wr.add({Name('Type'): Name('Page'), Name('Parent'): pages,
                   Name('MediaBox'): [0, 0, w, h],
                   Name('Contents'): cref,
                   Name('Resources'): {Name('Font'): {Name('F1'): fref}}})
    wr.set(pages, {Name('Type'): Name('Pages'), Name('Kids'): [page],
                   Name('Count'): 1})
    wr.set(cat, {Name('Type'): Name('Catalog'), Name('Pages'): pages})
    buf = io.BytesIO()
    wr.save(buf, cat, None, b'0123456789abcdef')
    r = PdfReader(buf.getvalue())
    return Rasterizer(r).render_page(0, scale=scale)


def _simple_font(wr, data, subtype='TrueType', file_key='FontFile2',
                 file_subtype=None, encoding='WinAnsiEncoding',
                 differences=None, widths=True, base='TFont'):
    sd = {Name('Length1'): len(data)}
    if file_subtype:
        sd[Name('Subtype')] = Name(file_subtype)
    ff = wr.add(Stream(sd, data, deflate=True))
    descr = wr.add({Name('Type'): Name('FontDescriptor'),
                    Name('FontName'): Name(base), Name('Flags'): 32,
                    Name(file_key): ff, Name('ItalicAngle'): 0,
                    Name('Ascent'): 800, Name('Descent'): -200,
                    Name('CapHeight'): 700, Name('StemV'): 80,
                    Name('FontBBox'): [0, -200, 600, 800]})
    d = {Name('Type'): Name('Font'), Name('Subtype'): Name(subtype),
         Name('BaseFont'): Name(base), Name('FontDescriptor'): descr}
    if widths:
        d[Name('FirstChar')] = 32
        d[Name('LastChar')] = 122
        d[Name('Widths')] = [600] * (122 - 32 + 1)
    if differences is not None:
        d[Name('Encoding')] = {Name('Differences'): differences}
    elif encoding:
        d[Name('Encoding')] = Name(encoding)
    return wr.add(d)


def _dark(a):
    return (a < 50).all(axis=-1)


class TestSimpleFonts:
    def test_truetype_exact_rectangle_glyph(self):
        # glyph 'A': rect 400x700 units; fs 50 -> 20x35 device px
        data = _build_ttf({'boxA': 700})
        a = _render(lambda wr: _simple_font(wr, data),
                    b'BT /F1 50 Tf 20 40 Td (A) Tj ET')
        d = _dark(a)
        assert abs(int(d.sum()) - 20 * 35) <= 60
        ys, xs = np.nonzero(d)
        # origin (20,40): rect x 20+5..20+25, y(user) 40..75
        assert abs(xs.min() - 25) <= 1 and abs(xs.max() - 44) <= 1
        assert abs(ys.min() - (150 - 75)) <= 1
        assert abs(ys.max() - (150 - 41)) <= 1

    def test_bare_cff_fontfile3(self):
        otf = _build_cff({'A': 700})
        blob = TTFont(io.BytesIO(otf)).getTableData('CFF ')
        a = _render(lambda wr: _simple_font(
            wr, blob, subtype='Type1', file_key='FontFile3',
            file_subtype='Type1C'),
            b'BT /F1 50 Tf 20 40 Td (A) Tj ET')
        # triangle area: 0.5 * 500 * 700 / 1000^2 * 50^2 = 437.5 px
        assert abs(int(_dark(a).sum()) - 437) <= 60

    def test_opentype_cff_fontfile3(self):
        otf = _build_cff({'A': 700})
        a = _render(lambda wr: _simple_font(
            wr, otf, subtype='Type1', file_key='FontFile3',
            file_subtype='OpenType'),
            b'BT /F1 50 Tf 20 40 Td (A) Tj ET')
        assert abs(int(_dark(a).sum()) - 437) <= 60

    def test_differences_encoding_picks_other_glyph(self):
        # code 65 remapped to shorter glyph 'boxB' via Differences
        data = _build_ttf({'boxA': 700, 'boxB': 350})
        a = _render(lambda wr: _simple_font(
            wr, data, differences=[65, Name('boxB')]),
            b'BT /F1 50 Tf 20 40 Td (A) Tj ET')
        assert abs(int(_dark(a).sum()) - 20 * 17.5) <= 60

    def test_hmtx_advance_without_widths(self):
        # no /Widths: consecutive glyphs advance by hmtx 600/1000 em
        data = _build_ttf({'boxA': 700})
        a = _render(lambda wr: _simple_font(wr, data, widths=False),
                    b'BT /F1 50 Tf 20 40 Td (AA) Tj ET')
        d = _dark(a)
        ys, xs = np.nonzero(d)
        # second glyph starts at 20 + 0.6*50 + 0.1*50 = 55
        assert abs(xs.max() - (20 + 30 + 25 - 1)) <= 1


class TestCIDFonts:
    def _cid_font(self, wr, data, cid2gid_pairs, w_array=None):
        ff = wr.add(Stream({Name('Length1'): len(data)}, data,
                           deflate=True))
        descr = wr.add({Name('Type'): Name('FontDescriptor'),
                        Name('FontName'): Name('TCID'),
                        Name('Flags'): 4, Name('FontFile2'): ff,
                        Name('ItalicAngle'): 0, Name('Ascent'): 800,
                        Name('Descent'): -200, Name('CapHeight'): 700,
                        Name('StemV'): 80,
                        Name('FontBBox'): [0, -200, 600, 800]})
        n = max(c for c, _ in cid2gid_pairs) + 1
        c2g = np.zeros(n, '>u2')
        for c, g in cid2gid_pairs:
            c2g[c] = g
        c2g_ref = wr.add(Stream({}, c2g.tobytes(), deflate=True))
        cid = {Name('Type'): Name('Font'),
               Name('Subtype'): Name('CIDFontType2'),
               Name('BaseFont'): Name('TCID'),
               Name('CIDSystemInfo'): {Name('Registry'): b'Adobe',
                                       Name('Ordering'): b'Identity',
                                       Name('Supplement'): 0},
               Name('FontDescriptor'): descr,
               Name('DW'): 600,
               Name('CIDToGIDMap'): c2g_ref}
        if w_array is not None:
            cid[Name('W')] = w_array
        cid_ref = wr.add(cid)
        return wr.add({Name('Type'): Name('Font'),
                       Name('Subtype'): Name('Type0'),
                       Name('BaseFont'): Name('TCID'),
                       Name('Encoding'): Name('Identity-H'),
                       Name('DescendantFonts'): [cid_ref]})

    def test_identity_h_cid2gid_stream(self):
        data = _build_ttf({'boxA': 700})
        a = _render(lambda wr: self._cid_font(wr, data, [(5, 1)]),
                    b'BT /F1 50 Tf 20 40 Td <0005> Tj ET')
        assert abs(int(_dark(a).sum()) - 700) <= 60

    def test_w_array_advance(self):
        data = _build_ttf({'boxA': 700})
        a = _render(lambda wr: self._cid_font(
            wr, data, [(5, 1), (6, 1)], w_array=[5, [1000]]),
            b'BT /F1 50 Tf 20 40 Td <00050006> Tj ET')
        d = _dark(a)
        _ys, xs = np.nonzero(d)
        # first glyph x 25..45, second starts at 20+50(W=1000)+5
        assert abs(xs.max() - (20 + 50 + 25 - 1)) <= 1

    def test_standin_via_tounicode(self):
        # no embedded program: DejaVu stand-in through ToUnicode
        def font(wr):
            tu = (b'begincmap\n1 beginbfchar\n<0005> <0041>\n'
                  b'endbfchar\nendcmap')
            tu_ref = wr.add(Stream({}, tu))
            cid_ref = wr.add({Name('Type'): Name('Font'),
                              Name('Subtype'): Name('CIDFontType2'),
                              Name('BaseFont'): Name('Helvetica'),
                              Name('DW'): 600})
            return wr.add({Name('Type'): Name('Font'),
                           Name('Subtype'): Name('Type0'),
                           Name('BaseFont'): Name('Helvetica'),
                           Name('Encoding'): Name('Identity-H'),
                           Name('ToUnicode'): tu_ref,
                           Name('DescendantFonts'): [cid_ref]})
        a = _render(font, b'BT /F1 50 Tf 20 40 Td <0005> Tj ET')
        d = _dark(a)
        # a real 'A' shape: substantial but far below the 0.6x0.95 em
        # metric box (~1400 px), and wider at the baseline than the top
        assert 200 < d.sum() < 900
        ys, xs = np.nonzero(d)
        rows = {}
        for y, x in zip(ys, xs):
            rows.setdefault(y, []).append(x)
        top = min(rows)
        bot = max(rows)
        assert len(rows[bot]) > len(rows[top])


class TestType3:
    def test_charproc_executes(self):
        def font(wr):
            proc = wr.add(Stream({}, b'60 0 d0 0 0 40 70 re f'))
            return wr.add({Name('Type'): Name('Font'),
                           Name('Subtype'): Name('Type3'),
                           Name('FontBBox'): [0, 0, 100, 100],
                           Name('FontMatrix'): [0.01, 0, 0, 0.01, 0, 0],
                           Name('CharProcs'): {Name('sq'): proc},
                           Name('Encoding'): {
                               Name('Differences'): [65, Name('sq')]},
                           Name('FirstChar'): 65,
                           Name('LastChar'): 65,
                           Name('Widths'): [60]})
        a = _render(font, b'BT /F1 50 Tf 20 40 Td (AA) Tj ET')
        d = _dark(a)
        # each glyph: 40x70 glyph units, FontMatrix 0.01 -> 20x35 px;
        # advance 60 units -> 30 px apart
        assert abs(int(d.sum()) - 2 * 20 * 35) <= 120
        ys, xs = np.nonzero(d)
        assert abs(xs.min() - 20) <= 1
        assert abs(xs.max() - (20 + 30 + 20 - 1)) <= 1
        assert abs(ys.max() - (150 - 41)) <= 1


class TestFallbacks:
    def test_unresolvable_paints_metric_box(self):
        # Symbol-named font without a program: no stand-in, box mode
        def font(wr):
            return wr.add({Name('Type'): Name('Font'),
                           Name('Subtype'): Name('Type1'),
                           Name('BaseFont'): Name('Symbol'),
                           Name('FirstChar'): 65,
                           Name('LastChar'): 65,
                           Name('Widths'): [600]})
        a = _render(font, b'BT /F1 50 Tf 20 40 Td (A) Tj ET')
        d = _dark(a)
        # metric box: 0.6 em x 0.9 em at 50 pt = 30 x 45 px
        assert d.sum() > 1000

    def test_glyphless_font_keeps_box_coverage(self, tmp_path):
        # our own text layer under Tr 0 must stay visible (test
        # corpus depends on it; a real viewer shows blank)
        from tests.test_raster import _doc_with_ops
        words = [{'lines': [{
            'bbox': [10, 30, 180, 60], 'baseline': (0.0, 0),
            'words': [{'text': 'hello', 'bbox': [10, 30, 90, 60],
                       'confidence': 90, 'writing_direction': 0,
                       'fontsize': 20}]}]}]
        r = _doc_with_ops(b'', render_text=True, words=words)
        a = Rasterizer(r).render_page(0, scale=2.0)
        assert _dark(a).sum() > 1000
