"""pdf-to-hocr: PDF text-layer extraction (pdf/textextract.py).

The reference has no in-repo equivalent (its ``bin/pdfcomp:31`` shells
out to archive-hocr-tools' pdf-to-hocr); these tests pin the in-tree
extractor: hOCR -> text PDF -> hOCR round trip, word segmentation
rules, ToUnicode/base-encoding resolution, and the self-contained
pdfcomp pipeline.
"""

import io
import os

import numpy as np
import pytest

from archive_pdf_tools_tpu.pdf.builder import DocumentBuilder
from archive_pdf_tools_tpu.pdf.reader import PdfReader
from archive_pdf_tools_tpu.pdf.textextract import (
    extract_page_glyphs, group_words, group_lines, page_to_hocr,
    parse_tounicode)
from archive_pdf_tools_tpu.inputs.hocr import (
    hocr_page_iterator, hocr_page_to_word_data, hocr_page_get_dimensions)


def _doc_with_ops(ops, w=300, h=200):
    b = DocumentBuilder()
    idx = b.add_text_page([], w, h, 72)
    b.pages[idx].extra_ops = ops
    b.write_pdfa()
    b.write_metadata()
    buf = io.BytesIO()
    b.save(buf, deflate=False)
    return PdfReader(buf.getvalue())


class TestGrouping:
    def test_spaces_split_kerning_does_not(self):
        r = _doc_with_ops(
            b'BT /XF1 24 Tf 1 0 0 1 20 150 Tm (Hello world) Tj ET '
            b'BT /XF1 18 Tf 1 0 0 1 20 100 Tm '
            b'[(kern) -30 (ed) -2000 (gap)] TJ ET')
        g, W, H = extract_page_glyphs(r, 0, scale=1.0)
        words = [w[0] for w in group_words(g)]
        assert words == ['Hello', 'world', 'kerned', 'gap']

    def test_lines_cluster_by_baseline(self):
        # 'two' sits 30px (1.5 em) after 'one': same line; gaps over
        # 2.5 em are column gutters and split (TestReadingOrder)
        r = _doc_with_ops(
            b'BT /XF1 20 Tf 1 0 0 1 20 150 Tm (one) Tj ET '
            b'BT /XF1 20 Tf 1 0 0 1 80 150 Tm (two) Tj ET '
            b'BT /XF1 20 Tf 1 0 0 1 20 100 Tm (three) Tj ET')
        g, _W, _H = extract_page_glyphs(r, 0, scale=1.0)
        lines = group_lines(group_words(g))
        assert len(lines) == 2
        assert [w[0] for w in lines[0]['words']] == ['one', 'two']
        assert [w[0] for w in lines[1]['words']] == ['three']
        # device y grows downward: first line above second
        assert lines[0]['bbox'][1] < lines[1]['bbox'][1]

    def test_rotated_text_groups_in_reading_order(self):
        # 90-degree text matrix: advance runs up the page.  Grouping
        # must split words on the space and keep reading order, and
        # must not merge the rotated line with the horizontal one.
        r = _doc_with_ops(
            b'BT /XF1 16 Tf 0 1 -1 0 100 40 Tm (going up fast) Tj ET '
            b'BT /XF1 16 Tf 1 0 0 1 120 100 Tm (flat here) Tj ET')
        g, _W, _H = extract_page_glyphs(r, 0, scale=1.0)
        lines = group_lines(group_words(g))
        texts = [[w[0] for w in ln['words']] for ln in lines]
        assert ['going', 'up', 'fast'] in texts
        assert ['flat', 'here'] in texts
        rot = next(ln for ln in lines
                   if [w[0] for w in ln['words']][0] == 'going')
        # vertical line: tall, narrow boxes; words ordered bottom-up
        assert rot['bbox'][3] - rot['bbox'][1] > \
            rot['bbox'][2] - rot['bbox'][0]
        ys = [w[1][3] for w in rot['words']]
        assert ys[0] > ys[1] > ys[2]

    def test_scale_applies(self):
        r = _doc_with_ops(b'BT /XF1 24 Tf 1 0 0 1 50 100 Tm (x) Tj ET')
        g1, W1, H1 = extract_page_glyphs(r, 0, scale=1.0)
        g2, W2, H2 = extract_page_glyphs(r, 0, scale=2.0)
        assert (W2, H2) == (2 * W1, 2 * H1)
        assert abs(g2[0][1] - 2 * g1[0][1]) < 1e-6


class TestToUnicode:
    def test_parse_bfchar_and_ranges(self):
        data = (b'begincmap\n'
                b'2 beginbfchar\n<0001> <0041>\n<0002> <00660069>\n'
                b'endbfchar\n'
                b'1 beginbfrange\n<0010> <0012> <0061>\nendbfrange\n'
                b'1 beginbfrange\n<0020> <0021> [<005A> <0059>]\n'
                b'endbfrange\nendcmap')
        m = parse_tounicode(data)
        assert m[1] == 'A'
        assert m[2] == 'fi'          # ligature: full multi-char value
        assert m[0x10] == 'a' and m[0x12] == 'c'
        assert m[0x20] == 'Z' and m[0x21] == 'Y'


class TestRoundTrip:
    def test_hocr_pdf_hocr(self, tmp_path):
        from tests.fixtures import make_book
        from archive_pdf_tools_tpu.cli.pdfrenderer_cli import main as rmain
        from archive_pdf_tools_tpu.cli.pdf_to_hocr import main as hmain

        _glob, hocr_path, pages = make_book(tmp_path, n_pages=1,
                                            w=400, h=560)
        outpdf = str(tmp_path / 'text.pdf')
        assert rmain(['-T', hocr_path, '-o', outpdf]) == 0

        outhocr = str(tmp_path / 'rt.hocr')
        assert hmain(['-f', outpdf, '-o', outhocr, '--ppi', '72']) == 0

        got = []
        n_pages = 0
        for page in hocr_page_iterator(outhocr):
            n_pages += 1
            assert hocr_page_get_dimensions(page) == (400, 560)
            wd = hocr_page_to_word_data(page)
            got += [(w['text'], w['bbox']) for par in wd
                    for line in par['lines'] for w in line['words']]
        assert n_pages == 1
        orig = pages[0][1]
        assert [g[0] for g in got] == [o[4] for o in orig]
        # word x-extents within a few px of the source boxes (the y
        # extent differs by design: metric box vs source line box)
        for (text, bbox), (l, t, r, b, _w) in zip(got, orig):
            assert abs(bbox[0] - l) <= 4, (text, bbox)
            assert abs(bbox[2] - r) <= 12, (text, bbox)

    def test_hocr_output_is_parseable_xml(self, tmp_path):
        r = _doc_with_ops(
            b'BT /XF1 24 Tf 1 0 0 1 20 150 Tm (a <&> b) Tj ET')
        div = page_to_hocr(r, 0, scale=1.0)
        from lxml import etree
        root = etree.fromstring(div)
        words = [w.text for w in root.iter()
                 if (w.get('class') or '') == 'ocrx_word']
        assert words == ['a', '<&>', 'b']


class TestReadingOrder:
    def test_two_columns_same_baselines(self):
        """Columns sharing one leading grid (equal baselines — the
        common real-world case) must still read left column first:
        lines split at the gutter instead of fusing across it."""
        from archive_pdf_tools_tpu.pdf.textextract import order_reading
        ops = []
        for i in range(3):
            y = 240 - i * 20
            ops.append(b'BT /XF1 10 Tf 1 0 0 1 20 %d Tm '
                       b'(left%d text here) Tj ET' % (y, i))
            ops.append(b'BT /XF1 10 Tf 1 0 0 1 160 %d Tm '
                       b'(right%d text here) Tj ET' % (y, i))
        r = _doc_with_ops(b' '.join(ops), w=300, h=300)
        lines = order_reading(group_lines(group_words(
            extract_page_glyphs(r, 0)[0])))
        firsts = [ln['words'][0][0] for ln in lines]
        assert firsts == ['left0', 'left1', 'left2',
                          'right0', 'right1', 'right2']

    def test_xml_invalid_chars_sanitized(self):
        """Control chars / lone surrogates from hostile ToUnicode maps
        must not produce unparseable hOCR or crash the utf-8 encode."""
        from archive_pdf_tools_tpu.pdf.textextract import _esc
        s = 'a\x08b' + chr(0xD800) + 'c￾e'
        out = _esc(s)
        assert out == 'a�b�c�e'
        out.encode('utf-8')   # must not raise

    def test_two_columns_with_spanning_title(self):
        """XY-cut ordering: a spanning title first, then the whole left
        column, then the right — not y-interleaved."""
        from archive_pdf_tools_tpu.pdf.textextract import order_reading
        ops = [b'BT /XF1 14 Tf 1 0 0 1 80 280 Tm (Spanning Title) Tj ET']
        for i in range(3):
            y = 240 - i * 20
            ops.append(b'BT /XF1 10 Tf 1 0 0 1 20 %d Tm '
                       b'(left%d column text) Tj ET' % (y, i))
            ops.append(b'BT /XF1 10 Tf 1 0 0 1 160 %d Tm '
                       b'(right%d column text) Tj ET' % (y - 7, i))
        r = _doc_with_ops(b' '.join(ops), w=300, h=300)
        lines = order_reading(group_lines(group_words(
            extract_page_glyphs(r, 0)[0])))
        firsts = [ln['words'][0][0] for ln in lines]
        assert firsts == ['Spanning', 'left0', 'left1', 'left2',
                          'right0', 'right1', 'right2']


class TestStd14Metrics:
    def test_helvetica_afm_widths(self):
        """A /Widths-less standard-14 Helvetica font (allowed by ISO
        32000-1 9.6.2.2) must use real core-AFM advances: 'i' is
        222/1000 em, 'W' 944/1000 em — not a flat default."""
        from archive_pdf_tools_tpu.pdf.writer import PdfWriter, Name, \
            Stream
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        fref = wr.add({Name('Type'): Name('Font'),
                       Name('Subtype'): Name('Type1'),
                       Name('BaseFont'): Name('Helvetica')})
        cref = wr.add(Stream(
            {}, b'BT /F1 24 Tf 1 0 0 1 20 100 Tm (iii WWW) Tj ET'))
        page = wr.add({Name('Type'): Name('Page'), Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, 400, 200],
                       Name('Contents'): cref,
                       Name('Resources'): {Name('Font'):
                                           {Name('F1'): fref}}})
        wr.set(pages, {Name('Type'): Name('Pages'), Name('Kids'): [page],
                       Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'), Name('Pages'): pages})
        import io
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        r = PdfReader(buf.getvalue())
        words = group_words(extract_page_glyphs(r, 0, scale=1.0)[0])
        wmap = {t: bb[2] - bb[0] for t, bb, _b, _f, _d in words}
        assert abs(wmap['iii'] - 3 * 24 * 0.222) < 0.5
        assert abs(wmap['WWW'] - 3 * 24 * 0.944) < 0.5


class TestForeignPdf:
    def test_matplotlib_pdf_extracts(self, tmp_path):
        """A PDF produced by a genuinely foreign writer (matplotlib's
        PDF backend: Type3 DejaVu subsets, /Differences glyph names,
        no ToUnicode) must extract correct words and sane boxes."""
        matplotlib = pytest.importorskip('matplotlib')
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(4, 3))
        fig.text(0.1, 0.8, 'Hello TPU world', fontsize=18)
        fig.text(0.1, 0.5, 'Second line of text', fontsize=14)
        path = str(tmp_path / 'mpl.pdf')
        fig.savefig(path, format='pdf')
        plt.close(fig)

        r = PdfReader(path)
        g, W, H = extract_page_glyphs(r, 0, scale=2.0)
        assert (W, H) == (576, 432)
        lines = group_lines(group_words(g))
        assert [w[0] for w in lines[0]['words']] == \
            ['Hello', 'TPU', 'world']
        assert [w[0] for w in lines[1]['words']] == \
            ['Second', 'line', 'of', 'text']
        # upper line sits in the top half, second below it
        assert lines[0]['bbox'][3] < H / 2 < lines[1]['bbox'][3]


class TestPdfcompSelfContained:
    @pytest.mark.skipif(os.environ.get('APT_SKIP_E2E') == '1',
                        reason='e2e gated off')
    def test_pdfcomp_without_external_tool(self, tmp_path):
        """recode a fixture book, then pdfcomp the result with no
        external pdf-to-hocr on PATH: hOCR comes from the in-tree
        extractor and the output must stay a well-formed PDF."""
        from tests.test_recode_e2e import run_recode
        from archive_pdf_tools_tpu.cli.pdfcomp import main as pmain

        first, _res, _pages = run_recode(tmp_path, n_pages=1,
                                         validate=False)
        out = str(tmp_path / 'comp.pdf')
        assert pmain([first, out]) == 0
        reader = PdfReader(out)
        assert reader.page_count() == 1
        # the text layer survived into the hOCR step: extract again
        g, _W, _H = extract_page_glyphs(reader, 0, scale=1.0)
        texts = ''.join(w[0] for w in group_words(g))
        assert 'word00' in texts

    @pytest.mark.skipif(os.environ.get('APT_SKIP_E2E') == '1',
                        reason='e2e gated off')
    def test_recode_pdf_without_hocr(self, tmp_path):
        """recode_pdf --from-pdf with no -T auto-extracts the input's
        text layer (TPU extra; the reference errors without -T)."""
        from tests.test_recode_e2e import run_recode
        from archive_pdf_tools_tpu.cli.recode_pdf import main as rmain

        first, _res, _pages = run_recode(tmp_path, n_pages=1,
                                         validate=False)
        out = str(tmp_path / 'again.pdf')
        rc = rmain(['-P', first, '-o', out, '--dpi', '72',
                    '-J', 'pillow'])
        assert rc == 0
        reader = PdfReader(out)
        assert reader.page_count() == 1
        g, _W, _H = extract_page_glyphs(reader, 0, scale=1.0)
        texts = ''.join(w[0] for w in group_words(g))
        assert 'word00' in texts
