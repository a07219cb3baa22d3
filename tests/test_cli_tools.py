"""Secondary CLI and tool tests."""

import json
import os
import subprocess
import sys
import zipfile

import pytest
from PIL import Image

from archive_pdf_tools_tpu.pipeline.recode import recode
from archive_pdf_tools_tpu.pdf.reader import PdfReader
from archive_pdf_tools_tpu.cli.pdf_metadata_json import analyse, main as meta_main
from archive_pdf_tools_tpu.cli.compress_pdf_images import main as comp_main
from archive_pdf_tools_tpu.cli.pdf_to_imagestack import main as stack_main
from archive_pdf_tools_tpu.cli.pdfrenderer_cli import main as rend_main
from archive_pdf_tools_tpu.cli.epub_to_pdf import main as epub_main

from tests.fixtures import make_book

J2K_BG = 'quality_mode:"rates";quality_layers:[500]'
J2K_FG = 'quality_mode:"rates";quality_layers:[750]'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def book_pdf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('book')
    stack, hocr, pages = make_book(tmp, n_pages=2)
    out = str(tmp / 'book.pdf')
    recode(from_imagestack=stack, hocr_file=hocr, out_pdf=out, dpi=100,
           jbig2=True, bg_compression_flags=[J2K_BG],
           fg_compression_flags=[J2K_FG])
    return out, hocr


@pytest.fixture(scope='module')
def jpeg_pdf(tmp_path_factory):
    """A simple one-image-per-page JPEG PDF (compress input)."""
    tmp = tmp_path_factory.mktemp('jpegsrc')
    stack, hocr, pages = make_book(tmp, n_pages=2)
    out = str(tmp / 'src.pdf')
    recode(from_imagestack=stack, hocr_file=hocr, out_pdf=out, dpi=100,
           image_mode=3)   # skip images
    # rebuild with single jpeg image per page via mode 2 + jpeg format
    out2 = str(tmp / 'src2.pdf')
    recode(from_imagestack=stack, hocr_file=hocr, out_pdf=out2, dpi=100,
           jbig2=False, mask_compression='ccitt', mrc_image_format='jpeg',
           bg_compression_flags=['-S40'], fg_compression_flags=['-S30'])
    return out2, hocr


class TestPdfMetadataJson:
    def test_analyse(self, book_pdf):
        path, hocr = book_pdf
        rep = analyse(path)
        # reference JSON schema (bin/pdf-metadata-json:260-410):
        # pdf-to-hocr -J consumes these exact keys
        assert rep['page_count'] == 2
        pd = rep['page_data'][0]
        assert pd['has_text_layer']
        assert len(pd['image_data']) == 2
        for im in pd['image_data']:
            assert {'xref', 'width', 'height', 'depth', 'label',
                    'bbox', 'transform', 'mode', 'mask'} <= set(im)
        assert rep['imagestack_image_format'] in ('Grayscale', 'RGB')
        assert pd['estimated_ppi'] >= 72
        assert pd['estimated_scale'] > 0

    def test_cli(self, book_pdf, tmp_path, capsys):
        path, _ = book_pdf
        out = str(tmp_path / 'meta.json')
        assert meta_main([path, out]) == 0
        rep = json.loads(open(out).read())
        assert rep['page_count'] == 2

    def test_vector_colour_detected(self, tmp_path):
        """Colour set only by vector operators (no images) must flip the
        page's colour-mode — classified by rendering the page with
        images removed (reference parity, bin/pdf-metadata-json:61-113).
        Per the reference's min/max test, a two-value render is Bitonal;
        Grayscale needs three distinct levels."""
        from archive_pdf_tools_tpu.pdf.builder import DocumentBuilder
        for ops, want in ((b'1 0 0 rg 0 0 50 50 re f', 'RGB'),
                          (b'0.5 g 0 0 50 50 re f 0.2 g 60 0 40 40 re f',
                           'Grayscale'),
                          (b'0 g 0 0 50 50 re f', 'Bitonal')):
            b = DocumentBuilder()
            idx = b.add_text_page([], 200, 300, ppi=72)
            b.pages[idx].extra_ops = ops
            path = str(tmp_path / ('v_%s.pdf' % want))
            b.save(path)
            rep = analyse(path, sample_pixels=False)
            got = rep['page_data'][0]['page_without_images_color_mode']
            assert got == want, want


class TestCompressPdfImages:
    def test_compress(self, jpeg_pdf, tmp_path, capsys):
        src, hocr = jpeg_pdf
        out = str(tmp_path / 'comp.pdf')
        assert comp_main([src, hocr, out, '--dpi', '100']) == 0
        r = PdfReader(out)
        assert r.page_count() == 2
        imgs = r.page_images(0)
        names = {n for n, _, _ in imgs}
        assert 'MRCbg' in names and 'MRCfg' in names
        filters = {str(r.resolve(s.dict['Filter'])) for _, _, s in imgs}
        assert 'JPXDecode' in filters


class TestPdfToImagestack:
    def test_stack(self, book_pdf, tmp_path, capsys):
        path, _ = book_pdf
        out = str(tmp_path / 'stack.zip')
        assert stack_main([path, out]) == 0
        zf = zipfile.ZipFile(out)
        assert len(zf.namelist()) >= 2


class TestPdfRenderer:
    def test_render_textonly(self, book_pdf, tmp_path, capsys):
        _, hocr = book_pdf
        out = str(tmp_path / 'text.pdf')
        assert rend_main(['-T', hocr, '-o', out, '-D', '100']) == 0
        r = PdfReader(out)
        assert r.page_count() == 2
        assert b'TJ' in r.page_contents(0)
        assert not r.page_images(0)


class TestEpubToPdf:
    def test_basic_epub(self, tmp_path, capsys):
        epub = tmp_path / 'test.epub'
        with zipfile.ZipFile(epub, 'w') as zf:
            zf.writestr('mimetype', 'application/epub+zip')
            zf.writestr('META-INF/container.xml', '''<?xml version="1.0"?>
<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
 <rootfiles><rootfile full-path="OEBPS/content.opf"
  media-type="application/oebps-package+xml"/></rootfiles></container>''')
            zf.writestr('OEBPS/content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="id">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>A Tale</dc:title><dc:creator>Author X</dc:creator>
  <dc:language>en</dc:language></metadata>
 <manifest><item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>
 </manifest><spine><itemref idref="c1"/></spine></package>''')
            zf.writestr('OEBPS/ch1.xhtml', '''<html xmlns="http://www.w3.org/1999/xhtml">
<body><h1>Chapter One</h1>''' + ''.join(
                '<p>Paragraph %d with some words in it.</p>' % i
                for i in range(120)) + '</body></html>')
        out = str(tmp_path / 'epub.pdf')
        assert epub_main([str(epub), out]) == 0
        r = PdfReader(out)
        assert r.page_count() >= 2
        assert r.info()['Title'] == b'A Tale'
        assert 'Outlines' in r.catalog

    def test_epub_degradation(self, tmp_path):
        """docs/EPUB.md degradation contract: floats, tables, flex and
        unsupported CSS must not crash, must emit pages, and every
        text node must survive into the PDF text stream in document
        order (the layout degrades, the words never do)."""
        epub = tmp_path / 'hard.epub'
        with zipfile.ZipFile(epub, 'w') as zf:
            zf.writestr('mimetype', 'application/epub+zip')
            zf.writestr('META-INF/container.xml', '''<?xml version="1.0"?>
<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
 <rootfiles><rootfile full-path="content.opf"
  media-type="application/oebps-package+xml"/></rootfiles></container>''')
            zf.writestr('content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>Hard Layout</dc:title></metadata>
 <manifest><item id="c1" href="hard.xhtml"
  media-type="application/xhtml+xml"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
            zf.writestr('hard.xhtml', '''<html
 xmlns="http://www.w3.org/1999/xhtml"><head><style>
 .sidebar { float: right; width: 33%; margin: calc(1em + 2px); }
 .grid { display: grid; grid-template-columns: 1fr 1fr; }
 td { padding: 0.5em 1em; text-indent: 2em; }
</style></head><body>
 <p class="sidebar">FLOATED sidebar text</p>
 <p>MAIN column paragraph</p>
 <table><tr><td>CELLA</td><td>CELLB</td></tr>
        <tr><td>CELLC</td><td>CELLD</td></tr></table>
 <div class="grid"><p>GRIDONE</p><p>GRIDTWO</p></div>
 <blockquote>QUOTED passage</blockquote>
</body></html>''')
        out = str(tmp_path / 'hard.pdf')
        assert epub_main([str(epub), out]) == 0
        r = PdfReader(out)
        assert r.page_count() >= 1
        text = b' '.join(r.page_contents(i)
                         for i in range(r.page_count()))
        tokens = [b'FLOATED', b'MAIN', b'CELLA', b'CELLB', b'CELLC',
                  b'CELLD', b'GRIDONE', b'GRIDTWO', b'QUOTED']
        pos = [text.find(t) for t in tokens]
        assert all(p >= 0 for p in pos), (tokens, pos)
        assert pos == sorted(pos)          # document order preserved
        # nested blocks must not double-count (p inside blockquote)
        assert text.count(b'QUOTED') == 1


class TestTools:
    def _run(self, tool, *args):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, 'tools', tool)]
            + list(args), capture_output=True, text=True,
            env=dict(os.environ, APT_PLATFORM='cpu'))

    def test_pdfimagesmrc(self, book_pdf):
        path, _ = book_pdf
        res = self._run('pdfimagesmrc', path)
        assert res.returncode == 0, res.stderr
        assert 'mask' in res.stdout and 'bg' in res.stdout

    def test_mrcview_and_maskview(self, book_pdf, tmp_path):
        path, _ = book_pdf
        out = str(tmp_path / 'view.pdf')
        res = self._run('mrcview', path, out)
        assert res.returncode == 0, res.stderr
        r = PdfReader(out)
        assert r.page_count() == 6   # 2 pages x (bg, fg, mask)
        out2 = str(tmp_path / 'masks.pdf')
        res = self._run('maskview', path, out2)
        assert res.returncode == 0, res.stderr
        assert PdfReader(out2).page_count() == 2

    def test_threshold_and_blur_tools(self, tmp_path):
        from tests.fixtures import render_book_page
        img, _ = render_book_page(120, 160)
        src = str(tmp_path / 'in.png')
        Image.fromarray(img).save(src)
        mask_out = str(tmp_path / 'mask.png')
        res = self._run('threshold-image', src, mask_out,
                        '--dpi', '100', '--denoise', 'fast')
        assert res.returncode == 0, res.stderr
        fg_out = str(tmp_path / 'fg.png')
        res = self._run('partial-blur', src, mask_out, fg_out,
                        '--mode', 'optimise')
        assert res.returncode == 0, res.stderr
        pre = str(tmp_path / 'cmp')
        res = self._run('compress', src, mask_out, pre)
        assert res.returncode == 0, res.stderr
        merged = str(tmp_path / 'merged.png')
        res = self._run('merge', mask_out, pre + '_fg.jp2',
                        pre + '_bg.jp2', merged)
        assert res.returncode == 0, res.stderr
        # render_book_page(w=120, h=160) -> PIL size (120, 160)
        assert Image.open(merged).size == (120, 160)


class TestStrictWellFormedness:
    """Every PDF-producing surface must satisfy the strict parser
    (exact xref offsets, stream lengths, tail rules) — not just the
    lenient in-tree reader."""

    def _strict_parse(self, path):
        from archive_pdf_tools_tpu.validators.pdfa_check import StrictPdf
        with open(path, 'rb') as fp:
            return StrictPdf(fp.read())

    def test_epub_output_strict(self, tmp_path):
        import zipfile
        epub = tmp_path / 'min.epub'
        with zipfile.ZipFile(epub, 'w') as zf:
            zf.writestr('mimetype', 'application/epub+zip')
            zf.writestr('META-INF/container.xml', '''<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container"
 version="1.0"><rootfiles><rootfile full-path="c.opf"
 media-type="application/oebps-package+xml"/></rootfiles></container>''')
            zf.writestr('c.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="2.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>T</dc:title></metadata>
 <manifest><item id="c1" href="ch1.xhtml"
  media-type="application/xhtml+xml"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
            zf.writestr('ch1.xhtml',
                        '<html><body><h1>One</h1><p>hello</p>'
                        '</body></html>')
        out = str(tmp_path / 'e.pdf')
        assert epub_main([str(epub), out]) == 0
        pdf = self._strict_parse(out)
        assert pdf.trailer is not None

    def test_pdfrenderer_output_strict(self, tmp_path, book_pdf=None):
        from tests.fixtures import make_book
        _stack, hocr, _pages = make_book(tmp_path, n_pages=1)
        out = str(tmp_path / 'r.pdf')
        assert rend_main(['-T', hocr, '-o', out]) == 0
        self._strict_parse(out)

    def test_compress_pdf_images_output_strict(self, jpeg_pdf, tmp_path):
        src, hocr = jpeg_pdf
        out = str(tmp_path / 'c.pdf')
        assert comp_main([src, hocr, out, '--dpi', '100']) == 0
        self._strict_parse(out)


class TestPdfcomp:
    def test_pdfcomp_with_hocr(self, jpeg_pdf, tmp_path, capsys):
        from archive_pdf_tools_tpu.cli.pdfcomp import main as pdfcomp_main
        src, hocr = jpeg_pdf
        out = str(tmp_path / 'pc.pdf')
        assert pdfcomp_main([src, out, '--hocr', hocr]) == 0
        cap = capsys.readouterr()
        assert 'Compression factor:' in cap.out
        r = PdfReader(out)
        assert r.page_count() == 2
        names = {n for n, _, _ in r.page_images(0)}
        assert 'MRCbg' in names

    def test_pdfcomp_without_hocr(self, jpeg_pdf, tmp_path, capsys):
        # no pdf-to-hocr binary in this environment: must still
        # compress without text-guided masks
        from archive_pdf_tools_tpu.cli.pdfcomp import main as pdfcomp_main
        src, _hocr = jpeg_pdf
        out = str(tmp_path / 'pc2.pdf')
        assert pdfcomp_main([src, out]) == 0
        assert PdfReader(out).page_count() == 2


def test_epub_to_pdf_rejects_pdf_and_stamps_producer(tmp_path):
    """Reference-CLI contract: PDF input exits with 'document is PDF
    already' (bin/epub-to-pdf:43); output carries the converter
    Producer/Creator (bin/epub-to-pdf:52-60)."""
    import pytest
    import zipfile
    from archive_pdf_tools_tpu.cli.epub_to_pdf import main as e2p
    pdfish = tmp_path / 'in.pdf'
    pdfish.write_bytes(b'%PDF-1.4\n%%EOF\n')
    with pytest.raises(SystemExit, match='document is PDF already'):
        e2p([str(pdfish), str(tmp_path / 'o.pdf')])
    notzip = tmp_path / 'junk.epub'
    notzip.write_bytes(b'garbage bytes')
    with pytest.raises(SystemExit, match='not an EPUB/XPS/CBZ'):
        e2p([str(notzip), str(tmp_path / 'o.pdf')])
    # a real conversion stamps Producer/Creator
    src = tmp_path / 'b.epub'
    with zipfile.ZipFile(str(src), 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml',
                    '<?xml version="1.0"?><container xmlns="urn:oasis:'
                    'names:tc:opendocument:xmlns:container" version='
                    '"1.0"><rootfiles><rootfile full-path="c.opf" '
                    'media-type="application/oebps-package+xml"/>'
                    '</rootfiles></container>')
        zf.writestr('c.opf', '<?xml version="1.0"?>'
                    '<package xmlns="http://www.idpf.org/2007/opf" '
                    'version="3.0"><metadata xmlns:dc="http://purl.'
                    'org/dc/elements/1.1/"><dc:title>T</dc:title>'
                    '</metadata><manifest><item id="c1" href="c.xhtml"'
                    ' media-type="application/xhtml+xml"/></manifest>'
                    '<spine><itemref idref="c1"/></spine></package>')
        zf.writestr('c.xhtml', '<html xmlns="http://www.w3.org/1999/'
                    'xhtml"><body><p>hello</p></body></html>')
    out = str(tmp_path / 'out.pdf')
    assert e2p([str(src), out]) == 0
    from archive_pdf_tools_tpu.pdf.reader import PdfReader
    info = PdfReader(out).info()
    prod = info.get('Producer')
    prod = prod.decode() if isinstance(prod, bytes) else str(prod)
    assert 'Internet Archive PDF converter' in prod
