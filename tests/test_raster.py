"""Content-stream rasterizer tests (pdf/raster.py) and the three CLIs
it completes: colour-mode-by-render, rasterizing pdf-to-imagestack,
epub-to-pdf image placement (VERDICT round-1 missing #2)."""

import io
import zipfile

import numpy as np
from PIL import Image

from archive_pdf_tools_tpu.pdf.builder import DocumentBuilder
from archive_pdf_tools_tpu.pdf.reader import PdfReader
from archive_pdf_tools_tpu.pdf.raster import Rasterizer, page_colour_mode


def _doc_with_ops(ops, w=200, h=150, render_text=False, words=None):
    b = DocumentBuilder(render_text_lines=render_text)
    idx = b.add_text_page(words or [], w, h, 72)
    b.pages[idx].extra_ops = ops
    b.write_pdfa()
    b.write_metadata()
    buf = io.BytesIO()
    b.save(buf, deflate=False)
    return PdfReader(buf.getvalue())


class TestVectorRaster:
    def test_rect_fill_exact_geometry(self):
        r = _doc_with_ops(b'1 0 0 rg 20 90 60 40 re f')
        a = Rasterizer(r).render_page(0, scale=2.0)
        red = (a[..., 0] > 200) & (a[..., 1] < 80) & (a[..., 2] < 80)
        assert red.sum() == 60 * 40 * 4          # exact pixel count
        ys, xs = np.nonzero(red)
        # user (20, 90)-(80, 130) -> device y flipped: rows 40..120
        assert xs.min() == 40 and xs.max() == 159
        assert ys.min() == 40 and ys.max() == 119

    def test_winding_rules(self):
        # two concentric rects, same direction: nonzero fills both,
        # even-odd leaves a hole
        ops = (b'0 g 10 10 100 100 re 30 30 60 60 re ')
        a_nz = Rasterizer(_doc_with_ops(ops + b'f')).render_page(0)
        a_eo = Rasterizer(_doc_with_ops(ops + b'f*')).render_page(0)
        c = (70, 60)   # inside the inner rect (device coords)
        assert (a_nz[c[1], c[0]] < 50).all()
        assert (a_eo[c[1], c[0]] > 200).all()

    def test_bezier_circleish(self):
        # approximate circle with 4 cubics; area ~ pi r^2
        k = 0.5523 * 40
        ops = (b'0 g 100 75 m '
               b'100 %g 60 115 l' % (75 + 40)).replace(b'l', b'l')
        ops = (b'0 g 100 115 m '
               + b'%g 115 60 %g 60 75 c ' % (100 - k, 75 + k)
               + b'60 %g %g 35 100 35 c ' % (75 - k, 100 - k)
               + b'%g 35 140 %g 140 75 c ' % (100 + k, 75 - k)
               + b'140 %g %g 115 100 115 c f' % (75 + k, 100 + k))
        a = Rasterizer(_doc_with_ops(ops)).render_page(0)
        black = (a < 50).all(axis=-1)
        assert abs(black.sum() - np.pi * 40 * 40) < 300

    def test_stroke_line(self):
        r = _doc_with_ops(b'0 G 4 w 10 75 m 190 75 l S')
        a = Rasterizer(r).render_page(0)
        black = (a < 50).all(axis=-1)
        assert 180 * 3 <= black.sum() <= 180 * 6

    def test_clip(self):
        ops = (b'q 50 50 40 40 re W n 0 g 0 0 200 150 re f Q')
        a = Rasterizer(_doc_with_ops(ops)).render_page(0)
        black = (a < 50).all(axis=-1)
        assert black.sum() == 40 * 40

    def test_cm_transform(self):
        # translate+scale via cm, then unit rect
        ops = b'q 40 0 0 30 20 20 cm 0 g 0 0 1 1 re f Q'
        a = Rasterizer(_doc_with_ops(ops)).render_page(0)
        assert ((a < 50).all(axis=-1)).sum() == 40 * 30

    def test_cmyk_and_gray_ops(self):
        r = _doc_with_ops(b'1 0 0 0 k 10 10 50 50 re f '
                          b'0.5 g 100 10 50 50 re f')
        a = Rasterizer(r).render_page(0)
        cyanish = (a[..., 0] < 100) & (a[..., 1] > 180) & \
            (a[..., 2] > 180)
        assert cyanish.sum() == 2500
        assert page_colour_mode(r, 0) == 'RGB'


class TestTextRaster:
    def _words(self):
        return [{'lines': [{
            'bbox': [10, 30, 180, 60], 'baseline': (0.0, 0),
            'words': [{'text': 'hello', 'bbox': [10, 30, 90, 60],
                       'confidence': 90, 'writing_direction': 0,
                       'fontsize': 20}]}]}]

    def test_visible_text_marks(self):
        r = _doc_with_ops(b'', render_text=True, words=self._words())
        a = Rasterizer(r).render_page(0, scale=2.0)
        assert ((a < 50).all(axis=-1)).sum() > 1000
        assert page_colour_mode(r, 0) == 'Bitonal'

    def test_invisible_text_no_marks(self):
        r = _doc_with_ops(b'', render_text=False, words=self._words())
        a = Rasterizer(r).render_page(0, scale=2.0)
        assert ((a < 50).all(axis=-1)).sum() == 0


class TestImageRaster:
    def test_mrc_stack_composites(self, tmp_path):
        from tests.test_recode_e2e import run_recode
        out, res, pages = run_recode(tmp_path, validate=False)
        r = PdfReader(out)
        a = Rasterizer(r).render_page(0, scale=1.0)
        dark = ((a < 100).all(axis=-1)).mean()
        assert 0.01 < dark < 0.7      # fg text visible through SMask
        # with images skipped the page is blank -> Bitonal
        assert page_colour_mode(r, 0) == 'Bitonal'

    def test_skip_images_flag(self, tmp_path):
        from tests.test_recode_e2e import run_recode
        out, _res, _pages = run_recode(tmp_path, validate=False)
        r = PdfReader(out)
        a = Rasterizer(r).render_page(0, skip_images=True)
        assert (a == 255).all()


class TestCliIntegration:
    def test_metadata_json_vector_colour(self):
        from archive_pdf_tools_tpu.cli.pdf_metadata_json import \
            analyse_page
        key = 'page_without_images_color_mode'
        r = _doc_with_ops(b'0.9 0.2 0.2 rg 10 10 100 100 re f')
        assert analyse_page(r, 0)[key] == 'RGB'
        # NB: a page whose render has exactly two values classifies
        # Bitonal — the reference's min/max pixmap test does the same
        # (bin/pdf-metadata-json:96-108); Grayscale needs >= 3 levels
        r2 = _doc_with_ops(b'0.5 g 10 10 100 100 re f '
                           b'0.2 g 120 10 50 50 re f')
        assert analyse_page(r2, 0)[key] == 'Grayscale'
        r3 = _doc_with_ops(b'0 g 10 10 100 100 re f')
        assert analyse_page(r3, 0)[key] == 'Bitonal'

    def test_imagestack_vector_only_page(self, tmp_path):
        from archive_pdf_tools_tpu.cli.pdf_to_imagestack import main
        b = DocumentBuilder()
        i0 = b.add_text_page([], 200, 150, 72)
        b.pages[i0].extra_ops = b'0.2 0.4 0.9 rg 30 30 120 80 re f'
        b.write_pdfa()
        b.write_metadata()
        src = str(tmp_path / 'vec.pdf')
        b.save(src)
        outzip = str(tmp_path / 'stack.zip')
        assert main([src, outzip, '--ppi', '144']) == 0
        with zipfile.ZipFile(outzip) as zf:
            names = zf.namelist()
            assert len(names) == 1
            img = Image.open(io.BytesIO(zf.read(names[0])))
            assert img.size[0] == 400     # 200pt at 144ppi
            arr = np.asarray(img.convert('RGB'))
            blueish = (arr[..., 2] > 150) & (arr[..., 0] < 150)
            assert blueish.sum() > 1000

    def test_epub_image_placement(self, tmp_path):
        from archive_pdf_tools_tpu.cli.epub_to_pdf import main
        img = Image.fromarray(
            (np.mgrid[0:60, 0:80][0] * 4).astype(np.uint8)).convert('RGB')
        ibuf = io.BytesIO()
        img.save(ibuf, format='JPEG')
        epub = str(tmp_path / 't.epub')
        with zipfile.ZipFile(epub, 'w') as zf:
            zf.writestr('mimetype', 'application/epub+zip')
            zf.writestr('META-INF/container.xml', '''<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container"
 version="1.0"><rootfiles><rootfile full-path="OEBPS/content.opf"
 media-type="application/oebps-package+xml"/></rootfiles></container>''')
            zf.writestr('OEBPS/content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="2.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>Pic</dc:title></metadata>
 <manifest><item id="c1" href="ch1.xhtml"
  media-type="application/xhtml+xml"/>
  <item id="i1" href="img/fig.jpg" media-type="image/jpeg"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
            zf.writestr('OEBPS/ch1.xhtml',
                        '<html><body><h1>One</h1><p>before</p>'
                        '<p><img src="img/fig.jpg"/></p>'
                        '<p>after</p></body></html>')
            zf.writestr('OEBPS/img/fig.jpg', ibuf.getvalue())
        out = str(tmp_path / 'out.pdf')
        assert main([epub, out]) == 0
        r = PdfReader(out)
        assert len(r.page_images(0)) == 1
        # gradient renders as many gray levels
        a = Rasterizer(r).render_page(0)
        assert len(np.unique(a[..., 0])) > 30

    def test_imagestack_reference_signature(self, tmp_path):
        """The reference's 4-positional form (in_pdf in_json identifier
        out_zip) works: IA member naming, json-driven format."""
        import json
        from tests.test_recode_e2e import run_recode
        from archive_pdf_tools_tpu.cli.pdf_metadata_json import analyse
        from archive_pdf_tools_tpu.cli.pdf_to_imagestack import \
            main as imain
        pdf, _r, _p = run_recode(tmp_path, n_pages=1, validate=False)
        meta = tmp_path / 'meta.json'
        meta.write_text(json.dumps(analyse(pdf)))
        out = str(tmp_path / 'st.zip')
        assert imain([pdf, str(meta), 'mybook', out]) == 0
        names = zipfile.ZipFile(out).namelist()
        assert names == ['mybook_jp2/mybook_0000.jp2']

    def test_epub_proportional_layout(self, tmp_path):
        """Headings set in 14pt Helvetica-Bold, body in 10pt
        Times-Roman with AFM-measured ragged-right wraps (not
        monospace), WinAnsi punctuation preserved."""
        from archive_pdf_tools_tpu.cli.epub_to_pdf import main
        from archive_pdf_tools_tpu.pdf.textextract import (
            extract_page_glyphs, group_words, group_lines)
        epub = str(tmp_path / 'p.epub')
        with zipfile.ZipFile(epub, 'w') as zf:
            zf.writestr('META-INF/container.xml', '''<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container"
 version="1.0"><rootfiles><rootfile full-path="content.opf"
 media-type="application/oebps-package+xml"/></rootfiles></container>''')
            zf.writestr('content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="2.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>T</dc:title></metadata>
 <manifest><item id="c1" href="c1.xhtml"
  media-type="application/xhtml+xml"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
            zf.writestr('c1.xhtml',
                        '<html><body><h1>Big Heading</h1><p>'
                        + 'The quick brown fox jumps over it. ' * 25
                        + '</p><p>Curly “quotes” — dash.'
                        '</p></body></html>')
        out = str(tmp_path / 'p.pdf')
        assert main([epub, out]) == 0
        r = PdfReader(out)
        lines = group_lines(group_words(
            extract_page_glyphs(r, 0, scale=1.0)[0]))
        assert [w[0] for w in lines[0]['words']] == ['Big', 'Heading']
        assert lines[0]['x_size'] > lines[1]['x_size']   # 14pt vs 10pt
        # proportional wrap: body lines end ragged near the column
        # right edge (54 + 504 = 558pt), well past a monospace wrap
        body_edges = [ln['bbox'][2] for ln in lines[1:6]]
        assert all(470 < e <= 559 for e in body_edges), body_edges
        text = ' '.join(w[0] for ln in lines for w in ln['words'])
        assert '“quotes”' in text and '—' in text


class TestMultiImagePages:
    def _two_image_pdf(self, tmp_path):
        """A page carrying two separate images (left gray photo, right
        dark figure) plus visible vector marks."""
        from archive_pdf_tools_tpu.pdf.writer import (PdfWriter, Name,
                                                      Stream)
        w = PdfWriter()
        cat = w.reserve()
        pages = w.reserve()
        rng = np.random.default_rng(0)
        a1 = (rng.random((100, 80)) * 60 + 180).astype(np.uint8)
        a2 = np.full((100, 80), 40, np.uint8)
        refs = []
        for arr in (a1, a2):
            refs.append(w.add(Stream(
                {Name('Type'): Name('XObject'),
                 Name('Subtype'): Name('Image'),
                 Name('Width'): arr.shape[1],
                 Name('Height'): arr.shape[0],
                 Name('BitsPerComponent'): 8,
                 Name('ColorSpace'): Name('DeviceGray')},
                arr.tobytes(), deflate=True)))
        content = w.add(Stream({}, (
            b'q 80 0 0 100 10 40 cm /ImA Do Q\n'
            b'q 80 0 0 100 110 40 cm /ImB Do Q\n'
            b'0 g 10 10 180 20 re f'), deflate=False))
        page = w.add({Name('Type'): Name('Page'), Name('Parent'): pages,
                      Name('MediaBox'): [0, 0, 200, 150],
                      Name('Contents'): content,
                      Name('Resources'): {Name('XObject'): {
                          Name('ImA'): refs[0], Name('ImB'): refs[1]}}})
        w.set(pages, {Name('Type'): Name('Pages'), Name('Kids'): [page],
                      Name('Count'): 1})
        w.set(cat, {Name('Type'): Name('Catalog'), Name('Pages'): pages})
        path = str(tmp_path / 'two.pdf')
        with open(path, 'wb') as fp:
            w.save(fp, cat, None, b'0123456789abcdef')
        return path

    def test_load_page_image_composites_both(self, tmp_path):
        from archive_pdf_tools_tpu.pipeline.recode import \
            _load_page_image
        from archive_pdf_tools_tpu.pdf.reader import PdfReader
        path = self._two_image_pdf(tmp_path)
        r = PdfReader(path)
        img = _load_page_image(r, None, 0, None, None, None, False, None)
        arr = np.asarray(img.convert('L'))
        h, w = arr.shape
        # both image regions must be present: light left, dark right
        left = arr[h // 2, w // 4]
        right = arr[h // 2, 3 * w // 4]
        assert left > 150 and right < 90, (left, right)

    def test_compress_pdf_images_handles_both(self, tmp_path):
        from archive_pdf_tools_tpu.cli.compress_pdf_images import \
            main as comp_main
        from archive_pdf_tools_tpu.pdf.reader import PdfReader
        path = self._two_image_pdf(tmp_path)
        out = str(tmp_path / 'comp2.pdf')
        assert comp_main([path, out, '--dpi', '100']) == 0
        r = PdfReader(out)
        names = {n for n, _, _ in r.page_images(0)}
        assert {'MRCbg', 'MRCfg', 'MRCbg1', 'MRCfg1'} <= names
        # and the composite still renders with both halves intact
        a = Rasterizer(r).render_page(0)
        g = a[..., 0]
        assert g[90, 50] > 140 and g[90, 150] < 110


class TestInlineImagesAndShadings:
    def _doc(self, content, shading=None, w=200, h=150):
        from archive_pdf_tools_tpu.pdf.writer import (PdfWriter, Name,
                                                      Stream)
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        cref = wr.add(Stream({}, content))
        res = {}
        if shading is not None:
            res[Name('Shading')] = {Name('Sh0'): wr.add(shading)}
        page = wr.add({Name('Type'): Name('Page'),
                       Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, w, h],
                       Name('Contents'): cref,
                       Name('Resources'): res})
        wr.set(pages, {Name('Type'): Name('Pages'), Name('Kids'): [page],
                       Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'), Name('Pages'): pages})
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        return PdfReader(buf.getvalue())

    def test_inline_image_gray(self):
        # 2x2 gray inline image scaled over a 60x40 region
        data = bytes([0, 255, 255, 0])
        content = (b'q 60 0 0 40 20 20 cm BI /W 2 /H 2 /BPC 8 /CS /G ID '
                   + data + b' EI Q')
        r = self._doc(content)
        a = Rasterizer(r).render_page(0)
        # dark quadrant top-left of the image region
        assert a[150 - 58, 25, 0] < 60       # top-left sample = 0
        assert a[150 - 58, 70, 0] > 200      # top-right = 255

    def test_inline_image_mask(self):
        stride = bytes([0b10000000])        # 1x? mask: 1 bit
        content = (b'0 0 1 rg q 50 0 0 50 10 10 cm '
                   b'BI /W 1 /H 1 /BPC 1 /IM true ID '
                   + bytes([0x00]) + b' EI Q')
        r = self._doc(content)
        a = Rasterizer(r).render_page(0)
        # sample 0 paints fill colour (blue) across the square
        assert a[150 - 30, 30, 2] > 200 and a[150 - 30, 30, 0] < 100

    def test_axial_shading(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        shading = {
            Name('ShadingType'): 2,
            Name('ColorSpace'): Name('DeviceRGB'),
            Name('Coords'): [0, 0, 200, 0],
            Name('Function'): {
                Name('FunctionType'): 2,
                Name('Domain'): [0, 1],
                Name('C0'): [1, 0, 0],
                Name('C1'): [0, 0, 1],
                Name('N'): 1,
            },
        }
        content = b'/Sh0 sh'
        r = self._doc(content, shading=shading)
        a = Rasterizer(r).render_page(0)
        # left edge red, right edge blue, middle purple-ish
        assert a[75, 3, 0] > 200 and a[75, 3, 2] < 60
        assert a[75, 196, 2] > 200 and a[75, 196, 0] < 60
        mid = a[75, 100]
        assert 90 < mid[0] < 170 and 90 < mid[2] < 170
        from archive_pdf_tools_tpu.pdf.raster import page_colour_mode
        assert page_colour_mode(r, 0) == 'RGB'


class TestMeshShadings(TestInlineImagesAndShadings):
    @staticmethod
    def _bits(values):
        """Pack (value, nbits) pairs MSB-first into bytes."""
        out = bytearray()
        acc = 0
        nb = 0
        for v, n in values:
            acc = (acc << n) | (v & ((1 << n) - 1))
            nb += n
            while nb >= 8:
                nb -= 8
                out.append((acc >> nb) & 0xFF)
        if nb:
            out.append((acc << (8 - nb)) & 0xFF)
        return bytes(out)

    def _mesh_doc(self, shading_dict, payload, fn_stream=None):
        from archive_pdf_tools_tpu.pdf.writer import (PdfWriter, Name,
                                                      Stream)
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        if fn_stream is not None:
            shading_dict[Name('Function')] = wr.add(fn_stream)
        sref = wr.add(Stream(shading_dict, payload))
        cref = wr.add(Stream({}, b'/Sh0 sh'))
        page = wr.add({Name('Type'): Name('Page'),
                       Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, 200, 150],
                       Name('Contents'): cref,
                       Name('Resources'): {
                           Name('Shading'): {Name('Sh0'): sref}}})
        wr.set(pages, {Name('Type'): Name('Pages'),
                       Name('Kids'): [page], Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'),
                     Name('Pages'): pages})
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        return PdfReader(buf.getvalue())

    def test_freeform_triangle_gouraud(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        # bpc=16 coords in Decode [0,200]/[0,150]; bpcomp=8 rgb
        def vx(flag, x, y, rgb):
            return [(flag, 8),
                    (int(x / 200 * 65535), 16),
                    (int(y / 150 * 65535), 16)] + \
                   [(c, 8) for c in rgb]
        payload = self._bits(
            vx(0, 10, 10, (255, 0, 0)) + vx(0, 190, 10, (0, 255, 0))
            + vx(0, 100, 140, (0, 0, 255)))
        sh = {Name('ShadingType'): 4,
              Name('ColorSpace'): Name('DeviceRGB'),
              Name('BitsPerCoordinate'): 16,
              Name('BitsPerComponent'): 8,
              Name('BitsPerFlag'): 8,
              Name('Decode'): [0, 200, 0, 150, 0, 1, 0, 1, 0, 1]}
        r = self._mesh_doc(sh, payload)
        a = Rasterizer(r).render_page(0)
        # near the red vertex (user 20,15 -> row 150-15)
        p = a[150 - 15, 22]
        assert p[0] > 150 and p[2] < 110, p
        # near the blue vertex
        p = a[150 - 130, 100]
        assert p[2] > 150 and p[0] < 110, p
        # outside the triangle stays white
        assert a[150 - 140, 5, 0] > 240

    def test_freeform_odd_bitwidth(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        # bpc=12 is NOT byte-aligned: exercises the bit-level take()
        # fallback (the bulk record decoder handles only 8/16/32)
        def vx(flag, x, y, rgb):
            return [(flag, 8),
                    (int(x / 200 * 4095), 12),
                    (int(y / 150 * 4095), 12)] + \
                   [(c, 8) for c in rgb]
        payload = self._bits(
            vx(0, 10, 10, (255, 0, 0)) + vx(0, 190, 10, (0, 255, 0))
            + vx(0, 100, 140, (0, 0, 255)))
        sh = {Name('ShadingType'): 4,
              Name('ColorSpace'): Name('DeviceRGB'),
              Name('BitsPerCoordinate'): 12,
              Name('BitsPerComponent'): 8,
              Name('BitsPerFlag'): 8,
              Name('Decode'): [0, 200, 0, 150, 0, 1, 0, 1, 0, 1]}
        r = self._mesh_doc(sh, payload)
        a = Rasterizer(r).render_page(0)
        p = a[150 - 15, 22]
        assert p[0] > 150 and p[2] < 110, p
        p = a[150 - 130, 100]
        assert p[2] > 150 and p[0] < 110, p
        assert a[150 - 140, 5, 0] > 240

    def test_lattice_with_sampled_function(self):
        from archive_pdf_tools_tpu.pdf.writer import Name, Stream
        # 2x2 lattice, single parametric value per vertex mapped
        # through a FunctionType 0 sampled ramp red->blue
        def vx(x, y, t):
            return [(int(x / 200 * 65535), 16),
                    (int(y / 150 * 65535), 16), (t, 8)]
        payload = self._bits(
            vx(0, 0, 0) + vx(200, 0, 255)
            + vx(0, 150, 0) + vx(200, 150, 255))
        fn = Stream({Name('FunctionType'): 0,
                     Name('Domain'): [0, 1],
                     Name('Range'): [0, 1, 0, 1, 0, 1],
                     Name('Size'): [2],
                     Name('BitsPerSample'): 8},
                    bytes([255, 0, 0, 0, 0, 255]))
        sh = {Name('ShadingType'): 5,
              Name('ColorSpace'): Name('DeviceRGB'),
              Name('BitsPerCoordinate'): 16,
              Name('BitsPerComponent'): 8,
              Name('VerticesPerRow'): 2,
              Name('Decode'): [0, 200, 0, 150, 0, 1]}
        r = self._mesh_doc(sh, payload, fn_stream=fn)
        a = Rasterizer(r).render_page(0)
        assert a[75, 4, 0] > 180 and a[75, 4, 2] < 80     # left red
        assert a[75, 195, 2] > 180 and a[75, 195, 0] < 80  # right blue

    def test_coons_patch_corner_colours(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        # one square patch, straight edges, distinct corner colours
        corners = [(0, 0), (200, 0), (200, 150), (0, 150)]

        def third(p, q, k):
            return (p[0] + (q[0] - p[0]) * k / 3.0,
                    p[1] + (q[1] - p[1]) * k / 3.0)
        p = [corners[0], third(corners[0], corners[1], 1),
             third(corners[0], corners[1], 2), corners[1],
             third(corners[1], corners[2], 1),
             third(corners[1], corners[2], 2), corners[2],
             third(corners[2], corners[3], 1),
             third(corners[2], corners[3], 2), corners[3],
             third(corners[3], corners[0], 1),
             third(corners[3], corners[0], 2)]
        cols = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
        vals = [(0, 8)]
        for (x, y) in p:
            vals += [(int(x / 200 * 65535), 16),
                     (int(y / 150 * 65535), 16)]
        for c in cols:
            vals += [(ch, 8) for ch in c]
        sh = {Name('ShadingType'): 6,
              Name('ColorSpace'): Name('DeviceRGB'),
              Name('BitsPerCoordinate'): 16,
              Name('BitsPerComponent'): 8,
              Name('BitsPerFlag'): 8,
              Name('Decode'): [0, 200, 0, 150, 0, 1, 0, 1, 0, 1]}
        r = self._mesh_doc(sh, self._bits(vals))
        a = Rasterizer(r).render_page(0)
        assert a[150 - 6, 6, 0] > 170                 # c1 red @ p1
        assert a[150 - 6, 193, 1] > 170               # c2 green @ p4
        assert a[150 - 144, 193, 2] > 170             # c3 blue @ p7
        p4c = a[150 - 144, 6]
        assert p4c[0] > 170 and p4c[1] > 170          # c4 yellow @ p10


class TestFormXObjectImages:
    def test_metadata_sees_form_wrapped_image(self, tmp_path):
        # a scan image drawn only inside a Form XObject must still be
        # inventoried (draw-order placement records carry the stream
        # resolved via the form's own resources)
        from archive_pdf_tools_tpu.pdf.writer import (PdfWriter, Name,
                                                      Stream)
        from archive_pdf_tools_tpu.cli.pdf_metadata_json import \
            analyse_page
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        arr = np.full((50, 40), 120, np.uint8)
        img_ref = wr.add(Stream(
            {Name('Type'): Name('XObject'),
             Name('Subtype'): Name('Image'),
             Name('Width'): 40, Name('Height'): 50,
             Name('BitsPerComponent'): 8,
             Name('ColorSpace'): Name('DeviceGray')},
            arr.tobytes(), deflate=True))
        form_ref = wr.add(Stream(
            {Name('Type'): Name('XObject'),
             Name('Subtype'): Name('Form'),
             Name('BBox'): [0, 0, 1, 1],
             Name('Resources'): {Name('XObject'):
                                 {Name('FIm'): img_ref}}},
            b'q 1 0 0 1 0 0 cm /FIm Do Q'))
        content = wr.add(Stream(
            {}, b'q 80 0 0 100 10 20 cm /Fx0 Do Q'))
        page = wr.add({Name('Type'): Name('Page'), Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, 200, 150],
                       Name('Contents'): content,
                       Name('Resources'): {Name('XObject'):
                                           {Name('Fx0'): form_ref}}})
        wr.set(pages, {Name('Type'): Name('Pages'), Name('Kids'): [page],
                       Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'), Name('Pages'): pages})
        path = str(tmp_path / 'form.pdf')
        with open(path, 'wb') as fp:
            wr.save(fp, cat, None, b'0123456789abcdef')
        r = PdfReader(path)
        rep = analyse_page(r, 0)
        assert len(rep['image_data']) == 1
        im = rep['image_data'][0]
        assert im['width'] == 40 and im['label'] == 'FIm'
        # placed at (10, 20)-(90, 120) PDF coords -> top-left origin
        assert abs(im['bbox'][0] - 10) < 0.01
        assert abs(im['bbox'][2] - 90) < 0.01


class TestExtGState:
    """ExtGState alpha / blend modes / transfer functions
    (VERDICT r2 missing #5: the rasterizer used to ignore /gs)."""

    def _doc(self, content, egs):
        from archive_pdf_tools_tpu.pdf.writer import (PdfWriter, Name,
                                                      Stream)
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()

        def conv(v):
            if isinstance(v, Stream):
                return wr.add(v)
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        cref = wr.add(Stream({}, content))
        page = wr.add({Name('Type'): Name('Page'),
                       Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, 200, 150],
                       Name('Contents'): cref,
                       Name('Resources'): {
                           Name('ExtGState'): {Name('GS0'): conv(egs)}}})
        wr.set(pages, {Name('Type'): Name('Pages'),
                       Name('Kids'): [page], Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'),
                     Name('Pages'): pages})
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        return PdfReader(buf.getvalue())

    def test_constant_fill_alpha(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        r = self._doc(b'/GS0 gs 1 0 0 rg 0 0 200 150 re f',
                      {Name('ca'): 0.5})
        a = Rasterizer(r).render_page(0)
        # red at 0.5 over white: (255, 127, 127)
        assert abs(int(a[75, 100, 0]) - 255) <= 1
        assert abs(int(a[75, 100, 1]) - 127) <= 2
        assert abs(int(a[75, 100, 2]) - 127) <= 2

    def test_multiply_blend(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        r = self._doc(b'1 1 0 rg 0 0 200 150 re f '
                      b'/GS0 gs 0 1 1 rg 50 50 60 60 re f',
                      {Name('BM'): Name('Multiply')})
        a = Rasterizer(r).render_page(0)
        # yellow * cyan = green inside the overlap
        p = a[150 - 80, 80]
        assert p[0] < 5 and p[1] > 250 and p[2] < 5, p
        # outside stays yellow
        p = a[150 - 20, 20]
        assert p[0] > 250 and p[1] > 250 and p[2] < 5, p

    def test_unknown_blend_is_normal(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        r = self._doc(b'1 1 0 rg 0 0 200 150 re f '
                      b'/GS0 gs 0 1 1 rg 50 50 60 60 re f',
                      {Name('BM'): Name('NotAMode')})
        a = Rasterizer(r).render_page(0)
        p = a[150 - 80, 80]
        assert p[0] < 5 and p[1] > 250 and p[2] > 250, p   # plain cyan

    def test_luminosity_blend(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        r = self._doc(b'1 0 0 rg 0 0 200 150 re f '
                      b'/GS0 gs 0.5 g 0 0 200 150 re f',
                      {Name('BM'): Name('Luminosity')})
        a = Rasterizer(r).render_page(0)
        # SetLum(red, 0.5): (1, 0.2857, 0.2857) after ClipColor
        p = a[75, 100]
        assert p[0] > 250 and abs(int(p[1]) - 73) <= 3 \
            and abs(int(p[2]) - 73) <= 3, p

    def test_transfer_inversion(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        # TR = 1 - t (Type 2 exponential, C0=1, C1=0): painting 0.25
        # gray lands as 0.75 gray
        r = self._doc(b'/GS0 gs 0.25 g 0 0 200 150 re f',
                      {Name('TR'): {Name('FunctionType'): 2,
                                    Name('Domain'): [0, 1],
                                    Name('C0'): [1.0], Name('C1'): [0.0],
                                    Name('N'): 1}})
        a = Rasterizer(r).render_page(0)
        assert all(abs(int(a[75, 100, k]) - 191) <= 2 for k in range(3))

    def test_alpha_restored_by_Q(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        r = self._doc(b'q /GS0 gs Q 1 0 0 rg 0 0 200 150 re f',
                      {Name('ca'): 0.2})
        a = Rasterizer(r).render_page(0)
        p = a[75, 100]
        assert p[0] > 250 and p[1] < 5 and p[2] < 5, p   # opaque red

    def _smask_doc(self, content, smask_dict, group_content,
                   extra_egs=None):
        from archive_pdf_tools_tpu.pdf.writer import (PdfWriter, Name,
                                                      Stream)
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        gref = wr.add(Stream({Name('Type'): Name('XObject'),
                              Name('Subtype'): Name('Form'),
                              Name('BBox'): [0, 0, 200, 150],
                              Name('Group'): {
                                  Name('S'): Name('Transparency'),
                                  Name('CS'): Name('DeviceGray')}},
                             group_content))
        egs = {Name('SMask'): dict(smask_dict, **{Name('G'): gref})}
        egs.update(extra_egs or {})
        cref = wr.add(Stream({}, content))
        page = wr.add({Name('Type'): Name('Page'),
                       Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, 200, 150],
                       Name('Contents'): cref,
                       Name('Resources'): {
                           Name('ExtGState'): {Name('GS0'): egs}}})
        wr.set(pages, {Name('Type'): Name('Pages'),
                       Name('Kids'): [page], Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'),
                     Name('Pages'): pages})
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        return PdfReader(buf.getvalue())

    def test_luminosity_soft_mask(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        # mask group paints a white (lum=1) rect on the default black
        # backdrop: the red fill only lands inside that rect
        r = self._smask_doc(
            b'/GS0 gs 1 0 0 rg 0 0 200 150 re f',
            {Name('S'): Name('Luminosity')},
            b'1 g 40 40 80 60 re f')
        a = Rasterizer(r).render_page(0)
        p = a[150 - 70, 80]               # inside the mask rect
        assert p[0] > 250 and p[1] < 5, p
        p = a[150 - 20, 10]               # outside: untouched white
        assert (p > 250).all(), p

    def test_alpha_soft_mask_and_none_reset(self):
        from archive_pdf_tools_tpu.pdf.writer import Name
        # alpha subtype: painted group area = alpha 1, rest 0; a later
        # /SMask /None ExtGState must clear it.  The second ExtGState
        # has no G, so build it inline.
        from archive_pdf_tools_tpu.pdf.writer import PdfWriter, Stream
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        gref = wr.add(Stream({Name('Type'): Name('XObject'),
                              Name('Subtype'): Name('Form'),
                              Name('BBox'): [0, 0, 200, 150]},
                             b'0 g 0 75 200 75 re f'))
        cref = wr.add(Stream({}, b'/GS0 gs 0 0 1 rg 0 0 200 150 re f '
                             b'/GS1 gs 0 1 0 rg 0 0 100 40 re f'))
        page = wr.add({Name('Type'): Name('Page'),
                       Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, 200, 150],
                       Name('Contents'): cref,
                       Name('Resources'): {Name('ExtGState'): {
                           Name('GS0'): {Name('SMask'): {
                               Name('S'): Name('Alpha'),
                               Name('G'): gref}},
                           Name('GS1'): {Name('SMask'): Name('None')}}}})
        wr.set(pages, {Name('Type'): Name('Pages'),
                       Name('Kids'): [page], Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'),
                     Name('Pages'): pages})
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        r = PdfReader(buf.getvalue())
        a = Rasterizer(r).render_page(0)
        # top half (user y>=75 -> device rows <75): group painted ->
        # blue shows
        p = a[30, 150]
        assert p[2] > 250 and p[0] < 5, p
        # bottom half outside the group's painted area: stays white
        p = a[150 - 30, 150]
        assert (p > 250).all(), p
        # the /None reset: green rect paints opaquely (user 0..40 y ->
        # device rows 110..150)
        p = a[150 - 20, 50]
        assert p[1] > 250 and p[0] < 5 and p[2] < 5, p
