"""End-to-end recode pipeline tests: imagestack + hOCR -> MRC PDF."""

import io
import os

from PIL import Image

from archive_pdf_tools_tpu.pipeline.recode import recode, guess_dpi
from archive_pdf_tools_tpu.pdf.reader import PdfReader
from archive_pdf_tools_tpu.codecs.jbig2 import decode_jbig2
from archive_pdf_tools_tpu.cli.recode_pdf import main as cli_main

from tests.fixtures import make_book, make_scandata

J2K_BG = 'quality_mode:"rates";quality_layers:[500]'
J2K_FG = 'quality_mode:"rates";quality_layers:[750]'


def run_recode(tmp_path, n_pages=2, rgb=False, validate=True, **kw):
    stack, hocr, pages = make_book(tmp_path, n_pages=n_pages, rgb=rgb)
    out = str(tmp_path / 'out.pdf')
    defaults = dict(from_imagestack=stack, hocr_file=hocr, out_pdf=out,
                    dpi=100, jbig2=True,
                    bg_compression_flags=[J2K_BG],
                    fg_compression_flags=[J2K_FG],
                    hq_bg_compression_flags=[J2K_BG],
                    hq_fg_compression_flags=[J2K_FG])
    defaults.update(kw)
    res = recode(**defaults)
    if validate:
        # conformance gauntlet: every e2e output must satisfy the
        # strict from-spec PDF/A-3b checker (incl. full JBIG2 decode
        # of embedded masks — pages here are small)
        from archive_pdf_tools_tpu.validators import validate_pdfa
        validate_pdfa(out, strict_jbig2_decode=True,
                      strict_jpx_decode=3)
    return out, res, pages


class TestRecodeE2E:
    def test_basic_book(self, tmp_path):
        out, res, pages = run_recode(tmp_path)
        assert res['compression_ratio'] > 1.0
        r = PdfReader(out)
        assert r.page_count() == 2
        imgs = r.page_images(0)
        assert len(imgs) == 2   # bg + fg (mask rides as SMask)
        # validate the jbig2 mask round-trips and correlates with text
        for _, _, s in imgs:
            sm = r.resolve(s.dict.get('SMask'))
            if sm is None:
                continue
            w = int(r.resolve(sm.dict['Width']))
            h = int(r.resolve(sm.dict['Height']))
            bits = decode_jbig2(sm.raw, w, h)
            mask = ~bits   # jbig2 white (0) = ink
            assert 0.005 < mask.mean() < 0.6
        # bg/fg decodable by Pillow
        for _, _, s in imgs:
            img = Image.open(io.BytesIO(s.raw))
            assert img.size == (400, 560)
        # text layer present with hex strings
        ops = r.page_contents(0)
        assert b'3 Tr' in ops and b'TJ' in ops
        # pdfa + xmp
        assert b'pdfaid:part' in r.xmp_metadata()

    def test_bg_downsample(self, tmp_path):
        out, res, pages = run_recode(tmp_path, bg_downsample=3)
        r = PdfReader(out)
        sizes = sorted(int(r.resolve(s.dict['Width']))
                       for _, _, s in r.page_images(0))
        assert sizes[0] == 133 and sizes[1] == 400

    def test_rgb_book(self, tmp_path):
        out, res, pages = run_recode(tmp_path, rgb=True)
        r = PdfReader(out)
        css = sorted(str(r.resolve(s.dict['ColorSpace']))
                     for _, _, s in r.page_images(0))
        assert css == ['DeviceRGB', 'DeviceRGB']

    def test_grayscale_pdf_flag(self, tmp_path):
        out, res, pages = run_recode(tmp_path, rgb=True, grayscale_pdf=True)
        r = PdfReader(out)
        css = {str(r.resolve(s.dict['ColorSpace']))
               for _, _, s in r.page_images(0)}
        assert css == {'DeviceGray'}

    def test_bw_pdf(self, tmp_path):
        out, res, pages = run_recode(tmp_path, force_1bit_output=True)
        r = PdfReader(out)
        imgs = r.page_images(0)
        assert len(imgs) == 1
        assert str(r.resolve(imgs[0][2].dict['Filter'])) == 'JBIG2Decode'

    def test_ccitt_mask(self, tmp_path):
        out, res, pages = run_recode(tmp_path, mask_compression='ccitt',
                                     jbig2=False)
        r = PdfReader(out)
        filters = {str(r.resolve(s.dict.get('Filter')))
                   for _, _, s in r.page_images(0)}
        sm = [r.resolve(s.dict.get('SMask')) for _, _, s in r.page_images(0)]
        sm = [s for s in sm if s][0]
        assert str(r.resolve(sm.dict['Filter'])) == 'CCITTFaxDecode'
        parms = r.resolve(sm.dict['DecodeParms'])
        assert r.resolve(parms['BlackIs1']) is True

    def test_scandata_skip_and_labels(self, tmp_path):
        stack, hocr, pages = make_book(tmp_path, n_pages=3)
        sd = make_scandata(tmp_path, 3, dpi=100, skip=(1,),
                           numbers=[None, None, '5'])
        out = str(tmp_path / 'out.pdf')
        res = recode(from_imagestack=stack, hocr_file=hocr, out_pdf=out,
                     scandata_file=sd, jbig2=True,
                     bg_compression_flags=[J2K_BG],
                     fg_compression_flags=[J2K_FG])
        r = PdfReader(out)
        assert r.page_count() == 2
        assert 'PageLabels' in r.catalog

    def test_stop_after(self, tmp_path):
        out, res, pages = run_recode(tmp_path, n_pages=3, stop_after=2)
        # reference semantics: stop_after decrements once; 1 full page
        r = PdfReader(out)
        assert r.page_count() <= 2

    def test_jpeg_format(self, tmp_path):
        out, res, pages = run_recode(
            tmp_path, mrc_image_format='jpeg',
            bg_compression_flags=['-S30'], fg_compression_flags=['-S20'],
            hq_bg_compression_flags=['-S40'],
            hq_fg_compression_flags=['-S30'])
        r = PdfReader(out)
        filters = {str(r.resolve(s.dict['Filter']))
                   for _, _, s in r.page_images(0)}
        assert filters == {'DCTDecode'}

    def test_hq_pages(self, tmp_path):
        out, res, pages = run_recode(tmp_path, n_pages=2, hq_pages='1',
                                     bg_downsample=3)
        r = PdfReader(out)
        # page 1 is HQ: no downsampled layer
        sizes0 = sorted(int(r.resolve(s.dict['Width']))
                        for _, _, s in r.page_images(0))
        sizes1 = sorted(int(r.resolve(s.dict['Width']))
                        for _, _, s in r.page_images(1))
        assert sizes0 == [400, 400]
        assert sizes1 == [133, 400]

    def test_metadata(self, tmp_path):
        out, res, pages = run_recode(
            tmp_path, metadata_title='T', metadata_author='A',
            metadata_url='http://u', metadata_language=['en', 'fr'])
        r = PdfReader(out)
        info = r.info()
        assert info['Title'] == b'T'
        xmp = r.xmp_metadata().decode('utf-8')
        assert '<rdf:li>fr</rdf:li>' in xmp
        assert r.resolve(r.catalog['Lang']) == b'en'

    def test_jp2_imagestack(self, tmp_path):
        stack, hocr, pages = make_book(tmp_path, n_pages=1, fmt='jp2')
        out = str(tmp_path / 'out.pdf')
        res = recode(from_imagestack=stack, hocr_file=hocr, out_pdf=out,
                     dpi=100, jbig2=True,
                     bg_compression_flags=[J2K_BG],
                     fg_compression_flags=[J2K_FG])
        assert PdfReader(out).page_count() == 1


class TestRecodeFromPdf:
    def test_recode_own_pdf(self, tmp_path):
        # build a source PDF with our own pipeline (mode 0 passthrough of
        # jpeg), then recode it via --from-pdf
        stack, hocr, pages = make_book(tmp_path, n_pages=2)
        src = str(tmp_path / 'src.pdf')
        recode(from_imagestack=stack, hocr_file=hocr, out_pdf=src,
               dpi=100, jbig2=False, mrc_image_format='jpeg',
               image_mode=2, mask_compression='ccitt',
               bg_compression_flags=['-S40'], fg_compression_flags=['-S30'])
        out = str(tmp_path / 'out.pdf')
        res = recode(from_pdf=src, hocr_file=hocr, out_pdf=out,
                     jbig2=True,
                     bg_compression_flags=[J2K_BG],
                     fg_compression_flags=[J2K_FG])
        r = PdfReader(out)
        assert r.page_count() == 2


class TestCLI:
    def test_cli_end_to_end(self, tmp_path, capsys):
        stack, hocr, pages = make_book(tmp_path, n_pages=1)
        out = str(tmp_path / 'cli.pdf')
        rc = cli_main(['-I', stack, '-T', hocr, '-o', out, '--dpi', '100',
                       '-J', 'pillow', '--bg-downsample', '3'])
        assert rc == 0
        assert PdfReader(out).page_count() == 1

    def test_cli_flag_errors(self, capsys):
        assert cli_main([]) == 1

    def test_guess_dpi(self):
        assert guess_dpi(2480, 3507) == 300
        assert guess_dpi(595, 842) == 72


class TestResume:
    def test_jbig2_symbol_coding(self, tmp_path):
        out, res, pages = run_recode(tmp_path, jbig2_symbol_mode='auto')
        assert res['compression_ratio'] > 1.0
        r = PdfReader(out)
        for page in range(r.page_count()):
            for _, _, s in r.page_images(page):
                sm = r.resolve(s.dict.get('SMask'))
                if sm is None:
                    continue
                w = int(r.resolve(sm.dict['Width']))
                h = int(r.resolve(sm.dict['Height']))
                bits = decode_jbig2(sm.raw, w, h)
                dec = r.resolve(sm.dict.get('Decode'))
                mask = bits if dec and float(r.resolve(dec[0])) == 1.0 \
                    else ~bits
                # same ink statistics regardless of chosen coding
                assert 0.005 < mask.mean() < 0.6

    def test_symbol_vs_generic_same_mask(self, tmp_path):
        out_g, _, _ = run_recode(tmp_path, jbig2_symbol_mode=False)
        out_s, _, _ = run_recode(tmp_path, jbig2_symbol_mode=True,
                                 out_pdf=str(tmp_path / 'out_sym.pdf'))

        def masks(path):
            r = PdfReader(path)
            got = []
            for page in range(r.page_count()):
                for _, _, s in r.page_images(page):
                    sm = r.resolve(s.dict.get('SMask'))
                    if sm is None:
                        continue
                    w = int(r.resolve(sm.dict['Width']))
                    h = int(r.resolve(sm.dict['Height']))
                    bits = decode_jbig2(sm.raw, w, h)
                    dec = r.resolve(sm.dict.get('Decode'))
                    got.append(bits if dec and
                               float(r.resolve(dec[0])) == 1.0 else ~bits)
            return got

        for mg, ms in zip(masks(out_g), masks(out_s)):
            assert (mg == ms).all()   # symbol coding is lossless

    def test_resume_from_artifacts(self, tmp_path):
        stack, hocr, pages = make_book(tmp_path, n_pages=2)
        art = tmp_path / 'artifacts'
        art.mkdir()
        out1 = str(tmp_path / 'a.pdf')
        recode(from_imagestack=stack, hocr_file=hocr, out_pdf=out1,
               dpi=100, jbig2=True, out_dir=str(art),
               bg_compression_flags=[J2K_BG],
               fg_compression_flags=[J2K_FG])
        files = sorted(p.name for p in art.iterdir())
        assert '000000_meta.json' in files and '000001_mask.jbig2' in files
        # resume run must produce an equivalent PDF without recomputing
        out2 = str(tmp_path / 'b.pdf')
        recode(from_imagestack=stack, hocr_file=hocr, out_pdf=out2,
               dpi=100, jbig2=True, out_dir=str(art), resume=True,
               bg_compression_flags=[J2K_BG],
               fg_compression_flags=[J2K_FG])
        r1, r2 = PdfReader(out1), PdfReader(out2)
        assert r2.page_count() == r1.page_count()
        raws1 = [s.raw for _, _, s in r1.page_images(0)]
        raws2 = [s.raw for _, _, s in r2.page_images(0)]
        assert sorted(map(len, raws1)) == sorted(map(len, raws2))


class TestFromPdfImageDecoding:
    def test_recode_bw_jbig2_pdf(self, tmp_path):
        # a bw PDF's only image is a JBIG2 stream; recode must decode it
        stack, hocr, pages = make_book(tmp_path, n_pages=1)
        src = str(tmp_path / 'bw.pdf')
        recode(from_imagestack=stack, hocr_file=hocr, out_pdf=src,
               dpi=100, jbig2=True, force_1bit_output=True,
               bg_compression_flags=[J2K_BG],
               fg_compression_flags=[J2K_FG])
        out = str(tmp_path / 'out.pdf')
        recode(from_pdf=src, hocr_file=hocr, out_pdf=out, jbig2=True,
               bg_compression_flags=[J2K_BG],
               fg_compression_flags=[J2K_FG])
        r = PdfReader(out)
        assert r.page_count() == 1
        # bitonal source short-circuits to a mask-only page
        assert len(r.page_images(0)) == 1


class TestMixedBook:
    def test_mixed_sizes_and_modes(self, tmp_path):
        """Pages of different sizes/modes exercise batch-group breaks."""
        from tests.fixtures import render_book_page, words_to_hocr_page, \
            HOCR_TEMPLATE
        from PIL import Image as PILImage
        specs = [(400, 560, 'gray'), (400, 560, 'rgb'), (300, 420, 'gray'),
                 (400, 560, 'gray'), (400, 560, 'bitonal')]
        hocr_pages = []
        for i, (w, h, mode) in enumerate(specs):
            img, words = render_book_page(w, h, seed=i,
                                          rgb=(mode == 'rgb'))
            if mode == 'bitonal':
                im = PILImage.fromarray(img > 128)
            else:
                im = PILImage.fromarray(img)
            im.save(str(tmp_path / ('page_%04d.png' % i)))
            hocr_pages.append(words_to_hocr_page(words, w, h, page_no=i))
        hocr = tmp_path / 'mixed.hocr'
        hocr.write_text(HOCR_TEMPLATE % '\n'.join(hocr_pages),
                        encoding='utf-8')
        out = str(tmp_path / 'mixed.pdf')
        res = recode(from_imagestack=str(tmp_path / 'page_*.png'),
                     hocr_file=str(hocr), out_pdf=out, dpi=100, jbig2=True,
                     batch_pages=3,
                     bg_compression_flags=[J2K_BG],
                     fg_compression_flags=[J2K_FG])
        r = PdfReader(out)
        assert r.page_count() == 5
        # bitonal page -> single mask image; others -> bg + fg
        assert len(r.page_images(4)) == 1
        for idx in range(4):
            assert len(r.page_images(idx)) == 2
        # rgb page keeps DeviceRGB
        css = {str(r.resolve(s.dict['ColorSpace']))
               for _, _, s in r.page_images(1)}
        assert 'DeviceRGB' in css


class TestRealisticCorpusE2E:
    def test_compression_on_scan_corpus(self, tmp_path):
        """README.rst:177-190-style config on realistic scan pages:
        ratio vs raw must land in the MRC ballpark (the reference
        reports 3-15x vs source formats, far more vs raw)."""
        from tests.scanfix import synth_scan
        from tests.fixtures import words_to_hocr_page, HOCR_TEMPLATE

        pages = []
        wds = []
        for seed in range(2):
            img, wd = synth_scan(seed=seed, h=560, w=400, dpi=100)
            pages.append(img)
            wds.append(wd)
        stack_dir = tmp_path / 'imgs'
        stack_dir.mkdir()
        for i, img in enumerate(pages):
            Image.fromarray(img).save(str(stack_dir / ('p%04d.png' % i)))
        hocr_pages = []
        for i, wd in enumerate(wds):
            words = []
            for para in wd:
                for line in para['lines']:
                    x0, y0, x1, y1 = line['bbox']
                    words.append((x0, y0, x1, y1, 'synthword'))
            hocr_pages.append(words_to_hocr_page(words, 400, 560,
                                                 page_no=i))
        hocr = str(tmp_path / 'book.hocr')
        with open(hocr, 'w') as fp:
            fp.write(HOCR_TEMPLATE % '\n'.join(hocr_pages))

        from archive_pdf_tools_tpu.pipeline.recode import recode
        out = str(tmp_path / 'out.pdf')
        res = recode(from_imagestack=str(stack_dir / 'p*.png'),
                     hocr_file=hocr, out_pdf=out, dpi=100, jbig2=True,
                     bg_downsample=3,
                     bg_compression_flags=[J2K_BG],
                     fg_compression_flags=[J2K_FG],
                     hq_bg_compression_flags=[J2K_BG],
                     hq_fg_compression_flags=[J2K_FG])
        raw = sum(p.size for p in pages)
        import os
        pdf_size = os.path.getsize(out)
        ratio_vs_raw = raw / pdf_size
        # realistic noisy pages: far less compressible than flat-gray
        # fixtures, but MRC must still beat raw handily
        assert ratio_vs_raw > 4, ratio_vs_raw
        from archive_pdf_tools_tpu.validators import validate_pdfa
        validate_pdfa(out, strict_jbig2_decode=True,
                      strict_jpx_decode=3)
