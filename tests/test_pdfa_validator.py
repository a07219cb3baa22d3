"""PDF/A-3b validator gauntlet: the strict from-spec checker must pass
our writer's real output and catch deliberate conformance breaks."""

import io

import pytest

from archive_pdf_tools_tpu.pdf.builder import DocumentBuilder
from archive_pdf_tools_tpu.validators import (validate_pdfa,
                                              PdfAValidationError)
from archive_pdf_tools_tpu.validators.pdfa_check import (
    _check_icc_output_profile, _check_truetype)


def _build_doc(**meta):
    b = DocumentBuilder()
    words = [{'lines': [{
        'bbox': [10, 10, 200, 40], 'baseline': (0.0, 0),
        'words': [{'text': 'hello world', 'bbox': [10, 10, 200, 40],
                   'confidence': 90, 'writing_direction': 0,
                   'fontsize': 12}]}]}]
    b.add_text_page(words, 612, 792, 96)
    b.write_pdfa()
    b.write_metadata(extra_metadata=meta or {'title': 'A Title'})
    buf = io.BytesIO()
    b.save(buf)
    return b, buf.getvalue()


class TestPdfAValidator:
    def test_builder_output_passes(self):
        _, data = _build_doc()
        facts = validate_pdfa(data)
        assert facts['pages'] == 1
        assert facts['fonts'] == 1

    def test_with_labels_toc_ua(self):
        b = DocumentBuilder()
        for i in range(3):
            b.add_text_page([], 612, 792, 96)
        b.write_pdfa()
        b.write_page_labels(['i', '1', '2'])
        b.write_toc([{'title': 'Ch 1', 'level': 1, 'accessible-page': 0},
                     {'title': 'Ch 2', 'level': 1, 'accessible-page': 2}])
        b.write_basic_ua(language='en')
        b.write_metadata(extra_metadata={'title': 'T'})
        buf = io.BytesIO()
        b.save(buf)
        facts = validate_pdfa(buf.getvalue())
        assert facts['pages'] == 3

    def test_catches_missing_output_intent(self):
        b = DocumentBuilder()
        b.add_text_page([], 612, 792, 96)
        b.write_metadata()
        buf = io.BytesIO()
        b.save(buf)
        with pytest.raises(PdfAValidationError, match='OutputIntents'):
            validate_pdfa(buf.getvalue())

    def test_catches_missing_metadata(self):
        b = DocumentBuilder()
        b.add_text_page([], 612, 792, 96)
        b.write_pdfa()
        buf = io.BytesIO()
        b.save(buf)
        with pytest.raises(PdfAValidationError, match='Metadata'):
            validate_pdfa(buf.getvalue())

    def test_catches_wrong_pdfaid_part(self):
        b = DocumentBuilder()
        b.add_text_page([], 612, 792, 96)
        b.write_pdfa()
        b.write_metadata()
        b.xmp = b.xmp.replace('<pdfaid:part>3<', '<pdfaid:part>1<')
        buf = io.BytesIO()
        b.save(buf)
        with pytest.raises(PdfAValidationError, match='pdfaid:part'):
            validate_pdfa(buf.getvalue())

    def test_catches_info_xmp_mismatch(self):
        b, _ = _build_doc(title='XMP says this')
        from archive_pdf_tools_tpu.pdf.writer import Name
        b.info[Name('Title')] = 'Info says that'
        buf = io.BytesIO()
        b.save(buf)
        with pytest.raises(PdfAValidationError, match='Title'):
            validate_pdfa(buf.getvalue())

    def test_catches_missing_trailer_id(self, monkeypatch):
        b = DocumentBuilder()
        b.add_text_page([], 612, 792, 96)
        b.write_pdfa()
        b.write_metadata()
        buf = io.BytesIO()
        b._build_page_objects()
        from archive_pdf_tools_tpu.pdf.writer import Name, Stream
        catalog = {Name('Type'): Name('Catalog'),
                   Name('Pages'): b.pages_ref}
        catalog.update(b.catalog_extra)
        xmp_ref = b.w.add(Stream({Name('Type'): Name('Metadata'),
                                  Name('Subtype'): Name('XML')},
                                 b.xmp.encode('utf-8')))
        catalog[Name('Metadata')] = xmp_ref
        b.w.set(b.catalog_ref, catalog)
        b.w.save(buf, b.catalog_ref, None, None)   # no /ID
        with pytest.raises(PdfAValidationError, match='/ID'):
            validate_pdfa(buf.getvalue())

    def test_catches_undefined_font_resource(self):
        b, data = _build_doc()
        # rename the font resource key so the Tf operand dangles
        broken = data.replace(b'/Font << /f-0-0', b'/Font << /f-9-9')
        with pytest.raises(PdfAValidationError, match='Tf'):
            validate_pdfa(broken)

    def test_catches_unknown_content_operator(self):
        b = DocumentBuilder()
        idx = b.add_text_page([], 612, 792, 96)
        b.pages[idx].extra_ops = b'1 0 0 1 0 0 cm 5 frobnicate'
        b.write_pdfa()
        b.write_metadata()
        buf = io.BytesIO()
        b.save(buf, deflate=False)
        with pytest.raises(PdfAValidationError, match='operator'):
            validate_pdfa(buf.getvalue())

    def test_catches_unbalanced_q(self):
        b = DocumentBuilder()
        idx = b.add_text_page([], 612, 792, 96)
        b.pages[idx].extra_ops = b'q q Q'
        b.write_pdfa()
        b.write_metadata()
        buf = io.BytesIO()
        b.save(buf, deflate=False)
        with pytest.raises(PdfAValidationError, match='unbalanced q'):
            validate_pdfa(buf.getvalue())


class TestIccAndFontChecks:
    def test_real_srgb_profile_passes(self):
        from archive_pdf_tools_tpu.pdf.builder import srgb_icc_bytes
        _check_icc_output_profile(srgb_icc_bytes())

    def test_icc_rejects_bad_signature(self):
        from archive_pdf_tools_tpu.pdf.builder import srgb_icc_bytes
        icc = bytearray(srgb_icc_bytes())
        icc[36:40] = b'nope'
        with pytest.raises(PdfAValidationError, match='acsp'):
            _check_icc_output_profile(bytes(icc))

    def test_icc_rejects_size_mismatch(self):
        from archive_pdf_tools_tpu.pdf.builder import srgb_icc_bytes
        icc = srgb_icc_bytes() + b'\x00'
        with pytest.raises(PdfAValidationError, match='size'):
            _check_icc_output_profile(icc)

    def test_icc_rejects_wrong_space(self):
        from archive_pdf_tools_tpu.pdf.builder import srgb_icc_bytes
        with pytest.raises(PdfAValidationError, match='colour space'):
            _check_icc_output_profile(srgb_icc_bytes(),
                                      expect_space=b'CMYK')

    def test_glyphless_font_passes_with_dw(self):
        import archive_pdf_tools_tpu.pdf.fonts as F
        with open(F._FONT_PATH, 'rb') as fp:
            data = fp.read()
        _check_truetype(data, dw=1000 // F.K_CHAR_WIDTH)

    def test_font_rejects_wrong_dw(self):
        import archive_pdf_tools_tpu.pdf.fonts as F
        with open(F._FONT_PATH, 'rb') as fp:
            data = fp.read()
        with pytest.raises(PdfAValidationError, match='DW'):
            _check_truetype(data, dw=123)

    def test_font_rejects_truncated(self):
        import archive_pdf_tools_tpu.pdf.fonts as F
        with open(F._FONT_PATH, 'rb') as fp:
            data = fp.read()
        with pytest.raises(PdfAValidationError):
            _check_truetype(data[:40], dw=500)
