"""Stream-filter coverage for foreign PDFs: LZWDecode, ASCII85Decode,
CCITT G3 / byte-aligned-MH / BlackIs1 handling.

The reference inherits all of these from PyMuPDF's MuPDF decoders
(every fitz.open in ``recode.py:35``, ``bin/pdf-metadata-json``); our
reader implements them directly.  LZW test vectors come from libtiff's
own encoder (via Pillow TIFF), the independent implementation every
viewer interoperates with.
"""

import io

import numpy as np
import pytest
from PIL import Image

from archive_pdf_tools_tpu.pdf.reader import (PdfReader, lzw_decode,
                                              a85_decode)
from archive_pdf_tools_tpu.pdf.writer import PdfWriter, Name, Stream
from archive_pdf_tools_tpu.codecs.ccitt import (encode_ccitt_g4,
                                                decode_ccitt,
                                                decode_ccitt_g4)


def _tiff_strip(img, **save_kw):
    """Encode via Pillow/libtiff as a single strip, return raw strip
    bytes (the exact payload a PDF would embed)."""
    buf = io.BytesIO()
    info = dict(save_kw.pop('tiffinfo', {}))
    info[278] = img.height                # RowsPerStrip: single strip
    img.save(buf, format='TIFF', tiffinfo=info, **save_kw)
    buf.seek(0)
    t = Image.open(buf)
    offsets = t.tag_v2[273]
    counts = t.tag_v2[279]
    assert len(offsets) == 1
    raw = buf.getvalue()
    return raw[offsets[0]:offsets[0] + counts[0]]


def _lzw_of(payload):
    """LZW-compress arbitrary bytes with libtiff by making them the
    pixel data of a 1-row grayscale TIFF."""
    img = Image.frombytes('L', (len(payload), 1), payload)
    return _tiff_strip(img, compression='tiff_lzw')


class TestLZW:
    def test_libtiff_cross_check_text(self):
        payload = (b'BT /F1 12 Tf 72 720 Td (Hello LZW world, '
                   b'hello again hello) Tj ET\n' * 20)
        assert lzw_decode(_lzw_of(payload)) == payload

    def test_libtiff_cross_check_random(self):
        rng = np.random.default_rng(7)
        payload = rng.integers(0, 256, 3000, np.uint8).tobytes()
        assert lzw_decode(_lzw_of(payload)) == payload

    def test_table_growth_to_12_bits_and_clear(self):
        # >4096 table entries forces width 12 and a mid-stream clear
        rng = np.random.default_rng(1)
        payload = rng.integers(0, 16, 120000, np.uint8).tobytes()
        assert lzw_decode(_lzw_of(payload)) == payload

    def test_high_compression_run(self):
        payload = b'\xAB' * 50000
        assert lzw_decode(_lzw_of(payload)) == payload

    def test_early_change_parameter_matters(self):
        # libtiff streams use EarlyChange 1 (the PDF default); decoding
        # one with /EarlyChange 0 must desynchronize past the 9->10 bit
        # switch, proving the parameter is honored
        rng = np.random.default_rng(2)
        payload = rng.integers(0, 256, 3000, np.uint8).tobytes()
        stream = _lzw_of(payload)
        assert lzw_decode(stream, early=1) == payload
        try:
            wrong = lzw_decode(stream, early=0)
        except Exception:
            wrong = None
        assert wrong != payload

    def test_reader_applies_lzw_filter(self):
        payload = b'q 1 0 0 1 10 10 cm Q ' * 40
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        cref = wr.add(Stream({Name('Filter'): Name('LZWDecode')},
                             _lzw_of(payload)))
        page = wr.add({Name('Type'): Name('Page'),
                       Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, 200, 200],
                       Name('Contents'): cref})
        wr.set(pages, {Name('Type'): Name('Pages'),
                       Name('Kids'): [page], Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'),
                     Name('Pages'): pages})
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        r = PdfReader(buf.getvalue())
        assert r.page_contents(0) == payload


class TestASCII85:
    def test_round_trip(self):
        import base64
        payload = b'\x00\x00\x00\x00some text \xff\xfe' * 9 + b'xy'
        enc = base64.a85encode(payload) + b'~>'
        assert a85_decode(enc) == payload

    def test_whitespace_and_adobe_frame(self):
        import base64
        payload = bytes(range(256))
        body = base64.a85encode(payload)
        enc = b'<~' + b'\n'.join(body[i:i + 30]
                                 for i in range(0, len(body), 30)) \
            + b'\r\n~>'
        assert a85_decode(enc) == payload

    def test_reader_applies_a85_filter(self):
        import base64
        payload = b'0.5 g 0 0 100 100 re f'
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        cref = wr.add(Stream({Name('Filter'): Name('ASCII85Decode')},
                             base64.a85encode(payload) + b'~>'))
        page = wr.add({Name('Type'): Name('Page'),
                       Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, 200, 200],
                       Name('Contents'): cref})
        wr.set(pages, {Name('Type'): Name('Pages'),
                       Name('Kids'): [page], Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'),
                     Name('Pages'): pages})
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        r = PdfReader(buf.getvalue())
        assert r.page_contents(0) == payload


def _test_mask(w=640, h=96):
    rng = np.random.default_rng(3)
    m = np.zeros((h, w), bool)
    for _ in range(40):                   # text-ish runs
        y = int(rng.integers(0, h - 8))
        x = int(rng.integers(0, w - 60))
        m[y:y + 6, x:x + int(rng.integers(20, 60))] = True
    return m


class TestCCITT:
    def test_g4_round_trip_unchanged(self):
        m = _test_mask()
        assert (decode_ccitt_g4(encode_ccitt_g4(m), *m.shape[::-1])
                == m).all()

    def test_black_is_1_polarity(self):
        m = _test_mask()
        raw = encode_ccitt_g4(m)
        s1 = decode_ccitt(raw, m.shape[1], m.shape[0], k=-1,
                          black_is_1=True)
        s0 = decode_ccitt(raw, m.shape[1], m.shape[0], k=-1,
                          black_is_1=False)
        assert (s1 == ~s0).all() and (s1 == m).all()

    def test_g3_1d(self):
        # libtiff G3 (EOL-synchronized 1-D) <-> PDF /K 0
        m = _test_mask()
        strip = _tiff_strip(Image.fromarray(m), compression='group3')
        out = decode_ccitt(strip, m.shape[1], m.shape[0], k=0,
                           black_is_1=True)
        assert (out == m).all()

    def test_g3_2d(self):
        # T4Options bit 0 = 2-D <-> PDF /K > 0
        m = _test_mask()
        try:
            strip = _tiff_strip(Image.fromarray(m),
                                compression='group3',
                                tiffinfo={292: 1})
        except Exception:
            pytest.skip('libtiff group3 2-D encode unavailable')
        out = decode_ccitt(strip, m.shape[1], m.shape[0], k=4,
                           black_is_1=True)
        assert (out == m).all()

    def test_mh_byte_aligned(self):
        # TIFF compression 2 (Modified Huffman, byte-aligned rows)
        # <-> PDF /K 0 /EncodedByteAlign true
        m = _test_mask()
        try:
            strip = _tiff_strip(Image.fromarray(m),
                                compression='tiff_ccitt')
        except Exception:
            pytest.skip('libtiff MH encode unavailable')
        out = decode_ccitt(strip, m.shape[1], m.shape[0], k=0,
                           byte_align=True, black_is_1=True)
        assert (out == m).all()


class TestForeignCCITTInPdf:
    def _pdf_with_fax(self, m, strip, **parms_extra):
        w, h = m.shape[1], m.shape[0]
        wr = PdfWriter()
        cat = wr.reserve()
        pages = wr.reserve()
        parms = {Name('K'): 0, Name('Columns'): w, Name('Rows'): h}
        for k, v in parms_extra.items():
            parms[Name(k)] = v
        img = wr.add(Stream(
            {Name('Type'): Name('XObject'),
             Name('Subtype'): Name('Image'),
             Name('Width'): w, Name('Height'): h,
             Name('ColorSpace'): Name('DeviceGray'),
             Name('BitsPerComponent'): 1,
             Name('Filter'): Name('CCITTFaxDecode'),
             Name('DecodeParms'): parms}, strip))
        content = b'q %d 0 0 %d 0 0 cm /Im1 Do Q' % (w, h)
        cref = wr.add(Stream({}, content))
        page = wr.add({Name('Type'): Name('Page'),
                       Name('Parent'): pages,
                       Name('MediaBox'): [0, 0, w, h],
                       Name('Contents'): cref,
                       Name('Resources'): {
                           Name('XObject'): {Name('Im1'): img}}})
        wr.set(pages, {Name('Type'): Name('Pages'),
                       Name('Kids'): [page], Name('Count'): 1})
        wr.set(cat, {Name('Type'): Name('Catalog'),
                     Name('Pages'): pages})
        buf = io.BytesIO()
        wr.save(buf, cat, None, b'0123456789abcdef')
        return PdfReader(buf.getvalue())

    def test_default_polarity_renders_ink_black(self):
        # no /BlackIs1: black pixels are sample 0 = black in DeviceGray
        from archive_pdf_tools_tpu.pdf.raster import Rasterizer
        m = _test_mask(320, 64)
        strip = _tiff_strip(Image.fromarray(m), compression='group3')
        r = self._pdf_with_fax(m, strip)
        a = Rasterizer(r).render_page(0)
        dark = (a < 80).all(axis=-1)
        agree = (dark == m).mean()
        assert agree > 0.99

    def test_pipeline_image_decode(self):
        from archive_pdf_tools_tpu.pipeline.recode import \
            _decode_pdf_image
        m = _test_mask(320, 64)
        strip = _tiff_strip(Image.fromarray(m), compression='group3')
        r = self._pdf_with_fax(m, strip)
        _, _, stream = r.page_images(0)[0]
        img = _decode_pdf_image(r, stream)
        arr = np.asarray(img.convert('L'))
        # ink must be dark (sample 0) under the default polarity
        assert (arr[m] < 128).mean() > 0.99
        assert (arr[~m] > 128).mean() > 0.99
