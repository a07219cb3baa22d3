"""External-library conformance checks of emitted byte streams.

Round-1 VERDICT's top risk was self-verification: every stream was only
ever decoded by in-tree code or by the same library that produced it.
This module decodes our outputs with independently *built* third-party
decoders present in the image:

  * ``cv2`` (OpenCV 5) bundles its own OpenJPEG 2.5.3 — a second,
    separately built copy of the canonical JPEG2000 reference decoder
    for the from-scratch ``-J tpu`` encoder (`codecs/jp2tpu.py`), on
    top of the Pillow-bundled OpenJPEG the unit tests use;
  * cv2 also bundles its own libtiff (CCITT G4) and libjpeg-turbo
    (vs Pillow's libjpeg) — same upstream lineage as Pillow's codecs,
    different builds/versions;
  * ``fontTools`` — a genuinely independent sfnt implementation that
    parses our *generated-from-scratch* ``data/glyphless.ttf`` and the
    FontFile2 program embedded in every recode output
    (reference counterpart: the Tesseract-shipped ``data/tesseract.ttf``,
    ``pdfrenderer.py:315``).

JBIG2 remains in-tree-only (no external T.88 decoder exists in this
image); its stand-in is the independently written from-spec decoder in
``validators/jbig2_check.py``.
"""

import io
import struct

import numpy as np
import pytest


class TestDecoderVersionPins:
    """Pin the external decoder builds these conformance tests rely on
    (VERDICT r4 #9): a silent library upgrade could change decode
    behaviour and mask a stream regression.  When a deliberate image
    upgrade changes a version, update the pin here IN THE SAME COMMIT
    and re-run this whole module so the new decoders re-certify every
    stream family."""

    PINS = {
        'pillow': '12.1.0',
        'pillow_openjpeg': '2.5.4',
        'pillow_libtiff': '4.7.1',
        'cv2': '5.0.0',
    }

    def test_pillow_pins(self):
        import PIL
        from PIL import features
        assert PIL.__version__ == self.PINS['pillow'], \
            'Pillow changed: re-certify conformance, then update pin'
        assert features.version_codec('jpg_2000') == \
            self.PINS['pillow_openjpeg'], \
            'Pillow OpenJPEG changed: re-certify JP2 conformance'
        assert features.version_codec('libtiff') == \
            self.PINS['pillow_libtiff'], \
            'Pillow libtiff changed: re-certify G4 conformance'

    def test_cv2_pin(self):
        cv2 = pytest.importorskip('cv2')
        assert cv2.__version__ == self.PINS['cv2'], \
            'OpenCV changed: re-certify JP2/G4/JPEG conformance'
from PIL import Image

cv2 = pytest.importorskip('cv2')

from archive_pdf_tools_tpu.codecs.jp2tpu import encode_jp2_tpu


def _cv2_decode(data):
    return cv2.imdecode(np.frombuffer(data, np.uint8),
                        cv2.IMREAD_UNCHANGED)


class TestJP2TPUExternalDecode:
    """Our from-scratch JPEG2000 encoder vs cv2's OpenJPEG build."""

    def _check(self, arr, **kw):
        data = encode_jp2_tpu(Image.fromarray(arr), **kw)
        dec_cv = _cv2_decode(data)
        assert dec_cv is not None, 'cv2/OpenJPEG refused the stream'
        dec_pil = np.asarray(Image.open(io.BytesIO(data)))
        if dec_cv.ndim == 3:
            dec_cv = dec_cv[..., ::-1]      # cv2 returns BGR
        assert dec_cv.shape == dec_pil.shape == arr.shape
        # two independent OpenJPEG builds must agree bit-exactly
        assert np.array_equal(dec_cv, dec_pil)
        return dec_cv

    def test_gray_noisy(self):
        rng = np.random.default_rng(10)
        a = (rng.random((220, 300)) * 200 + 20).astype(np.uint8)
        self._check(a, ratio=50)

    def test_gray_odd_size_high_ratio(self):
        rng = np.random.default_rng(11)
        a = (rng.random((173, 241)) * 255).astype(np.uint8)
        self._check(a, ratio=500)

    def test_rgb(self):
        rng = np.random.default_rng(12)
        a = (rng.random((160, 190, 3)) * 255).astype(np.uint8)
        self._check(a, ratio=100)

    def test_clean_text_like(self):
        a = np.full((256, 256), 235, np.uint8)
        a[40:44, 20:230] = 30
        a[80:120, 30:34] = 25
        a[200:204, 10:240] = 40
        dec = self._check(a, ratio=200)
        # near-lossless on the flat background
        assert abs(int(dec[0, 0]) - 235) < 12

    def test_e2e_layer_streams(self, tmp_path):
        """fg/bg JPX streams inside an actual recode output decode in
        cv2's OpenJPEG."""
        from tests.test_recode_e2e import run_recode
        from archive_pdf_tools_tpu.pdf.reader import PdfReader
        out, _res, _pages = run_recode(
            tmp_path, validate=False,
            jpeg2000_implementation='tpu',
            bg_compression_flags=['ratio:200'],
            fg_compression_flags=['ratio:300'],
            hq_bg_compression_flags=['ratio:200'],
            hq_fg_compression_flags=['ratio:300'])
        r = PdfReader(out)
        n_jpx = 0
        for idx in range(r.page_count()):
            for _name, _x, s in r.page_images(idx):
                filt = str(r.resolve(s.dict.get('Filter')))
                if filt != 'JPXDecode':
                    continue
                w = int(r.resolve(s.dict['Width']))
                h = int(r.resolve(s.dict['Height']))
                dec = _cv2_decode(s.raw)
                assert dec is not None, 'cv2 refused an embedded JPX'
                assert dec.shape[:2] == (h, w)
                n_jpx += 1
        assert n_jpx >= 2


class TestCCITTExternalDecode:
    """Raw G4 codestreams vs cv2's libtiff build (Pillow encodes with
    its own libtiff; cv2's is a separate build)."""

    @staticmethod
    def _tiff_wrap(stream, w, h):
        hdr = b'II*\x00' + struct.pack('<I', 8)
        ntags = 8
        data_off = 8 + 2 + ntags * 12 + 4

        def tag(tid, typ, cnt, val):
            return struct.pack('<HHI4s', tid, typ, cnt,
                               struct.pack('<I', val))

        tags = (tag(256, 4, 1, w) + tag(257, 4, 1, h)
                + tag(258, 3, 1, 1) + tag(259, 3, 1, 4)
                + tag(262, 3, 1, 1)            # BlackIsZero
                + tag(273, 4, 1, data_off) + tag(278, 4, 1, h)
                + tag(279, 4, 1, len(stream)))
        ifd = struct.pack('<H', ntags) + tags + struct.pack('<I', 0)
        return hdr + ifd + bytes(stream)

    def _check(self, mask):
        from archive_pdf_tools_tpu.codecs.ccitt import encode_ccitt_g4
        h, w = mask.shape
        g4 = encode_ccitt_g4(mask)
        dec = _cv2_decode(self._tiff_wrap(g4, w, h))
        assert dec is not None, 'cv2/libtiff refused the G4 stream'
        assert dec.shape == (h, w)
        # libtiff expands G4 to min-is-black under BlackIsZero: text
        # (True = CCITT black) decodes nonzero, matching our own
        # decode_ccitt_g4 convention (True = text)
        assert np.array_equal(dec != 0, mask)

    def test_speckle(self):
        rng = np.random.default_rng(20)
        self._check(rng.random((120, 150)) < 0.3)

    def test_text_bands_odd_width(self):
        m = np.zeros((90, 131), bool)
        m[10:20, 5:125] = True
        m[40:44, :] = True
        m[:, 130] = True
        self._check(m)

    def test_all_white_and_all_black(self):
        self._check(np.zeros((40, 64), bool))
        self._check(np.ones((40, 64), bool))


class TestJPEGExternalDecode:
    def test_size_target_stream(self):
        from archive_pdf_tools_tpu.codecs.jpeg import encode_jpeg
        rng = np.random.default_rng(30)
        base = np.clip(rng.normal(170, 30, (200, 260)), 0, 255)
        img = Image.fromarray(base.astype(np.uint8))
        data = encode_jpeg(img, flags='-S20')
        dec = _cv2_decode(data)
        assert dec is not None and dec.shape == (200, 260)
        err = np.abs(dec.astype(np.float64)
                     - np.asarray(img, np.float64))
        assert np.sqrt((err ** 2).mean()) < 30


class TestFontExternal:
    def test_glyphless_ttf_parses(self):
        from fontTools.ttLib import TTFont
        from archive_pdf_tools_tpu.pdf.fonts import _FONT_PATH
        f = TTFont(_FONT_PATH)
        for table in ('head', 'hhea', 'maxp', 'cmap', 'glyf', 'hmtx',
                      'loca', 'name', 'post'):
            assert table in f, 'missing %s' % table
        upm = f['head'].unitsPerEm
        # DW 500 contract: glyph 1 advance is half an em
        order = f.getGlyphOrder()
        adv, _lsb = f['hmtx'][order[1]]
        assert adv * 1000 // upm == 500
        # glyphless: glyph 1 carries no contours
        assert f['glyf'][order[1]].numberOfContours in (0, None)

    def test_embedded_fontfile2_parses(self, tmp_path):
        from fontTools.ttLib import TTFont
        from tests.test_recode_e2e import run_recode
        from archive_pdf_tools_tpu.pdf.reader import PdfReader, PStream
        out, _res, _pages = run_recode(tmp_path, validate=False)
        r = PdfReader(out)
        found = 0
        for num in sorted(r.xref):
            obj = r.object(num)
            if not isinstance(obj, PStream):
                continue
            if 'Length1' not in obj.dict:
                continue
            data = obj.decoded()
            if data[:4] != b'\x00\x01\x00\x00':
                continue
            f = TTFont(io.BytesIO(data))
            assert {'head', 'glyf', 'hmtx'} <= set(f.keys())
            found += 1
        assert found == 1
