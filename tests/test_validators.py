"""Conformance-gauntlet tests: every emitted byte stream must satisfy
the independent from-spec validators (archive_pdf_tools_tpu.validators),
which are written from the ITU/ISO texts, not from the encoders."""

import numpy as np
import pytest

from archive_pdf_tools_tpu.codecs.jbig2 import encode_jbig2
from archive_pdf_tools_tpu.validators import (validate_jbig2,
                                              Jbig2ValidationError)


def _text_mask(seed=3, h=220, w=300):
    rng = np.random.default_rng(seed)
    mask = np.zeros((h, w), np.uint8)
    for _ in range(60):
        y, x = rng.integers(0, h - 12), rng.integers(0, w - 10)
        glyph = (rng.random((10, 7)) < 0.5).astype(np.uint8)
        mask[y:y + 10, x:x + 7] |= glyph
    mask[50, :] = 1
    mask[:, 120] = 1
    return mask


# repeated-glyph page: exercises real symbol sharing and (in lossy
# classification) exemplar substitution + XOR residue
def _glyph_mask(seed=5, h=200, w=260):
    rng = np.random.default_rng(seed)
    glyphs = [(rng.random((11, 8)) < 0.45).astype(np.uint8)
              for _ in range(4)]
    mask = np.zeros((h, w), np.uint8)
    for _ in range(40):
        g = glyphs[int(rng.integers(0, 4))]
        y, x = rng.integers(0, h - 12), rng.integers(0, w - 9)
        mask[y:y + 11, x:x + 8] |= g
    return mask


MODES = [
    dict(embedded=True, tpgdon=True),
    dict(embedded=True, tpgdon=False),
    dict(embedded=False, tpgdon=True),
    dict(embedded=True, tpgdon=True, bands=3),
    dict(embedded=True, tpgdon=True, symbol_mode=True),
    dict(embedded=False, tpgdon=True, symbol_mode=True),
    dict(embedded=True, tpgdon=True, symbol_mode='auto'),
    dict(embedded=True, tpgdon=True, symbol_mode='refine'),
]


class TestJbig2SpecValidator:
    @pytest.mark.parametrize('cfg', MODES,
                             ids=lambda c: '-'.join(
                                 f'{k}={v}' for k, v in c.items()))
    def test_every_mode_decodes_bitexact(self, cfg):
        mask = _text_mask()
        data = encode_jbig2(mask, **cfg)
        page = validate_jbig2(data, embedded=cfg.get('embedded', True),
                              expect=mask)
        assert page.shape == mask.shape

    def test_symbol_sharing_page(self):
        mask = _glyph_mask()
        for mode in (True, 'lossy', 'refine'):
            data = encode_jbig2(mask, symbol_mode=mode,
                                symbol_corr_pct=85)
            page = validate_jbig2(data, embedded=True)
            if mode in (True, 'refine'):
                # lossless modes must reproduce the input exactly
                assert np.array_equal(page, (mask != 0).astype(np.uint8))
            else:
                # lossy classification: still close (exemplars differ
                # from instances by at most the correlation slack)
                agree = (page == (mask != 0)).mean()
                assert agree > 0.97

    def test_empty_and_full_masks(self):
        for mask in (np.zeros((64, 80), np.uint8),
                     np.ones((64, 80), np.uint8)):
            for mode in (False, True):
                data = encode_jbig2(mask, symbol_mode=mode)
                validate_jbig2(data, embedded=True, expect=mask)

    def test_single_symbol_page(self):
        # SBSYMCODELEN = 0 edge: one dictionary symbol decodes no ID bits
        mask = np.zeros((40, 50), np.uint8)
        mask[10:20, 15:22] = 1
        data = encode_jbig2(mask, symbol_mode=True)
        validate_jbig2(data, embedded=True, expect=mask)

    def test_rejects_truncation(self):
        data = encode_jbig2(_text_mask())
        with pytest.raises(Jbig2ValidationError):
            validate_jbig2(data[:-10] + b'', embedded=True)

    def test_rejects_file_header_in_embedded(self):
        data = encode_jbig2(_text_mask(), embedded=False)
        with pytest.raises(Jbig2ValidationError,
                           match='file header'):
            validate_jbig2(data, embedded=True)

    def test_rejects_missing_trailers_standalone(self):
        data = encode_jbig2(_text_mask(), embedded=True)
        with pytest.raises(Jbig2ValidationError):
            validate_jbig2(data, embedded=False)

    def test_rejects_region_outside_page(self):
        data = bytearray(encode_jbig2(_text_mask()))
        # page info data starts after the first 11-byte segment header;
        # corrupt the page width field down to 8 so the region overflows
        assert data[4] == 48
        data[11:15] = (8).to_bytes(4, 'big')
        with pytest.raises(Jbig2ValidationError):
            validate_jbig2(bytes(data), embedded=True)

    def test_rejects_bad_combination_op_without_override(self):
        mask = _text_mask()
        data = bytearray(encode_jbig2(mask))
        # region segment info's external combination op byte: XOR on a
        # page without the override flag must be rejected
        # layout: seg0 header(11) + page info(19) + seg1 header(11) +
        # region info w,h,x,y (16) + op byte
        op_off = 11 + 19 + 11 + 16
        assert data[op_off] == 0x00
        data[op_off] = 0x02
        with pytest.raises(Jbig2ValidationError,
                           match='override'):
            validate_jbig2(bytes(data), embedded=True)

    def test_refine_stream_uses_override_flag(self):
        # the XOR-residue stream must set page flag bit 6, or third-party
        # decoders may legally reject it (T.88 7.4.8.5)
        mask = _glyph_mask()
        # corr 60 forces non-exact classes, so a residue region exists
        data = encode_jbig2(mask, symbol_mode='refine',
                            symbol_corr_pct=60)
        page_flags = data[11 + 16]
        assert page_flags & 0x40
        validate_jbig2(data, embedded=True, expect=mask)


# ---------------------------------------------------------------- JP2

from archive_pdf_tools_tpu.validators.jp2_check import (  # noqa: E402
    validate_jp2, Jp2ValidationError)


class TestJp2SpecValidator:
    def _encode(self, shape, ratio=None, **kw):
        import os
        from archive_pdf_tools_tpu.codecs.jp2tpu import encode_jp2_tpu
        os.environ.setdefault('APT_JP2_DEVICE', 'native')
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        return encode_jp2_tpu(img, ratio=ratio, **kw)

    def test_profiles_walk_to_eoc(self):
        for shape, ratio in [((300, 400), None), ((301, 399), 50),
                             ((256, 256, 3), 100), ((64, 64), 20)]:
            facts = validate_jp2(self._encode(shape, ratio))
            assert facts['packet_walk']
            assert facts['w'] == shape[1] and facts['h'] == shape[0]
            if ratio:
                assert facts['included'] < facts['blocks']

    def test_pillow_stream_box_checks(self):
        import io
        from PIL import Image
        rng = np.random.default_rng(2)
        img = Image.fromarray(
            rng.integers(0, 256, (120, 140), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format='JPEG2000',
                 quality_mode='rates', quality_layers=[50])
        facts = validate_jp2(buf.getvalue())
        assert facts['w'] == 140 and facts['h'] == 120
        # OpenJPEG's reversible streams strict-walk too (QCD style 0):
        # agreement with a fully independent encoder's Tier-2 framing
        # cross-validates the walker itself
        assert facts['packet_walk']

    def test_rejects_packet_header_bitflip(self):
        # flips in the first packet's HEADER bytes must derail the walk
        # (body/MQ flips are legitimately invisible to Tier-2 syntax —
        # the Pillow decode covers those); a header flip changes
        # inclusion/length coding so the walk misses EOC or Psot
        data = bytearray(self._encode((300, 400), ratio=30))
        sod = data.find(b'\xff\x93')
        caught = tried = 0
        for off in range(sod + 2, sod + 8):
            for bit in (0x80, 0x10, 0x01):
                mut = bytearray(data)
                mut[off] ^= bit
                tried += 1
                try:
                    validate_jp2(bytes(mut))
                except Jp2ValidationError:
                    caught += 1
        assert caught >= tried // 2, (caught, tried)

    def test_rejects_truncation(self):
        data = self._encode((300, 400))
        with pytest.raises(Jp2ValidationError):
            validate_jp2(data[:-30])

    def test_rejects_bad_psot(self):
        data = bytearray(self._encode((128, 128)))
        sot = data.find(b'\xff\x90')
        # Psot at sot+6 (marker 2 + Lsot 2 + Isot 2)
        import struct as _s
        psot = _s.unpack('>I', data[sot + 6:sot + 10])[0]
        data[sot + 6:sot + 10] = _s.pack('>I', psot + 4)
        with pytest.raises(Jp2ValidationError, match='Psot|EOC'):
            validate_jp2(bytes(data))

    def test_rejects_bad_signature(self):
        data = bytearray(self._encode((64, 64)))
        data[8:12] = b'nope'
        with pytest.raises(Jp2ValidationError):
            validate_jp2(bytes(data))
