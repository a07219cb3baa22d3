"""Codec layer tests: JBIG2 round-trip, CCITT polarity, JPEG size target,
JPEG2000 in-process, MRC encode bundle."""

import io

import numpy as np
from PIL import Image

from archive_pdf_tools_tpu.codecs.jbig2 import encode_jbig2, decode_jbig2
from archive_pdf_tools_tpu.codecs.ccitt import (
    encode_ccitt_g4, decode_ccitt_g4)
from archive_pdf_tools_tpu.codecs.jpeg import encode_jpeg
from archive_pdf_tools_tpu.codecs.jpeg2000 import (
    encode_jpeg2000, decode_jpeg2000, get_jpeg2000_info)
from archive_pdf_tools_tpu.codecs.mrc_encode import (
    encode_mrc_mask, encode_mrc_images)

from tests.test_kernels import synth_page


def text_mask(h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    m = np.zeros((h, w), bool)
    for _ in range(60):
        y, x = rng.integers(0, h - 5), rng.integers(0, w - 40)
        m[y:y + 3, x:x + int(rng.integers(8, 40))] = True
    return m


class TestJBIG2:
    def test_roundtrip_masks(self):
        for seed in range(3):
            m = text_mask(seed=seed)
            data = encode_jbig2(m)
            assert (decode_jbig2(data, 320, 240) == m).all()

    def test_standalone_has_file_header(self):
        m = text_mask()
        data = encode_jbig2(m, embedded=False)
        assert data[:4] == b'\x97JB2'

    def test_embedded_no_file_header(self):
        m = text_mask()
        data = encode_jbig2(m, embedded=True)
        assert data[:4] != b'\x97JB2'

    def test_compresses(self):
        m = text_mask()
        data = encode_jbig2(m)
        assert len(data) < m.size // 8 // 3   # beats raw packed by 3x+

    def test_banded_roundtrip(self):
        for seed, bands in ((0, 2), (1, 3), (2, 7)):
            m = text_mask(seed=seed, h=896)
            data = encode_jbig2(m, bands=bands)
            assert (decode_jbig2(data, 320, 896) == m).all()
            mono = encode_jbig2(m)
            # banding restarts the coder per band: small overhead only
            assert len(data) < len(mono) + 200 * bands

    def test_banded_standalone(self):
        m = text_mask(h=512)
        data = encode_jbig2(m, embedded=False, bands=2)
        assert data[:4] == b'\x97JB2'
        assert (decode_jbig2(data, 320, 512) == m).all()

    def test_bands_clamped_for_short_pages(self):
        m = text_mask(h=160)          # fewer rows than 2 x 128
        data = encode_jbig2(m, bands=8)
        assert (decode_jbig2(data, 320, 160) == m).all()

    def test_packed_input_byte_identical(self):
        # the packed-row entry point (jbig2tpu_encode_packed) must
        # produce byte-identical streams to the byte-per-pixel path,
        # with and without polarity inversion, incl. non-multiple-of-8
        # widths (row padding bits must never leak into the region)
        from archive_pdf_tools_tpu.codecs.jbig2 import encode_jbig2_packed
        for seed, w in ((0, 320), (1, 317), (2, 257)):
            m = text_mask(seed=seed)[:, :w]
            pk = np.packbits(m.astype(np.uint8), axis=-1)
            assert encode_jbig2_packed(pk, w, 240) == encode_jbig2(m)
            assert encode_jbig2_packed(pk, w, 240, invert=True) \
                == encode_jbig2(~m)

    def test_packed_mask_fast_path(self):
        # PackedMask through encode_mrc_mask: identical EncodedMask on
        # the generic path, and a correct host unpack for formats the
        # packed encoder doesn't cover (png / symbol mode)
        from archive_pdf_tools_tpu.codecs.mrc_encode import PackedMask
        m = text_mask(seed=3, w=317)
        pm = PackedMask(np.packbits(m.astype(np.uint8), axis=-1),
                        317, 240)
        assert encode_mrc_mask(pm) == encode_mrc_mask(m)
        assert encode_mrc_mask(pm, fmt='png') == encode_mrc_mask(m,
                                                                 fmt='png')
        assert encode_mrc_mask(pm, jbig2_symbol_mode=True) \
            == encode_mrc_mask(m, jbig2_symbol_mode=True)

    def test_run_fastpath_byte_identical(self):
        # The batched-MPS run fast path (native/jbig2.cpp SameRun +
        # EncodeMPSRun) must produce byte-identical streams to the
        # serial per-pixel coder (JBIG2_NO_RUNOPT=1).  Shapes chosen to
        # hit every branch: white margins, solid ink blocks, dithered
        # noise (no runs), alternating columns, run ends at row edges.
        import os
        rng = np.random.default_rng(7)
        masks = [
            np.zeros((64, 200), bool),                    # all white
            np.ones((64, 200), bool),                     # all ink
            text_mask(seed=3),                            # sparse text
            rng.random((96, 256)) < 0.5,                  # dense noise
            np.tile(np.arange(256) % 2 == 0, (40, 1)),    # alternating
        ]
        big = np.zeros((400, 520), bool)                  # page-like:
        big[60:100, 40:480] = True                        # ink band
        big[200:240, 40:200] = True
        big[200:240, 300:480] = True                      # word gap
        masks.append(big)
        for tp in (True, False):
            for i, m in enumerate(masks):
                fast = encode_jbig2(m, tpgdon=tp)
                os.environ['JBIG2_NO_RUNOPT'] = '1'
                try:
                    serial = encode_jbig2(m, tpgdon=tp)
                finally:
                    del os.environ['JBIG2_NO_RUNOPT']
                assert fast == serial, (i, tp)
                assert (decode_jbig2(fast, m.shape[1],
                                     m.shape[0]) == m).all()


def glyph_mask(h=400, w=520, seed=1):
    """Text-like page reusing a small set of exact glyph bitmaps."""
    rng = np.random.default_rng(seed)
    glyphs = [rng.random((11, 8)) < 0.5 for _ in range(12)]
    m = np.zeros((h, w), bool)
    for row in range(4, h - 14, 16):
        x = 6
        while x < w - 14:
            m[row:row + 11, x:x + 8] |= glyphs[int(rng.integers(0, 12))]
            x += 8 + int(rng.integers(2, 6))
    return m


def noisy_glyph_mask(h=400, w=520, seed=1, flips=2):
    """glyph_mask with a few salt-noise bit flips per glyph instance, so
    instances are near-identical but not exact copies."""
    rng = np.random.default_rng(seed)
    glyphs = [rng.random((11, 8)) < 0.5 for _ in range(4)]
    m = np.zeros((h, w), bool)
    for row in range(4, h - 14, 16):
        x = 6
        while x < w - 14:
            g = glyphs[int(rng.integers(0, 4))].copy()
            for _ in range(flips):
                gy, gx = rng.integers(1, 10), rng.integers(1, 7)
                g[gy, gx] = ~g[gy, gx]
            m[row:row + 11, x:x + 8] |= g
            x += 8 + int(rng.integers(2, 6))
    return m


class TestJBIG2Symbol:
    def test_lossless_roundtrip(self):
        m = glyph_mask()
        data = encode_jbig2(m, symbol_mode=True)
        assert (decode_jbig2(data, m.shape[1], m.shape[0]) == m).all()

    def test_lossy_classifier_compresses_noisy_glyphs(self):
        m = noisy_glyph_mask()
        exact = encode_jbig2(m, symbol_mode=True)
        lossy = encode_jbig2(m, symbol_mode='lossy')
        # near-identical instances merge into fewer classes (the random
        # 50%-density synthetic glyphs trip the 2x2 veto far more often
        # than real text; real pages merge much further)
        assert len(lossy) < 0.75 * len(exact)
        got = decode_jbig2(lossy, m.shape[1], m.shape[0])
        agree = (got == m).mean()
        assert agree > 0.97          # exemplar substitution only
        # every glyph instance is still rendered somewhere close by:
        # ink counts stay within a few percent
        assert abs(int(got.sum()) - int(m.sum())) < 0.1 * m.sum()

    def test_lossy_is_exact_on_exact_copies(self):
        m = glyph_mask()
        lossy = encode_jbig2(m, symbol_mode='lossy')
        # identical instances classify exactly; output stays lossless
        assert (decode_jbig2(lossy, m.shape[1], m.shape[0]) == m).all()

    def test_refine_is_bit_exact(self):
        m = noisy_glyph_mask()
        lossy = encode_jbig2(m, symbol_mode='lossy')
        refined = encode_jbig2(m, symbol_mode='refine')
        # the lossy stream really diverges on this input...
        assert not (decode_jbig2(lossy, m.shape[1], m.shape[0]) == m).all()
        # ...and the XOR residue region restores exactness
        assert (decode_jbig2(refined, m.shape[1], m.shape[0]) == m).all()
        assert len(refined) > len(lossy)

    def test_refine_beats_exact_symbols_on_noisy_glyphs(self):
        m = noisy_glyph_mask(flips=2)
        exact = encode_jbig2(m, symbol_mode=True)
        refined = encode_jbig2(m, symbol_mode='refine')
        # both lossless; shared exemplars + residue beat per-variant
        # dictionary symbols once instances diverge enough (salt noise
        # is the residue's worst case — clustered edge noise on real
        # scans compresses far better)
        assert (decode_jbig2(refined, m.shape[1], m.shape[0]) == m).all()
        assert len(refined) < len(exact)

    def test_refine_no_residue_on_exact_copies(self):
        m = glyph_mask()
        refined = encode_jbig2(m, symbol_mode='refine')
        plain = encode_jbig2(m, symbol_mode='lossy')
        # exemplar rendering already matches: no residue segment emitted
        assert len(refined) == len(plain)
        assert (decode_jbig2(refined, m.shape[1], m.shape[0]) == m).all()

    def test_beats_generic_on_repeated_glyphs(self):
        m = glyph_mask()
        gen = encode_jbig2(m)
        sym = encode_jbig2(m, symbol_mode=True)
        assert len(sym) < len(gen)

    def test_auto_picks_smaller(self):
        m = glyph_mask()
        auto = encode_jbig2(m, symbol_mode='auto')
        gen = encode_jbig2(m)
        sym = encode_jbig2(m, symbol_mode=True)
        assert len(auto) == min(len(gen), len(sym))
        assert (decode_jbig2(auto, m.shape[1], m.shape[0]) == m).all()

    def test_edge_masks(self):
        for m in (np.zeros((40, 50), bool), np.ones((40, 50), bool),
                  np.eye(64, dtype=bool),
                  np.array([[True]]),
                  text_mask(64, 80)):
            for mode in (True, 'auto'):
                data = encode_jbig2(m, symbol_mode=mode)
                got = decode_jbig2(data, m.shape[1], m.shape[0])
                assert (got == m).all(), mode

    def test_standalone_symbol_file(self):
        m = glyph_mask()
        data = encode_jbig2(m, embedded=False, symbol_mode=True)
        assert data[:4] == b'\x97JB2'
        assert (decode_jbig2(data, m.shape[1], m.shape[0]) == m).all()

    def test_mask_encode_sets_decode_array(self):
        m = glyph_mask()
        em = encode_mrc_mask(m, jbig2_symbol_mode=True)
        assert em.decode == (1, 0)
        # generic polarity has no decode flip
        em2 = encode_mrc_mask(m)
        assert em2.decode is None


class TestCCITT:
    def test_roundtrip(self):
        m = text_mask(seed=5)
        data = encode_ccitt_g4(m)
        back = decode_ccitt_g4(data, 320, 240)
        assert (back == m).all()

    def test_large_single_strip(self):
        m = np.zeros((3000, 2400), bool)
        m[::7] = True
        data = encode_ccitt_g4(m)
        assert (decode_ccitt_g4(data, 2400, 3000) == m).all()


class TestJPEG:
    def test_size_target(self):
        img = Image.fromarray(synth_page(400, 500))
        data = encode_jpeg(img, ['-S30'])
        assert len(data) <= 30 * 1024
        assert data[:2] == b'\xff\xd8'

    def test_no_target(self):
        img = Image.fromarray(synth_page(100, 100))
        data = encode_jpeg(img)
        assert data[:2] == b'\xff\xd8'


class TestJP2:
    def test_pillow_roundtrip(self, tmp_path):
        img = Image.fromarray(synth_page(120, 150))
        out = str(tmp_path / 'x.jp2')
        encode_jpeg2000(img, out, 'pillow',
                        ['quality_mode:"rates";quality_layers:[50]'])
        size, mode = get_jpeg2000_info(out)
        assert size == (150, 120)
        back = decode_jpeg2000(out)
        assert back.size == (150, 120)

    def test_reduce(self, tmp_path):
        img = Image.fromarray(synth_page(128, 160))
        out = str(tmp_path / 'y.jp2')
        encode_jpeg2000(img, out, 'pillow',
                        ['quality_mode:"rates";quality_layers:[50]'])
        back = decode_jpeg2000(out, reduce_=3)
        assert back.size[0] < 160


class TestMRCEncode:
    def test_bundle(self):
        mask = text_mask()
        g = synth_page(240, 320)
        em, eb, ef = encode_mrc_images(
            mask, g, g,
            bg_compression_flags=['quality_mode:"rates";quality_layers:[500]'],
            fg_compression_flags=['quality_mode:"rates";quality_layers:[750]'])
        assert em.fmt == 'jbig2' and em.width == 320 and em.height == 240
        assert eb.data[:4] in (b'\x00\x00\x00\x0c', b'\xffO\xffQ')
        assert ef.gray

    def test_mask_polarity(self):
        # ink must be encoded as JBIG2-white (bit 0): all-ink mask encodes
        # to the same stream as an all-white jbig2 page
        mask = np.ones((40, 60), bool)
        d = encode_mrc_mask(mask).data
        back = decode_jbig2(d, 60, 40)
        assert not back.any()   # raw jbig2 bits are all 0 (white)

    def test_png_mask(self):
        mask = text_mask()
        em = encode_mrc_mask(mask, fmt='png')
        img = Image.open(io.BytesIO(em.data))
        arr = np.asarray(img)
        assert (arr == mask).all()   # True = white pixels
