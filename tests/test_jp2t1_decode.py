"""Decode-side validation of the in-tree EBCOT Tier-1 encoder.

validators/jp2t1_check.py is a from-spec T.800 D.3/D.4 block DECODER
(direct neighbourhood reads, no flag-word machinery) over the shared
T.88/T.800 MQ decoder.  Every stream the native encoder
(native/jp2t1.cpp) emits must round-trip coefficient-exactly:
full blocks bit-for-bit, plane-boundary truncations with the uncoded
planes masked.  This closes the validator-independence loop for
JPEG2000 the way validators/jbig2_check.py does for JBIG2 (VERDICT r4
missing #3) — no external codec involved.
"""

import numpy as np
import pytest

from archive_pdf_tools_tpu.codecs import jp2tpu as J
from archive_pdf_tools_tpu.validators.jp2t1_check import decode_block


def _encode(blk, orient, max_passes=-1):
    lib = J._get_lib()
    return J._encode_block(lib, blk, orient, max_passes=max_passes)


def _expect(blk, p_end=0):
    mag = (np.abs(blk).astype(np.int64) >> p_end) << p_end
    sgn = (blk < 0).astype(np.int64)
    return mag, sgn


def _check(blk, orient, p_end=0, max_passes=-1):
    data, nbps, npasses, _r, _d = _encode(blk, orient,
                                          max_passes=max_passes)
    h, w = blk.shape
    if nbps == 0:
        assert not np.any(blk)
        return
    mag, sgn = decode_block(data, w, h, orient, nbps, npasses)
    mag = np.asarray(mag).reshape(h, w)
    sgn = np.asarray(sgn).reshape(h, w)
    emag, esgn = _expect(blk, p_end)
    assert np.array_equal(mag, emag), (
        'magnitude mismatch orient=%d shape=%s p_end=%d'
        % (orient, blk.shape, p_end))
    nz = mag > 0
    assert np.array_equal(sgn[nz], esgn[nz]), 'sign mismatch'


@pytest.mark.parametrize('orient', [0, 1, 2])
def test_full_roundtrip_random(orient):
    rng = np.random.default_rng(17 + orient)
    blk = rng.integers(-90, 91, (32, 32), np.int32)
    _check(blk, orient)


def test_full_roundtrip_sparse():
    rng = np.random.default_rng(5)
    blk = np.zeros((64, 64), np.int32)
    idx = rng.integers(0, 64 * 64, 150)
    blk.ravel()[idx] = rng.integers(-400, 401, 150)
    _check(blk, 2)


@pytest.mark.parametrize('shape', [(1, 1), (5, 7), (33, 17), (4, 64),
                                   (63, 5)])
def test_odd_shapes(shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    blk = rng.integers(-30, 31, shape, np.int32)
    _check(blk, 1)


def test_single_coefficient_values():
    for v in (1, -1, 2, 255, -256, 1 << 15):
        blk = np.zeros((8, 8), np.int32)
        blk[3, 4] = v
        _check(blk, 0)


def test_plane_boundary_truncation():
    rng = np.random.default_rng(99)
    blk = rng.integers(-200, 201, (32, 32), np.int32)
    nbps = int(np.abs(blk).max()).bit_length()
    for p_end in (1, 2, 4):
        if p_end >= nbps:
            continue
        npasses = 1 + 3 * (nbps - 1 - p_end)
        _check(blk, 0, p_end=p_end, max_passes=npasses)


def test_realistic_band_blocks():
    """Blocks cut from a real quantized band of the native transform:
    the decoder must round-trip production coefficient statistics,
    not just synthetic noise."""
    rng = np.random.default_rng(3)
    img = np.full((256, 256), 230, np.uint8)
    for _ in range(40):
        y, x = rng.integers(10, 240, 2)
        img[y:y + 6, x:x + int(rng.integers(20, 80))] = 35
    pages, meta = J.transform_jp2_batch(img[None], ratio=200)
    bands = pages[0][0]     # component 0: LL then HL/LH/HH per level
    checked = 0
    for bi, arr in enumerate(bands):
        arr = np.asarray(arr, np.int32)
        if arr.ndim != 2 or not np.any(arr):
            continue
        blk = arr[:min(32, arr.shape[0]), :min(32, arr.shape[1])]
        if not np.any(blk):
            continue
        _check(np.ascontiguousarray(blk), min(bi % 3, 2))
        checked += 1
        if checked >= 3:
            break
    assert checked >= 1


def test_corruption_detected():
    """Flipping a mid-stream byte must change the decode (the stream
    is not silently self-correcting)."""
    rng = np.random.default_rng(7)
    blk = rng.integers(-90, 91, (16, 16), np.int32)
    data, nbps, npasses, _r, _d = _encode(blk, 0)
    bad = bytearray(data)
    bad[len(bad) // 2] ^= 0x5A
    try:
        mag, sgn = decode_block(bytes(bad), 16, 16, 0, nbps, npasses)
    except Exception:
        return                      # detected as a hard error: fine
    emag, _ = _expect(blk)
    assert not np.array_equal(np.asarray(mag).reshape(16, 16), emag)


def test_whole_codestream_decode():
    """Full loop: encode a page -> strict Tier-2 walk collects every
    included block's body -> the from-spec T1 decoder reconstructs it
    -> compare against the actual quantized band coefficients.  PCRD
    may truncate mid-plane, so the exact per-coefficient invariant is:
    decoded magnitude equals the source masked at the last coded plane
    or one plane above it (which of the two depends on which pass the
    coefficient was last coded in), and every decoded sign matches."""
    from archive_pdf_tools_tpu.validators.jp2_check import validate_jp2

    rng = np.random.default_rng(11)
    img = np.full((256, 256), 228, np.uint8)
    for _ in range(50):
        y, x = rng.integers(10, 235, 2)
        img[y:y + 5, x:x + int(rng.integers(15, 90))] = 30
    img = np.clip(img.astype(np.int16)
                  + rng.normal(0, 6, img.shape).astype(np.int16),
                  0, 255).astype(np.uint8)

    pages, meta = J.transform_jp2_batch(img[None], ratio=60)
    jp2 = J.encode_jp2_from_qbands(pages[0], meta, ratio=60, workers=1,
                                   page_idx=0)
    blks = []
    facts = validate_jp2(jp2, collect_blocks=blks)
    assert facts['packet_walk'] and blks, 'no blocks collected'

    bands = pages[0][0]
    checked = 0
    for rec in blks:
        r, bi = rec['res'], rec['band']
        band_index = 0 if r == 0 else 1 + 3 * (r - 1) + bi
        arr = np.asarray(bands[band_index], np.int64)
        x0, y0 = rec['bx'] * 64, rec['by'] * 64
        src = arr[y0:y0 + rec['h'], x0:x0 + rec['w']]
        assert src.shape == (rec['h'], rec['w'])
        mag, sgn = decode_block(rec['data'], rec['w'], rec['h'],
                                rec['orient'], rec['nbps'],
                                rec['npasses'])
        mag = np.asarray(mag).reshape(rec['h'], rec['w'])
        sgn = np.asarray(sgn).reshape(rec['h'], rec['w'])
        k = rec['npasses'] - 1
        nbps = rec['nbps']
        if k == 0:
            p_cur, phase = nbps - 1, 2
        else:
            p_cur = nbps - 2 - (k - 1) // 3
            phase = (k - 1) % 3
        amag = np.abs(src)
        m1 = (amag >> p_cur) << p_cur
        if phase == 2:
            ok = mag == m1
        else:
            m2 = (amag >> (p_cur + 1)) << (p_cur + 1)
            ok = (mag == m1) | (mag == m2)
        assert ok.all(), (
            'block res=%d band=%d bx=%d by=%d: %d coeffs outside the '
            'adjacent-plane masks' % (r, bi, rec['bx'], rec['by'],
                                      int((~ok).sum())))
        nz = mag > 0
        assert np.array_equal(sgn[nz], (src < 0)[nz].astype(int)), \
            'sign mismatch in res=%d band=%d' % (r, bi)
        checked += 1
    assert checked == len(blks) and checked >= 6
