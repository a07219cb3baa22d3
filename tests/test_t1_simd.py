"""Byte-identity of the three Tier-1 MQ implementations.

APT_T1_MQ selects how jp2t1_encode_band codes uncapped blocks:
``scalar`` (direct per-block StripeCoder), ``replay`` (record
(context, bit) decision tokens, re-encode through a scalar MQ coder —
exercises the token split on any host), and ``simd`` (16 blocks in
lockstep AVX-512 lanes; density-routed, VERDICT r4 #3).  All three
must produce identical streams, pass rates, distortions and PCRD
hulls; the conformance suite (Pillow/OpenJPEG decode) pins the
absolute T.800 semantics separately.
"""

import ctypes
import os

import numpy as np
import pytest

from archive_pdf_tools_tpu.codecs import jp2tpu as J


@pytest.fixture(scope='module')
def lib():
    return J._get_lib()


def _cases():
    rng = np.random.default_rng(7)
    yield 'dense', rng.integers(-300, 300, (200, 168)).astype(np.int32)
    sp = np.zeros((256, 256), np.int32)
    m = rng.random((256, 256)) < 0.02
    sp[m] = rng.integers(-40, 40, m.sum())
    yield 'sparse', sp
    # mid density straddles the SIMD routing threshold
    md = rng.random((192, 192)) < 0.15
    a = np.zeros((192, 192), np.int32)
    a[md] = rng.integers(-100, 100, md.sum())
    yield 'middense', a
    yield 'grad', (np.add.outer(np.arange(128), np.arange(130)) // 4
                   - 30).astype(np.int32)
    yield 'tiny', rng.integers(-5, 5, (7, 9)).astype(np.int32)
    z = np.zeros((130, 70), np.int32)
    z[5, 5] = 1000
    yield 'spike', z


def _encode(lib, arr, mode, caps=None, only=None, max_passes=-1,
            monkeypatch=None):
    monkeypatch.setenv('APT_T1_MQ', mode)
    band = J._Band('HL', 1, 1, 9, 0, 0.5, arr)
    J._encode_band_blocks(lib, band, caps=caps, only=only,
                          max_passes=max_passes)
    return band


def _assert_same(ref, got, tag):
    for i, (cr, cg) in enumerate(zip(ref.blocks, got.blocks)):
        assert cr.data == cg.data, (tag, i, 'stream')
        assert cr.nbps == cg.nbps and cr.npasses == cg.npasses, (tag, i)
        assert np.array_equal(cr.rates, cg.rates), (tag, i, 'rates')
        assert np.allclose(cr.dists, cg.dists), (tag, i, 'dists')
        if cr.hull_rows is not None:
            assert np.array_equal(cr.hull_rows[1], cg.hull_rows[1]), \
                (tag, i, 'hull')


@pytest.mark.parametrize('mode', ['replay', 'simd'])
def test_modes_match_scalar(lib, mode, monkeypatch):
    for name, arr in _cases():
        for mp in (-1, 7):
            ref = _encode(lib, arr, 'scalar', max_passes=mp,
                          monkeypatch=monkeypatch)
            got = _encode(lib, arr, mode, max_passes=mp,
                          monkeypatch=monkeypatch)
            _assert_same(ref, got, (name, mode, mp))


@pytest.mark.parametrize('mode', ['replay', 'simd'])
def test_modes_match_with_caps(lib, mode, monkeypatch):
    """Capped blocks route to the scalar path in every mode; the mixed
    band (some capped, some grouped) must still match scalar exactly."""
    rng = np.random.default_rng(11)
    arr = rng.integers(-200, 200, (256, 200)).astype(np.int32)

    def run(m):
        monkeypatch.setenv('APT_T1_MQ', m)
        band = J._Band('HH', 2, 2, 9, 0, 0.5, arr)
        caps = {id(cb): (120 if i % 3 == 0 else 0)
                for i, cb in enumerate(band.blocks)}
        J._encode_band_blocks(lib, band, caps=caps)
        return band

    _assert_same(run('scalar'), run(mode), ('caps', mode))


@pytest.mark.parametrize('mode', ['replay', 'simd'])
def test_rescue_only_subset(lib, mode, monkeypatch):
    """The rescue path (`only` subset) must leave skipped blocks
    untouched and re-encode the subset identically across modes."""
    rng = np.random.default_rng(13)
    arr = rng.integers(-150, 150, (200, 264)).astype(np.int32)

    def run(m):
        monkeypatch.setenv('APT_T1_MQ', m)
        band = J._Band('LL', 0, 0, 9, 0, 0.5, arr)
        J._encode_band_blocks(lib, band)
        only = {id(cb) for i, cb in enumerate(band.blocks) if i % 2}
        J._encode_band_blocks(lib, band, only=only)
        return band

    _assert_same(run('scalar'), run(mode), ('rescue', mode))


def test_simd_routing_density():
    """The density router groups only blocks with >= 1/8 nonzero
    coefficients (RESULTS.md r5 density sweep: SIMD crosses scalar at
    ~10-12%); this pins the threshold arithmetic."""
    assert (512 * 8 >= 64 * 64) and not (511 * 8 >= 64 * 64)
