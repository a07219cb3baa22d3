"""Tests for filters, sigma estimation, grayconvert, resize, TV denoise."""

import numpy as np
import pytest
from PIL import Image
from scipy import ndimage

from archive_pdf_tools_tpu.ops.filters import (
    gaussian_filter, uniform_filter, partial_blur, partial_boxblur)
from archive_pdf_tools_tpu.ops.sigma import estimate_sigma, estimate_noise
from archive_pdf_tools_tpu.ops.grayconvert import special_gray_convert
from archive_pdf_tools_tpu.ops.resize import (
    resize, thumbnail_size, downsample_layer)
from archive_pdf_tools_tpu.ops.tv import denoise_tv_bregman, denoise_bregman

from tests.test_kernels import synth_page


class TestFilters:
    @pytest.mark.parametrize('sigma', [0.5, 1.3, 3.0])
    def test_gaussian_matches_scipy(self, sigma):
        img = synth_page(80, 100).astype(np.float32)
        ref = ndimage.gaussian_filter(img, sigma=sigma)
        got = np.asarray(gaussian_filter(img[None], sigma))[0]
        assert np.abs(ref - got).max() < 0.05

    def test_uniform_matches_scipy(self):
        img = synth_page(60, 70).astype(np.float32)
        ref = ndimage.uniform_filter(img, size=5)
        got = np.asarray(uniform_filter(img[None], 5))[0]
        assert np.abs(ref - got).max() < 0.05

    def test_partial_blur_restores_mask_pixels(self):
        img = synth_page(60, 70)
        mask = img < 100
        out = np.asarray(partial_blur(mask[None], img[None], sigma=5))[0]
        assert (out[mask] == img[mask]).all()

    def test_partial_boxblur_rgb(self):
        g = synth_page(40, 50)
        img = np.stack([g, g, g], -1)
        mask = g < 100
        out = np.asarray(partial_boxblur(mask[None], img[None], size=5))[0]
        assert out.shape == img.shape
        assert (out[mask] == img[mask]).all()


class TestSigma:
    def test_gaussian_noise_recovered(self):
        rng = np.random.default_rng(0)
        img = 128 + rng.normal(0, 10, (256, 256))
        est = float(np.asarray(estimate_sigma(img[None].astype(np.float32)))[0])
        assert 8.0 < est < 12.0

    def test_clean_image_low_sigma(self):
        img = np.full((128, 128), 200, np.float32)
        est = float(np.asarray(estimate_sigma(img[None]))[0])
        assert est < 1e-6

    def test_estimate_noise_crop(self):
        rng = np.random.default_rng(1)
        img = (128 + rng.normal(0, 5, (200, 300))).astype(np.float32)
        est = float(np.asarray(estimate_noise(img[None]))[0])
        assert 3.5 < est < 6.5


def _gray_ref(imd):
    """Reference semantics of special_gray_convert in plain numpy."""
    d = {}
    for i, k in enumerate('rgb'):
        ch = imd[:, :, i]
        d[k + '_min'] = ch.min() / 255.
        d[k + '_max'] = ch.max() / 255.
        d[k + '_mean'] = ch.mean() / 255.
        d[k + '_std'] = ch.std() / 255.
    bright = round(d['r_mean'] * d['g_mean'] * d['b_mean'] /
                   (d['b_max'] * (1 - d['r_std']) * (1 - d['g_std'])
                    * (1 - d['b_std'])), 4)
    low = min(int(196 * d['r_min'] + 14.5), 50)
    his = {'r': min(int(35.66 * bright + 48.5), 95),
           'g': min(int(39.22 * bright + 44.5), 95),
           'b': min(int(45.16 * bright + 36.5), 95)}
    p2v = lambda x: (x * 255) / 100
    out = np.copy(imd)
    for i, c in enumerate('rgb'):
        ch = out[:, :, i]
        minv, maxv = p2v(low), p2v(his[c])
        interval = maxv / 255. - minv / 255.
        zero = ch < minv
        mx = ch > maxv
        scaled = ((ch.astype(np.float64) - minv) / interval).astype(np.uint8)
        scaled[zero] = 0
        scaled[mx] = 255
        out[:, :, i] = scaled
    f = out.astype(np.float64) / 255.
    v = f.max(-1)
    mn = f.min(-1)
    s = np.where(v > 0, (v - mn) / np.where(v > 0, v, 1), 0)
    l = v * (1 - s / 2)
    return (l * 255).astype(np.uint8)


class TestGrayConvert:
    def test_matches_reference_semantics(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
        ref = _gray_ref(img)
        got = np.asarray(special_gray_convert(img[None]))[0]
        agree = (ref == got).mean()
        # our path is exact integer arithmetic; the reference's f64
        # truncation can land 1 LSB below the exact rational value
        assert agree > 0.9, agree
        assert np.abs(ref.astype(int) - got.astype(int)).max() <= 1


class TestResize:
    @pytest.mark.parametrize('filt,pil', [('bicubic', Image.BICUBIC),
                                          ('lanczos', Image.LANCZOS)])
    def test_close_to_pil(self, filt, pil):
        img = synth_page(120, 160)
        ref = np.asarray(Image.fromarray(img).resize((53, 40), resample=pil))
        got = np.asarray(resize(img, 40, 53, filt))
        diff = np.abs(ref.astype(int) - got.astype(int))
        assert (diff == 0).mean() > 0.99 and diff.max() <= 1

    def test_thumbnail_size_matches_pil(self):
        for (w, h, f) in [(2093, 2813, 3), (100, 150, 2), (33, 47, 3),
                          (1000, 1000, 4)]:
            im = Image.new('L', (w, h))
            im.thumbnail((int(w / f), int(h / f)))
            assert thumbnail_size(w, h, int(w / f), int(h / f)) == im.size

    def test_downsample_layer_too_small(self):
        img = np.full((2, 2), 100, np.uint8)
        out, ok = downsample_layer(img, 3)
        assert not ok and out.shape == (2, 2)

    def test_rgb_resize(self):
        img = np.stack([synth_page(60, 80, seed=s) for s in range(3)], -1)
        out = np.asarray(resize(img, 30, 40))
        assert out.shape == (30, 40, 3)


class TestTV:
    def test_denoises(self):
        rng = np.random.default_rng(5)
        clean = np.zeros((64, 64), np.float32)
        clean[20:44, 20:44] = 1.0
        noisy = clean + rng.normal(0, 0.3, clean.shape).astype(np.float32)
        out = np.asarray(denoise_tv_bregman(noisy[None], weight=1.0))[0]
        assert ((out > 0.5) == (clean > 0.5)).mean() > 0.97

    def test_mask_wrapper(self):
        rng = np.random.default_rng(6)
        mask = np.zeros((64, 64), bool)
        mask[10:50, 10:50] = True
        speck = rng.random(mask.shape) < 0.01
        out = np.asarray(denoise_bregman((mask | speck)[None]))[0]
        assert out.dtype == bool
        # bulk preserved, isolated specks mostly gone
        assert out[15:45, 15:45].all()
