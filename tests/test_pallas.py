"""Pallas kernel parity (interpret mode on CPU) vs exact oracles."""

import numpy as np
import pytest

from archive_pdf_tools_tpu.ops import golden
from archive_pdf_tools_tpu.ops.optimise_pallas import optimise_pallas
from archive_pdf_tools_tpu.ops.denoise_pallas import fast_mask_denoise_pallas

from tests.test_kernels import synth_page


class TestOptimisePallas:
    @pytest.mark.parametrize('n', [3, 10])
    def test_gray_exact(self, n):
        img = synth_page(70, 150, seed=n)
        mask = golden.sauvola_mask_ref(img, 15, 15, 0.34)
        ref = golden.optimise_ref(mask, img, n)
        got = np.asarray(optimise_pallas(mask[None], img[None], n,
                                         interpret=True))[0]
        assert (ref == got).all()

    def test_rgb_exact(self):
        g = synth_page(60, 140, seed=5)
        img = np.stack([g, np.clip(g + 9, 0, 255),
                        np.clip(g - 9, 0, 255)], -1).astype(np.uint8)
        mask = golden.sauvola_mask_ref(g, 15, 15, 0.34)
        ref = golden.optimise_ref(mask, img, 3)
        got = np.asarray(optimise_pallas(mask[None], img[None], 3,
                                         interpret=True))[0]
        assert (ref == got).all()

    def test_batched_nonaligned_width(self):
        imgs = np.stack([synth_page(50, 130, seed=s) for s in range(3)])
        masks = np.stack([golden.sauvola_mask_ref(i, 15, 15, 0.34)
                          for i in imgs])
        got = np.asarray(optimise_pallas(masks, imgs, 3, interpret=True))
        for i in range(3):
            assert (golden.optimise_ref(masks[i], imgs[i], 3)
                    == got[i]).all()

    def test_empty_and_full_mask(self):
        img = synth_page(40, 128)
        for mask in (np.zeros((40, 128), bool), np.ones((40, 128), bool)):
            ref = golden.optimise_ref(mask, img, 3)
            got = np.asarray(optimise_pallas(mask[None], img[None], 3,
                                             interpret=True))[0]
            assert (ref == got).all()


class TestDenoisePallas:
    def test_random_exact(self):
        rng = np.random.default_rng(11)
        mask = rng.random((2, 70, 140)) < 0.25
        ref = np.stack([golden.fast_mask_denoise_ref(m, 4, 2) for m in mask])
        got = np.asarray(fast_mask_denoise_pallas(mask, 4, 2,
                                                  interpret=True))
        assert (ref == got).all()

    def test_text_mask_exact(self):
        img = synth_page(90, 150, seed=3)
        mask = golden.sauvola_mask_ref(img, 15, 15, 0.34)
        ref = golden.fast_mask_denoise_ref(mask, 4, 2)
        got = np.asarray(fast_mask_denoise_pallas(mask[None], 4, 2,
                                                  interpret=True))[0]
        assert (ref == got).all()
