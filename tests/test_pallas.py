"""Pallas kernel parity (interpret mode on CPU) vs exact oracles."""

import os

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

    def test_bitplane_and_tables_agree(self):
        # both in-row prefix implementations (MXU bit-plane vs packed
        # tables) must match the golden serial semantics exactly
        rng = np.random.default_rng(7)
        mask = rng.random((2, 50, 300)) < 0.3
        ref = np.stack([golden.fast_mask_denoise_ref(m, 4, 2)
                        for m in mask])
        for bp in (True, False):
            got = np.asarray(fast_mask_denoise_pallas(
                mask, 4, 2, interpret=True, bitplane=bp))
            assert (ref == got).all(), bp

    def test_long_nonconstant_chain_exact(self):
        # adversarial input for the K-windowed prefix shortcut: a lone
        # full-width one-pixel row is a >K-long chain of AND transitions
        # (every interior pixel counts exactly mincnt neighbours), so no
        # 128-column window composition is constant and the row must
        # take the full-prefix fallback.  Also a checkerboard band and
        # an isolated-speckle field for the resolved paths.
        h, w = 20, 400
        rows = []
        m = np.zeros((h, w), bool)
        m[10, :] = True                       # AND chain, kept
        rows.append(m)
        m = np.zeros((h, w), bool)
        m[8:12, ::2] = True                   # checkerboard-ish band
        m[9, :] = True
        rows.append(m)
        m = np.zeros((h, w), bool)
        m[5, 5] = m[7, 100] = m[15, 399] = True   # speckles, dropped
        rows.append(m)
        for mask in rows:
            ref = golden.fast_mask_denoise_ref(mask, 4, 2)
            got = np.asarray(fast_mask_denoise_pallas(
                mask[None], 4, 2, interpret=True))[0]
            assert (ref == got).all()


class TestThresholdPallas:
    # interpret runs cost minutes at radius 48; the radius-8 bucket
    # exercises the same kernel mechanics (full radius verified on TPU
    # and via APT_RUN_SLOW=1)
    def test_fused_blur_sauvola_small_radius(self):
        import scipy.ndimage as ndi
        from archive_pdf_tools_tpu.ops import threshold_pallas as tp
        img = synth_page(60, 150, seed=2, noise=0)[None]
        sigma = 1.2
        idx = np.arange(-8, 9, dtype=np.float64)
        wts = np.exp(-0.5 * idx ** 2 / sigma ** 2)
        wts = (wts / wts.sum()).astype(np.float32)[None]
        got = np.asarray(tp.blur_sauvola_pallas(
            img, wts, 31, interpret=True, radius=8))[0]
        blurred = ndi.gaussian_filter(img[0].astype(np.float32),
                                      sigma=sigma, truncate=8 / sigma)
        ref = golden.sauvola_mask_ref(blurred.astype(np.uint8), 31, 31,
                                      0.34)
        assert (ref == got).mean() > 0.998   # f32 blur vs f64 scipy

    def test_identity_weights_pure_sauvola(self):
        from archive_pdf_tools_tpu.ops import threshold_pallas as tp
        img = synth_page(56, 140, seed=1, noise=0)[None]
        wts = np.zeros((1, 17), np.float32)
        wts[0, 8] = 1.0
        got = np.asarray(tp.blur_sauvola_pallas(
            img, wts, 31, interpret=True, radius=8))[0]
        ref = golden.sauvola_mask_ref(img[0], 31, 31, 0.34)
        assert (ref == got).all()

    @pytest.mark.skipif(os.environ.get('APT_RUN_SLOW') != '1',
                        reason='full-tap interpret run costs minutes; '
                               'verified on TPU')
    def test_fused_full_taps_matches_xla(self):
        from archive_pdf_tools_tpu.mrc import decompose as D
        imgs = np.stack([synth_page(60, 150, seed=s, noise=22)
                         for s in range(1)])
        blur_u8, s1 = D.global_threshold_input(imgs)
        ref = np.asarray(D.global_threshold(blur_u8, 31))
        got, s2 = D.global_threshold_fused(imgs, 31, interpret=True)
        assert (ref == np.asarray(got)).all()


class TestLinesPallas:
    def test_line_crops_exact(self):
        from archive_pdf_tools_tpu.ops.lines_pallas import \
            line_thresholds_pallas
        gray = np.stack([synth_page(120, 250, seed=s) for s in range(2)])
        boxes = np.array([[20, 60, 100, 250],
                          [30, 75, 25, 230],
                          [70, 115, 5, 245]], np.int32)
        t, b, l, r = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        pages = np.array([0, 1, 1], np.int32)
        th, ti, ones, ones_inv = line_thresholds_pallas(
            gray, np.stack([t, b, l, r]), pages, 51, 0.1, interpret=True)
        th, ti = np.asarray(th), np.asarray(ti)
        ones, ones_inv = np.asarray(ones), np.asarray(ones_inv)
        for i in range(3):
            crop = gray[pages[i], t[i]:b[i], l[i]:r[i]]
            ref = golden.sauvola_mask_ref(crop, 51, 51, 0.1)
            refi = golden.sauvola_mask_ref(255 - crop, 51, 51, 0.1)
            off = t[i] % 8        # crop rows are 8-aligned (lines_pallas)
            sl = slice(off, off + b[i] - t[i])
            assert (ref == th[i][sl, l[i]:r[i]].astype(bool)).all()
            assert (refi == ti[i][sl, l[i]:r[i]].astype(bool)).all()
            assert ones[i] == ref.sum()          # fused ink counts
            assert ones_inv[i] == refi.sum()

    def test_paste_kernel_matches_scan(self):
        """paste_crops_pallas == the XLA-scan paste, including overlap
        order, unselected lines, and pages with no lines."""
        import jax.numpy as jnp
        from archive_pdf_tools_tpu.ops.lines_pallas import \
            line_thresholds_pallas
        from archive_pdf_tools_tpu.ops.paste_pallas import \
            build_paste_plan, paste_crops_pallas
        from archive_pdf_tools_tpu.mrc import decompose as D

        bsz, h, w = 3, 120, 250
        gray = np.stack([synth_page(h, w, seed=s) for s in range(bsz)])
        # overlapping boxes on page 0; page 2 has no lines at all
        boxes = np.array([[20, 60, 100, 250],
                          [35, 80, 60, 220],       # overlaps the first
                          [70, 115, 5, 245],
                          [9, 40, 30, 200]], np.int32).T
        pages = np.array([0, 0, 1, 1], np.int32)
        selector = np.array([1, 2, 0, 1], np.int32)
        gmask = np.zeros((bsz, h, w), bool)
        gmask[:, 100:104, 10:50] = True

        th, ti, _o, _oi = line_thresholds_pallas(
            gray, jnp.asarray(boxes), jnp.asarray(pages), 51, 0.1,
            interpret=True)
        th, ti = th[:boxes.shape[1]], ti[:boxes.shape[1]]  # drop GROUP pad

        ref = np.asarray(D.paste_selected_crops(
            th, ti, jnp.asarray(boxes), jnp.asarray(pages),
            jnp.asarray(selector), jnp.asarray(gmask), bsz, h))

        plan = build_paste_plan(boxes, pages, selector, bsz)
        got = np.asarray(paste_crops_pallas(
            th, ti,
            *(jnp.asarray(plan[k]) for k in
              ('li', 't', 'b', 'l', 'r', 'sel', 'gpage', 'gfirst')),
            jnp.asarray(gmask), interpret=True))
        assert (ref == got).all()

        # the combined-stream PG=8 variant (APT_PASTE=combined8) pastes
        # identically
        plan8 = build_paste_plan(boxes, pages, selector, bsz, pg=8)
        got8 = np.asarray(paste_crops_pallas(
            th, ti,
            *(jnp.asarray(plan8[k]) for k in
              ('li', 't', 'b', 'l', 'r', 'sel', 'gpage', 'gfirst')),
            jnp.asarray(gmask), interpret=True, combined=True))
        assert (ref == got8).all()

    def test_paste_kernel_no_selected_lines(self):
        import jax.numpy as jnp
        from archive_pdf_tools_tpu.ops.paste_pallas import \
            build_paste_plan, paste_crops_pallas
        bsz, h, w = 2, 64, 130
        crops = np.ones((8, 16, 256), np.uint8)
        boxes = np.array([[8, 30, 0, 100]], np.int32).T
        pages = np.array([1], np.int32)
        selector = np.array([0], np.int32)
        gmask = np.zeros((bsz, h, w), bool)
        gmask[0, 5, 5] = True
        plan = build_paste_plan(boxes, pages, selector, bsz)
        got = np.asarray(paste_crops_pallas(
            jnp.asarray(crops), jnp.asarray(crops),
            *(jnp.asarray(plan[k]) for k in
              ('li', 't', 'b', 'l', 'r', 'sel', 'gpage', 'gfirst')),
            jnp.asarray(gmask), interpret=True))
        assert (got == gmask).all()

    @pytest.mark.skipif(os.environ.get('APT_RUN_SLOW') != '1',
                        reason='full-tap interpret run costs minutes; '
                               'verified on TPU')
    def test_mask_path_parity_pallas_vs_xla(self, monkeypatch):
        from archive_pdf_tools_tpu.mrc.api import decompose_masks
        from tests.test_decompose import synth_word_data
        imgs = [synth_page(110, 180, seed=s, noise=18) for s in range(2)]
        wds = [synth_word_data(110, 180, n_lines=3, seed=s)
               for s in range(2)]
        m1, _ = decompose_masks(imgs, wds, dpi=80)
        monkeypatch.setenv('APT_TPU_KERNELS', 'pallas')
        m2, _ = decompose_masks(imgs, wds, dpi=80)
        assert (np.asarray(m1) == np.asarray(m2)).all()
