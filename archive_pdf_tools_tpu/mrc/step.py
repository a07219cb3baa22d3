"""Single fused MRC decompose step (pure, jittable, shardable).

The flagship compute of the framework as one jit: hOCR line thresholds,
noise-adaptive global threshold, mask composition, despeckle, and both
radiate fills.  The host-side line-selection heuristic is factored out
(selection flags are inputs), so the step is a pure function of arrays
and vmaps/shards over the page batch — this is what ``__graft_entry__``
compile-checks and what the multi-chip dry run partitions.
"""

import functools

import jax
import jax.numpy as jnp

from ..const import DENOISE_FAST
from . import decompose as D


@functools.partial(jax.jit,
                   static_argnames=('window', 'n_seg', 'rgb', 'denoise',
                                    'exact_denoise'))
def mrc_full_step(images, line_id, boxes, use_plain, use_inv,
                  window, n_seg, rgb=False, denoise=DENOISE_FAST,
                  exact_denoise=True):
    """images: uint8 (B, H, W) or (B, H, W, 3); line_id: (B, H, W) int32;
    boxes: (4, n_seg) int32; use_plain/use_inv: (n_seg,) bool.

    Returns (mask bool, fg uint8, bg uint8, line ink counts)."""
    gray = D.gray_601(images) if rgb else images

    thres, thres_inv, ones, ones_inv, size = D.hocr_line_thresholds(
        gray, line_id, boxes, window, n_seg)

    blurred_u8, _sigma = D.global_threshold_input(gray)
    gmask = D.global_threshold(blurred_u8, window)

    mask = D.compose_mask(thres, thres_inv, use_plain, use_inv,
                          line_id, gmask)
    mask = D.denoise_mask(mask, denoise, exact_denoise)

    fg = D.fg_layer(mask, images)
    bg = D.bg_layer(mask, images)
    return mask, fg, bg, (ones, ones_inv)


@functools.partial(jax.jit,
                   static_argnames=('window', 'rgb', 'denoise', 'interpret',
                                    'max_line_h', 'blur_radius',
                                    'despeckle_bitplane'))
def mrc_full_step_pallas(images, boxes, pages, selector, window,
                         rgb=False, denoise=DENOISE_FAST, interpret=False,
                         max_line_h=128, blur_radius=16, paste_plan=None,
                         despeckle_bitplane=None):
    """The flagship step on the Pallas kernel path: line-band thresholds,
    fused blur+Sauvola, ordered crop pasting, exact despeckle, radiate
    fills — one jit, streamed row-walk kernels throughout.

    boxes: (4, n) int32; pages: (n,) int32; selector: (n,) int32 per-line
    pick (0 none / 1 plain / 2 inverse) from the host heuristic.
    paste_plan: optional tuple of the 8 ``build_paste_plan`` arrays
    (li, t, b, l, r, sel, gpage, gfirst); with it the paste runs as the
    Pallas page-block kernel instead of the serial XLA scan."""
    from ..ops.lines_pallas import line_thresholds_pallas
    from ..ops.optimise_pallas import optimise_pallas
    from ..ops.denoise_pallas import fast_mask_denoise_pallas

    gray = D.gray_601(images) if rgb else images
    b, h, w = gray.shape

    crops_t, crops_i, ones, ones_inv = line_thresholds_pallas(
        gray, boxes, pages, window, interpret=interpret,
        max_line_h=max_line_h)
    gmask, _sigma = D.global_threshold_fused_static(
        gray, window, blur_radius, interpret=interpret)
    if paste_plan is not None:
        from ..ops.paste_pallas import paste_crops_pallas
        mask = paste_crops_pallas(crops_t, crops_i, *paste_plan, gmask,
                                  interpret=interpret)
    else:
        mask = D.paste_selected_crops(crops_t, crops_i, boxes, pages,
                                      selector, gmask, b, h)
    if denoise == DENOISE_FAST:
        mask = fast_mask_denoise_pallas(mask, 4, 2, interpret=interpret,
                                        bitplane=despeckle_bitplane)

    fg = optimise_pallas(mask, images, 3, interpret=interpret)
    bg = optimise_pallas(jnp.logical_not(mask), images, 10,
                         interpret=interpret)
    return mask, fg, bg, (ones, ones_inv)
