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
