"""Multi-chip page-batch execution of the Pallas kernel path.

GSPMD partitions the XLA-op formulation automatically (see
tests/test_parallel.py), but Pallas kernels are opaque to the
partitioner, so the production multi-chip path wraps the full kernel
step in ``shard_map``: every chip runs the row-walk kernels on its local
page shard; line metadata is replicated (each shard thresholds only the
lines whose pages it owns — other lines produce empty crops because
their page index is out of the local shard, handled by clamping).

For exact line handling across shards, the caller partitions the line
arrays per shard (lines reference local page indices); the recode
pipeline builds per-chip batches, so in practice each shard receives
its own complete (boxes, pages, selector) set.
"""


import numpy as np
import jax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..mrc.step import mrc_full_step_pallas


def sharded_mrc_step(mesh, window, rgb=False, denoise='fast',
                     interpret=False, max_line_h=128, with_paste_plan=False):
    """Build a pjit-able function running the full Pallas MRC step on
    each chip's page shard.

    Returned fn signature: (images (B, H, W[,3]) sharded on pages,
    boxes (D, 4, n), pages (D, n), selector (D, n)) where D = mesh size
    and the per-shard line arrays use *local* page indices.  With
    ``with_paste_plan`` the fn takes a 5th argument: the tuple of 8
    per-shard ``build_paste_plan`` arrays from ``split_paste_plans``
    (runs the Pallas paste kernel instead of the XLA scan).
    """
    def local_step(images, boxes, pages, selector, *plan):
        # leading shard dim of the line arrays is this chip's slice
        return mrc_full_step_pallas(
            images, boxes[0], pages[0], selector[0], window=window,
            rgb=rgb, denoise=denoise, interpret=interpret,
            max_line_h=max_line_h,
            paste_plan=tuple(a[0] for a in plan) if plan else None)[:3]

    n_in = 4 + (8 if with_paste_plan else 0)
    return shard_map(
        local_step, mesh=mesh,
        in_specs=tuple([P('pages')] * n_in),
        out_specs=(P('pages'), P('pages'), P('pages')),
        check_vma=False)


_PHASE_CACHE = {}


def _cached(key, build):
    fn = _PHASE_CACHE.get(key)
    if fn is None:
        fn = _PHASE_CACHE[key] = build()
    return fn


def sharded_line_thresholds(mesh, window, max_line_h, interpret):
    """shard_map of the Pallas line-threshold kernel: each chip
    thresholds the lines of its local page shard.  Inputs: gray
    (B, H, W) page-sharded; boxes (D, 4, n)/pages (D, n) stacked
    per-shard with LOCAL page indices.  Outputs concatenate the
    per-shard line slots on the leading axis (global slot =
    shard * n + local slot)."""
    from ..ops.lines_pallas import line_thresholds_pallas

    def build():
        def local(gray, boxes, pages):
            return line_thresholds_pallas(
                gray, boxes[0], pages[0], window, interpret=interpret,
                max_line_h=max_line_h)
        return jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P('pages'),) * 3,
            out_specs=(P('pages'),) * 4, check_vma=False))
    return _cached(('lines', mesh, window, max_line_h, interpret), build)


def sharded_global_threshold(mesh, window, radius, interpret):
    """shard_map of the fused blur+Sauvola kernel.  The blur-radius
    bucket must be picked from the GLOBAL batch (mrc.decompose.
    pick_blur_radius) so every shard compiles the identical kernel the
    single-device path would — byte-identical masks."""
    from ..mrc.decompose import global_threshold_fused_static

    def build():
        def local(gray):
            return global_threshold_fused_static(gray, window, radius,
                                                 interpret=interpret)
        return jax.jit(shard_map(
            local, mesh=mesh, in_specs=(P('pages'),),
            out_specs=(P('pages'), P('pages')), check_vma=False))
    return _cached(('gthresh', mesh, window, radius, interpret), build)


def sharded_paste(mesh, interpret):
    """shard_map of the Pallas crop-paste kernel over per-shard plans
    (leading shard dim on every plan array)."""
    from ..ops.paste_pallas import paste_crops_pallas

    def build():
        def local(crops_t, crops_i, gmask, *plan):
            return paste_crops_pallas(
                crops_t, crops_i, *(a[0] for a in plan), gmask,
                interpret=interpret)
        return jax.jit(shard_map(
            local, mesh=mesh, in_specs=(P('pages'),) * 11,
            out_specs=P('pages'), check_vma=False))
    return _cached(('paste', mesh, interpret), build)


def sharded_denoise(mesh, interpret):
    """shard_map of the exact despeckle kernel."""
    from ..ops.denoise_pallas import fast_mask_denoise_pallas

    def build():
        def local(mask):
            return fast_mask_denoise_pallas(mask, 4, 2,
                                            interpret=interpret)
        return jax.jit(shard_map(
            local, mesh=mesh, in_specs=(P('pages'),),
            out_specs=P('pages'), check_vma=False))
    return _cached(('denoise', mesh, interpret), build)


def sharded_optimise(mesh, n, invert, interpret):
    """shard_map of the radiate fill (fg n=3, bg n=10 on the inverted
    mask)."""
    from ..ops.optimise_pallas import optimise_pallas
    import jax.numpy as jnp

    def build():
        def local(mask, img):
            m = jnp.logical_not(mask) if invert else mask
            return optimise_pallas(m, img, n, interpret=interpret)
        return jax.jit(shard_map(
            local, mesh=mesh, in_specs=(P('pages'), P('pages')),
            out_specs=P('pages'), check_vma=False))
    return _cached(('optimise', mesh, n, invert, interpret), build)


def split_lines_per_shard(boxes, pages, selector, batch, n_shards):
    """Host helper: scatter global line arrays into per-shard arrays
    with local page indices (page p -> shard p // (batch/n_shards))."""
    per = batch // n_shards
    n = boxes.shape[1]
    out_boxes = np.zeros((n_shards, 4, n), np.int32)
    out_pages = np.zeros((n_shards, n), np.int32)
    out_sel = np.zeros((n_shards, n), np.int32)
    # dummy slot 0 convention
    out_boxes[:, 1, 0] = 1
    out_boxes[:, 3, 0] = 1
    fill = [1] * n_shards
    for i in range(1, n):
        p = int(pages[i])
        s = p // per
        if s >= n_shards or fill[s] >= n:
            continue
        j = fill[s]
        fill[s] = j + 1
        out_boxes[s, :, j] = boxes[:, i]
        out_pages[s, j] = p - s * per
        out_sel[s, j] = selector[i]
    return out_boxes, out_pages, out_sel


def split_paste_plans(shard_boxes, shard_pages, shard_sel, per_shard_pages):
    """Host helper: per-shard ``build_paste_plan`` arrays stacked on a
    leading shard dim, for ``sharded_mrc_step(with_paste_plan=True)``."""
    from ..ops.paste_pallas import build_paste_plan
    keys = ('li', 't', 'b', 'l', 'r', 'sel', 'gpage', 'gfirst')
    plans = [build_paste_plan(shard_boxes[s], shard_pages[s],
                              shard_sel[s], per_shard_pages)
             for s in range(shard_boxes.shape[0])]
    return tuple(np.stack([p[k] for p in plans]) for k in keys)
