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
