"""High-level MRC decomposition API.

``decompose_pages`` is the batched TPU entry point: a list of same-sized
pages in, (mask, fg, bg) numpy arrays out.  ``create_mrc_hocr_components``
is a drop-in, generator-yielding equivalent of the reference API
(``mrc.py:334-471``) built on a batch of one.

Batching contract: all pages in one call share (height, width, mode,
dpi-window); the pipeline caller groups pages into such buckets (book
scans are naturally uniform).  Each distinct bucket costs one XLA
compile, cached for the life of the process.
"""

import time as _time

import numpy as np
import jax
import jax.numpy as jnp

from ..const import (DENOISE_NONE, DENOISE_FAST,
                     RECODE_RUNTIME_WARNING_TOO_SMALL_TO_DOWNSAMPLE)
from ..ops.sauvola import sauvola_window
from ..ops.golden import estimate_sigma_np
from ..ops.resize import thumbnail_size, resize
from . import decompose as D
from .hocr_prep import prepare_lines, paint_line_ids


# Largest per-batch line capacity before decompose_masks splits the
# page batch (crop buffers are (n, line_h, W) — capacity bounds both
# HBM and recompiles).  Module-level so tests can lower it.
MAX_LINE_CAPACITY = 16384


def _round_lines(n):
    """Static per-batch line capacity: multiples of 64 bound recompiles
    without the padding waste of power-of-two rounding.  A single page
    with more than MAX_LINE_CAPACITY lines (degenerate hOCR) cannot be
    split further: capacity then grows in 1024-line steps so no line is
    ever dropped."""
    n64 = -(-(n + 1) // 64) * 64
    if n64 <= MAX_LINE_CAPACITY:
        return n64
    return -(-n64 // 1024) * 1024


class TimingData:
    """Reference-compatible (stage, seconds) accumulator."""

    def __init__(self, sink=None):
        self.sink = sink

    def add(self, key, t0):
        if self.sink is not None:
            self.sink.append((key, _time.time() - t0))


def decompose_masks(np_images, word_datas, dpi=None, downsample=None,
                    denoise_mask=DENOISE_FAST, exact_denoise=True,
                    timing_data=None, errors=None, mesh=None):
    """Mask phase for a uniform batch.

    np_images: list of uint8 arrays, all (H, W) gray or (H, W, 3) RGB of
    identical shape.  Returns bool (B, H, W) numpy mask array.

    mesh: optional 1-D 'pages' jax Mesh — the batch is then sharded
    over its devices (page-batch DP, SURVEY.md section 2.5): the XLA
    ops partition via GSPMD, the Pallas kernels run per-shard under
    shard_map with per-shard line arrays.  Results are byte-identical
    with the single-device path (the blur-radius bucket is picked from
    the global batch; per-line crops and the host selection heuristic
    see identical values).  Batches not divisible by the mesh size (or
    containing tall-line host patches) fall back to single-device.
    """
    td = TimingData(timing_data)
    # pages may arrive pre-uploaded (jax arrays from the pipeline's
    # loader thread: the host->device transfer then overlapped the
    # previous batch's encode work); stack them on device
    on_device = any(isinstance(im, jax.Array) for im in np_images)
    # with a mesh, pre-uploaded pages are stacked on device and
    # resharded in place below (device_put accepts committed arrays;
    # resharding rides ICI) — pulling them back to host first would be
    # a full round trip through the host link (ADVICE r3).  The
    # pipeline normally disables preload when a mesh exists, so this
    # is the defensive path, not the production one.
    imgs = (jnp.stack(np_images) if on_device
            else np.stack(np_images))
    rgb = imgs.ndim == 4
    h, w = imgs.shape[1], imgs.shape[2]
    window = sauvola_window(dpi)

    tl0 = _time.time()
    page_boxes = [prepare_lines(wd, w, h, downsample=downsample)
                  for wd in word_datas]
    prep_dt = _time.time() - tl0

    # Batches whose total line count would exceed the static capacity
    # (e.g. batch 8 x 2k-line newspaper pages at 600 DPI) are split into
    # page sub-batches and concatenated: capacity bounds the crop-buffer
    # HBM footprint, so dropping lines (the pre-r3 behavior) is never an
    # option.  Greedy page packing keeps each sub-batch under the cap.
    if (len(np_images) > 1
            and sum(len(bx) for bx in page_boxes) + 1 > MAX_LINE_CAPACITY):
        cuts, acc = [0], 0
        for p, bx in enumerate(page_boxes):
            if p > cuts[-1] and acc + len(bx) + 1 > MAX_LINE_CAPACITY:
                cuts.append(p)
                acc = 0
            acc += len(bx)
        cuts.append(len(np_images))
        masks, devs = [], []
        for a, b in zip(cuts[:-1], cuts[1:]):
            m, d = decompose_masks(
                np_images[a:b], word_datas[a:b], dpi=dpi,
                downsample=downsample, denoise_mask=denoise_mask,
                exact_denoise=exact_denoise, timing_data=timing_data,
                errors=errors)
            masks.append(m)
            devs.append(d)
        return jnp.concatenate(masks), jnp.concatenate(devs)

    from ..utils.backend import use_pallas
    from ..ops.lines_pallas import LINE_H_BUCKETS

    # Lines taller than the largest Pallas bucket (rare display type)
    # take a host-oracle patch path instead of dropping the whole batch
    # to the XLA fallback; the XLA path (use_pallas() off) still
    # handles every height itself.
    tall_lines = []
    short_pos = None
    if use_pallas():
        cap = LINE_H_BUCKETS[-1]
        short_boxes = []
        short_pos = []
        for p, bx in enumerate(page_boxes):
            keep = []
            kpos = []
            for i, (tt, bo, ll, rr) in enumerate(bx):
                if bo - tt + tt % 8 > cap:
                    # i = document position within the page, so the
                    # patch step can honor the reference's
                    # paint-in-document-order overlap semantics
                    tall_lines.append((p, i, tt, bo, ll, rr))
                else:
                    keep.append((tt, bo, ll, rr))
                    kpos.append(i)
            short_boxes.append(keep)
            short_pos.append(kpos)
        page_boxes = short_boxes

    if mesh is not None and (len(np_images) < mesh.size
                             or len(np_images) % mesh.size != 0
                             or tall_lines):
        mesh = None

    t0 = _time.time()
    if mesh is not None:
        from ..parallel.mesh import shard_pages
        dev_imgs = shard_pages(mesh, imgs)
    else:
        dev_imgs = jnp.asarray(imgs)
    if rgb:
        gray = D.gray_601(dev_imgs)
        td.add('grey_conversion', t0)
    else:
        gray = dev_imgs

    # --- hOCR line thresholds (page_boxes prepared above; its time is
    # folded into this stage to keep the reference's timing keys) ---
    t0 = _time.time() - prep_dt

    total = sum(len(bx) for bx in page_boxes)
    n_seg = _round_lines(total)

    # crop rows are 8-aligned (lines_pallas): a line occupies rows
    # [t%8, t%8 + height) of its bucket
    tallest = max((bo - t + t % 8 for bx in page_boxes
                   for (t, bo, l, r) in bx), default=0)
    line_bucket = next((b for b in LINE_H_BUCKETS if tallest <= b), None)
    pallas_lines = use_pallas() and line_bucket is not None

    def _global_mask_pallas():
        if mesh is not None:
            from ..parallel.sharded import sharded_global_threshold
            radius = D.pick_blur_radius(gray)
            interp0 = jax.devices()[0].platform == 'cpu'
            return sharded_global_threshold(mesh, window, radius,
                                            interp0)(gray)
        return D.global_threshold_fused(gray, window)

    def _run_denoise(mask):
        if (mesh is not None and denoise_mask == DENOISE_FAST
                and exact_denoise and use_pallas()):
            from ..parallel.sharded import sharded_denoise
            interp0 = jax.devices()[0].platform == 'cpu'
            return sharded_denoise(mesh, interp0)(mask)
        return D.denoise_mask(mask, denoise_mask, exact_denoise)

    if total == 0:
        # no (short) hOCR lines at all: the mask is the global
        # threshold, plus any tall-line patches (+ denoise below)
        td.add('hocr_mask_gen', t0)
        t0 = _time.time()
        if use_pallas():
            gmask, sigma_est = _global_mask_pallas()
        else:
            blurred_u8, sigma_est = D.global_threshold_input(gray)
            gmask = D.global_threshold(blurred_u8, window)
        td.add('threshold', t0)
        mask = gmask
        if tall_lines:
            # no short lines at all -> no document-order conflicts
            mask = _tall_line_patches(mask, gmask, gray, tall_lines,
                                      window, {})
        if denoise_mask is not None and denoise_mask != DENOISE_NONE:
            t0 = _time.time()
            mask = _run_denoise(mask)
            td.add('fast_denoise'
                   if denoise_mask == DENOISE_FAST else 'denoise', t0)
        return mask, dev_imgs

    if pallas_lines:
        interp = jax.devices()[0].platform == 'cpu'
        slots = None
        if mesh is not None:
            # per-shard line arrays with LOCAL page indices: each chip
            # thresholds the lines of its own page shard under
            # shard_map.  Global lids keep the single-device order so
            # the host selection sees identical per-line values;
            # ``slots`` maps lid -> flat slot in the concatenated
            # per-shard output.
            ds = mesh.size
            per = len(np_images) // ds
            shard_tot = [sum(len(page_boxes[p])
                             for p in range(s * per, (s + 1) * per))
                         for s in range(ds)]
            n_seg_s = _round_lines(max(shard_tot))
            sboxes = np.zeros((ds, 4, n_seg_s), np.int32)
            sboxes[:, 1, 0] = 1
            sboxes[:, 3, 0] = 1
            spages = np.zeros((ds, n_seg_s), np.int32)
            boxes = np.zeros((4, total + 1), np.int32)
            boxes[1, 0] = 1
            boxes[3, 0] = 1
            slots = np.zeros(total + 1, np.int64)
            _line_pages = {}
            fill = [0] * ds
            lid = 0
            for p, bx in enumerate(page_boxes):
                s = p // per
                for (tt, bo, ll, rr) in bx:
                    lid += 1
                    j = fill[s] + 1
                    fill[s] = j
                    sboxes[s, :, j] = (tt, bo, ll, rr)
                    spages[s, j] = p - s * per
                    boxes[:, lid] = (tt, bo, ll, rr)
                    slots[lid] = s * n_seg_s + j
                    _line_pages[lid] = p
            n_lines = lid

            from ..parallel.sharded import sharded_line_thresholds
            from ..parallel.mesh import shard_pages as _shard
            crops_t, crops_i, ones_s, oinv_s = sharded_line_thresholds(
                mesh, window, line_bucket, interp)(
                gray, _shard(mesh, sboxes), _shard(mesh, spages))
            ones = np.asarray(ones_s)[slots]
            ones_inv = np.asarray(oinv_s)[slots]
        else:
            # flat line arrays with a dummy slot 0 (select_lines
            # convention)
            boxes = np.zeros((4, n_seg), np.int32)
            boxes[1, 0] = 1
            boxes[3, 0] = 1
            pages = np.zeros((n_seg,), np.int32)
            _line_pages = {}
            lid = 0
            for p, bx in enumerate(page_boxes):
                for (tt, bo, ll, rr) in bx:
                    if lid + 1 >= n_seg:
                        # unreachable: batch splitting above keeps
                        # total + 1 <= capacity (defensive only — never
                        # let n_lines outrun the crop buffers)
                        break
                    lid += 1
                    boxes[:, lid] = (tt, bo, ll, rr)
                    pages[lid] = p
                    _line_pages[lid] = p
            n_lines = lid

            from ..ops.lines_pallas import line_thresholds_pallas
            crops_t, crops_i, ones, ones_inv = line_thresholds_pallas(
                gray, jnp.asarray(boxes), jnp.asarray(pages), window,
                interpret=interp, max_line_h=line_bucket)
        size = ((boxes[1] - boxes[0]) *
                (boxes[3] - boxes[2])).astype(np.int64)

        # prefetch every sigma-needy crop in ONE device gather+transfer
        # (the select_lines branch that needs the wavelet sigma is
        # decidable from the ratios alone, mrc.py:240-251)
        ones_h = np.asarray(ones)
        oinv_h = np.asarray(ones_inv)
        size_h = np.maximum(np.asarray(size), 1)
        ratio_h = ones_h / size_h
        inv_h = oinv_h / size_h
        needy = np.where(
            ((ratio_h < 0.3) | (inv_h < 0.3))
            & ~((inv_h > 0.2) & (ratio_h < 0.2))
            & (np.arange(len(size_h)) > 0)
            & (np.arange(len(size_h)) <= n_lines))[0]
        _needy_cache = {}
        if len(needy):
            gather = slots[needy] if slots is not None else needy
            idx = jnp.asarray(gather.astype(np.int32))
            # crops are 0/1: pack to bits on device so the transfer is
            # 8x smaller (the host link is the bottleneck of the
            # pipeline-level path on thin hosts)
            wcrop = crops_t.shape[-1]
            nt_b = np.asarray(jnp.packbits(
                jnp.take(crops_t, idx, axis=0), axis=-1))
            ni_b = np.asarray(jnp.packbits(
                jnp.take(crops_i, idx, axis=0), axis=-1))
            nt = np.unpackbits(nt_b, axis=-1)[..., :wcrop]
            ni = np.unpackbits(ni_b, axis=-1)[..., :wcrop]
            for j, i in enumerate(needy):
                _needy_cache[int(i)] = (nt[j], ni[j])

        def sigma_fn(i):
            tt, bo, ll, rr = boxes[:, i]
            ct, ci = _needy_cache[int(i)]
            off = tt % 8
            ct = ct[off:off + (bo - tt), ll:rr]
            ci = ci[off:off + (bo - tt), ll:rr]
            return (estimate_sigma_np(ct.astype(np.float64)),
                    estimate_sigma_np(ci.astype(np.float64)))
    else:
        id_map, boxes, n_lines = paint_line_ids(page_boxes, h, w, n_seg - 1)
        thres, thres_inv, ones, ones_inv, size = D.hocr_line_thresholds(
            gray, jnp.asarray(id_map), jnp.asarray(boxes), window, n_seg)

        _page_cache = {}
        _line_pages = {}
        lid = 0
        for p, bx in enumerate(page_boxes):
            for _ in bx:
                lid += 1
                if lid < n_seg:
                    _line_pages[lid] = p

        def fetch_maps(p):
            if p not in _page_cache:
                _page_cache[p] = (np.asarray(thres[p]),
                                  np.asarray(thres_inv[p]))
            return _page_cache[p]

        def sigma_fn(i):
            p = _line_pages[i]
            tmap, imap = fetch_maps(p)
            tt, bb, ll, rr = (boxes[0][i], boxes[1][i],
                              boxes[2][i], boxes[3][i])
            crop = tmap[tt:bb, ll:rr].astype(np.float64)
            crop_inv = imap[tt:bb, ll:rr].astype(np.float64)
            return estimate_sigma_np(crop), estimate_sigma_np(crop_inv)

    ones = np.asarray(ones)
    ones_inv = np.asarray(ones_inv)
    size_np = np.asarray(size)

    use_plain, use_inv = D.select_lines(ones, ones_inv, size_np,
                                        sigma_fn, n_lines)
    td.add('hocr_mask_gen', t0)

    # --- global threshold with noise-adaptive pre-blur ---
    t0 = _time.time()
    if use_pallas():
        gmask, sigma_est = _global_mask_pallas()
        td.add('threshold', t0)
    else:
        blurred_u8, sigma_est = D.global_threshold_input(gray)
        td.add('est_1', t0)
        t0 = _time.time()
        gmask = D.global_threshold(blurred_u8, window)
        td.add('threshold', t0)

    if pallas_lines:
        selector = np.where(use_plain, 1,
                            np.where(use_inv, 2, 0)).astype(np.int32)
        if mesh is not None:
            # selector back into per-shard slots, then per-shard paste
            # plans pasted under shard_map
            ssel = np.zeros((ds, n_seg_s), np.int32)
            for glid in range(1, n_lines + 1):
                s, j = divmod(int(slots[glid]), n_seg_s)
                ssel[s, j] = selector[glid]
            from ..parallel.sharded import sharded_paste, \
                split_paste_plans
            from ..parallel.mesh import shard_pages as _shard
            plan = split_paste_plans(sboxes, spages, ssel, per)
            mask = sharded_paste(mesh, interp)(
                crops_t, crops_i, gmask,
                *(_shard(mesh, a) for a in plan))
        else:
            from ..ops.paste_pallas import (build_paste_plan,
                                            paste_crops_pallas)
            plan = build_paste_plan(boxes, pages, selector,
                                    len(np_images))
            mask = paste_crops_pallas(
                crops_t, crops_i,
                *(jnp.asarray(plan[kk]) for kk in
                  ('li', 't', 'b', 'l', 'r', 'sel', 'gpage', 'gfirst')),
                gmask, interpret=interp)
    else:
        mask = D.compose_mask(thres, thres_inv, jnp.asarray(use_plain),
                              jnp.asarray(use_inv), jnp.asarray(id_map),
                              gmask)

    if tall_lines:
        # selected short lines by page + document position: the patch
        # step must let a LATER selected line win an overlap, exactly
        # like the reference's in-order assignment (``mrc.py:188-270``)
        selected_short = {}
        lid = 0
        for p, bx in enumerate(page_boxes):
            for j, (tt, bo, ll, rr) in enumerate(bx):
                lid += 1
                if use_plain[lid] or use_inv[lid]:
                    selected_short.setdefault(p, []).append(
                        (short_pos[p][j], tt, bo, ll, rr))
        mask = _tall_line_patches(mask, gmask, gray, tall_lines, window,
                                  selected_short)

    if denoise_mask is not None and denoise_mask != DENOISE_NONE:
        t0 = _time.time()
        mask = _run_denoise(mask)
        td.add('fast_denoise' if denoise_mask == DENOISE_FAST else 'denoise',
               t0)

    return mask, dev_imgs


@jax.jit
def _apply_patch_jit(mask, gmask, page, patch_bits, region_bits):
    """where(region, patch | gmask, mask) on one page; patch/region ride
    as packed bits (8x less host->device traffic)."""
    w = mask.shape[2]
    patch = jnp.unpackbits(patch_bits, axis=-1)[:, :w].astype(bool)
    region = jnp.unpackbits(region_bits, axis=-1)[:, :w].astype(bool)
    row = jnp.where(region, patch | gmask[page], mask[page])
    return mask.at[page].set(row)


def _tall_line_patches(mask, gmask, gray, tall_lines, window,
                       selected_short):
    """hOCR lines taller than the largest Pallas bucket (rare display
    type): threshold each crop with the reference-semantics numpy
    oracle (exact ``mrc.py:188-270`` behaviour, no per-shape compiles),
    run the same dual-polarity selection, and paste the selected masks
    into the device mask.  The paste ORs the global-threshold mask
    inside the patched region, preserving the reference's
    assign-lines-then-OR-global ordering (``mrc.py:374-382``).

    selected_short: {page: [(doc_pos, t, b, l, r), ...]} of the SHORT
    selected lines already painted on device.  The reference assigns
    line crops in document order (later lines overwrite earlier in an
    overlap), so a tall patch must NOT cover pixels a later selected
    short line painted — those pixels are carved out of the patch
    region.  tall_lines entries carry their own doc_pos for the same
    reason (later tall lines overwrite earlier ones)."""
    from ..ops import golden

    ones = [0]
    ones_inv = [0]
    size = [0]
    crops = [None]
    metas = [None]
    for (p, pos, t, b, l, r) in tall_lines:
        crop = np.asarray(gray[p, t:b, l:r])
        th = golden.sauvola_mask_ref(crop, window, window, 0.1)
        inv = golden.sauvola_mask_ref(255 - crop, window, window, 0.1)
        ones.append(int(th.sum()))
        ones_inv.append(int(inv.sum()))
        size.append(int(crop.size))
        crops.append((th, inv))
        metas.append((p, pos, t, b, l, r))

    def sigma_fn(i):
        th, inv = crops[i]
        return (estimate_sigma_np(th.astype(np.float64)),
                estimate_sigma_np(inv.astype(np.float64)))

    use_plain, use_inv = D.select_lines(
        np.array(ones, np.int64), np.array(ones_inv, np.int64),
        np.array(size, np.int64), sigma_fn, len(tall_lines))

    h, w = int(mask.shape[1]), int(mask.shape[2])
    by_page = {}
    for i in range(1, len(metas)):
        pick = None
        if use_plain[i]:
            pick = crops[i][0]
        elif use_inv[i]:
            pick = crops[i][1]
        if pick is None:
            continue
        (p, pos, t, b, l, r) = metas[i]
        by_page.setdefault(p, []).append((pos, t, b, l, r, pick))

    for p, items in sorted(by_page.items()):
        patch = np.zeros((h, w), np.uint8)
        region = np.zeros((h, w), np.uint8)
        pos_map = np.full((h, w), -1, np.int32)
        for (pos, t, b, l, r, pick) in sorted(items):  # document order
            region[t:b, l:r] = 1
            patch[t:b, l:r] = pick
            pos_map[t:b, l:r] = pos
        # later selected short lines win their overlap: carve them out
        # of the patch region so the device-painted mask shows through
        for (spos, st, sb, sl, sr) in selected_short.get(p, []):
            sub = pos_map[st:sb, sl:sr]
            later = (sub >= 0) & (sub < spos)
            if later.any():
                region[st:sb, sl:sr][later] = 0
        mask = _apply_patch_jit(
            mask, gmask, p,
            jnp.asarray(np.packbits(patch, axis=-1)),
            jnp.asarray(np.packbits(region, axis=-1)))
    return mask


def decompose_layers(mask, dev_imgs, bg_downsample=None, fg_downsample=None,
                     timing_data=None, errors=None, device=False,
                     mesh=None):
    """fg/bg phase: radiate fills + optional layer downsampling.

    mask: device bool (B, H, W); dev_imgs: device uint8 (B, H, W[, 3]).
    Returns (fg, bg) uint8 arrays (downsampled sizes if requested) —
    numpy by default; with ``device=True`` they stay ON DEVICE so a
    device consumer (the batched '-J tpu' JPEG2000 transform) can use
    them without the uint8 layers ever crossing the host link.
    With ``mesh``, the Pallas radiate fills run per page shard under
    shard_map (page-batch DP; falls back when the batch does not
    divide the mesh).
    """
    td = TimingData(timing_data)
    from ..utils.backend import use_pallas
    if mesh is not None and (mask.shape[0] < mesh.size
                             or mask.shape[0] % mesh.size != 0
                             or not use_pallas()):
        mesh = None
    if mesh is not None:
        from ..parallel.sharded import sharded_optimise
        interp = jax.devices()[0].platform == 'cpu'
        fg_fn = sharded_optimise(mesh, 3, False, interp)
        bg_fn = sharded_optimise(mesh, 10, True, interp)
    else:
        fg_fn, bg_fn = D.fg_layer, D.bg_layer

    t0 = _time.time()
    fg = fg_fn(mask, dev_imgs)
    fg.block_until_ready()
    td.add('fg_partial_blur', t0)
    if fg_downsample:
        t0 = _time.time()
        fg, ok = _downsample(fg, fg_downsample, errors)
        td.add('fg_downsample', t0)

    t0 = _time.time()
    bg = bg_fn(mask, dev_imgs)
    bg.block_until_ready()
    td.add('bg_partial_blur', t0)
    if bg_downsample:
        t0 = _time.time()
        bg, ok = _downsample(bg, bg_downsample, errors)
        td.add('bg_downsample', t0)

    if device:
        return fg, bg
    return np.asarray(fg), np.asarray(bg)


def _downsample(layer, factor, errors):
    """Layer thumbnail semantics (``mrc.py:420-434``): box (w//f, h//f),
    PIL aspect fit, warning when degenerate."""
    chan = layer.ndim == 4
    h, w = (layer.shape[1], layer.shape[2])
    bw, bh = int(w / factor), int(h / factor)
    if bw <= 0 or bh <= 0:
        if errors is not None:
            errors.add(RECODE_RUNTIME_WARNING_TOO_SMALL_TO_DOWNSAMPLE)
        return layer, False
    tgt = thumbnail_size(w, h, bw, bh)
    if tgt is None:
        return layer, True
    tw, th = tgt
    return resize(layer, th, tw, 'bicubic'), True


def decompose_pages(np_images, word_datas, dpi=None, downsample=None,
                    bg_downsample=None, fg_downsample=None,
                    denoise_mask=DENOISE_FAST, exact_denoise=True,
                    timing_data=None, errors=None):
    """One-call batched decomposition: (masks, fgs, bgs) numpy arrays
    for a uniform batch of pages."""
    mask, dev_imgs = decompose_masks(
        np_images, word_datas, dpi=dpi, downsample=downsample,
        denoise_mask=denoise_mask, exact_denoise=exact_denoise,
        timing_data=timing_data, errors=errors)
    fg, bg = decompose_layers(mask, dev_imgs, bg_downsample=bg_downsample,
                              fg_downsample=fg_downsample,
                              timing_data=timing_data, errors=errors)
    return np.asarray(mask), fg, bg


def create_mrc_hocr_components(image, hocr_word_data, dpi=None,
                               downsample=None, bg_downsample=None,
                               fg_downsample=None, denoise_mask=None,
                               timing_data=None, errors=None,
                               exact_denoise=True):
    """Drop-in generator equivalent of the reference API (``mrc.py:334``):
    yields mask, then foreground, then background numpy arrays for one
    PIL image page."""
    grayscale = image.mode == 'L'
    if not grayscale and image.mode != 'RGB':
        t0 = _time.time()
        image = image.convert('RGB')
        if timing_data is not None:
            timing_data.append(('grey_conversion', _time.time() - t0))

    np_img = np.asarray(image)
    mask, dev_imgs = decompose_masks(
        [np_img], [hocr_word_data], dpi=dpi, downsample=downsample,
        denoise_mask=denoise_mask or DENOISE_NONE,
        exact_denoise=exact_denoise,
        timing_data=timing_data, errors=errors)

    yield np.asarray(mask[0])

    fg, bg = decompose_layers(mask, dev_imgs, bg_downsample=bg_downsample,
                              fg_downsample=fg_downsample,
                              timing_data=timing_data, errors=errors)
    yield fg[0]
    yield bg[0]
