"""Batched MRC decomposition (mask -> fg -> bg), the flagship TPU pipeline.

Re-architecture of the reference's per-page generator
``create_mrc_hocr_components`` (``mrc.py:334-471``) as three jitted,
batch-vectorized device phases plus a tiny host decision step:

  phase A (device)  gray conversion; per-hOCR-line Sauvola thresholds of
                    the crop and its inverse (k=0.1) computed *in place*
                    on the full page via 2-D integral images with
                    per-pixel bbox-clamped windows -- no per-line crop
                    buffers, no serial line loop (re-derives
                    ``mrc.py:188-270``); per-line ink ratios via segment
                    sums; noise estimate, conditional gaussian pre-blur
                    and the global Sauvola mask (k=0.34, re-derives
                    ``mrc.py:273-329``).
  host              the ratio/sigma line-selection heuristic
                    (``mrc.py:240-264``); only 'needy' lines (those the
                    quick ratio test cannot decide) pay for an exact
                    wavelet-MAD sigma on a small device-sliced crop.
  phase B (device)  mask composition (line overwrite then OR, matching
                    ``mrc.py:266,329``) + despeckle; then fg/bg radiate
                    fills (exact optimise kernels) and layer downsamples.

The inverted-crop threshold costs nothing extra: with S=sum, Q=sum of
squares and C=count over a window, the inverse image's stats are
S' = 255*C - S and Q' = 65025*C - 510*S + Q.

All device arrays are (B, H, W) with pages padded into shape buckets, so
every phase vmaps/shards trivially over a page-batch mesh.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.sauvola import sauvola_mask, _offsets
from ..ops.denoise import fast_mask_denoise_exact, fast_mask_denoise_jacobi
from ..ops.optimise import optimise
from ..ops.sigma import estimate_noise
from ..ops.tv import denoise_bregman
from ..const import DENOISE_FAST, DENOISE_BREGMAN

MAX_BLUR_RADIUS = 48  # supports sigma_est <= 120 (blur sigma <= 12)


@jax.jit
def gray_601(img_rgb):
    """PIL Image.convert('L') exact semantics: ITU-R 601-2 luma in 16.16
    fixed point with rounding: (R*19595 + G*38470 + B*7471 + 2^15) >> 16."""
    r = img_rgb[..., 0].astype(jnp.uint32)
    g = img_rgb[..., 1].astype(jnp.uint32)
    b = img_rgb[..., 2].astype(jnp.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 32768) >> 16).astype(jnp.uint8)


def _integral2d(x):
    """Padded 2-D integral image, uint32 with benign modular wrap."""
    c = jnp.cumsum(jnp.cumsum(x.astype(jnp.uint32), axis=-2), axis=-1)
    return jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])


def _corner_gather(d, rlo, rhi, clo, chi):
    """d: (B, H+1, W+1) integral; bounds: (B, H, W) index maps.
    Returns the exact window sums via 4 flat gathers."""
    b, hp1, wp1 = d.shape
    df = d.reshape(b, hp1 * wp1)

    def g(rr, cc):
        idx = (rr * wp1 + cc).reshape(b, -1)
        return jnp.take_along_axis(df, idx, axis=1).reshape(rr.shape)

    return g(rhi, chi) - g(rlo, chi) - g(rhi, clo) + g(rlo, clo)


def _sauvola_test(px_f, s, q, cnt, k):
    """Shared squared-form Sauvola decision on integer window stats."""
    cnt = jnp.maximum(cnt, 1)
    mean_i = s // cnt
    var_i = q // cnt - mean_i * mean_i
    mean = mean_i.astype(jnp.float32)
    var = var_i.astype(jnp.float32)
    k = jnp.float32(k)
    k2 = k * k / jnp.float32(128.0) / jnp.float32(128.0)
    t = px_f + mean * (k - 1.0)
    rhs = mean * mean * k2 * var
    pos = jnp.logical_or(t <= 0.0, t * t <= rhs)
    neg = jnp.logical_and(t <= 0.0, t * t >= rhs)
    return jnp.where(k >= 0.0, pos, neg)


@functools.partial(jax.jit, static_argnames=('window', 'n_seg'))
def hocr_line_thresholds(gray, line_id, boxes, window, n_seg, k=0.1):
    """Per-line Sauvola thresholds of each line crop and its inverse,
    evaluated for every pixel of the page at once.

    gray: (B, H, W) uint8; line_id: (B, H, W) int32 (0 = background);
    boxes: (4, n_seg) int32 rows t, b, l, r.

    Returns (thres, thres_inv) bool maps (meaningful inside boxes) and
    per-line (ones, ones_inv, size) int32 arrays of length n_seg.
    """
    bsz, h, w = gray.shape
    row_off, col_off = _offsets(window, window)

    t = boxes[0][line_id]
    bo = boxes[1][line_id]
    l = boxes[2][line_id]
    r = boxes[3][line_id]

    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    rlo = jnp.clip(ys + row_off[0], t, bo)
    rhi = jnp.clip(ys + row_off[1], t, bo)
    clo = jnp.clip(xs + col_off[0], l, r)
    chi = jnp.clip(xs + col_off[1], l, r)

    d1 = _integral2d(gray)
    d2 = _integral2d(gray.astype(jnp.uint32) ** 2)

    s = _corner_gather(d1, rlo, rhi, clo, chi)
    q = _corner_gather(d2, rlo, rhi, clo, chi)
    cnt = ((rhi - rlo) * (chi - clo)).astype(jnp.uint32)

    px = gray.astype(jnp.float32)
    thres = _sauvola_test(px, s, q, cnt, k)

    s_inv = 255 * cnt - s
    q_inv = 65025 * cnt - 510 * s + q
    thres_inv = _sauvola_test(255.0 - px, s_inv, q_inv, cnt, k)

    inside = line_id > 0
    thres = jnp.logical_and(thres, inside)
    thres_inv = jnp.logical_and(thres_inv, inside)

    flat_id = line_id.reshape(-1)
    ones = jax.ops.segment_sum(thres.reshape(-1).astype(jnp.int32),
                               flat_id, num_segments=n_seg)
    ones_inv = jax.ops.segment_sum(thres_inv.reshape(-1).astype(jnp.int32),
                                   flat_id, num_segments=n_seg)
    size = ((boxes[1] - boxes[0]) * (boxes[3] - boxes[2])).astype(jnp.int32)
    return thres, thres_inv, ones, ones_inv, size


@functools.partial(jax.jit, static_argnames=('max_radius',))
def blur_weights(gray, max_radius=MAX_BLUR_RADIUS):
    """Per-page separable gaussian taps from the noise estimate
    (``mrc.py:305-311``): scipy's sampled kernel truncated at radius
    int(4*sigma+0.5) inside a static max_radius buffer, normalized;
    the identity kernel when the reference would skip the blur
    (sigma_est <= 1).  Returns ((B, 2R+1) f32 taps, sigma_est)."""
    # no full-image f32 convert here: estimate_noise center-crops
    # FIRST and diagonal_detail converts the crop (bit-identical —
    # slice-of-convert == convert-of-slice); the blur itself reads
    # uint8 inside the Pallas kernel
    sigma_est = estimate_noise(gray)                     # (B,)
    sigma = sigma_est * 0.1

    idx = jnp.arange(-max_radius, max_radius + 1,
                     dtype=jnp.float32)
    radius = jnp.floor(4.0 * sigma + 0.5)[:, None]
    sig2 = jnp.maximum(sigma, 1e-6)[:, None] ** 2
    wts = jnp.exp(-0.5 * idx[None, :] ** 2 / sig2)
    wts = jnp.where(jnp.abs(idx[None, :]) <= radius, wts, 0.0)
    wts = wts / jnp.sum(wts, axis=1, keepdims=True)
    ident = (idx == 0).astype(jnp.float32)
    wts = jnp.where((sigma_est > 1.0)[:, None], wts, ident[None, :])
    return wts, sigma_est


@jax.jit
def global_threshold_input(gray):
    """Noise estimate + conditional gaussian pre-blur (``mrc.py:300-325``)
    as XLA convs.  Returns the uint8-truncated image to threshold, plus
    sigma_est per page."""
    imgf = gray.astype(jnp.float32)
    wts, sigma_est = blur_weights(gray)

    # separable blur with per-page kernels; reflect padding like scipy.
    # pages ride the channel axis with feature_group_count=B so each page
    # gets its own kernel (depthwise conv).
    bsz = gray.shape[0]
    pad = [(0, 0), (MAX_BLUR_RADIUS, MAX_BLUR_RADIUS), (0, 0)]

    def conv_axis(x, axis):
        xp = jnp.moveaxis(x, axis, 1)                    # (B, N, M)
        xp = jnp.pad(xp, pad, mode='symmetric')
        out = jax.lax.conv_general_dilated(
            xp[None],                                    # (1, B, N+2R, M)
            wts[:, None, :, None],                       # (B, 1, K, 1)
            window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            feature_group_count=bsz,
            precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(out[0], 1, axis)

    blurred = conv_axis(conv_axis(imgf, -2), -1)
    return blurred.astype(jnp.uint8), sigma_est


@functools.partial(jax.jit, static_argnames=('window',))
def global_threshold(gray, window):
    """Full-page Sauvola mask, k=0.34 (``mrc.py:58-87,324-329``)."""
    return sauvola_mask(gray, window, window, 0.34, 128.0)


def global_threshold_fused(gray, window, interpret=None):
    """Pre-blur + global Sauvola as one fused Pallas row walk (same
    semantics as global_threshold_input + global_threshold).

    The blur MAC cost is linear in the tap radius; the per-page scipy
    radius (int(0.4*sigma_est + 0.5)) is read on the host to pick the
    smallest static radius bucket that covers the batch."""
    if interpret is None:
        interpret = jax.devices()[0].platform == 'cpu'
    return global_threshold_fused_static(gray, window,
                                         pick_blur_radius(gray),
                                         interpret=interpret)


def pick_blur_radius(gray):
    """Host-side: smallest static radius bucket covering the batch's
    per-page scipy blur radius int(4 * 0.1*sigma_est + 0.5).  Callers
    jitting the full step compute this pre-trace and pass it as the
    static ``blur_radius``."""
    from ..ops.threshold_pallas import RADIUS_BUCKETS
    import numpy as _np
    sigma_est_h = _np.asarray(estimate_noise(
        jnp.asarray(gray).astype(jnp.float32)))
    need = int(_np.floor(4.0 * 0.1 * sigma_est_h.max() + 0.5))
    return next((r for r in RADIUS_BUCKETS if need <= r),
                RADIUS_BUCKETS[-1])


def global_threshold_fused_static(gray, window, radius, interpret=False):
    """Jit-safe fused threshold with a caller-chosen static blur radius
    (weights still data-dependent; taps beyond the dynamic scipy radius
    are zero)."""
    from ..ops.threshold_pallas import blur_sauvola_pallas
    wts, sigma_est = blur_weights(gray, max_radius=radius)
    mask = blur_sauvola_pallas(gray, wts, window, 0.34, 128.0,
                               interpret=interpret, radius=radius)
    return mask, sigma_est


@jax.jit
def compose_mask(thres, thres_inv, use_plain, use_inv, line_id, global_mask):
    """hOCR-line overwrite (last line wins, via the id map) then OR with
    the global threshold mask (``mrc.py:265-266,329``)."""
    pick_plain = use_plain[line_id]
    pick_inv = use_inv[line_id]
    hocr = jnp.where(pick_plain, thres,
                     jnp.where(pick_inv, thres_inv, False))
    return jnp.logical_or(hocr, global_mask)


@jax.jit
def line_crop_counts(crops_t, crops_i, boxes):
    """Per-line ink counts over the valid crop region of the Pallas line
    buffers ((n, MAX_H, Wp) uint8; crop rows 8-aligned, see
    lines_pallas)."""
    n, max_h, wp = crops_t.shape
    rows = jnp.arange(max_h, dtype=jnp.int32)[None, :, None]
    cols = jnp.arange(wp, dtype=jnp.int32)[None, None, :]
    t, b, l, r = boxes[0], boxes[1], boxes[2], boxes[3]
    off = t % 8
    valid = (rows >= off[:, None, None]) & \
            (rows < (off + b - t)[:, None, None]) & \
            (cols >= l[:, None, None]) & (cols < r[:, None, None])
    ones = jnp.sum(jnp.where(valid, crops_t, 0), axis=(1, 2))
    ones_inv = jnp.sum(jnp.where(valid, crops_i, 0), axis=(1, 2))
    size = ((b - t) * (r - l)).astype(jnp.int32)
    return ones.astype(jnp.int32), ones_inv.astype(jnp.int32), size


@functools.partial(jax.jit, static_argnames=('bsz', 'h'))
def paste_selected_crops(crops_t, crops_i, boxes, pages, selector,
                         global_mask, bsz, h):
    """Paste each line's selected threshold crop (selector 0=none,
    1=plain, 2=inverse) into page maps in document order (last line
    wins), then OR the global mask (``mrc.py:265-266,329``).  Crop rows
    are 8-aligned in page coordinates (see lines_pallas)."""
    n, max_h, wp = crops_t.shape
    buf = jnp.zeros((bsz, h + max_h, wp), jnp.uint8)

    rows = jnp.arange(max_h, dtype=jnp.int32)[:, None]
    cols = jnp.arange(wp, dtype=jnp.int32)[None, :]

    def body(acc, xs):
        ct, ci, t, b, l, r, page, sel = xs
        off = t % 8
        ok = (rows >= off) & (rows < off + (b - t)) & \
            (cols >= l) & (cols < r) & (sel > 0)
        chosen = jnp.where(sel == 1, ct, ci)
        cur = jax.lax.dynamic_slice(acc, (page, t - off, 0),
                                    (1, max_h, wp))
        new = jnp.where(ok[None], chosen[None], cur)
        return jax.lax.dynamic_update_slice(acc, new,
                                            (page, t - off, 0)), None

    buf, _ = jax.lax.scan(
        body, buf,
        (crops_t, crops_i, boxes[0], boxes[1], boxes[2], boxes[3],
         pages, selector), unroll=4)   # ~9% faster than unroll=1 (measured)
    hocr = buf[:, :h, :global_mask.shape[-1]].astype(bool)
    return jnp.logical_or(hocr, global_mask)


def select_lines(ones, ones_inv, size, sigma_fn, n_lines):
    """Host-side selection heuristic per line (``mrc.py:231-264``).

    sigma_fn(line_idx) -> (ratio_sigma, inv_ratio_sigma) is only invoked
    for lines the ratio tests cannot decide (it is expensive; the
    reference guards it the same way).

    Returns boolean numpy arrays (use_plain, use_inv) indexed by line id.
    """
    n_seg = len(size)
    use_plain = np.zeros(n_seg, bool)
    use_inv = np.zeros(n_seg, bool)
    for i in range(1, n_lines + 1):
        sz = int(size[i])
        if sz <= 0:
            continue
        ratio = int(ones[i]) / sz
        inv_ratio = int(ones_inv[i]) / sz
        if ratio < 0.3 or inv_ratio < 0.3:
            if inv_ratio > 0.2 and ratio < 0.2:
                use_plain[i] = True
            else:
                ratio_sigma, inv_ratio_sigma = sigma_fn(i)
                if inv_ratio < 0.3 and inv_ratio < ratio and \
                        (inv_ratio_sigma < ratio_sigma or
                         (ratio_sigma < 0.1 and inv_ratio_sigma < 0.1)):
                    use_inv[i] = True
                elif ratio < 0.2:
                    use_plain[i] = True
    return use_plain, use_inv


def denoise_mask(mask, mode, exact=True):
    """Mask despeckle dispatch (``mrc.py:384-396``)."""
    if mode == DENOISE_FAST:
        if not exact:
            return fast_mask_denoise_jacobi(mask, 4, 2)
        from ..utils.backend import use_pallas
        if use_pallas():
            from ..ops.denoise_pallas import fast_mask_denoise_pallas
            interp = jax.devices()[0].platform == 'cpu'
            return fast_mask_denoise_pallas(mask, 4, 2, interpret=interp)
        return fast_mask_denoise_exact(mask, 4, 2)
    if mode == DENOISE_BREGMAN:
        return denoise_bregman(mask)
    return mask


def _optimise_dispatch(mask, img, n):
    from ..utils.backend import use_pallas
    if use_pallas():
        from ..ops.optimise_pallas import optimise_pallas
        interp = jax.devices()[0].platform == 'cpu'
        return optimise_pallas(mask, img, n, interpret=interp)
    return optimise(mask, img, n)


def fg_layer(mask, img):
    """Foreground radiate fill, n=3 (``mrc.py:408-415``)."""
    return _optimise_dispatch(mask, img, 3)


def bg_layer(mask, img):
    """Background radiate fill with inverted mask, n=10
    (``mrc.py:439-449``)."""
    return _optimise_dispatch(jnp.logical_not(mask), img, 10)
