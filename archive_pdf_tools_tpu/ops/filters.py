"""Separable blur filters matching scipy.ndimage semantics, TPU-native.

The reference leans on scipy for:
* ``ndimage.gaussian_filter(imgf, sigma)`` as the pre-threshold noise blur
  (``mrc.py:311``) and inside ``partial_blur`` (``mrc.py:111-150``)
* ``ndimage.uniform_filter`` inside ``partial_boxblur`` (``mrc.py:153-185``)

scipy defaults reproduced here: truncate=4.0 (kernel radius
``int(truncate*sigma + 0.5)``), border mode 'reflect' (edge-inclusive
mirror, numpy 'symmetric'), separable 1-D passes.  Filters operate on the
trailing two axes and broadcast over leading batch dims.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel1d(sigma, radius):
    """scipy.ndimage._gaussian_kernel1d (order 0): sampled, normalized."""
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return (phi / phi.sum()).astype(np.float32)


def _conv1d_reflect(x, kernel, axis):
    """Correlate along ``axis`` with edge-inclusive mirror padding."""
    k = kernel.shape[0]
    lo = k // 2
    hi = k - 1 - lo
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    xp = jnp.pad(x, pad, mode='symmetric')
    xp = jnp.moveaxis(xp, axis, -1)
    shape = xp.shape
    flat = xp.reshape(-1, 1, shape[-1])                      # (N, C=1, W)
    kern = jnp.asarray(kernel, jnp.float32)[None, None, :]   # (O, I, K)
    out = jax.lax.conv_general_dilated(
        flat.astype(jnp.float32), kern,
        window_strides=(1,), padding='VALID',
        dimension_numbers=('NCH', 'OIH', 'NCH'),
        precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(shape[:-1] + (out.shape[-1],))
    return jnp.moveaxis(out, -1, axis)


@functools.partial(jax.jit, static_argnames=('sigma', 'truncate'))
def gaussian_filter(img, sigma, truncate=4.0):
    """scipy.ndimage.gaussian_filter equivalent over the last two axes.
    ``sigma`` must be a static python float (kernel size depends on it)."""
    radius = int(float(truncate) * float(sigma) + 0.5)
    k = gaussian_kernel1d(float(sigma), radius)
    out = _conv1d_reflect(img.astype(jnp.float32), k, axis=-2)
    return _conv1d_reflect(out, k, axis=-1)


@functools.partial(jax.jit, static_argnames=('size',))
def uniform_filter(img, size=5):
    """scipy.ndimage.uniform_filter equivalent over the last two axes."""
    k = np.full((size,), 1.0 / size, np.float32)
    out = _conv1d_reflect(img.astype(jnp.float32), k, axis=-2)
    return _conv1d_reflect(out, k, axis=-1)


def _partial(mask, img, blur):
    """Shared core of partial_blur/partial_boxblur (``mrc.py:111-185``):
    blur img*mask and mask, divide (+1e-5), truncate to uint8, restore
    original pixels where mask is set.  Channels (if any) ride a leading
    batch axis through the blur."""
    maskf = mask.astype(jnp.float32)
    weights = blur(maskf) + 0.00001
    if img.ndim == mask.ndim + 1:                            # (..., H, W, C)
        chan = jnp.moveaxis(img, -1, 0).astype(jnp.float32)  # (C, ..., H, W)
        num = blur(chan * maskf[None])
        out = jnp.moveaxis(num / weights[None], 0, -1)
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
        return jnp.where(mask[..., None], img, out)
    num = blur(img.astype(jnp.float32) * maskf)
    out = (num / weights).astype(jnp.uint8)
    return jnp.where(mask, img, out)


def partial_blur(mask, img, sigma=5):
    """Gaussian variant (``mrc.py:111-150``)."""
    return _partial(mask, img, lambda a: gaussian_filter(a, float(sigma)))


def partial_boxblur(mask, img, size=5):
    """Uniform variant (``mrc.py:153-185``)."""
    return _partial(mask, img, lambda a: uniform_filter(a, int(size)))
