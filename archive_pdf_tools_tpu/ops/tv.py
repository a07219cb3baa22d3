"""Isotropic split-Bregman total-variation denoise, TPU-native.

The reference's optional mask denoiser (``mrc.py:90-108``,
``--denoise-mask bregman``) runs ``skimage.restoration.denoise_tv_bregman``
with weight=1.0 on the float mask and keeps pixels > 0.4.

This is the Goldstein-Osher split-Bregman solver for
    min_u  weight/2 ||u - f||^2 + TV_iso(u)
re-cast for TPU: the Gauss-Seidel sweep of the original becomes damped
Jacobi updates (pure stencil ops, vectorized over batch), run for a fixed
iteration budget instead of an epsilon-based break so the graph is static.
Converged solutions agree with skimage's to well below the 0.4 mask
threshold for all but boundary-straddling pixels.
"""

import functools

import jax
import jax.numpy as jnp


def _shift(a, off, axis):
    """Neighbour with edge clamp (Neumann boundary)."""
    n = a.shape[axis]
    idx = jnp.clip(jnp.arange(n) + off, 0, n - 1)
    return jnp.take(a, idx, axis=axis)


@functools.partial(jax.jit, static_argnames=('max_iter',))
def denoise_tv_bregman(img, weight=1.0, max_iter=100):
    """img: float (..., H, W) in [0, 1]-ish. Returns float32 same shape."""
    f = img.astype(jnp.float32)
    lam = 2.0 * weight          # split penalty (skimage uses lambda=2w)
    mu = weight

    u0 = f
    d = jnp.zeros(f.shape + (2,), jnp.float32)   # split gradients
    b = jnp.zeros_like(d)                        # Bregman accumulators

    def grad(u):
        gy = _shift(u, 1, -2) - u
        gx = _shift(u, 1, -1) - u
        return jnp.stack([gy, gx], axis=-1)

    def div(p):
        py, px = p[..., 0], p[..., 1]
        dy = py - _shift(py, -1, -2)
        dx = px - _shift(px, -1, -1)
        return dy + dx

    def body(_, state):
        u, d, b = state
        # u-update (Jacobi step of the Euler-Lagrange system)
        n4 = (_shift(u, 1, -2) + _shift(u, -1, -2) +
              _shift(u, 1, -1) + _shift(u, -1, -1))
        u = (mu * f + lam * (n4 + div(d - b))) / (mu + 4.0 * lam)
        # shrinkage (isotropic)
        g = grad(u) + b
        norm = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
        shrink = jnp.maximum(norm - 1.0 / lam, 0.0) / jnp.maximum(norm, 1e-12)
        d = g * shrink
        b = g - d
        return u, d, b

    u, _, _ = jax.lax.fori_loop(0, max_iter, body, (u0, d, b))
    return u


def denoise_bregman(binary_mask, weight=1.0):
    """Reference ``denoise_bregman`` (``mrc.py:90-108``): TV-denoise the
    float mask and keep pixels > 0.4."""
    out = denoise_tv_bregman(binary_mask.astype(jnp.float32), weight)
    return out > 0.4
