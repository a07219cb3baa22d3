"""Backend dispatch: Pallas row-walk kernels on TPU, XLA scans on CPU.

The scan formulations (ops/optimise.py, ops/denoise.py) are the
reference semantics expressed portably; the Pallas kernels
(ops/optimise_pallas.py, ops/denoise_pallas.py) are bit-identical but
stream rows through VMEM without per-step dispatch overhead.  Both are
exact, so dispatch is purely a performance decision.

Env overrides: APT_TPU_KERNELS=pallas|scan forces a choice.
"""

import os

import jax


def use_pallas():
    forced = os.environ.get('APT_TPU_KERNELS')
    if forced == 'pallas':
        return True
    if forced == 'scan':
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform not in ('cpu', 'gpu')


def pack_mask_bits(mask):
    """Pack a bool (B, H, W) mask to (B, H, ceil(W/8)) uint8 on device
    (np.unpackbits-compatible big-endian bit order) — 8x less
    device->host traffic for mask transfers."""
    import jax.numpy as jnp
    b, h, w = mask.shape
    wpad = -(-w // 8) * 8
    m = mask.astype(jnp.uint8)
    if wpad != w:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, wpad - w)))
    m = m.reshape(b, h, wpad // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(m * weights, axis=-1, dtype=jnp.uint8)


def unpack_mask_bits(packed, w):
    """Host-side inverse of pack_mask_bits -> bool (..., H, w)."""
    import numpy as np
    bits = np.unpackbits(np.asarray(packed), axis=-1)
    return bits[..., :w].astype(bool)
