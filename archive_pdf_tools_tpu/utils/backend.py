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
