"""Page-batch data parallelism over a device mesh.

The reference is strictly serial (``recode.py:291``; its only
concurrency knob forwards a thread count to codec subprocesses,
``bin/recode_pdf:66``).  Pages are embarrassingly parallel, so the TPU
design shards the page batch across chips on a 1-D ``pages`` mesh:
every kernel in mrc/ops is batch-leading and communication-free except
the hOCR segment sums, whose scatter-adds XLA turns into a psum over
the page shards.  ICI handles that; hosts keep their own codec work.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def page_mesh(n_devices=None, devices=None):
    """1-D mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ('pages',))


def shard_pages(mesh, *arrays):
    """Place arrays with their leading (batch) dim split over 'pages'."""
    out = []
    for arr in arrays:
        spec = P('pages', *([None] * (arr.ndim - 1)))
        out.append(jax.device_put(arr, NamedSharding(mesh, spec)))
    return out if len(out) > 1 else out[0]


def replicate(mesh, *arrays):
    """Place arrays replicated on every device of the mesh."""
    out = [jax.device_put(a, NamedSharding(mesh, P())) for a in arrays]
    return out if len(out) > 1 else out[0]
