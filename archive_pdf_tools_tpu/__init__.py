"""archive-pdf-tools-tpu: TPU-native MRC PDF compression framework.

Public surface mirrors the reference package (``internetarchivepdf``):

    from archive_pdf_tools_tpu import recode
    from archive_pdf_tools_tpu.mrc import create_mrc_hocr_components
"""

import os as _os

# Honor JAX_PLATFORMS even on hosts whose sitecustomize pre-registers a
# TPU plugin before jax reads the env var (this dev image): without
# this, `JAX_PLATFORMS=cpu some-tool` still lands on the TPU and every
# op goes through the remote compile service.  A no-op when the backend
# already initialized or the value matches.
if _os.environ.get('JAX_PLATFORMS'):
    try:
        import jax as _jax
        _jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
    except Exception:
        pass

from .const import VERSION, PRODUCER, __version__  # noqa: F401


def recode(*args, **kwargs):
    """Lazy alias of pipeline.recode.recode (keeps import light)."""
    from .pipeline.recode import recode as _recode
    return _recode(*args, **kwargs)
