"""archive-pdf-tools-tpu: TPU-native MRC PDF compression framework.

Public surface mirrors the reference package (``internetarchivepdf``):

    from archive_pdf_tools_tpu import recode
    from archive_pdf_tools_tpu.mrc import create_mrc_hocr_components
"""

from .const import VERSION, PRODUCER, __version__  # noqa: F401


def recode(*args, **kwargs):
    """Lazy alias of pipeline.recode.recode (keeps import light)."""
    from .pipeline.recode import recode as _recode
    return _recode(*args, **kwargs)
