"""Constants for the TPU-native MRC compression framework.

Parity reference: /root/reference/internetarchivepdf/const.py (whole file).
Image modes, denoise modes, runtime warning codes, JPEG2000 implementation
ids and compressor ids keep the reference's string/int values so that CLI
flags and library calls remain drop-in compatible.
"""

VERSION = '0.1.0'

PRODUCER = 'Internet Archive PDF (TPU) %s; jax/XLA MRC engine' % (VERSION,)

# --- image modes (const.py:25-28) ---
IMAGE_MODE_PASSTHROUGH = 0
IMAGE_MODE_PIXMAP = 1
IMAGE_MODE_MRC = 2
IMAGE_MODE_SKIP = 3

# --- mask denoise modes (const.py:31-33) ---
DENOISE_NONE = 'none'
DENOISE_FAST = 'fast'
DENOISE_BREGMAN = 'bregman'

# --- runtime warning codes (const.py:35-45) ---
RECODE_RUNTIME_WARNING_INVALID_PAGE_SIZE = 'invalid-page-size'
RECODE_RUNTIME_WARNING_INVALID_PAGE_NUMBERS = 'invalid-page-numbers'
RECODE_RUNTIME_WARNING_INVALID_JP2_HEADERS = 'invalid-jp2-headers'
RECODE_RUNTIME_WARNING_TOO_SMALL_TO_DOWNSAMPLE = 'too-small-to-downsample'

RECODE_RUNTIME_WARNINGS = {
    RECODE_RUNTIME_WARNING_INVALID_PAGE_SIZE,
    RECODE_RUNTIME_WARNING_INVALID_PAGE_NUMBERS,
    RECODE_RUNTIME_WARNING_INVALID_JP2_HEADERS,
    RECODE_RUNTIME_WARNING_TOO_SMALL_TO_DOWNSAMPLE,
}

# --- JPEG2000 implementations (const.py:47-53) ---
JPEG2000_IMPL_KAKADU = 'kakadu'
JPEG2000_IMPL_OPENJPEG = 'openjpeg'
JPEG2000_IMPL_GROK = 'grok'
JPEG2000_IMPL_PILLOW = 'pillow'

JPEG2000_IMPLS = (JPEG2000_IMPL_KAKADU, JPEG2000_IMPL_OPENJPEG,
                  JPEG2000_IMPL_GROK, JPEG2000_IMPL_PILLOW)

# --- compressors (const.py:55-59) ---
COMPRESSOR_JPEG2000 = 'jpeg2000'
COMPRESSOR_JPEG = 'jpeg'

COMPRESSOR_JBIG2 = 'jbig2'
COMPRESSOR_CCITT = 'ccitt'

__version__ = VERSION
