"""CCITT Group 4 mask codec via Pillow/libtiff.

The reference's ``--mask-compression ccitt`` path defers G4 encoding to
PyMuPDF at save time; here we encode directly: Pillow writes a
single-strip G4 TIFF (libtiff, battle-tested) and we extract the raw
codestream for PDF embedding with ``/CCITTFaxDecode``.

Polarity (determined empirically against libtiff): mask True (text)
pixels are CCITT-black in the produced stream, so the PDF image dict
must carry ``/BlackIs1 true`` for text to decode as sample 1 (opaque in
an SMask).  ``decode_params()`` returns the matching DecodeParms.
"""

import io

import numpy as np
from PIL import Image


def encode_ccitt_g4(mask):
    """bool/uint8 (H, W) mask -> raw single-strip G4 codestream bytes."""
    m = np.asarray(mask).astype(bool)
    h, w = m.shape
    im = Image.fromarray(m)
    buf = io.BytesIO()
    im.save(buf, format='TIFF', compression='group4', tiffinfo={278: h})
    buf.seek(0)
    t = Image.open(buf)
    offsets = t.tag_v2[273]
    counts = t.tag_v2[279]
    if len(offsets) != 1:
        raise RuntimeError('expected single-strip G4 TIFF, got %d strips'
                           % len(offsets))
    raw = buf.getvalue()
    return raw[offsets[0]:offsets[0] + counts[0]]


def decode_params(w, h):
    """PDF DecodeParms dict source for streams from encode_ccitt_g4."""
    return ('<< /K -1 /Columns %d /Rows %d /BlackIs1 true >>' % (w, h))


def decode_ccitt_g4(stream, w, h):
    """Round-trip helper: wrap the raw stream in a minimal TIFF and let
    libtiff decode it.  Returns bool (H, W) with True = text."""
    import struct
    hdr = b'II*\x00' + struct.pack('<I', 8)
    ntags = 8
    data_off = 8 + 2 + ntags * 12 + 4

    def tag(tid, typ, cnt, val):
        return struct.pack('<HHI4s', tid, typ, cnt, struct.pack('<I', val))

    tags = (tag(256, 4, 1, w) + tag(257, 4, 1, h) + tag(258, 3, 1, 1)
            + tag(259, 3, 1, 4) + tag(262, 3, 1, 1)
            + tag(273, 4, 1, data_off) + tag(278, 4, 1, h)
            + tag(279, 4, 1, len(stream)))
    ifd = struct.pack('<H', ntags) + tags + struct.pack('<I', 0)
    im = Image.open(io.BytesIO(hdr + ifd + bytes(stream)))
    return np.asarray(im)
