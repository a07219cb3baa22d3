#!/usr/bin/env python3
"""Generate a minimal glyphless TrueType font for invisible text layers.

The text-only PDF embeds a CIDFontType2 whose CIDToGIDMap sends every CID
to glyph 1; both glyphs (0 = .notdef, 1 = blank) have empty outlines and a
fixed advance of 500/1000 em (matching the /DW 500 the renderer writes,
see pdf/textlayer.py).  The reference ships a prebuilt binary
(internetarchivepdf/data/tesseract.ttf, used at pdfrenderer.py:315); we
build an equivalent from scratch so the asset is reproducible.

Usage: python tools/make_glyphless_font.py [out.ttf]
"""

import struct
import sys


def _checksum(data):
    data = data + b'\x00' * (-len(data) % 4)
    return sum(struct.unpack('>%dI' % (len(data) // 4), data)) & 0xFFFFFFFF


def _table_head(index_to_loc=0):
    return struct.pack('>IIIIHHqqhhhhHHhhh',
                       0x00010000,     # version
                       0x00010000,     # fontRevision
                       0,              # checkSumAdjustment (patched later)
                       0x5F0F3CF5,     # magicNumber
                       0b0000000000001011,  # flags
                       1000,           # unitsPerEm
                       0, 0,           # created, modified
                       0, 0, 500, 1000,  # xMin yMin xMax yMax
                       0,              # macStyle
                       8,              # lowestRecPPEM
                       2,              # fontDirectionHint
                       index_to_loc,   # indexToLocFormat (short)
                       0)              # glyphDataFormat


def _table_hhea():
    return struct.pack('>IhhhHhhhhhhhhhhhH',
                       0x00010000,
                       1000,   # ascender
                       -1,     # descender
                       0,      # lineGap
                       500,    # advanceWidthMax
                       0, 0, 500,  # minLSB, minRSB, xMaxExtent
                       1, 0, 0,    # caret slope rise/run/offset
                       0, 0, 0, 0,  # reserved
                       0,      # metricDataFormat
                       2)      # numberOfHMetrics


def _table_maxp():
    return struct.pack('>IH' + 'H' * 13, 0x00010000, 2, *([0] * 13))


def _table_hmtx():
    return struct.pack('>HhHh', 500, 0, 500, 0)


def _table_loca():
    return struct.pack('>HHH', 0, 0, 0)


def _table_glyf():
    # zero-length: loca is all-zero, so any padding here trips strict
    # parsers (fontTools: "too much 'glyf' table data")
    return b''


def _table_cmap():
    # format 4, one real segment (space -> gid 1) + terminator
    seg = struct.pack('>HHHHHHH HH H HH hh HH',
                      4, 32, 0,           # format, length, language
                      4,                  # segCountX2
                      4, 1, 0,            # searchRange, entrySel, rangeShift
                      0x0020, 0xFFFF,     # endCodes
                      0,                  # reservedPad
                      0x0020, 0xFFFF,     # startCodes
                      -31, 1,             # idDelta (0x20->1, 0xFFFF->0)
                      0, 0)               # idRangeOffsets
    header = struct.pack('>HH HHI', 0, 1, 3, 1, 12)
    return header + seg


def _table_name():
    strings = [
        (1, 'GlyphLessFont'),
        (2, 'Regular'),
        (4, 'GlyphLessFont'),
        (6, 'GlyphLessFont'),
    ]
    records = b''
    storage = b''
    for name_id, text in strings:
        enc = text.encode('utf-16-be')
        records += struct.pack('>HHHHHH', 3, 1, 0x409, name_id,
                               len(enc), len(storage))
        storage += enc
    header = struct.pack('>HHH', 0, len(strings),
                         6 + 12 * len(strings))
    return header + records + storage


def _table_post():
    return struct.pack('>IIhhIIIIII', 0x00030000, 0, 0, 0, 1, 0, 0, 0, 0, 0)


def _table_os2():
    return struct.pack('>HhHHH hhhhhhhhhhh bbbbbbbbbb IIII 4sH HHH',
                       1,        # version
                       500,      # xAvgCharWidth
                       400, 5,   # usWeightClass, usWidthClass
                       0,        # fsType
                       0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,  # subscript etc.
                       0, 0, 0, 0, 0, 0, 0, 0, 0, 0,      # panose
                       0, 0, 0, 0,      # unicode ranges
                       b'TPU ', 0x0040,  # vendor, fsSelection (regular)
                       0x0020, 0x0020,   # first/last char index
                       0) + struct.pack('>hhhHH II',
                                        1000, -1, 0,  # typo asc/desc/gap
                                        1000, 1,      # win ascent/descent
                                        0, 0)         # code page ranges


def build_font():
    tables = {
        'OS/2': _table_os2(),
        'cmap': _table_cmap(),
        'glyf': _table_glyf(),
        'head': _table_head(),
        'hhea': _table_hhea(),
        'hmtx': _table_hmtx(),
        'loca': _table_loca(),
        'maxp': _table_maxp(),
        'name': _table_name(),
        'post': _table_post(),
    }
    tags = sorted(tables)
    num = len(tags)
    search_range = 16 * (2 ** (num.bit_length() - 1))
    header = struct.pack('>IHHHH', 0x00010000, num, search_range,
                         num.bit_length() - 1, 16 * num - search_range)
    offset = 12 + 16 * num
    directory = b''
    body = b''
    offsets = {}
    for tag in tags:
        data = tables[tag]
        offsets[tag] = offset
        directory += struct.pack('>4sIII', tag.encode('ascii'),
                                 _checksum(data), offset, len(data))
        pad = b'\x00' * (-len(data) % 4)
        body += data + pad
        offset += len(data) + len(pad)

    font = header + directory + body
    adjustment = (0xB1B0AFBA - _checksum(font)) & 0xFFFFFFFF
    head_off = offsets['head']
    font = (font[:head_off + 8] + struct.pack('>I', adjustment)
            + font[head_off + 12:])
    return font


if __name__ == '__main__':
    out = sys.argv[1] if len(sys.argv) > 1 else \
        'archive_pdf_tools_tpu/data/glyphless.ttf'
    data = build_font()
    with open(out, 'wb') as fp:
        fp.write(data)
    print('wrote %s (%d bytes)' % (out, len(data)))
