"""Embedded @font-face body fonts in epub-to-pdf.

The reference renders EPUB @font-face fonts through PyMuPDF's HTML
engine (``/root/reference/bin/epub-to-pdf:44``); ours embeds the
book's TrueType (or CFF-OpenType) font as a Type0/Identity-H CIDFontType2 (raw sfnt in
FontFile2), measures wraps with its real hmtx advances, and emits a
ToUnicode CMap so text stays extractable.  IDPF- and Adobe-obfuscated
fonts (META-INF/encryption.xml) are de-obfuscated first.

The fixture font is matplotlib's bundled DejaVuSans.ttf (public,
already a dependency of pdf/glyphs.py's stand-in machinery).
"""

import hashlib
import os
import re
import zipfile
import zlib

import pytest

import matplotlib

from archive_pdf_tools_tpu.cli.epub_to_pdf import main, MARGIN
from archive_pdf_tools_tpu.pdf.reader import PdfReader

FONT_PATH = os.path.join(os.path.dirname(matplotlib.__file__),
                         'mpl-data', 'fonts', 'ttf', 'DejaVuSans.ttf')

CONTAINER = '''<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container"
 version="1.0"><rootfiles><rootfile full-path="content.opf"
 media-type="application/oebps-package+xml"/></rootfiles></container>'''

UID = 'urn:uuid:12345678-9abc-def0-1234-56789abcdef0'

OPF = '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0"
 unique-identifier="uid">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:identifier id="uid">%s</dc:identifier>
  <dc:title>Fonts</dc:title></metadata>
 <manifest><item id="c1" href="c1.xhtml"
  media-type="application/xhtml+xml"/>
  <item id="css" href="style.css" media-type="text/css"/>
  <item id="f1" href="fonts/Body.ttf"
  media-type="application/x-font-ttf"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''' % UID

CSS = '''@font-face { font-family: "BookBody";
  src: url(fonts/Body.ttf); font-weight: normal; }
body { font-family: "BookBody", serif; }
'''

XHTML = ('<?xml version="1.0"?>\n<html xmlns='
         '"http://www.w3.org/1999/xhtml"><head>'
         '<link rel="stylesheet" type="text/css" href="style.css"/>'
         '</head><body>%s</body></html>')


def _epub_with_font(path, body, font_bytes, encryption_xml=None):
    with zipfile.ZipFile(path, 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        if encryption_xml:
            zf.writestr('META-INF/encryption.xml', encryption_xml)
        zf.writestr('content.opf', OPF)
        zf.writestr('style.css', CSS)
        zf.writestr('fonts/Body.ttf', font_bytes)
        zf.writestr('c1.xhtml', XHTML % body)


def _font_data():
    with open(FONT_PATH, 'rb') as fp:
        return fp.read()


def _type0_font(r):
    """(type0 dict, descendant dict, fontfile bytes, tounicode text)
    of the first embedded Type0 font in the PDF."""
    page = r.pages()[0]
    fonts = r.resolve(r.resolve(page['Resources'])['Font'])
    for name, ref in fonts.items():
        f = r.resolve(ref)
        if str(r.resolve(f.get('Subtype'))) == 'Type0':
            desc = r.resolve(r.resolve(f['DescendantFonts'])[0])
            fd = r.resolve(desc['FontDescriptor'])
            ff = r.resolve(fd.get('FontFile2') or fd['FontFile3'])
            tou = r.resolve(f['ToUnicode'])
            return f, desc, ff.decoded(), \
                tou.decoded().decode('ascii')
    return None, None, None, None


def test_embedded_body_font(tmp_path):
    epub = str(tmp_path / 'f.epub')
    data = _font_data()
    _epub_with_font(epub, '<p>Quartz vex jumbled night</p>'
                          '<p>More <b>BOLDBIT</b> body text</p>', data)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    t0, desc, ff, tou = _type0_font(r)
    assert t0 is not None, 'no Type0 font embedded'
    # the raw sfnt goes in unmodified
    assert ff == data
    assert str(r.resolve(t0['Encoding'])) == 'Identity-H'
    assert str(r.resolve(desc['Subtype'])) == 'CIDFontType2'
    assert str(r.resolve(desc['CIDToGIDMap'])) == 'Identity'
    # body text shows as /F7 hex strings, not (literal) strings
    c = r.page_contents(0)
    assert re.search(rb'/F7 10 Tf', c)
    assert not re.search(rb'\(Quartz', c)
    # the bold run keeps the standard-14 styled face
    assert re.search(rb'/F3 10 Tf \((?:[^)]* )?BOLDBIT', c)
    # ToUnicode maps every used glyph back to its character
    assert 'beginbfchar' in tou
    # 'Q' of Quartz: DejaVu gid for Q maps to U+0051
    assert re.search(r'<[0-9a-f]{4}> <0051>', tou)
    # /W carries real (non-default) advances for the used glyphs
    warr = r.resolve(desc['W'])
    assert len(warr) >= 2


def test_extract_text_roundtrip(tmp_path):
    """Our own text extractor recovers the words through ToUnicode —
    the embedded-font path stays pdf-to-hocr compatible."""
    from archive_pdf_tools_tpu.pdf.textextract import (
        extract_page_glyphs, group_words)
    epub = str(tmp_path / 'x.epub')
    _epub_with_font(epub, '<p>Recoverable embedded words</p>',
                    _font_data())
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    glyphs, _w, _h = extract_page_glyphs(r, 0)
    words = [w[0] for w in group_words(glyphs)]
    assert 'Recoverable' in words and 'embedded' in words


def _obfuscate(data, key, n):
    head = bytes(b ^ key[i % len(key)] for i, b in enumerate(data[:n]))
    return head + data[n:]


ENC_XML = '''<?xml version="1.0"?>
<encryption xmlns="urn:oasis:names:tc:opendocument:xmlns:container"
 xmlns:enc="http://www.w3.org/2001/04/xmlenc#">
 <enc:EncryptedData>
  <enc:EncryptionMethod Algorithm="%s"/>
  <enc:CipherData><enc:CipherReference URI="fonts/Body.ttf"/>
  </enc:CipherData>
 </enc:EncryptedData>
</encryption>'''


@pytest.mark.parametrize('algo', ['idpf', 'adobe'])
def test_obfuscated_font(tmp_path, algo):
    data = _font_data()
    if algo == 'idpf':
        key = hashlib.sha1(UID.encode()).digest()
        obf = _obfuscate(data, key, 1040)
        uri = 'http://www.idpf.org/2008/embedding'
    else:
        key = bytes.fromhex('123456789abcdef0123456789abcdef0')
        obf = _obfuscate(data, key, 1024)
        uri = 'http://ns.adobe.com/pdf/enc#RC'
    assert obf != data
    epub = str(tmp_path / (algo + '.epub'))
    _epub_with_font(epub, '<p>Deobfuscated text body</p>', obf,
                    encryption_xml=ENC_XML % uri)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    _t0, _desc, ff, _tou = _type0_font(r)
    # deobfuscation recovered the original sfnt bit-exactly
    assert ff == data


def test_unparseable_font_degrades(tmp_path):
    """A corrupt font file falls back to the standard-14 faces —
    never crashes, text survives as /F1 literals."""
    epub = str(tmp_path / 'bad.epub')
    _epub_with_font(epub, '<p>Fallback body text</p>',
                    b'\x00\x01\x00\x00' + b'garbage' * 100)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = PdfReader(out).page_contents(0)
    assert re.search(rb'\((?:Fallback|[^)]*Fallback)', c)


def test_linked_stylesheet_rules_apply(tmp_path):
    """Rules in a <link rel=stylesheet> file apply (not only <style>
    blocks): a linked text-align:center class centers the line."""
    epub = str(tmp_path / 'link.epub')
    with zipfile.ZipFile(epub, 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', OPF.replace(
            '<item id="f1" href="fonts/Body.ttf"\n'
            '  media-type="application/x-font-ttf"/>', ''))
        zf.writestr('style.css', '.tc { text-align: center }')
        zf.writestr('c1.xhtml', XHTML %
                    '<p class="tc">CENTERED</p><p>LEFTP</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = PdfReader(out).page_contents(0)
    from tests.test_epub_layout import _td_x
    assert _td_x(c, b'LEFTP') == MARGIN
    assert _td_x(c, b'CENTERED') > MARGIN + 60


OTF_PATH = '/opt/venv/lib/python3.12/site-packages/pygame/tests/fixtures/fonts/test_fixed.otf'


@pytest.mark.skipif(not os.path.exists(OTF_PATH),
                    reason='no OTF fixture on this box')
def test_embedded_otf_body_font(tmp_path):
    """CFF-flavored OpenType embeds as CIDFontType0 + FontFile3
    /OpenType; extraction roundtrips through our rasterizer's OTTO
    path (pdf/glyphs.py) — an internal cross-implementation check."""
    from archive_pdf_tools_tpu.pdf.textextract import (
        extract_page_glyphs, group_words)
    with open(OTF_PATH, 'rb') as fp:
        data = fp.read()
    epub = str(tmp_path / 'otf.epub')
    _epub_with_font(epub, '<p>otf body words here</p>', data)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    t0, desc, ff, tou = _type0_font(r)
    assert t0 is not None
    assert ff == data
    assert str(r.resolve(desc['Subtype'])) == 'CIDFontType0'
    assert 'CIDToGIDMap' not in desc
    glyphs, _w, _h = extract_page_glyphs(r, 0)
    words = [w[0] for w in group_words(glyphs)]
    assert 'body' in words and 'words' in words


# --- @font-face bold/italic variants ---------------------------------

OPF_VARIANTS = '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0"
 unique-identifier="uid">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:identifier id="uid">%s</dc:identifier>
  <dc:title>Variant fonts</dc:title></metadata>
 <manifest><item id="c1" href="c1.xhtml"
  media-type="application/xhtml+xml"/>
  <item id="css" href="style.css" media-type="text/css"/>
  <item id="f1" href="fonts/R.ttf"
  media-type="application/x-font-ttf"/>
  <item id="f2" href="fonts/B.ttf"
  media-type="application/x-font-ttf"/>
  <item id="f3" href="fonts/I.ttf"
  media-type="application/x-font-ttf"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''' % UID

CSS_VARIANTS = '''
@font-face { font-family: "BookBody"; src: url(fonts/R.ttf); }
@font-face { font-family: "BookBody"; src: url(fonts/B.ttf);
  font-weight: bold; }
@font-face { font-family: "BookBody"; src: url(fonts/I.ttf);
  font-style: italic; }
body { font-family: "BookBody", serif; }
'''


def _variant_data():
    import glob
    d = os.path.dirname(FONT_PATH)
    return (open(os.path.join(d, 'DejaVuSans.ttf'), 'rb').read(),
            open(os.path.join(d, 'DejaVuSans-Bold.ttf'), 'rb').read(),
            open(os.path.join(d, 'DejaVuSans-Oblique.ttf'),
                 'rb').read())


def test_font_face_variants(tmp_path):
    """Declared bold/italic @font-face variants of the body family
    embed and carry their styled runs (instead of the standard-14
    substitutes); an undeclared variant (bold-italic here) still
    falls back to standard-14."""
    reg, bold, ital = _variant_data()
    epub = str(tmp_path / 'v.epub')
    with zipfile.ZipFile(epub, 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', OPF_VARIANTS)
        zf.writestr('style.css', CSS_VARIANTS)
        zf.writestr('fonts/R.ttf', reg)
        zf.writestr('fonts/B.ttf', bold)
        zf.writestr('fonts/I.ttf', ital)
        zf.writestr('c1.xhtml', XHTML %
                    ('<p>roman body with <b>BOLDWORDS run</b> and '
                     '<i>ITALWORDS run</i> and '
                     '<b><i>BOTHWORDS</i></b> here</p>'))
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    c = r.page_contents(0)
    # bold and italic runs switch to the variant Type0 faces (hex)
    assert re.search(rb'/F7B 10 Tf <[0-9a-f]+> Tj', c)
    assert re.search(rb'/F7I 10 Tf <[0-9a-f]+> Tj', c)
    # undeclared bold-italic falls back to the standard-14 face
    assert re.search(rb'/F5 10 Tf \(BOTHWORDS\) Tj', c)
    # resources carry all three embedded faces with the right programs
    fonts = r.resolve(r.resolve(r.pages()[0]['Resources'])['Font'])
    for nm, data in (('F7', reg), ('F7B', bold), ('F7I', ital)):
        t0 = r.resolve(fonts[nm])
        assert str(r.resolve(t0.get('Subtype'))) == 'Type0'
        desc = r.resolve(r.resolve(t0['DescendantFonts'])[0])
        fd = r.resolve(desc['FontDescriptor'])
        assert r.resolve(fd['FontFile2']).decoded() == data
    # text extraction recovers words across all variant faces
    from archive_pdf_tools_tpu.pdf.textextract import (
        extract_page_glyphs, group_words)
    glyphs, _w, _h = extract_page_glyphs(r, 0)
    words = [w[0] for w in group_words(glyphs)]
    for want in ('roman', 'BOLDWORDS', 'ITALWORDS', 'BOTHWORDS'):
        assert want in words, words
