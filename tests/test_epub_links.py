"""Link annotations in epub-to-pdf output (VERDICT r4 missing #1).

The reference re-inserts every non-named link of the converted document
(``/root/reference/bin/epub-to-pdf:62-76``, ``pout.insert_link`` for all
links except LINK_NAMED).  Our converter must emit /Annots Link objects:
external hrefs as /URI actions, internal spine/fpage targets as GoTo
dests — strictly more than the reference, which drops internal named
links.
"""

import zipfile

import pytest

from archive_pdf_tools_tpu.cli.epub_to_pdf import main, MARGIN, PAGE_W
from archive_pdf_tools_tpu.pdf.reader import PdfReader, PRef

XPS_NS = 'http://schemas.microsoft.com/xps/2005/06'

CONTAINER = '''<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container"
 version="1.0"><rootfiles><rootfile full-path="content.opf"
 media-type="application/oebps-package+xml"/></rootfiles></container>'''


def _annots(r, idx):
    page = r.pages()[idx]
    return [r.resolve(a) for a in (r.resolve(page.get('Annots')) or [])]


def _link_epub(path):
    with zipfile.ZipFile(path, 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>Linked</dc:title></metadata>
 <manifest>
  <item id="c1" href="c1.xhtml" media-type="application/xhtml+xml"/>
  <item id="c2" href="c2.xhtml" media-type="application/xhtml+xml"/>
 </manifest>
 <spine><itemref idref="c1"/><itemref idref="c2"/></spine></package>''')
        zf.writestr('c1.xhtml', '''<?xml version="1.0"?>
<html xmlns="http://www.w3.org/1999/xhtml"><body>
 <h1>One</h1>
 <p>Visit <a href="https://example.com/x">the example site</a> or read
    <a href="c2.xhtml">chapter two</a> instead.</p>
</body></html>''')
        zf.writestr('c2.xhtml', '''<?xml version="1.0"?>
<html xmlns="http://www.w3.org/1999/xhtml"><body>
 <h1>Two</h1><p>Second chapter body.</p>
</body></html>''')


def test_reflow_links(tmp_path):
    epub = str(tmp_path / 'l.epub')
    _link_epub(epub)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    assert r.page_count() == 2
    annots = _annots(r, 0)
    assert len(annots) == 2
    for a in annots:
        assert str(a['Subtype']) == 'Link'
        x0, y0, x1, y1 = [float(r.resolve(v)) for v in a['Rect']]
        assert MARGIN <= x0 < x1 <= PAGE_W - MARGIN + 1.0
        assert 0 < y0 < y1

    uri = [a for a in annots if 'A' in a]
    assert len(uri) == 1
    action = r.resolve(uri[0]['A'])
    assert str(action['S']) == 'URI'
    assert r.resolve(action['URI']) == b'https://example.com/x'
    # 'Visit ' precedes the anchor: the rect must start past the margin
    assert float(r.resolve(uri[0]['Rect'][0])) > MARGIN + 5

    goto = [a for a in annots if 'Dest' in a][0]
    dest = r.resolve(goto['Dest'])
    assert isinstance(dest[0], PRef)
    assert dest[0].num == r.page_object_number(1)

    # chapter two's own page carries no annotations
    assert _annots(r, 1) == []


def test_fixed_layout_link(tmp_path):
    epub = str(tmp_path / 'f.epub')
    with zipfile.ZipFile(epub, 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>Fixed</dc:title>
  <meta property="rendition:layout">pre-paginated</meta></metadata>
 <manifest><item id="c1" href="p1.xhtml"
   media-type="application/xhtml+xml"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
        zf.writestr('p1.xhtml', '''<?xml version="1.0"?>
<html xmlns="http://www.w3.org/1999/xhtml"><head>
 <meta name="viewport" content="width=400, height=600"/></head>
<body>
 <div style="position:absolute; left:40px; top:30px; font-size:20px">
   <a href="http://fixed.test/go">TAP HERE</a></div>
</body></html>''')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    annots = _annots(r, 0)
    assert len(annots) == 1
    action = r.resolve(annots[0]['A'])
    assert r.resolve(action['URI']) == b'http://fixed.test/go'
    x0, y0, x1, y1 = [float(r.resolve(v)) for v in annots[0]['Rect']]
    # text draws at Td (30, 450 - 22.5 - 15): rect anchored there
    assert abs(x0 - 30.0) < 0.5
    assert y0 < 412.5 < y1
    assert x1 > x0 + 10


def _nav_xps(path):
    page1 = '''<FixedPage xmlns="%s" Width="816" Height="1056"
  xml:lang="en-US">
 <Glyphs OriginX="96" OriginY="192" FontRenderingEmSize="32"
   UnicodeString="example dot org" Fill="#FF000000" FontUri="/f.odttf"
   FixedPage.NavigateUri="http://example.org/page"/>
 <Path Fill="#FF0000FF" Data="M 96,384 L 288,384 288,432 96,432 Z"
   FixedPage.NavigateUri="/Documents/1/Pages/2.fpage"/>
</FixedPage>''' % XPS_NS
    page2 = ('<FixedPage xmlns="%s" Width="816" Height="1056">'
             '<Glyphs OriginX="96" OriginY="96" FontRenderingEmSize="16"'
             ' UnicodeString="second" FontUri="/f.odttf"/></FixedPage>'
             % XPS_NS)
    with zipfile.ZipFile(path, 'w') as zf:
        zf.writestr('FixedDocSeq.fdseq',
                    '<FixedDocumentSequence xmlns="%s">'
                    '<DocumentReference Source="/Documents/1/'
                    'FixedDoc.fdoc"/></FixedDocumentSequence>' % XPS_NS)
        zf.writestr('Documents/1/FixedDoc.fdoc',
                    '<FixedDocument xmlns="%s">'
                    '<PageContent Source="Pages/1.fpage"/>'
                    '<PageContent Source="Pages/2.fpage"/>'
                    '</FixedDocument>' % XPS_NS)
        zf.writestr('Documents/1/Pages/1.fpage', page1)
        zf.writestr('Documents/1/Pages/2.fpage', page2)


def test_xps_navigate_uri(tmp_path):
    src = str(tmp_path / 'doc.xps')
    _nav_xps(src)
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    r = PdfReader(out)
    assert r.page_count() == 2
    annots = _annots(r, 0)
    assert len(annots) == 2

    uri = [a for a in annots if 'A' in a][0]
    action = r.resolve(uri['A'])
    assert r.resolve(action['URI']) == b'http://example.org/page'
    x0, y0, x1, y1 = [float(r.resolve(v)) for v in uri['Rect']]
    # Glyphs baseline at (96, 192) XPS units -> (72, 1056-192 units) pt
    assert abs(x0 - 96 * 0.75) < 0.5
    assert y0 < (1056 - 192) * 0.75 < y1
    assert x1 > x0

    goto = [a for a in annots if 'Dest' in a][0]
    dest = r.resolve(goto['Dest'])
    assert dest[0].num == r.page_object_number(1)
    gx0, gy0, gx1, gy1 = [float(r.resolve(v)) for v in goto['Rect']]
    # path bbox 96..288 x 384..432 XPS units
    assert abs(gx0 - 96 * 0.75) < 0.5 and abs(gx1 - 288 * 0.75) < 0.5
    assert abs(gy1 - (1056 - 384) * 0.75) < 0.5


# --- declared TOC (nav / NCX) -> nested outline ----------------------

def _toc_epub(path, use_nav):
    nav = ('<?xml version="1.0"?><html xmlns="http://www.w3.org/1999'
           '/xhtml" xmlns:epub="http://www.idpf.org/2007/ops"><body>'
           '<nav epub:type="toc"><ol>'
           '<li><a href="c1.xhtml">Part One</a><ol>'
           '<li><a href="c1.xhtml">Chapter 1</a></li>'
           '<li><a href="c2.xhtml">Chapter 2</a></li></ol></li>'
           '<li><a href="c3.xhtml">Part Two</a></li>'
           '</ol></nav></body></html>')
    ncx = ('<?xml version="1.0"?><ncx xmlns="http://www.daisy.org/'
           'z3986/2005/ncx/" version="2005-1"><navMap>'
           '<navPoint id="n1"><navLabel><text>Part One</text>'
           '</navLabel><content src="c1.xhtml"/>'
           '<navPoint id="n2"><navLabel><text>Chapter 2</text>'
           '</navLabel><content src="c2.xhtml"/></navPoint>'
           '</navPoint>'
           '<navPoint id="n3"><navLabel><text>Part Two</text>'
           '</navLabel><content src="c3.xhtml"/></navPoint>'
           '</navMap></ncx>')
    items = ['<item id="c%d" href="c%d.xhtml" media-type='
             '"application/xhtml+xml"/>' % (i, i) for i in (1, 2, 3)]
    if use_nav:
        items.append('<item id="nav" href="nav.xhtml" properties='
                     '"nav" media-type="application/xhtml+xml"/>')
    else:
        items.append('<item id="ncx" href="toc.ncx" media-type='
                     '"application/x-dtbncx+xml"/>')
    opf = ('<?xml version="1.0"?><package xmlns="http://www.idpf.org'
           '/2007/opf" version="3.0"><metadata xmlns:dc="http://purl'
           '.org/dc/elements/1.1/"><dc:title>TOC Book</dc:title>'
           '</metadata><manifest>%s</manifest><spine>'
           '<itemref idref="c1"/><itemref idref="c2"/>'
           '<itemref idref="c3"/></spine></package>'
           % ''.join(items))
    with zipfile.ZipFile(path, 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', opf)
        if use_nav:
            zf.writestr('nav.xhtml', nav)
        else:
            zf.writestr('toc.ncx', ncx)
        for i in (1, 2, 3):
            zf.writestr('c%d.xhtml' % i,
                        '<html xmlns="http://www.w3.org/1999/xhtml">'
                        '<body><p>chapter %d body</p></body></html>'
                        % i)


def _outline_tree(r):
    cat = r.resolve(r.trailer['Root'])
    out = r.resolve(cat.get('Outlines'))

    def walk(ref):
        items = []
        while ref is not None:
            it = r.resolve(ref)
            title = it.get('Title')
            title = title.decode() if isinstance(title, bytes) \
                else str(title)
            dest = it.get('Dest')
            kids = walk(it.get('First')) if it.get('First') else []
            items.append((title, dest is not None, kids))
            ref = it.get('Next')
        return items

    return walk(out.get('First')), int(r.resolve(out['Count']))


@pytest.mark.parametrize('use_nav', [True, False])
def test_declared_toc_nested_outline(tmp_path, use_nav):
    """The book's declared TOC (EPUB 3 nav doc or EPUB 2 NCX) becomes
    the nested PDF outline — what the reference recovers via
    get_toc()/set_toc() (bin/epub-to-pdf:47-48) — instead of the
    flat first-heading fallback."""
    src = str(tmp_path / 't.epub')
    _toc_epub(src, use_nav)
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    r = PdfReader(out)
    tree, count = _outline_tree(r)
    if use_nav:
        assert [t for t, _d, _k in tree] == ['Part One', 'Part Two']
        assert [t for t, _d, _k in tree[0][2]] == \
            ['Chapter 1', 'Chapter 2']
        assert count == 4
    else:
        assert [t for t, _d, _k in tree] == ['Part One', 'Part Two']
        assert [t for t, _d, _k in tree[0][2]] == ['Chapter 2']
        assert count == 3
    # every emitted item carries a resolvable Dest
    def all_dests(items):
        for _t, has_dest, kids in items:
            assert has_dest
            all_dests(kids)
    all_dests(tree)
