"""XPS / CBZ input for epub-to-pdf (VERDICT r3 missing #1: the
reference converts XPS through the same PyMuPDF call as EPUB,
``bin/epub-to-pdf:44``).  Fixed pages must come out with text and
images positioned at their XPS coordinates (1/96 in -> pt)."""

import io
import re
import zipfile

import numpy as np
from PIL import Image

from archive_pdf_tools_tpu.cli.epub_to_pdf import main
from archive_pdf_tools_tpu.pdf.reader import PdfReader

XPS_NS = 'http://schemas.microsoft.com/xps/2005/06'


def _jpeg_bytes(w=80, h=60):
    img = Image.fromarray(
        (np.mgrid[0:h, 0:w][0] * 3).astype(np.uint8)).convert('RGB')
    buf = io.BytesIO()
    img.save(buf, format='JPEG')
    return buf.getvalue()


def _xps(path, ext_pages=()):
    fpage = '''<FixedPage xmlns="%s" Width="816" Height="1056"
  xml:lang="en-US">
 <Path Fill="#FFFF0000" Data="M 0,0 L 816,0 816,48 0,48 Z"/>
 <Glyphs OriginX="96" OriginY="192" FontRenderingEmSize="32"
   UnicodeString="Hello XPS" Fill="#FF000000" FontUri="/f.odttf"/>
 <Canvas RenderTransform="1,0,0,1,96,0">
  <Glyphs OriginX="0" OriginY="960" FontRenderingEmSize="16"
    UnicodeString="shifted" FontUri="/f.odttf"/>
 </Canvas>
 <Path Data="M 96,384 L 480,384 480,672 96,672 Z">
  <Path.Fill>
   <ImageBrush ImageSource="/Resources/art.jpg"
     Viewbox="0,0,80,60" ViewboxUnits="Absolute"
     Viewport="96,384,384,288" ViewportUnits="Absolute"/>
  </Path.Fill>
 </Path>
</FixedPage>''' % XPS_NS
    with zipfile.ZipFile(path, 'w') as zf:
        zf.writestr('FixedDocSeq.fdseq',
                    '<FixedDocumentSequence xmlns="%s">'
                    '<DocumentReference Source="/Documents/1/'
                    'FixedDoc.fdoc"/></FixedDocumentSequence>' % XPS_NS)
        pcs = ['<PageContent Source="Pages/1.fpage"/>']
        for i, _ in enumerate(ext_pages):
            pcs.append('<PageContent Source="Pages/x%d.fpage"/>' % i)
        zf.writestr('Documents/1/FixedDoc.fdoc',
                    '<FixedDocument xmlns="%s">%s</FixedDocument>'
                    % (XPS_NS, ''.join(pcs)))
        zf.writestr('Documents/1/Pages/1.fpage', fpage)
        for i, extra in enumerate(ext_pages):
            zf.writestr('Documents/1/Pages/x%d.fpage' % i, extra)
        zf.writestr('Resources/art.jpg', _jpeg_bytes())
        zf.writestr(
            'docProps/core.xml',
            '<cp:coreProperties xmlns:cp="http://schemas.openxml'
            'formats.org/package/2006/metadata/core-properties" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/">'
            '<dc:title>XPS Title</dc:title>'
            '<dc:creator>Auth</dc:creator></cp:coreProperties>')


def test_xps_positions(tmp_path):
    src = str(tmp_path / 'doc.xps')
    _xps(src)
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    r = PdfReader(out)
    assert r.page_count() == 1
    assert r.page_size(0) == (612.0, 792.0)     # 816x1056 at 72/96
    content = r.page_contents(0)
    # Glyphs: em 32 -> 24 pt at (96, 192) -> (72, 792 - 144)
    assert b'/F1 24 Tf 0 0 0 rg 72 648 Td (Hello XPS) Tj' in content
    # Canvas translate by 96 XPS units: x = (0+96)*0.75 = 72
    assert b'72 72 Td (shifted) Tj' in content
    # ImageBrush viewport 96,384 384x288 -> 288x216 pt at (72, 288)
    assert b'q 288 0 0 216 72 288 cm /Im0 Do Q' in content
    # solid red header band: axis-aligned rect at the page top
    assert b'1 0 0 rg 0 756 612 36 re f' in content
    # renders through the in-tree rasterizer
    from archive_pdf_tools_tpu.pdf.raster import Rasterizer
    a = Rasterizer(r).render_page(0)
    assert a.shape[0] > 0


def test_xps_docinfo(tmp_path):
    src = str(tmp_path / 'doc.xps')
    _xps(src)
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    info = PdfReader(out).info()
    title = info.get('Title')
    title = title.decode() if isinstance(title, bytes) else str(title)
    assert 'XPS Title' in title


def test_xps_multi_page_and_curved_path(tmp_path):
    # curves render as real bezier fills, not faked rectangles
    extra = ('<FixedPage xmlns="%s" Width="400" Height="400">'
             '<Path Fill="#FF00FF00" Data="M 0,0 C 10,10 20,20 30,0 Z"/>'
             '<Glyphs OriginX="10" OriginY="40" FontRenderingEmSize="12"'
             ' UnicodeString="p2"/></FixedPage>') % XPS_NS
    src = str(tmp_path / 'doc.oxps')
    _xps(src, ext_pages=[extra])
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    r = PdfReader(out)
    assert r.page_count() == 2
    assert r.page_size(1) == (300.0, 300.0)
    c2 = r.page_contents(1)
    assert b're f' not in c2          # no rectangle faking
    # M 0,0 -> (0, 300); C control points transformed (0.75 scale);
    # XPS default fill rule is even-odd
    assert re.search(rb'0 1 0 rg 0 300 m '
                     rb'7\.5 292\.5 15 285 22\.5 300 c h f\* Q', c2)
    assert b'(p2) Tj' in c2


def test_cbz(tmp_path):
    src = str(tmp_path / 'book.cbz')
    with zipfile.ZipFile(src, 'w') as zf:
        zf.writestr('p2.jpg', _jpeg_bytes(100, 150))
        zf.writestr('p1.jpg', _jpeg_bytes(80, 60))
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    r = PdfReader(out)
    assert r.page_count() == 2
    # sorted member order: p1 first
    assert r.page_size(0) == (60.0, 45.0)       # 80x60 px at 0.75
    assert r.page_size(1) == (75.0, 112.5)


# --- embedded XPS fonts (.odttf) -------------------------------------

def _odttf(data, guid):
    """ECMA-388 10.2.1.2 obfuscation (an involution: XOR the first 32
    bytes with the part-name GUID bytes in reverse order)."""
    key = bytes.fromhex(guid.replace('-', ''))
    head = bytes(b ^ key[15 - (i % 16)] for i, b in enumerate(data[:32]))
    return head + data[32:]


def _xps_with_font(path, font_member, font_bytes):
    fpage = ('<FixedPage xmlns="%s" Width="816" Height="1056">'
             '<Glyphs OriginX="96" OriginY="192" FontRenderingEmSize="32"'
             ' UnicodeString="Hello XPS" Fill="#FF000000" FontUri="/%s"/>'
             '</FixedPage>') % (XPS_NS, font_member)
    with zipfile.ZipFile(path, 'w') as zf:
        zf.writestr('FixedDocSeq.fdseq',
                    '<FixedDocumentSequence xmlns="%s">'
                    '<DocumentReference Source="/Documents/1/'
                    'FixedDoc.fdoc"/></FixedDocumentSequence>' % XPS_NS)
        zf.writestr('Documents/1/FixedDoc.fdoc',
                    '<FixedDocument xmlns="%s">'
                    '<PageContent Source="Pages/1.fpage"/>'
                    '</FixedDocument>' % XPS_NS)
        zf.writestr('Documents/1/Pages/1.fpage', fpage)
        zf.writestr(font_member, font_bytes)


def _dejavu():
    import matplotlib, os
    p = os.path.join(os.path.dirname(matplotlib.__file__), 'mpl-data',
                     'fonts', 'ttf', 'DejaVuSans.ttf')
    with open(p, 'rb') as fp:
        return fp.read()


def test_xps_embedded_odttf(tmp_path):
    """A GUID-named .odttf part embeds as a Type0 font: the stream is
    de-obfuscated (FontFile2 equals the clear sfnt), the Glyphs run
    uses the embedded face (hex strings, not the F1 fallback), and
    text extraction recovers the words through ToUnicode."""
    import re as _re
    data = _dejavu()
    guid = '1bd118ab-4137-4a33-a7e1-30e8b9e5c9f4'
    member = 'Resources/%s.odttf' % guid
    src = str(tmp_path / 'doc.xps')
    _xps_with_font(src, member, _odttf(data, guid))
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    r = PdfReader(out)
    c = r.page_contents(0)
    assert _re.search(rb'/F8 24 Tf', c)
    assert b'(Hello XPS)' not in c          # hex-encoded, not literal
    page = r.pages()[0]
    fonts = r.resolve(r.resolve(page['Resources'])['Font'])
    t0 = r.resolve(fonts['F8'])
    assert str(r.resolve(t0.get('Subtype'))) == 'Type0'
    desc = r.resolve(r.resolve(t0['DescendantFonts'])[0])
    fd = r.resolve(desc['FontDescriptor'])
    assert r.resolve(fd['FontFile2']).decoded() == data
    from archive_pdf_tools_tpu.pdf.textextract import (
        extract_page_glyphs, group_words)
    glyphs, _w, _h = extract_page_glyphs(r, 0)
    words = [w[0] for w in group_words(glyphs)]
    assert 'Hello' in words and 'XPS' in words


def test_xps_plain_ttf_fonturi(tmp_path):
    """A FontUri naming a clear .ttf (no GUID, no obfuscation) embeds
    as-is."""
    data = _dejavu()
    src = str(tmp_path / 'doc.xps')
    _xps_with_font(src, 'Resources/body.ttf', data)
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    r = PdfReader(out)
    assert b'/F8 24 Tf' in r.page_contents(0)
    page = r.pages()[0]
    fonts = r.resolve(r.resolve(page['Resources'])['Font'])
    desc = r.resolve(r.resolve(
        r.resolve(fonts['F8'])['DescendantFonts'])[0])
    fd = r.resolve(desc['FontDescriptor'])
    assert r.resolve(fd['FontFile2']).decoded() == data


def test_xps_glyph_indices(tmp_path):
    """Glyphs ``Indices`` overrides: explicit glyph ids + advances
    (1/100 em) render as a TJ array with pen corrections, link-rect
    widths use the XPS advances, cluster maps consume their chars and
    glyph-only runs (no UnicodeString) still render."""
    from archive_pdf_tools_tpu.pdf.embedfont import EmbeddedTTF
    import re as _re
    data = _dejavu()
    probe = EmbeddedTTF(data)
    g_a, g_b = probe.gid_of('A'), probe.gid_of('B')
    nat_a = probe.gid_adv(g_a)            # em fraction
    member = 'Resources/body.ttf'
    # A at a forced 200/100 em advance, B default; plus a glyphs-only
    # run naming raw gids with no UnicodeString
    fpage = ('<FixedPage xmlns="%s" Width="816" Height="1056">'
             '<Glyphs OriginX="96" OriginY="192" FontRenderingEmSize="32"'
             ' UnicodeString="AB" Indices="%d,200;%d" Fill="#FF000000"'
             ' FontUri="/%s"/>'
             '<Glyphs OriginX="96" OriginY="400"'
             ' FontRenderingEmSize="16" Indices="%d;%d" FontUri="/%s"/>'
             '</FixedPage>') % (XPS_NS, g_a, g_b, member,
                                g_a, g_b, member)
    src = str(tmp_path / 'doc.xps')
    with zipfile.ZipFile(src, 'w') as zf:
        zf.writestr('FixedDocSeq.fdseq',
                    '<FixedDocumentSequence xmlns="%s">'
                    '<DocumentReference Source="/Documents/1/'
                    'FixedDoc.fdoc"/></FixedDocumentSequence>' % XPS_NS)
        zf.writestr('Documents/1/FixedDoc.fdoc',
                    '<FixedDocument xmlns="%s">'
                    '<PageContent Source="Pages/1.fpage"/>'
                    '</FixedDocument>' % XPS_NS)
        zf.writestr('Documents/1/Pages/1.fpage', fpage)
        zf.writestr(member, data)
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    from archive_pdf_tools_tpu.pdf.reader import PdfReader
    r = PdfReader(out)
    c = r.page_contents(0)
    # run 1: TJ array with A's gid, a pen correction of
    # (nat - 2.0) * 1000 em-milliunits, then B's gid
    m = _re.search(rb'\[<%04x> (-?[\d.]+) <%04x>\] TJ'
                   % (g_a, g_b), c)
    assert m, c[:600]
    assert abs(float(m.group(1)) - (nat_a - 2.0) * 1000) < 0.5
    # glyphs-only run renders a TJ/Tj with both gids too
    assert c.count(b'%04x' % g_a) >= 2
    # extraction still sees the AB text (ToUnicode from the uv pairs)
    from archive_pdf_tools_tpu.pdf.textextract import (
        extract_page_glyphs, group_words)
    glyphs, _w, _h = extract_page_glyphs(r, 0)
    words = [w[0] for w in group_words(glyphs)]
    assert 'AB' in words, words


def test_xps_indices_cluster_and_uoffset(tmp_path):
    """A (2:1) cluster consumes two chars for one glyph; uOffset
    shifts the glyph without moving the pen."""
    from archive_pdf_tools_tpu.pdf.embedfont import EmbeddedTTF
    import re as _re
    data = _dejavu()
    probe = EmbeddedTTF(data)
    g_f, g_x = probe.gid_of('f'), probe.gid_of('x')
    nat_f = probe.gid_adv(g_f)
    member = 'Resources/body.ttf'
    fpage = ('<FixedPage xmlns="%s" Width="816" Height="1056">'
             '<Glyphs OriginX="96" OriginY="192"'
             ' FontRenderingEmSize="20" UnicodeString="fix"'
             ' Indices="(2:1)%d;%d,,25" Fill="#FF000000"'
             ' FontUri="/%s"/>'
             '</FixedPage>') % (XPS_NS, g_f, g_x, member)
    src = str(tmp_path / 'doc.xps')
    with zipfile.ZipFile(src, 'w') as zf:
        zf.writestr('FixedDocSeq.fdseq',
                    '<FixedDocumentSequence xmlns="%s">'
                    '<DocumentReference Source="/Documents/1/'
                    'FixedDoc.fdoc"/></FixedDocumentSequence>' % XPS_NS)
        zf.writestr('Documents/1/FixedDoc.fdoc',
                    '<FixedDocument xmlns="%s">'
                    '<PageContent Source="Pages/1.fpage"/>'
                    '</FixedDocument>' % XPS_NS)
        zf.writestr('Documents/1/Pages/1.fpage', fpage)
        zf.writestr(member, data)
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    from archive_pdf_tools_tpu.pdf.reader import PdfReader
    c = PdfReader(out).page_contents(0)
    # uOffset 25/100 em on x: a -250 pre-adjustment before its gid
    m = _re.search(rb'\[<%04x> (-?[\d.]+) <%04x>\] TJ'
                   % (g_f, g_x), c)
    assert m, c[:600]
    assert abs(float(m.group(1)) - (-250.0)) < 0.5


def test_xps_arc_and_stroke(tmp_path):
    """Elliptical arcs convert to beziers; stroked paths emit RG/w/S;
    fill+stroke paints with B; F1 selects the nonzero rule."""
    extra = ('<FixedPage xmlns="%s" Width="400" Height="400">'
             '<Path Stroke="#FF0000FF" StrokeThickness="4"'
             ' Data="M 100,100 A 50,50 0 0 1 200,100"/>'
             '<Path Fill="#FFFF0000" Stroke="#FF000000"'
             ' Data="F1 M 20,20 L 60,20 60,60 20,60 Z"/>'
             '</FixedPage>') % XPS_NS
    src = str(tmp_path / 'a.xps')
    _xps(src, ext_pages=[extra])
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    c = PdfReader(out).page_contents(1)
    # stroke-only arc: blue RG, 3 pt width (4 XPS units), bezier ops,
    # painted S
    m = re.search(rb'q 0 0 1 RG 3 w 75 225 m ((?:[\d. -]+ c ?)+) S Q',
                  c)
    assert m, c[:800]
    # the arc lands on its endpoint (150, 225) in page space
    assert b'150 225 c' in m.group(1)
    # fill+stroke square: B with the nonzero rule (F1)
    assert re.search(rb'q 1 0 0 rg 0 0 0 RG 0\.75 w 15 285 m .* h B Q',
                     c)
    # rasterizer draws it without error
    from archive_pdf_tools_tpu.pdf.raster import Rasterizer
    a = Rasterizer(PdfReader(out)).render_page(1)
    assert (a < 128).any()


def test_xps_verbose_path_geometry(tmp_path):
    """The verbose <Path.Data>/<PathGeometry> form renders through
    the same translator (Figures attribute and PathFigure/segment
    children both)."""
    extra = ('<FixedPage xmlns="%s" Width="400" Height="400">'
             '<Path Fill="#FF00FF00"><Path.Data>'
             '<PathGeometry Figures="M 20,20 L 60,20 60,60 Z"/>'
             '</Path.Data></Path>'
             '<Path Fill="#FFFF0000"><Path.Data><PathGeometry'
             ' FillRule="NonZero">'
             '<PathFigure StartPoint="100,100" IsClosed="true">'
             '<PolyLineSegment Points="140,100 140,140"/>'
             '<PolyBezierSegment Points="150,150 160,160 170,140"/>'
             '</PathFigure></PathGeometry></Path.Data></Path>'
             '</FixedPage>') % XPS_NS
    src = str(tmp_path / 'v.xps')
    _xps(src, ext_pages=[extra])
    out = str(tmp_path / 'out.pdf')
    assert main([src, out]) == 0
    c = PdfReader(out).page_contents(1)
    # Figures attribute triangle: even-odd fill
    assert re.search(rb'q 0 1 0 rg 15 285 m 45 285 l 45 255 l h f\* Q',
                     c)
    # verbose figure: nonzero fill with the bezier and closed path
    assert re.search(rb'q 1 0 0 rg 75 225 m 105 225 l 105 195 l '
                     rb'[\d. ]+ c h f Q', c)


def test_path_parser_robustness():
    """Garbage and overflowed geometry degrades to None (never
    crashes, never leaks inf/nan into content ops) — the degradation
    contract extended to the path translator."""
    import random
    from archive_pdf_tools_tpu.cli.epub_to_pdf import (
        _xps_path_pdf_ops, _xps_indices, _svg_transform)
    ident = lambda x, y: (x, y)
    for s in ('M 1e309,0 L 5,5', 'A 1e308,1,0,0,1,5,5',
              'M 0,0 C 1e310,0 0,0 1,1', 'M nan,0 L 1,1'):
        r = _xps_path_pdf_ops(s, ident)
        assert r is None or (b'inf' not in r[0] and
                             b'nan' not in r[0]), (s, r)
    rng = random.Random(7)
    alphabet = 'MLHVCQAZSTmlhvcqazst0123456789.,- ()%#;:eE'
    for _ in range(1500):
        s = ''.join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 50)))
        r = _xps_path_pdf_ops(s, ident)       # must never raise
        if r is not None:
            assert b'inf' not in r[0] and b'nan' not in r[0]
        _xps_indices(s)
        _svg_transform(s)
