"""Reflow layout subset depth: inline bold/italic runs, list markers
and indents, blockquote indent, <pre> line preservation, and table
grid layout (VERDICT r4 missing #2 — extend the subset where cheap).

The reference gets these via PyMuPDF's full HTML engine
(``/root/reference/bin/epub-to-pdf:44``); ours implements them in the
flow renderer: styled runs are char ranges measured with their own
core-AFM face, tables lay out as equal-width columns sharing a
baseline grid.
"""

import re
import zipfile

import pytest

from archive_pdf_tools_tpu.cli.epub_to_pdf import main, MARGIN
from archive_pdf_tools_tpu.pdf.reader import PdfReader

CONTAINER = '''<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container"
 version="1.0"><rootfiles><rootfile full-path="content.opf"
 media-type="application/oebps-package+xml"/></rootfiles></container>'''


def _epub(path, body):
    with zipfile.ZipFile(path, 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>Layout</dc:title></metadata>
 <manifest><item id="c1" href="c1.xhtml"
  media-type="application/xhtml+xml"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
        zf.writestr('c1.xhtml',
                    '<?xml version="1.0"?>\n<html xmlns='
                    '"http://www.w3.org/1999/xhtml"><body>%s'
                    '</body></html>' % body)


def _content(out):
    r = PdfReader(out)
    return b'\n'.join(r.page_contents(i) for i in range(r.page_count()))


def test_inline_styles(tmp_path):
    epub = str(tmp_path / 's.epub')
    _epub(epub, '<p>Plain then <b>BOLDRUN</b> and <em>ITALRUN</em> '
                'and <strong><em>BOTHRUN</em></strong> end.</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    # each styled run renders as its own Tf-switched segment
    assert re.search(rb'/F3 10 Tf \((?:[^)]* )?BOLDRUN', c)
    assert re.search(rb'/F4 10 Tf \((?:[^)]* )?ITALRUN', c)
    assert re.search(rb'/F5 10 Tf \((?:[^)]* )?BOTHRUN', c)
    # surrounding text stays roman and in document order
    order = [c.find(t) for t in
             (b'Plain then', b'BOLDRUN', b'ITALRUN', b'BOTHRUN',
              b'end.')]
    assert all(p >= 0 for p in order) and order == sorted(order)
    # the standard-14 styled faces are declared in resources
    r = PdfReader(out)
    fonts = r.resolve(r.resolve(r.pages()[0]['Resources'])['Font'])
    bold = r.resolve(fonts['F3'])
    assert str(r.resolve(bold['BaseFont'])) == 'Times-Bold'


def test_styled_link_rect_uses_styled_advances(tmp_path):
    epub = str(tmp_path / 'sl.epub')
    _epub(epub, '<p><b>WWWWWWWWWW</b> <a href="https://x.test/">go'
                '</a></p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    page = r.pages()[0]
    annots = [r.resolve(a) for a in r.resolve(page['Annots'])]
    assert len(annots) == 1
    x0 = float(r.resolve(annots[0]['Rect'][0]))
    # ten bold 'W' (944/1000 em at 10 pt) + space precede the anchor:
    # the rect must start past their BOLD width (the roman W is 9.44 ->
    # roman-measured x0 would be ~0.9 pt/char short)
    assert x0 > MARGIN + 10 * 9.44


def test_lists_markers_and_indent(tmp_path):
    epub = str(tmp_path / 'l.epub')
    _epub(epub, '<ul><li>first item</li><li>second item</li></ul>'
                '<ol><li>alpha</li><li>beta</li></ol>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    assert b'\x95 first item' in c          # cp1252 bullet
    assert b'\x95 second item' in c
    assert b'(1. alpha)' in c and b'(2. beta)' in c
    # li blocks render at MARGIN + 16
    xs = [float(m.group(1)) for m in
          re.finditer(rb'BT /F1 10 Tf ([\d.]+) ([\d.]+) Td', c)]
    assert (MARGIN + 16.0) in xs
    # consecutive items are single-spaced: adjacent ' lines in ONE
    # text run, no blank separator between them
    assert b"(\x95 first item) '\n(\x95 second item) '" in c


def test_blockquote_indent_and_pre(tmp_path):
    epub = str(tmp_path / 'q.epub')
    _epub(epub, '<blockquote>QUOTEBLOCK text</blockquote>'
                '<pre>codeline one\n  codeline two</pre>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    m = re.search(rb'BT /F1 10 Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n'
                  rb'\(QUOTEBLOCK', c)
    assert m and abs(float(m.group(1)) - (MARGIN + 24.0)) < 0.01
    # <pre> renders monospace with the newline preserved as two lines
    assert re.search(rb'/F6 9 Tf.*\(codeline one\)', c, re.S)
    assert b'(  codeline two)' in c
    i1, i2 = c.find(b'(codeline one)'), c.find(b'(  codeline two)')
    assert 0 <= i1 < i2


def test_table_grid_layout(tmp_path):
    epub = str(tmp_path / 't.epub')
    _epub(epub, '<table><tr><th>Name</th><th>Qty</th></tr>'
                '<tr><td>apples</td><td>12</td></tr>'
                '<tr><td>pears</td>'
                '<td><a href="https://x.test/p">7</a></td></tr>'
                '</table>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    cells = {}
    for m in re.finditer(
            rb'BT /F1 10 Tf ([\d.]+) ([\d.]+) Td [\d.]+ TL',
            c):
        tail = c[m.end():m.end() + 120]
        mm = re.search(rb'\(([^)]+)\)|Tf \(([^)]+)\)', tail)
        if mm:
            cells[(mm.group(1) or mm.group(2))] = (
                float(m.group(1)), float(m.group(2)))
    # grid: row cells share y, columns share x
    assert cells[b'apples'][1] == cells[b'12'][1]
    assert cells[b'pears'][1] == cells[b'7'][1]
    assert cells[b'apples'][0] == cells[b'pears'][0] == MARGIN
    assert cells[b'12'][0] == cells[b'7'][0] > MARGIN + 100
    # header cells render bold, with a rule under the header row
    assert re.search(rb'/F3 10 Tf \(Name\)', c)
    assert re.search(rb'q 0\.5 w [\d.]+ [\d.]+ m [\d.]+ [\d.]+ l S Q',
                     c)
    # the link annotation lands inside the second column
    r = PdfReader(out)
    annots = [r.resolve(a) for a in
              r.resolve(r.pages()[0].get('Annots'))]
    assert len(annots) == 1
    x0 = float(r.resolve(annots[0]['Rect'][0]))
    assert abs(x0 - cells[b'7'][0]) < 0.01


def test_table_cells_survive_in_order(tmp_path):
    """Degradation-contract extension: grid layout preserves document
    order in the content stream (row-major, left to right)."""
    epub = str(tmp_path / 'o.epub')
    _epub(epub, '<p>BEFORE</p><table>'
                '<tr><td>AA1</td><td>BB1</td></tr>'
                '<tr><td>CC2</td><td>DD2</td></tr></table>'
                '<p>AFTER</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    pos = [c.find(t) for t in
           (b'BEFORE', b'AA1', b'BB1', b'CC2', b'DD2', b'AFTER')]
    assert all(p >= 0 for p in pos) and pos == sorted(pos)


def _epub_with_image(path, body):
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.new('RGB', (200, 150), (200, 30, 30)).save(buf, 'JPEG')
    with zipfile.ZipFile(path, 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>F</dc:title></metadata>
 <manifest><item id="c1" href="c1.xhtml"
  media-type="application/xhtml+xml"/>
 <item id="i1" href="fig.jpg" media-type="image/jpeg"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
        zf.writestr('fig.jpg', buf.getvalue())
        zf.writestr('c1.xhtml',
                    '<?xml version="1.0"?>\n<html xmlns='
                    '"http://www.w3.org/1999/xhtml"><body>%s'
                    '</body></html>' % body)


def _image_placements(c):
    return [(float(m.group(3)), float(m.group(4)), float(m.group(1)),
             float(m.group(2)))
            for m in re.finditer(
                rb'q ([\d.]+) 0 0 ([\d.]+) ([\d.]+) ([\d.]+) cm '
                rb'/Im\d+ Do Q', c)]


def test_float_right_image_wraps_text(tmp_path):
    """float:right images keep their margin position while the
    following paragraph wraps beside them, then re-flows full-width
    below (two-phase wrap)."""
    from archive_pdf_tools_tpu.cli.epub_to_pdf import COL_W
    epub = str(tmp_path / 'fr.epub')
    words = ' '.join('w%03d' % i for i in range(160))
    _epub_with_image(epub, '<img src="fig.jpg" style="float:right"/>'
                           '<p>%s</p>' % words)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    (x, _y, w, _h), = _image_placements(c)
    assert abs((x + w) - (MARGIN + COL_W)) < 1.0      # right edge
    lines = re.findall(rb"\((.*?)\) '", c)
    body = [ln for ln in lines if re.match(rb'^w\d{3}', ln)]
    # narrow head lines beside the image, wider tail lines below it
    assert len(body[0]) < 0.75 * len(body[-1]), body
    # all words survive
    joined = b' '.join(lines)
    assert b'w000' in joined and b'w159' in joined


def test_float_left_image_indents_text(tmp_path):
    epub = str(tmp_path / 'fl.epub')
    words = ' '.join('v%03d' % i for i in range(160))
    _epub_with_image(epub, '<img src="fig.jpg" class="fig"/>'
                           '<p>%s</p>' % words)
    # float via a document stylesheet class rule (not inline style)
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.new('RGB', (200, 150), (60, 60, 200)).save(buf, 'JPEG')
    with zipfile.ZipFile(epub, 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>F</dc:title></metadata>
 <manifest><item id="c1" href="c1.xhtml"
  media-type="application/xhtml+xml"/>
 <item id="i1" href="fig.jpg" media-type="image/jpeg"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
        zf.writestr('fig.jpg', buf.getvalue())
        zf.writestr('c1.xhtml',
                    '<?xml version="1.0"?>\n<html xmlns='
                    '"http://www.w3.org/1999/xhtml"><head><style>'
                    '.fig { float: left; }</style></head><body>'
                    '<img src="fig.jpg" class="fig"/><p>%s</p>'
                    '</body></html>' % words)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    (x, _y, w, _h), = _image_placements(c)
    assert abs(x - MARGIN) < 0.01                     # left edge
    # the narrow head lines start past the image, the tail at MARGIN
    xs = [float(m.group(1)) for m in
          re.finditer(rb'BT /F1 10 Tf ([\d.]+) ([\d.]+) Td', c)]
    assert any(abs(v - (MARGIN + w + 10.0)) < 0.01 for v in xs)
    assert any(abs(v - MARGIN) < 0.01 for v in xs)


def test_float_without_following_text_degrades(tmp_path):
    """A floated image with no text block after it renders as a plain
    flow image (no content is lost)."""
    epub = str(tmp_path / 'fd.epub')
    _epub_with_image(epub, '<p>ONLY paragraph.</p>'
                           '<img src="fig.jpg" style="float:right"/>'
                           '<h2>HEADING after</h2>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    assert len(_image_placements(c)) == 1
    assert b'HEADING after' in c


def test_bare_container_text_and_h5_h6(tmp_path):
    """Text directly inside <div>/<section> (no <p>), h5/h6 headings
    and tails after nested blocks must all survive — real-world EPUBs
    carry bare-div paragraphs constantly (was silently dropped)."""
    epub = str(tmp_path / 'bd.epub')
    _epub(epub, '<div>BAREDIV text</div><h5>H5HEAD</h5>'
                '<h6>H6HEAD</h6>'
                '<div>intro INTEXT<p>NESTEDP</p>TAILTEXT</div>'
                '<section>SECTIONTEXT</section>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    for t in (b'BAREDIV', b'H5HEAD', b'H6HEAD', b'INTEXT',
              b'NESTEDP', b'TAILTEXT', b'SECTIONTEXT'):
        assert t in c, t
    assert c.count(b'NESTEDP') == 1     # no double extraction
    # h5/h6 render as headings (Helvetica-Bold F2)
    assert re.search(rb'/F2 14 Tf.*\(H5HEAD\)', c, re.S)


def test_br_line_breaks(tmp_path):
    """<br/> becomes a hard line break (was: words glued together)."""
    epub = str(tmp_path / 'br.epub')
    _epub(epub, '<p>line one<br/>line two</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    assert b'oneline' not in c
    assert b"(line one) '" in c and b"(line two) '" in c


@pytest.mark.parametrize('case', ['no_mimetype', 'missing_spine_doc',
                                  'broken_xml'])
def test_malformed_epub_never_crashes(tmp_path, case):
    """Degradation contract at the container level: a missing
    mimetype, a spine itemref whose document is absent, or
    non-well-formed XHTML must still produce a PDF (blank page /
    HTML-parser recovery), exit 0."""
    epub = str(tmp_path / (case + '.epub'))
    cont = ('<container xmlns="urn:oasis:names:tc:opendocument:'
            'xmlns:container"><rootfiles><rootfile full-path="c.opf"'
            '/></rootfiles></container>')
    with zipfile.ZipFile(epub, 'w') as zf:
        zf.writestr('META-INF/container.xml', cont)
        if case == 'no_mimetype':
            zf.writestr('c.opf', '<package xmlns="http://www.idpf.org'
                        '/2007/opf"><spine><itemref idref="x"/>'
                        '</spine></package>')
        elif case == 'missing_spine_doc':
            zf.writestr('c.opf', '<package xmlns="http://www.idpf.org'
                        '/2007/opf"><manifest><item id="g" '
                        'href="gone.xhtml"/></manifest>'
                        '<spine><itemref idref="g"/></spine></package>')
        else:
            zf.writestr('c.opf', '<package xmlns="http://www.idpf.org'
                        '/2007/opf"><manifest><item id="g" '
                        'href="bad.xhtml" media-type="application/'
                        'xhtml+xml"/></manifest>'
                        '<spine><itemref idref="g"/></spine></package>')
            zf.writestr('bad.xhtml', '<html><body><p>RECOVERED text')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    assert r.page_count() >= 1
    if case == 'broken_xml':
        assert b'RECOVERED' in r.page_contents(0)


def _td_x(content, needle):
    """The Td x of the BT block whose text contains `needle`."""
    for chunk in content.split(b'BT')[1:]:
        if needle in chunk:
            m = re.search(rb'/F\d [\d.]+ Tf ([\d.-]+) [\d.-]+ Td',
                          chunk)
            if m:
                return float(m.group(1))
    return None


def test_text_align_center_and_right(tmp_path):
    """text-align: center/right (style, align= attribute, <center>)
    shift each line within the column; left stays at the margin."""
    epub = str(tmp_path / 'al.epub')
    _epub(epub, '<h1 style="text-align:center">CENTERTITLE</h1>'
                '<p align="right">RIGHTLINE</p>'
                '<center><p>OLDCENTER</p></center>'
                '<p>LEFTLINE</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    x_center = _td_x(c, b'CENTERTITLE')
    x_right = _td_x(c, b'RIGHTLINE')
    x_old = _td_x(c, b'OLDCENTER')
    x_left = _td_x(c, b'LEFTLINE')
    assert x_left == MARGIN
    # centered short lines sit strictly inside the column, left of
    # the column midpoint (x + w/2 == margin + COL_W/2)
    assert MARGIN + 60 < x_center < MARGIN + 504 / 2
    assert MARGIN + 60 < x_old < MARGIN + 504 / 2
    # right-aligned: x = margin + COL_W - w, far right for short text
    assert x_right > MARGIN + 350


def test_text_indent_first_line(tmp_path):
    """CSS text-indent (em units) indents only the FIRST line of the
    paragraph; continuation lines return to the margin."""
    epub = str(tmp_path / 'ti.epub')
    words = ' '.join('word%02d' % i for i in range(40))
    _epub(epub, '<p style="text-indent:2em">%s</p>' % words)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    # 2em = 32 css px = 24 pt
    assert _td_x(c, b'word00') == MARGIN + 24.0
    assert _td_x(c, b'word20') == MARGIN
    # every word survives the two-phase wrap
    for i in range(40):
        assert (b'word%02d' % i) in c


def test_table_colspan(tmp_path):
    """A colspan-N cell owns N grid columns: the spanning header lays
    out at full table width while the data row splits into columns."""
    epub = str(tmp_path / 'cs.epub')
    _epub(epub, '<table><tr><th colspan="2">WIDE SPANNING HEADER '
                'CELL OVER BOTH COLUMNS STAYS ON ONE LINE</th></tr>'
                '<tr><td>LEFTCELL</td><td>RIGHTCELL</td></tr>'
                '</table>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    # data columns: cw = (COL_W - 6)/2 = 249, second cell at +255
    assert _td_x(c, b'LEFTCELL') == MARGIN
    assert _td_x(c, b'RIGHTCELL') == MARGIN + 255.0
    # the spanning cell wraps at 504 pt, not 249: the whole header
    # renders as ONE text segment (it would split at one column wide)
    assert re.search(rb'\(WIDE SPANNING HEADER CELL OVER BOTH '
                     rb'COLUMNS STAYS ON ONE LINE\)', c)


# --- block margins, nested lists, hr, forced page breaks -------------

def test_block_margins(tmp_path):
    """CSS margin-left/right (+ padding) indent the block and narrow
    the wrap; the clamp keeps at least 72 pt of column."""
    epub = str(tmp_path / 'm.epub')
    _epub(epub, '<p>ref paragraph</p>'
                '<p style="margin-left: 48px">MLBLOCK text here</p>'
                '<p style="margin: 0 32px">SHBLOCK shorthand</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    # 48 px = 36 pt -> text starts at MARGIN+36
    m = re.search(rb'BT /F1 10 Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n'
                  rb'\(MLBLOCK', c)
    assert m and float(m.group(1)) == MARGIN + 36.0
    # shorthand 'margin: 0 32px' -> left 24 pt
    m = re.search(rb'BT /F1 10 Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n'
                  rb'\(SHBLOCK', c)
    assert m and float(m.group(1)) == MARGIN + 24.0
    # the unstyled paragraph stays at the margin
    m = re.search(rb'BT /F1 10 Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n'
                  rb'\(ref paragraph', c)
    assert m and float(m.group(1)) == MARGIN


def test_margin_narrows_wrap(tmp_path):
    """A wide right margin forces earlier wraps than the full column."""
    words = ' '.join('wordy%02d' % i for i in range(40))
    epub = str(tmp_path / 'w.epub')
    _epub(epub, '<p>%s</p><p style="margin-right: 200pt">%s</p>'
          % (words, words))
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    # the margined copy needs strictly more lines for the same words:
    # group consecutive text lines into paragraphs at blank separators
    paras, cur = [], 0
    for ln in c.split(b'\n'):
        if ln.startswith(b'('):
            if ln.startswith(b'()'):
                if cur:
                    paras.append(cur)
                cur = 0
            else:
                cur += 1
    if cur:
        paras.append(cur)
    assert len(paras) == 2 and paras[1] > paras[0]


def test_nested_list_items(tmp_path):
    """Nested <ul>/<ol> items get their own lines, indented one step
    (16 pt) deeper per level; the outer item's text stops at the
    nested list (no double-collection)."""
    epub = str(tmp_path / 'n.epub')
    _epub(epub, '<ul><li>OUTERITEM'
                '<ol><li>INNERONE</li><li>INNERTWO</li></ol>'
                'tailtext</li><li>SECONDOUTER</li></ul>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    # outer at the li indent, inner one step deeper
    mo = re.search(rb'BT /F1 10 Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n'
                   rb'\(\xe2\x80\xa2 OUTERITEM', c)
    # cp1252 bullet byte is \x95
    mo = mo or re.search(rb'Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n'
                         rb'\(\x95 OUTERITEM', c)
    assert mo and float(mo.group(1)) == MARGIN + 16.0
    mi = re.search(rb'Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n'
                   rb'\(1. INNERONE', c)
    assert mi and float(mi.group(1)) == MARGIN + 32.0
    # inner items are NOT flattened into the outer item's line
    assert not re.search(rb'OUTERITEM[^\n]*INNERONE', c)
    # ordered markers number inner items independently
    assert b'(2. INNERTWO' in c
    # document order survives
    order = [c.find(t) for t in (b'OUTERITEM', b'INNERONE',
                                 b'INNERTWO', b'SECONDOUTER')]
    assert all(p >= 0 for p in order) and order == sorted(order)


def test_hr_rule(tmp_path):
    epub = str(tmp_path / 'h.epub')
    _epub(epub, '<p>above</p><hr/><p>below</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    m = re.search(rb'q 0.5 w ([\d.]+) ([\d.]+) m ([\d.]+) [\d.]+ l '
                  rb'S Q', c)
    assert m, 'no rule drawn'
    assert float(m.group(1)) == MARGIN
    # the rule sits between the two paragraphs' baselines
    ya = float(re.search(rb'Tf [\d.]+ ([\d.]+) Td [\d.]+ TL\n\(above',
                         c).group(1))
    yb = float(re.search(rb'Tf [\d.]+ ([\d.]+) Td [\d.]+ TL\n\(below',
                         c).group(1))
    assert yb < float(m.group(2)) < ya


def test_forced_page_breaks(tmp_path):
    """page-break-before on a chapter div and page-break-after on a
    block both force page boundaries (CSS 2 and CSS 3 spellings)."""
    epub = str(tmp_path / 'p.epub')
    _epub(epub, '<p>pageone text</p>'
                '<div style="page-break-before: always">'
                '<p>pagetwo text</p></div>'
                '<p style="break-after: page">still pagetwo</p>'
                '<p>pagethree text</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    assert r.page_count() == 3
    assert b'pageone' in r.page_contents(0)
    p2 = r.page_contents(1)
    assert b'pagetwo' in p2 and b'still pagetwo' in p2
    assert b'pageone' not in p2
    assert b'pagethree' in r.page_contents(2)


def test_block_text_color(tmp_path):
    """CSS color on a block (or inherited from a wrapper) renders the
    text in that fill color, scoped with q/Q so following content goes
    back to black."""
    epub = str(tmp_path / 'c.epub')
    _epub(epub, '<p style="color: #800000">DARKRED text</p>'
                '<div style="color: rgb(0, 128, 0)">'
                '<p>INHERITED green</p></div>'
                '<p>plain black after</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    m = re.search(rb'q ([\d.]+) 0 0 rg\nBT[^\x00]*?DARKRED', c)
    assert m and abs(float(m.group(1)) - 128 / 255.0) < 1e-3
    assert re.search(rb'q 0 ([\d.]+) 0 rg\nBT[^\x00]*?INHERITED', c)
    # the black paragraph is NOT inside a colored q scope
    m = re.search(rb'\(plain black after', c)
    assert m
    pre = c[:m.start()]
    assert pre.rfind(b' rg\nBT') < pre.rfind(b'Q\n')


def test_link_text_blue_underlined(tmp_path):
    """Anchors render in the conventional link blue with an underline
    rule (matching browser/PyMuPDF default HTML styling), and the
    annotation still carries the URI."""
    epub = str(tmp_path / 'l.epub')
    _epub(epub, '<p>go to <a href="https://example.com/x">THE SITE'
                '</a> now</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    # blue fill around the anchor segment, black restored after
    m = re.search(rb'0 0 0.8 rg\n/F1 10 Tf \(THE SITE\) Tj\n'
                  rb'0 0 0 rg', c)
    assert m, c[:800]
    # an underline stroke in link blue
    assert re.search(rb'q 0 0 0.8 RG 0.4 w [\d.]+ [\d.]+ m '
                     rb'[\d.]+ [\d.]+ l S Q', c)
    r = PdfReader(out)
    a = r.resolve(r.resolve(r.pages()[0]['Annots'])[0])
    assert r.resolve(r.resolve(a['A'])['URI']) == \
        b'https://example.com/x'


def test_link_in_bold_run_keeps_face_and_blue(tmp_path):
    epub = str(tmp_path / 'lb.epub')
    _epub(epub, '<p><b>bold <a href="https://e.org/">BLINK</a> tail'
                '</b></p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    # the linked segment keeps the bold face AND gets the link color
    assert re.search(rb'0 0 0.8 rg\n/F3 10 Tf \(BLINK\) Tj', c)


def test_sup_sub_runs(tmp_path):
    """<sup>/<sub> render smaller with a Ts baseline shift (footnote
    markers), and advances account for the reduced size."""
    epub = str(tmp_path / 'ss.epub')
    _epub(epub, '<p>energy E = mc<sup>2</sup> and H<sub>2</sub>O '
                'plus a note<sup><a href="#fn1">17</a></sup> end</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    # sup: raised, 6.5 pt; sub: lowered
    assert re.search(rb'3\.3 Ts\n/F1 6\.5 Tf \(2\) Tj\n0 Ts', c)
    assert re.search(rb'-1\.5 Ts\n/F1 6\.5 Tf \(2\) Tj\n0 Ts', c)
    # footnote-style linked sup keeps the shift (internal # anchor is
    # dropped as a link spec but the text must survive)
    assert re.search(rb'3\.3 Ts\n/F1 6\.5 Tf \(17\) Tj', c)
    assert b'(energy E = mc' in c and b' end' in c


def test_block_font_size(tmp_path):
    """Per-block CSS font-size: px/pt absolute, em/% scale the 10 pt
    body, keywords per CSS 2.1; leading scales with the size."""
    epub = str(tmp_path / 'fs.epub')
    _epub(epub, '<p>normal ten point</p>'
                '<p style="font-size: 14pt">FOURTEEN point</p>'
                '<p style="font-size: 0.8em">EIGHTPT relative</p>'
                '<div style="font-size: 120%"><p>INHERITED twelve'
                '</p></div>'
                '<p style="font-size: x-large">KEYWORD fifteen</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    m = re.search(rb'BT /F1 (\S+) Tf [\d.]+ [\d.]+ Td (\S+) TL\n'
                  rb'\(FOURTEEN', c)
    assert m and float(m.group(1)) == 14.0
    assert abs(float(m.group(2)) - 14 * 1.3) < 0.01
    for frag, want in ((rb'EIGHTPT', 8.0), (rb'INHERITED', 12.0),
                       (rb'KEYWORD', 15.0), (rb'normal ten', 10.0)):
        m = re.search(rb'BT /F1 (\S+) Tf [^\n]+ TL\n\(' + frag, c)
        assert m and float(m.group(1)) == want, (frag, m)


def test_font_size_wraps_narrower(tmp_path):
    """Bigger text wraps into more lines for the same words."""
    words = ' '.join('verse%02d' % i for i in range(30))
    epub = str(tmp_path / 'fw.epub')
    _epub(epub, '<p>%s</p><p style="font-size: 20pt">%s</p>'
          % (words, words))
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    paras, cur = [], 0
    for ln in c.split(b'\n'):
        if ln.startswith(b'('):
            if ln.startswith(b'()'):
                if cur:
                    paras.append(cur)
                cur = 0
            else:
                cur += 1
    if cur:
        paras.append(cur)
    assert len(paras) == 2 and paras[1] > 1.5 * paras[0]


def test_table_rowspan_blanks_column(tmp_path):
    """A rowspan cell occupies its column across the spanned rows:
    following rows' cells shift past it, and the spanned rows never
    render another cell at that column."""
    epub = str(tmp_path / 'rs.epub')
    _epub(epub, '<table>'
                '<tr><td rowspan="2">SPANCELL</td><td>R1C2</td></tr>'
                '<tr><td>R2C2</td></tr>'
                '<tr><td>R3C1</td><td>R3C2</td></tr></table>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    cells = {}
    for m in re.finditer(
            rb'BT /F1 10 Tf ([\d.]+) ([\d.]+) Td [\d.]+ TL', c):
        mm = re.search(rb'\(([^)]+)\)', c[m.end():m.end() + 80])
        if mm:
            cells[mm.group(1)] = (float(m.group(1)),
                                  float(m.group(2)))
    # row 2's only cell lands in COLUMN 2 (same x as R1C2), not col 1
    assert cells[b'R2C2'][0] == cells[b'R1C2'][0] > MARGIN
    assert cells[b'SPANCELL'][0] == MARGIN
    # row 3 reclaims column 1
    assert cells[b'R3C1'][0] == MARGIN
    assert cells[b'R3C2'][0] == cells[b'R1C2'][0]
    # rows keep their own baselines in order
    assert cells[b'SPANCELL'][1] == cells[b'R1C2'][1]
    assert cells[b'R2C2'][1] < cells[b'R1C2'][1]
    assert cells[b'R3C1'][1] < cells[b'R2C2'][1]


def test_table_column_widths(tmp_path):
    """Declared cell widths (CSS or width=) set the column split."""
    epub = str(tmp_path / 'cw.epub')
    _epub(epub, '<table><tr>'
                '<td style="width: 75%">WIDECELL</td>'
                '<td>NARROWCELL</td></tr></table>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    m = re.search(rb'BT /F1 10 Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n'
                  rb'\(NARROWCELL', c)
    assert m
    from archive_pdf_tools_tpu.cli.epub_to_pdf import COL_W
    # column 2 starts at 75% of the box + gutter
    boxw = COL_W - 6.0
    assert abs(float(m.group(1)) - (MARGIN + boxw * 0.75 + 6.0)) < 1.0


def test_table_borders(tmp_path):
    """border tables outline every cell (including empty ones); a
    borderless table draws no rects."""
    epub = str(tmp_path / 'bd.epub')
    _epub(epub, '<table border="1">'
                '<tr><td>A1</td><td>B1</td></tr>'
                '<tr><td>A2</td><td></td></tr></table>'
                '<table><tr><td>NOBORD</td></tr></table>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    rects = re.findall(rb'q 0.5 w [\d.-]+ [\d.]+ [\d.]+ [\d.]+ re S Q',
                       c)
    assert len(rects) == 4          # 2x2 grid, empty cell included
    # the borderless table stays rect-free: no rect after its text
    assert b'NOBORD' in c
    assert not re.search(rb'NOBORD.*re S Q', c, re.S)


def test_inline_svg_renders_as_vector_block(tmp_path):
    """An inline <svg> (cover art, diagrams) becomes a Form XObject
    at its flow position: shapes with fills/strokes/transforms render
    as vector ops; an svg holding only an <image> ref keeps the
    raster path (no empty form)."""
    svg = ('<svg xmlns="http://www.w3.org/2000/svg" width="200"'
           ' height="100" viewBox="0 0 200 100">'
           '<rect x="10" y="10" width="80" height="40" fill="#800000"/>'
           '<circle cx="150" cy="50" r="30" fill="none"'
           ' stroke="blue" stroke-width="4"/>'
           '<g transform="translate(20,60)">'
           '<path d="M 0,0 L 40,0 Q 60,20 40,30 Z" fill="green"/>'
           '</g></svg>')
    epub = str(tmp_path / 'v.epub')
    _epub(epub, '<p>before art</p>%s<p>after art</p>' % svg)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    r = PdfReader(out)
    page = r.pages()[0]
    xo = r.resolve(r.resolve(page['Resources']).get('XObject'))
    assert xo, 'no XObject placed'
    form = r.resolve(list(xo.values())[0])
    assert str(r.resolve(form.dict['Subtype'])) == 'Form'
    body = form.decoded()
    # rect at (10,10)-(90,50) in user units, maroon fill
    assert re.search(rb'q 0\.50\d* 0 0 rg 10 10 80 40 re f Q', body)
    # stroked circle: blue RG 4 w with bezier arcs
    assert re.search(rb'q 0 0 1 RG 4 w 180 50 m .* c .* S Q', body)
    # transformed group wraps its path in q cm ... Q
    assert re.search(rb'q 1 0 0 1 20 60 cm\nq 0 0\.5 0 rg 0 0 m '
                     rb'40 0 l .* c h f Q\nQ', body)
    # the page keeps text around the drawing in order
    c = r.page_contents(0)
    assert c.find(b'before art') < c.find(b'/Im0 Do') \
        < c.find(b'after art')
    # rasterizes with visible ink from the shapes
    from archive_pdf_tools_tpu.pdf.raster import Rasterizer
    import numpy as np
    a = Rasterizer(r).render_page(0)
    assert int((a[:, :, 2].astype(int) - a[:, :, 0] > 40).sum()) > 20


def test_svg_image_only_keeps_raster_path(tmp_path):
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.new('RGB', (60, 40), (9, 99, 199)).save(buf, 'JPEG')
    with zipfile.ZipFile(str(tmp_path / 'c.epub'), 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>Cover</dc:title></metadata>
 <manifest><item id="c1" href="c1.xhtml"
  media-type="application/xhtml+xml"/>
 <item id="im" href="art.jpg" media-type="image/jpeg"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
        zf.writestr('art.jpg', buf.getvalue())
        zf.writestr('c1.xhtml',
                    '<?xml version="1.0"?>\n<html xmlns='
                    '"http://www.w3.org/1999/xhtml"><body>'
                    '<svg xmlns="http://www.w3.org/2000/svg"'
                    ' viewBox="0 0 60 40">'
                    '<image xmlns:xlink="http://www.w3.org/1999/xlink"'
                    ' xlink:href="art.jpg" width="60" height="40"/>'
                    '</svg></body></html>')
    out = str(tmp_path / 'out.pdf')
    assert main([str(tmp_path / 'c.epub'), out]) == 0
    r = PdfReader(out)
    xo = r.resolve(r.resolve(r.pages()[0]['Resources'])['XObject'])
    imgs = [r.resolve(v) for v in xo.values()]
    # exactly the raster image, no empty vector form
    assert len(imgs) == 1
    assert str(r.resolve(imgs[0].dict['Subtype'])) == 'Image'


def test_text_transform_and_line_height(tmp_path):
    """text-transform rewrites characters length-preserving (link
    offsets stay exact); line-height scales the leading (unitless
    multiple of the block size, or absolute)."""
    epub = str(tmp_path / 'tt.epub')
    _epub(epub, '<p style="text-transform: uppercase">shout '
                '<a href="https://x.org/">quiet link</a> words</p>'
                '<p style="text-transform: capitalize">the quick '
                'brown fox</p>'
                '<p style="line-height: 2">double spaced paragraph '
                'line</p>'
                '<p style="line-height: 26px">absolute leading</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    assert b'SHOUT ' in c and b'QUIET LINK' in c and b'WORDS' in c
    assert b'The Quick Brown Fox' in c
    # line-height 2 -> 20 pt TL at the 10 pt body
    assert re.search(rb'BT /F1 10 Tf [\d.]+ [\d.]+ Td 20 TL\n'
                     rb'\(double spaced', c)
    # 26 px -> 19.5 pt
    assert re.search(rb'Td 19\.5 TL\n\(absolute leading', c)
    # the uppercased link still carries its annotation with a rect
    r = PdfReader(out)
    annots = r.resolve(r.pages()[0].get('Annots'))
    assert annots and len(annots) == 1


def test_dd_indents(tmp_path):
    epub = str(tmp_path / 'dl.epub')
    _epub(epub, '<dl><dt>Term</dt><dd>Definition text</dd></dl>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    m = re.search(rb'Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n\(Definition',
                  c)
    assert m and float(m.group(1)) == MARGIN + 24.0
    m = re.search(rb'Tf ([\d.]+) [\d.]+ Td [\d.]+ TL\n\(Term', c)
    assert m and float(m.group(1)) == MARGIN


def test_justify(tmp_path):
    """text-align: justify stretches word gaps with per-line Tw so
    every full line ends at the column edge; the paragraph's last
    line stays ragged; text-indent composes."""
    words = ' '.join('justy%02d' % i for i in range(40))
    epub = str(tmp_path / 'j.epub')
    _epub(epub, '<p style="text-align: justify; text-indent: 2em">'
                '%s</p>' % words)
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    from archive_pdf_tools_tpu.cli.epub_to_pdf import COL_W
    # every line but the last carries a Tw, reset after
    tws = re.findall(rb'([\d.]+) Tw\n\(([^)]+)\) \'\n0 Tw', c)
    lines = re.findall(rb'\(([^)]+)\) \'', c)
    assert len(tws) == len(lines) - 1 >= 2
    # measured: chars + Tw*gaps lands on the column edge (first line
    # indented by 2em = 32 px = 24 pt)
    from archive_pdf_tools_tpu.pdf.raster import _std14_widths
    from archive_pdf_tools_tpu.cli.epub_to_pdf import _PlainResolver
    wmap = _std14_widths(_PlainResolver,
                         {'BaseFont': 'Times-Roman'})
    for k, (twb, line) in enumerate(tws):
        lw = sum(wmap.get(b, 0.5) for b in line) * 10.0
        full = lw + float(twb) * line.count(b' ')
        want = COL_W - 24.0 if k == 0 else COL_W
        assert abs(full - want) < 0.1, (k, full, want)


def test_percent_margins_and_woff_font(tmp_path):
    """% margins resolve against the column width; a WOFF1 @font-face
    still embeds (unwrapped to its plain sfnt)."""
    import io as _io
    import os
    import matplotlib
    from fontTools.ttLib import TTFont
    from archive_pdf_tools_tpu.cli.epub_to_pdf import COL_W
    epub = str(tmp_path / 'pm.epub')
    _epub(epub, '<p style="margin-left: 10%">PCTBLOCK text</p>')
    out = str(tmp_path / 'out.pdf')
    assert main([epub, out]) == 0
    c = _content(out)
    m = re.search(rb'BT /F1 10 Tf ([\d.]+) [\d.]+ Td', c)
    xs = [float(mm.group(1)) for mm in re.finditer(
        rb'BT /F1 10 Tf ([\d.]+) [\d.]+ Td', c)]
    assert any(abs(x - (MARGIN + COL_W * 0.10)) < 0.01 for x in xs), xs
    # WOFF body font
    src = os.path.join(os.path.dirname(matplotlib.__file__),
                       'mpl-data', 'fonts', 'ttf', 'DejaVuSans.ttf')
    f = TTFont(src)
    f.flavor = 'woff'
    buf = _io.BytesIO()
    f.save(buf)
    woff = buf.getvalue()
    with zipfile.ZipFile(str(tmp_path / 'w.epub'), 'w') as zf:
        zf.writestr('mimetype', 'application/epub+zip')
        zf.writestr('META-INF/container.xml', CONTAINER)
        zf.writestr('content.opf', '''<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>W</dc:title></metadata>
 <manifest><item id="c1" href="c1.xhtml"
  media-type="application/xhtml+xml"/>
  <item id="css" href="s.css" media-type="text/css"/>
  <item id="f1" href="B.woff"
  media-type="application/font-woff"/></manifest>
 <spine><itemref idref="c1"/></spine></package>''')
        zf.writestr('s.css', '@font-face { font-family: "BW"; '
                    'src: url(B.woff); } body { font-family: "BW"; }')
        zf.writestr('B.woff', woff)
        zf.writestr('c1.xhtml',
                    '<?xml version="1.0"?>\n<html xmlns='
                    '"http://www.w3.org/1999/xhtml"><head><link rel='
                    '"stylesheet" type="text/css" href="s.css"/>'
                    '</head><body><p>woff body words</p>'
                    '</body></html>')
    out2 = str(tmp_path / 'out2.pdf')
    assert main([str(tmp_path / 'w.epub'), out2]) == 0
    r = PdfReader(out2)
    c2 = r.page_contents(0)
    assert re.search(rb'/F7 10 Tf', c2)     # embedded face in use
    fonts = r.resolve(r.resolve(r.pages()[0]['Resources'])['Font'])
    desc = r.resolve(r.resolve(
        r.resolve(fonts['F7'])['DescendantFonts'])[0])
    fd = r.resolve(desc['FontDescriptor'])
    ff = r.resolve(fd['FontFile2']).decoded()
    assert ff[:4] == b'\x00\x01\x00\x00'    # plain sfnt, unwrapped
    from archive_pdf_tools_tpu.pdf.textextract import (
        extract_page_glyphs, group_words)
    glyphs, _w, _h = extract_page_glyphs(r, 0)
    assert 'woff' in [w[0] for w in group_words(glyphs)]
