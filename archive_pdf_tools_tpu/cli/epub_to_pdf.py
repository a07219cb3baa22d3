"""epub-to-pdf: convert an EPUB to PDF, keeping TOC and metadata.

The reference delegates to PyMuPDF's ``convert_to_pdf``
(``bin/epub-to-pdf:35-76``).  Without a layout engine we implement a
text-centric conversion: spine XHTML chapters are extracted with lxml,
laid out as wrapped monospace text (Courier, a PDF standard-14 font, so
line metrics are exact), chapter starts become PDF outline entries, and
OPF metadata maps to the docinfo.  Faithful for reflowable text EPUBs;
fixed-layout/image EPUBs only keep their text.
"""

import argparse
import posixpath
import re
import sys
import zipfile

from lxml import etree

from ..pdf.writer import PdfWriter, Name, Stream

PAGE_W, PAGE_H = 612.0, 792.0
MARGIN = 54.0
FONT_SIZE = 10.0
LEADING = 13.0
CHAR_W = FONT_SIZE * 0.6    # courier advance 600/1000
COLS = int((PAGE_W - 2 * MARGIN) / CHAR_W)
ROWS = int((PAGE_H - 2 * MARGIN) / LEADING)


def _opf_path(zf):
    data = zf.read('META-INF/container.xml')
    root = etree.fromstring(data)
    rootfile = root.find('.//{*}rootfile')
    return rootfile.get('full-path')


def _spine_docs(zf, opf_path):
    opf = etree.fromstring(zf.read(opf_path))
    base = posixpath.dirname(opf_path)
    manifest = {}
    for item in opf.findall('.//{*}manifest/{*}item'):
        manifest[item.get('id')] = item.get('href')
    docs = []
    for ref in opf.findall('.//{*}spine/{*}itemref'):
        href = manifest.get(ref.get('idref'))
        if href:
            docs.append(posixpath.normpath(posixpath.join(base, href)))
    meta = {}
    for tag in ('title', 'creator', 'language'):
        el = opf.find('.//{*}metadata/{*}%s' % tag)
        if el is not None and el.text:
            meta[tag] = el.text
    return docs, meta


def _extract_text(zf, doc_path):
    try:
        data = zf.read(doc_path)
    except KeyError:
        return '', ''
    root = etree.fromstring(data, etree.HTMLParser())
    title = ''
    for h in root.iter():
        if isinstance(h.tag, str) and re.match(r'h[1-3]$',
                                               etree.QName(h).localname or '',
                                               re.I):
            title = ' '.join(h.itertext()).strip()
            break
    paras = []
    for p in root.iter():
        if isinstance(p.tag, str) and \
                (etree.QName(p).localname or '') in ('p', 'h1', 'h2', 'h3',
                                                     'h4', 'li',
                                                     'blockquote'):
            text = re.sub(r'\s+', ' ', ' '.join(p.itertext())).strip()
            if text:
                paras.append(text)
    return title, '\n\n'.join(paras)


def _wrap(text, cols):
    lines = []
    for para in text.split('\n'):
        words = para.split(' ')
        cur = ''
        for word in words:
            if not cur:
                cur = word
            elif len(cur) + 1 + len(word) <= cols:
                cur += ' ' + word
            else:
                lines.append(cur)
                cur = word
        lines.append(cur)
    return lines


def _esc(s):
    return s.replace('\\', r'\\').replace('(', r'\(').replace(')', r'\)') \
            .encode('latin-1', 'replace')


def main(argv=None):
    parser = argparse.ArgumentParser(description='Convert EPUB to PDF '
                                                 '(text-centric).')
    parser.add_argument('infile')
    parser.add_argument('outfile')
    args = parser.parse_args(argv)

    zf = zipfile.ZipFile(args.infile)
    docs, meta = _spine_docs(zf, _opf_path(zf))

    w = PdfWriter()
    catalog_ref = w.reserve()
    pages_ref = w.reserve()
    font_ref = w.add({Name('Type'): Name('Font'),
                      Name('Subtype'): Name('Type1'),
                      Name('BaseFont'): Name('Courier')})

    page_refs = []
    chapter_pages = []    # (title, first page index)
    cur_lines = []

    def flush_page():
        nonlocal cur_lines
        if not cur_lines:
            return
        ops = [b'BT /F1 %g Tf %g %g Td %g TL' %
               (FONT_SIZE, MARGIN, PAGE_H - MARGIN, LEADING)]
        for line in cur_lines:
            ops.append(b"(%s) '" % _esc(line))
        ops.append(b'ET')
        content = w.add(Stream({}, b'\n'.join(ops), deflate=True))
        ref = w.add({Name('Type'): Name('Page'), Name('Parent'): pages_ref,
                     Name('MediaBox'): [0, 0, PAGE_W, PAGE_H],
                     Name('Contents'): content,
                     Name('Resources'): {
                         Name('Font'): {Name('F1'): font_ref}}})
        page_refs.append(ref)
        cur_lines = []

    for doc in docs:
        title, text = _extract_text(zf, doc)
        if not text:
            continue
        flush_page()
        chapter_pages.append((title or doc, len(page_refs)))
        for line in _wrap(text, COLS):
            cur_lines.append(line)
            if len(cur_lines) >= ROWS:
                flush_page()
    flush_page()

    if not page_refs:    # empty spine: still emit one blank page
        cur_lines = ['']
        flush_page()

    w.set(pages_ref, {Name('Type'): Name('Pages'),
                      Name('Kids'): page_refs,
                      Name('Count'): len(page_refs)})
    catalog = {Name('Type'): Name('Catalog'), Name('Pages'): pages_ref}

    if chapter_pages:
        outlines_ref = w.reserve()
        item_refs = [w.reserve() for _ in chapter_pages]
        for i, (title, pidx) in enumerate(chapter_pages):
            item = {Name('Title'): title, Name('Parent'): outlines_ref,
                    Name('Dest'): [page_refs[min(pidx,
                                                 len(page_refs) - 1)],
                                   Name('XYZ'), None, None, None]}
            if i > 0:
                item[Name('Prev')] = item_refs[i - 1]
            if i + 1 < len(item_refs):
                item[Name('Next')] = item_refs[i + 1]
            w.set(item_refs[i], item)
        w.set(outlines_ref, {Name('Type'): Name('Outlines'),
                             Name('First'): item_refs[0],
                             Name('Last'): item_refs[-1],
                             Name('Count'): len(item_refs)})
        catalog[Name('Outlines')] = outlines_ref

    w.set(catalog_ref, catalog)
    info = {}
    if 'title' in meta:
        info[Name('Title')] = meta['title']
    if 'creator' in meta:
        info[Name('Author')] = meta['creator']
    info_ref = w.add(info)
    with open(args.outfile, 'wb') as fp:
        w.save(fp, catalog_ref, info_ref)
    print('wrote %s (%d pages, %d chapters)'
          % (args.outfile, len(page_refs), len(chapter_pages)))
    return 0


if __name__ == '__main__':
    sys.exit(main())
