"""PDF layer tests: writer/builder round-trips through our reader,
text layer math, page labels, metadata, PDF/A + UA scaffolding."""

import io
import zlib

import numpy as np
import pytest

from archive_pdf_tools_tpu.pdf.writer import PdfWriter, Name, Stream
from archive_pdf_tools_tpu.pdf.builder import DocumentBuilder
from archive_pdf_tools_tpu.pdf.reader import PdfReader, PStream
from archive_pdf_tools_tpu.pdf import pagenumbers as pn
from archive_pdf_tools_tpu.pdf.textlayer import (
    page_text_ops, codepoint_utf16be, clip_baseline)
from archive_pdf_tools_tpu.codecs.mrc_encode import (
    encode_mrc_mask, encode_mrc_images)

from tests.test_kernels import synth_page
from tests.test_codecs import text_mask
from tests.test_decompose import synth_word_data


def build_sample_doc(with_images=True, **meta):
    b = DocumentBuilder()
    wd = synth_word_data(400, 300)
    b.add_text_page(wd, 300.0, 400.0, ppi=72.0)
    b.add_text_page(wd, 300.0, 400.0, ppi=72.0)
    if with_images:
        mask = text_mask(400, 300)
        g = synth_page(400, 300)
        em, eb, ef = encode_mrc_images(
            mask, g, g,
            bg_compression_flags=['quality_mode:"rates";quality_layers:[500]'],
            fg_compression_flags=['quality_mode:"rates";quality_layers:[750]'])
        for idx in range(2):
            b.insert_image(idx, eb, gray=True)
            b.insert_image(idx, ef, gray=True, mask_enc=em)
    b.write_pdfa()
    b.write_basic_ua(language='en')
    from_docinfo = meta.pop('from_docinfo', None)
    b.write_metadata(extra_metadata=dict(
        title='Test Book', author='Test Author', url='https://x.test/b',
        language=['en'], **meta), from_docinfo=from_docinfo)
    buf = io.BytesIO()
    b.save(buf)
    return buf.getvalue()


class TestBuilderReader:
    def test_preserved_creationdate_xmp_consistent(self):
        """--from-pdf carries the source CreationDate into Info; the
        XMP CreateDate must derive from THAT value, not the clock
        (PDF/A consistency — caught live 2026-08-20 when a slow run
        put >1s between builder init and metadata write)."""
        data = build_sample_doc(
            from_docinfo={'creationDate': 'D:19991231235958Z'})
        r = PdfReader(data)
        assert r.info()['CreationDate'] == b'D:19991231235958Z'
        assert b'<xmp:CreateDate>1999-12-31T23:59:58Z' in \
            r.xmp_metadata()
        from archive_pdf_tools_tpu.validators import validate_pdfa
        validate_pdfa(data)

    def test_roundtrip_structure(self):
        data = build_sample_doc()
        assert data.startswith(b'%PDF-1.5')
        r = PdfReader(data)
        assert r.page_count() == 2
        assert r.page_size(0) == (300.0, 400.0)
        imgs = r.page_images(0)
        assert len(imgs) == 2
        filters = sorted(r.extract_image(s)[1] for _, _, s in imgs)
        assert filters == ['JPXDecode', 'JPXDecode']
        # fg must carry a JBIG2 SMask
        smasks = [r.resolve(s.dict.get('SMask')) for _, _, s in imgs]
        smasks = [s for s in smasks if s is not None]
        assert len(smasks) == 1
        assert str(r.resolve(smasks[0].dict['Filter'])) == 'JBIG2Decode'

    def test_pdfa_bits(self):
        r = PdfReader(build_sample_doc(with_images=False))
        cat = r.catalog
        intents = r.resolve(cat['OutputIntents'])
        intent = r.resolve(intents[0])
        assert str(r.resolve(intent['S'])) == 'GTS_PDFA1'
        icc = r.resolve(intent['DestOutputProfile'])
        assert isinstance(icc, PStream) and len(icc.decoded()) > 100
        xmp = r.xmp_metadata().decode('utf-8')
        assert '<pdfaid:part>3</pdfaid:part>' in xmp
        assert '<pdfaid:conformance>B</pdfaid:conformance>' in xmp
        assert 'Test Book' in xmp

    def test_ua_bits(self):
        r = PdfReader(build_sample_doc(with_images=False))
        cat = r.catalog
        root = r.resolve(cat['StructTreeRoot'])
        assert str(root['Type']) == 'StructTreeRoot'
        kids = r.resolve(root['K'])
        assert len(kids) == 2
        assert r.resolve(cat['MarkInfo'])['Marked'] is True
        assert r.resolve(cat['Lang']) == b'en'
        page = r.pages()[0]
        assert r.resolve(page['StructParents']) == 0

    def test_info_metadata(self):
        r = PdfReader(build_sample_doc(with_images=False))
        info = r.info()
        assert info['Title'] == b'Test Book'
        assert b'Internet Archive PDF' in bytes(info['Producer'])

    def test_text_content_stream(self):
        r = PdfReader(build_sample_doc(with_images=False))
        ops = r.page_contents(0)
        assert b'3 Tr' in ops          # invisible render mode
        assert b'Tz' in ops and b'TJ' in ops
        assert b'/f-0-0' in ops

    def test_page_labels(self):
        b = DocumentBuilder()
        b.add_text_page([], 100.0, 100.0, ppi=72.0)
        b.add_text_page([], 100.0, 100.0, ppi=72.0)
        b.add_text_page([], 100.0, 100.0, ppi=72.0)
        b.write_page_labels([None, 'i', '2'])
        buf = io.BytesIO()
        b.save(buf)
        r = PdfReader(buf.getvalue())
        labels = r.resolve(r.catalog['PageLabels'])
        nums = r.resolve(labels['Nums'])
        assert nums[0] == 0 and r.resolve(nums[1]) == {}
        assert str(r.resolve(nums[3])['S']) == 'r'

    def test_toc(self):
        b = DocumentBuilder()
        for _ in range(3):
            b.add_text_page([], 100.0, 100.0, ppi=72.0)
        b.write_toc([{'title': 'Ch 1', 'level': 1, 'accessible-page': 0},
                     {'title': 'Ch 2', 'level': 1, 'accessible-page': 2}])
        buf = io.BytesIO()
        b.save(buf)
        r = PdfReader(buf.getvalue())
        outlines = r.resolve(r.catalog['Outlines'])
        assert r.resolve(outlines['Count']) == 2
        first = r.resolve(outlines['First'])
        assert first['Title'] == b'Ch 1'


class TestTextMath:
    def test_codepoints(self):
        assert codepoint_utf16be(ord('A')) == '0041'
        assert codepoint_utf16be(0x1F600) == 'D83DDE00'
        assert codepoint_utf16be(0xD800) is None

    def test_clip_baseline_flattens(self):
        x1, y1, x2, y2 = clip_baseline(72, 0, 10.0, 500, 11.0)
        assert y1 == y2 == 10.5

    def test_empty_word_data(self):
        assert page_text_ops([], 100, 100, 72) == b''


class TestPageNumbers:
    def test_roman(self):
        assert pn.roman_to_int('XIV') == 14
        assert pn.roman_to_int('MCMXCIX') == 1999
        with pytest.raises(pn.InvalidRomanNumeral):
            pn.roman_to_int('IIII')

    def test_types(self):
        assert pn.value_type('12') == pn.ARABIC
        assert pn.value_type('xiv') == pn.ROMAN_LOWER
        assert pn.value_type('XIV') == pn.ROMAN_UPPER
        assert pn.value_type(None) == pn.INVALID
        with pytest.raises(ValueError):
            pn.value_type('A-2')
        assert pn.value_type('A-2', ignore_invalid=True) == pn.INVALID

    def test_series_runs(self):
        series = [None, 'i', 'ii', 'iii', '1', '2', '3', '5']
        runs, ok = pn.parse_series(series)
        assert ok
        assert [r['start'] for r in runs] == [0, 1, 4, 7]
        assert runs[1]['type'] == pn.ROMAN_LOWER
        assert runs[2]['type'] == pn.ARABIC

    def test_invalid_marks_not_ok(self):
        # ignore_invalid classifies junk as INVALID without failing
        runs, ok = pn.parse_series(['1', 'bogus str!'], ignore_invalid=True)
        assert ok and runs[1]['type'] == pn.INVALID
        # strict mode records the failure in all_ok
        runs, ok = pn.parse_series(['1', '2', 'bogus str!'])
        assert not ok

    def test_reference_inline_case(self):
        # shaped like pagenumbers.py:305 __main__ sample
        series = [None, 'i', 'ii', 'iii', None, None, None, 'iv', 'v', 'v',
                  'vi', '3', '4', '5', '4', '6', 'i', '7', None]
        runs, ok = pn.parse_series(series)
        assert ok
        assert runs[0]['type'] == pn.INVALID
        assert runs[1]['values'] == ['i', 'ii', 'iii']


class TestReaderXrefStream:
    def _build_xref_stream_pdf(self):
        """Minimal PDF 1.5 with an xref stream and an object stream."""
        import struct
        out = bytearray(b'%PDF-1.5\n')
        offsets = {}

        def add(num, body):
            offsets[num] = len(out)
            out.extend(b'%d 0 obj\n' % num + body + b'\nendobj\n')

        # catalog + pages inside an object stream (obj 5)
        bodies = [b'<< /Type /Catalog /Pages 2 0 R >> ',
                  b'<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >> ',
                  b'<< /Type /Page /Parent 2 0 R '
                  b'/MediaBox [ 0 0 100 200 ] >>']
        offs, pos = [], 0
        for body in bodies:
            offs.append(pos)
            pos += len(body)
        head = b''.join(b'%d %d ' % (i + 1, off)
                        for i, off in enumerate(offs))
        payload = head + b''.join(bodies)
        comp = zlib.compress(payload)
        add(5, b'<< /Type /ObjStm /N 3 /First %d /Length %d '
               b'/Filter /FlateDecode >>\nstream\n' % (len(head), len(comp))
               + comp + b'\nendstream')

        # xref stream (obj 4): entries for objects 0-5
        xref_pos = len(out)
        rows = []
        rows.append(bytes([0, 0, 0, 0, 0xFF]))          # obj 0 free
        for num in (1, 2, 3):
            idx = {1: 0, 2: 1, 3: 2}[num]
            rows.append(bytes([2]) + (5).to_bytes(3, 'big')
                        + bytes([idx]))                  # in objstm 5
        rows.append(bytes([0, 0, 0, 0, 0]))              # obj 4 (self; lazy)
        rows.append(bytes([1]) + offsets[5].to_bytes(3, 'big')
                    + bytes([0]))                        # obj 5 at offset
        data = b''.join(rows)
        comp = zlib.compress(data)
        offsets[4] = xref_pos
        out.extend(b'4 0 obj\n<< /Type /XRef /Size 6 /W [ 1 3 1 ] '
                   b'/Root 1 0 R /Length %d /Filter /FlateDecode '
                   b'>>\nstream\n' % len(comp) + comp
                   + b'\nendstream\nendobj\n')
        out.extend(b'startxref\n%d\n%%%%EOF\n' % xref_pos)
        return bytes(out)

    def test_xref_stream_and_objstm(self):
        data = self._build_xref_stream_pdf()
        r = PdfReader(data)
        assert r.page_count() == 1
        assert r.page_size(0) == (100.0, 200.0)


class TestEncryption:
    """Reader-side standard security handler (pdf/crypt.py; the
    reference relies on PyMuPDF for encrypted input)."""

    def test_aes_known_answers(self):
        from archive_pdf_tools_tpu.pdf.crypt import aes_cbc_nopad
        # FIPS-197 C.1 (AES-128) and C.3 (AES-256), single block, IV=0
        pt = bytes.fromhex('00112233445566778899aabbccddeeff')
        k128 = bytes.fromhex('000102030405060708090a0b0c0d0e0f')
        ct = aes_cbc_nopad(k128, b'\0' * 16, pt, decrypt=False)
        assert ct.hex() == '69c4e0d86a7b0430d8cdb78070b4c55a'
        assert aes_cbc_nopad(k128, b'\0' * 16, ct, decrypt=True) == pt
        k256 = bytes.fromhex('000102030405060708090a0b0c0d0e0f'
                             '101112131415161718191a1b1c1d1e1f')
        ct = aes_cbc_nopad(k256, b'\0' * 16, pt, decrypt=False)
        assert ct.hex() == '8ea2b7ca516745bfeafc49904b496089'

    def test_rc4_known_answer(self):
        from archive_pdf_tools_tpu.pdf.crypt import rc4
        # classic "Key"/"Plaintext" vector
        assert rc4(b'Key', b'Plaintext').hex() == 'bbf316e8d940af0ad3'

    @staticmethod
    def _esc(s):
        out = bytearray()
        for b in s:
            if b in (0x28, 0x29, 0x5C):
                out += b'\\' + bytes([b])
            elif b == 0x0D:
                out += b'\\r'
            elif b == 0x0A:
                out += b'\\n'
            else:
                out.append(b)
        return bytes(out)

    def _build_encrypted(self, enc_dict_body, encrypt_stream, doc_id):
        """Assemble a one-page PDF whose content stream is encrypted by
        the caller-provided function(num, data)."""
        contents = b'BT /F1 12 Tf 10 100 Td (secret words) Tj ET'
        body = encrypt_stream(4, contents)
        objs = {
            1: b'<< /Type /Catalog /Pages 2 0 R >>',
            2: b'<< /Type /Pages /Kids [3 0 R] /Count 1 >>',
            3: (b'<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] '
                b'/Contents 4 0 R >>'),
            4: b'<< /Length %d >>stream\n%s\nendstream' % (len(body), body),
            5: enc_dict_body,
        }
        out = bytearray(b'%PDF-1.6\n')
        offsets = {}
        for n in sorted(objs):
            offsets[n] = len(out)
            out += b'%d 0 obj\n%s\nendobj\n' % (n, objs[n])
        xref_at = len(out)
        out += b'xref\n0 6\n0000000000 65535 f \n'
        for n in sorted(objs):
            out += b'%010d 00000 n \n' % offsets[n]
        out += (b'trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R /ID [<'
                + doc_id.hex().encode() + b'> <' + doc_id.hex().encode()
                + b'>] >>\nstartxref\n%d\n%%%%EOF\n' % xref_at)
        return bytes(out), contents

    def test_rc4_128_document(self):
        import hashlib
        import struct
        from archive_pdf_tools_tpu.pdf.crypt import rc4, PAD
        from archive_pdf_tools_tpu.pdf.reader import PdfReader
        doc_id = bytes(range(16))
        o_entry = bytes(range(100, 132))
        p = -44 & 0xFFFFFFFF
        key = hashlib.md5(PAD + o_entry + struct.pack('<I', p)
                          + doc_id).digest()
        for _ in range(50):
            key = hashlib.md5(key[:16]).digest()
        key = key[:16]

        def enc(num, data):
            k = hashlib.md5(key + struct.pack('<I', num)[:3]
                            + b'\0\0').digest()[:16]
            return rc4(k, data)

        enc_dict = (b'<< /Filter /Standard /V 2 /R 3 /Length 128 /O <'
                    + o_entry.hex().encode()
                    + b'> /U <' + (b'\0' * 32).hex().encode()
                    + b'> /P -44 >>')
        pdf, plain = self._build_encrypted(enc_dict, enc, doc_id)
        r = PdfReader(pdf)
        assert r.page_contents(0).strip() == plain

    def test_aesv2_document(self):
        import hashlib
        import struct
        from archive_pdf_tools_tpu.pdf.crypt import aes_cbc_nopad, PAD
        from archive_pdf_tools_tpu.pdf.reader import PdfReader
        doc_id = bytes(range(16, 32))
        o_entry = bytes(range(200, 232))
        p = -44 & 0xFFFFFFFF
        key = hashlib.md5(PAD + o_entry + struct.pack('<I', p)
                          + doc_id).digest()
        for _ in range(50):
            key = hashlib.md5(key[:16]).digest()
        key = key[:16]

        def enc(num, data):
            k = hashlib.md5(key + struct.pack('<I', num)[:3] + b'\0\0'
                            + b'sAlT').digest()[:16]
            pad = 16 - len(data) % 16
            iv = bytes(range(32, 48))
            ct = aes_cbc_nopad(k, iv, data + bytes([pad]) * pad,
                               decrypt=False)
            return iv + ct

        enc_dict = (b'<< /Filter /Standard /V 4 /R 4 /Length 128'
                    b' /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>'
                    b' /StmF /StdCF /StrF /StdCF /O <'
                    + o_entry.hex().encode()
                    + b'> /U <' + (b'\0' * 32).hex().encode()
                    + b'> /P -44 >>')
        pdf, plain = self._build_encrypted(enc_dict, enc, doc_id)
        r = PdfReader(pdf)
        assert r.page_contents(0).strip() == plain

    def test_aes256_r6_document(self):
        from archive_pdf_tools_tpu.pdf.crypt import (aes_cbc_nopad,
                                                     _hash_2a)
        from archive_pdf_tools_tpu.pdf.reader import PdfReader
        doc_id = bytes(range(32, 48))
        file_key = bytes(range(64, 96))
        vsalt = bytes(range(8))
        ksalt = bytes(range(8, 16))
        u_hash = _hash_2a(b'', vsalt)
        u_entry = u_hash + vsalt + ksalt
        ik = _hash_2a(b'', ksalt)
        ue = aes_cbc_nopad(ik, b'\0' * 16, file_key, decrypt=False)
        o_entry = bytes(range(100, 148))          # wrong on purpose
        oe = bytes(range(110, 142))

        def enc(num, data):
            pad = 16 - len(data) % 16
            iv = bytes(range(48, 64))
            ct = aes_cbc_nopad(file_key, iv, data + bytes([pad]) * pad,
                               decrypt=False)
            return iv + ct

        enc_dict = (b'<< /Filter /Standard /V 5 /R 6 /Length 256'
                    b' /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>'
                    b' /StmF /StdCF /StrF /StdCF'
                    b' /O <' + o_entry.hex().encode()
                    + b'> /U <' + u_entry.hex().encode()
                    + b'> /OE <' + oe.hex().encode()
                    + b'> /UE <' + ue.hex().encode()
                    + b'> /P -44 >>')
        pdf, plain = self._build_encrypted(enc_dict, enc, doc_id)
        r = PdfReader(pdf)
        assert r.page_contents(0).strip() == plain

    def test_wrong_password_raises(self):
        import pytest as _pytest
        from archive_pdf_tools_tpu.pdf.crypt import (aes_cbc_nopad,
                                                     _hash_2a,
                                                     StandardDecryptor)
        vsalt, ksalt = b'A' * 8, b'B' * 8
        u = _hash_2a(b'right', vsalt) + vsalt + ksalt
        enc = {'Filter': 'Standard', 'V': 5, 'R': 6,
               'O': b'\0' * 48, 'U': u, 'OE': b'\0' * 32,
               'UE': b'\0' * 32, 'P': -44}
        with _pytest.raises(ValueError):
            StandardDecryptor(enc, b'', password=b'wrong')
        StandardDecryptor(enc, b'', password=b'right')   # no raise


class TestColourspaceReduction:
    def test_iccbased_and_cal_spaces(self):
        from archive_pdf_tools_tpu.pdf.reader import PdfReader, PStream
        from archive_pdf_tools_tpu.pdf.writer import (PdfWriter, Name,
                                                       Stream, Raw)
        w = PdfWriter()
        icc = w.add(Stream({Name('N'): 3}, b'\x00' * 8))
        img = w.add(Stream({
            Name('Type'): Name('XObject'), Name('Subtype'): Name('Image'),
            Name('Width'): 2, Name('Height'): 2,
            Name('BitsPerComponent'): 8,
            Name('ColorSpace'): Raw(b"[/ICCBased %d 0 R]" % int(icc)),
        }, b'\x00' * 12))
        # minimal page tree
        pages = w.reserve()
        page = w.add({Name('Type'): Name('Page'), Name('Parent'): pages,
                      Name('MediaBox'): [0, 0, 10, 10],
                      Name('Resources'): {
                          Name('XObject'): {Name('Im0'): img}}})
        w.set(pages, {Name('Type'): Name('Pages'), Name('Kids'): [page],
                      Name('Count'): 1})
        root = w.add({Name('Type'): Name('Catalog'), Name('Pages'): pages})
        import io as _io
        buf = _io.BytesIO()
        w.save(buf, root)
        r = PdfReader(buf.getvalue())
        _, _, s = r.page_images(0)[0]
        raw, filt, iw, ih, cs = r.extract_image(s)
        assert cs == 'DeviceRGB'
        assert r._device_colorspace('CalGray') == 'DeviceGray'
        assert r._device_colorspace('Lab') == 'DeviceRGB'
