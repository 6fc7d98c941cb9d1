"""Deterministic in-memory document builders for tests.

We generate tiny valid PDF/DOCX/XLSX/DOC byte streams with stdlib only,
so the suite never depends on files outside the repo. Where present, the
reference fixtures under /root/reference/.../src/test/resources are used
*in addition* (read-only) for Tika-parity goldens.
"""

from __future__ import annotations

import io
import struct
import zipfile
import zlib


def build_pdf(lines: list[str], compress: bool = False) -> bytes:
    """One-page PDF showing each line with a Tj operator."""
    content = ["BT", "/F1 12 Tf", "50 750 Td", "14 TL"]
    for i, line in enumerate(lines):
        esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        if i == 0:
            content.append(f"({esc}) Tj")
        else:
            content.append("T*")
            content.append(f"({esc}) Tj")
    content.append("ET")
    stream = "\n".join(content).encode("latin-1")
    filt = b""
    if compress:
        stream = zlib.compress(stream)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (
            len(stream), filt, stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    xref_at = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objs) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(b"%010d 00000 n \n" % off)
    out.write(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
              % (len(objs) + 1, xref_at))
    return out.getvalue()


def build_scanned_pdf(text_layer: list[str] | None = None) -> bytes:
    """One-page PDF whose content is a drawn image XObject — the
    scanned-document shape. With `text_layer` it gains an invisible-
    OCR-style text stream too (then it does NOT need OCR)."""
    content = ["q", "612 0 0 792 0 0 cm", "/Im1 Do", "Q"]
    if text_layer:
        content += ["BT", "/F1 12 Tf", "50 750 Td"]
        for line in text_layer:
            esc = (line.replace("\\", r"\\").replace("(", r"\(")
                   .replace(")", r"\)"))
            content.append(f"({esc}) Tj")
        content.append("ET")
    stream = "\n".join(content).encode("latin-1")
    pixels = bytes([0, 255, 255, 0])  # 2x2 gray checker
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << /Im1 5 0 R >> "
        b"/Font << /F1 6 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (
            len(stream), stream),
        b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length %d >>"
        b"\nstream\n%s\nendstream" % (len(pixels), pixels),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    xref_at = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objs) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(b"%010d 00000 n \n" % off)
    out.write(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
              % (len(objs) + 1, xref_at))
    return out.getvalue()


def build_docx(paragraphs: list[str]) -> bytes:
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{p}</w:t></w:r></w:p>'
        for p in paragraphs)
    document = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<w:document xmlns:w="{w}"><w:body>{body}</w:body>'
                f'</w:document>')
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
          'content-types">'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/word/document.xml" ContentType="application/'
          'vnd.openxmlformats-officedocument.wordprocessingml.document.'
          'main+xml"/></Types>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("word/document.xml", document)
    return buf.getvalue()


def build_xlsx(rows: list[list[str]]) -> bytes:
    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    strings: list[str] = []
    xml_rows = []
    for r, row in enumerate(rows, start=1):
        cells = []
        for c, val in enumerate(row):
            col = chr(ord("A") + c)
            strings.append(val)
            cells.append(f'<c r="{col}{r}" t="s"><v>{len(strings)-1}</v></c>')
        xml_rows.append(f'<row r="{r}">{"".join(cells)}</row>')
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{s}">'
             f'<sheetData>{"".join(xml_rows)}</sheetData></worksheet>')
    sst = (f'<?xml version="1.0"?><sst xmlns="{s}" count="{len(strings)}" '
           f'uniqueCount="{len(strings)}">'
           + "".join(f'<si><t xml:space="preserve">{t}</t></si>'
                     for t in strings)
           + "</sst>")
    wb = (f'<?xml version="1.0"?><workbook xmlns="{s}"><sheets>'
          f'<sheet name="Sheet1" sheetId="1" r:id="rId1" xmlns:r="http://'
          f'schemas.openxmlformats.org/officeDocument/2006/relationships"/>'
          f'</sheets></workbook>')
    ct = ('<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.'
          'org/package/2006/content-types">'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/'
          'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          '</Types>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def build_doc(text: str) -> bytes:
    """Minimal Word-97 binary: OLE2 container + FIB + single-piece Clx.

    Text is stored 8-bit (cp1252) in the WordDocument stream; the piece
    table lives in 0Table.
    """
    text_bytes = (text + "\r").encode("cp1252")

    # --- WordDocument stream: 1024-byte FIB + text ---
    fib = bytearray(1024)
    struct.pack_into("<H", fib, 0, 0xA5EC)        # wIdent
    struct.pack_into("<H", fib, 2, 0x00C1)        # nFib (Word 97)
    struct.pack_into("<H", fib, 0x0A, 0x0000)     # flags: 0Table
    struct.pack_into("<I", fib, 0x18, 1024)       # fcMin
    struct.pack_into("<I", fib, 0x1C, 1024 + len(text_bytes))  # fcMac
    word_stream = bytes(fib) + text_bytes

    # --- 0Table stream: Clx (Pcdt with one piece) ---
    nchars = len(text_bytes)
    plcpcd = struct.pack("<II", 0, nchars)  # cp[0], cp[1]
    fc_raw = (1024 * 2) | 0x40000000        # fCompressed → fc/2 = 1024
    plcpcd += struct.pack("<HIH", 0, fc_raw, 0)
    clx = b"\x02" + struct.pack("<I", len(plcpcd)) + plcpcd
    table_stream = clx
    struct.pack_into("<I", fib, 0x01A2, 0)              # fcClx
    struct.pack_into("<I", fib, 0x01A6, len(clx))       # lcbClx
    word_stream = bytes(fib) + text_bytes

    return _build_ole2({"WordDocument": word_stream, "0Table": table_stream})


def _build_ole2(streams: dict[str, bytes]) -> bytes:
    """Tiny OLE2 writer: 512-byte sectors, all streams in the regular FAT.

    Streams are padded to the mini-stream cutoff (4096) so we never need
    a mini-FAT.
    """
    sector = 512
    streams = {k: v + b"\x00" * max(0, 4096 - len(v)) for k, v in streams.items()}

    # layout: [FAT sector][dir sectors][stream sectors...]
    dir_entries = []
    # root entry
    payload_sectors: list[bytes] = []
    start_sids: dict[str, int] = {}

    def pad(b: bytes) -> bytes:
        rem = (-len(b)) % sector
        return b + b"\x00" * rem

    # directory: root + streams (each 128 bytes)
    def dirent(name: str, etype: int, start: int, size: int,
               left=0xFFFFFFFF, right=0xFFFFFFFF, child=0xFFFFFFFF) -> bytes:
        raw_name = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[: len(raw_name)] = raw_name
        struct.pack_into("<H", e, 64, len(raw_name))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<I", e, 68, left)
        struct.pack_into("<I", e, 72, right)
        struct.pack_into("<I", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    names = list(streams)
    # sector ids: 0 = FAT, then the directory chain, then stream data
    n_dirent = 1 + len(names)
    ndirsec = max(1, -(-(n_dirent * 128) // sector))
    next_sid = 1 + ndirsec
    fat: list[int] = [0xFFFFFFFD]  # FAT sector
    for k in range(ndirsec):       # directory chain
        fat.append(2 + k if k < ndirsec - 1 else 0xFFFFFFFE)
    for name in names:
        data = pad(streams[name])
        nsec = len(data) // sector
        start_sids[name] = next_sid
        for k in range(nsec):
            fat.append(next_sid + k + 1 if k < nsec - 1 else 0xFFFFFFFE)
        payload_sectors.append(data)
        next_sid += nsec

    # red-black-ish flat tree: root's child = first stream; chain via right
    child_sid = 1 if names else 0xFFFFFFFF
    ents = [dirent("Root Entry", 5, 0xFFFFFFFE, 0, child=child_sid)]
    for i, name in enumerate(names):
        right = i + 2 if i + 1 < len(names) else 0xFFFFFFFF
        ents.append(dirent(name, 2, start_sids[name], len(streams[name]),
                           right=right))
    dir_raw = pad(b"".join(ents))
    assert len(dir_raw) == ndirsec * sector

    while len(fat) < sector // 4:
        fat.append(0xFFFFFFFF)
    fat_raw = struct.pack(f"<{sector // 4}I", *fat[: sector // 4])

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)   # minor
    struct.pack_into("<H", header, 26, 0x0003)   # major (512-byte sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # sector shift
    struct.pack_into("<H", header, 32, 6)        # mini shift
    struct.pack_into("<I", header, 44, 1)        # num FAT sectors
    struct.pack_into("<I", header, 48, 1)        # dir start sid
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, 0xFFFFFFFE)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, 0xFFFFFFFE)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [0] + [0xFFFFFFFF] * 108             # FAT at sector 0
    struct.pack_into("<109I", header, 76, *difat)

    return bytes(header) + fat_raw + dir_raw + b"".join(payload_sectors)


def build_pptx(slides: list[list[str]]) -> bytes:
    """Minimal PPTX: one ppt/slides/slideN.xml per deck slide."""
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    ct_overrides = []
    parts = {}
    for i, paras in enumerate(slides, start=1):
        body = "".join(
            f'<a:p><a:r><a:t>{t}</a:t></a:r></a:p>' for t in paras)
        parts[f"ppt/slides/slide{i}.xml"] = (
            f'<?xml version="1.0"?>'
            f'<p:sld xmlns:p="{p}" xmlns:a="{a}"><p:cSld><p:spTree>'
            f'<p:sp><p:txBody>{body}</p:txBody></p:sp>'
            f'</p:spTree></p:cSld></p:sld>')
        ct_overrides.append(
            f'<Override PartName="/ppt/slides/slide{i}.xml" ContentType='
            f'"application/vnd.openxmlformats-officedocument.presentationml'
            f'.slide+xml"/>')
    parts["ppt/presentation.xml"] = (
        f'<?xml version="1.0"?><p:presentation xmlns:p="{p}"/>')
    ct = ('<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats'
          '.org/package/2006/content-types">'
          '<Default Extension="xml" ContentType="application/xml"/>'
          + "".join(ct_overrides) + "</Types>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        for name, xml in parts.items():
            zf.writestr(name, xml)
    return buf.getvalue()


def build_ppt(texts: list[str], utf16: bool = True) -> bytes:
    """Minimal PowerPoint-97 binary: OLE2 container whose 'PowerPoint
    Document' stream holds one SlideListWithText container (0x0FF0)
    wrapping a TextCharsAtom (0x0FA0) or TextBytesAtom (0x0FA8) per
    text block."""
    def rec(ver_inst: int, rtype: int, payload: bytes) -> bytes:
        return struct.pack("<HHI", ver_inst, rtype, len(payload)) + payload

    atoms = b"".join(
        rec(0, 0x0FA0, t.encode("utf-16-le")) if utf16
        else rec(0, 0x0FA8, t.encode("cp1252"))
        for t in texts)
    doc = rec(0x000F, 0x0FF0, atoms)
    return _build_ole2({"PowerPoint Document": doc,
                        "Current User": b"\x00" * 16})


def build_rtf(paragraphs: list[str]) -> bytes:
    r"""Small RTF with a font table (must be skipped by the extractor),
    a \uN unicode escape, and one \par per paragraph."""
    body = r"\par ".join(
        p.replace("\\", r"\\").replace("{", r"\{").replace("}", r"\}")
        for p in paragraphs)
    rtf = (r"{\rtf1\ansi\deff0{\fonttbl{\f0 Helvetica;}}"
           r"{\colortbl;\red0\green0\blue0;}"
           r"\f0\fs24 " + body + r"\par}")
    return rtf.encode("cp1252")


def build_xls(strings: list[str]) -> bytes:
    """Minimal BIFF8 workbook: BOF + SST (compressed 8-bit strings) +
    EOF inside an OLE2 'Workbook' stream."""
    def rec(rtype: int, payload: bytes) -> bytes:
        return struct.pack("<HH", rtype, len(payload)) + payload

    bof = rec(0x0809, struct.pack("<HHHHIi", 0x0600, 0x0005, 0x0DBB,
                                  0x07CC, 0, 0))
    sst_body = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        raw = s.encode("cp1252")
        sst_body += struct.pack("<HB", len(raw), 0) + raw
    sst = rec(0x00FC, sst_body)
    eof = rec(0x000A, b"")
    return _build_ole2({"Workbook": bof + sst + eof})


def _build_odf(mimetype: str, body_inner: str) -> bytes:
    o = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    tb = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
    content = (f'<?xml version="1.0" encoding="UTF-8"?>'
               f'<office:document-content xmlns:office="{o}" '
               f'xmlns:text="{t}" xmlns:table="{tb}">'
               f'<office:body>{body_inner}</office:body>'
               f'</office:document-content>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        # per ODF spec the mimetype entry comes first, stored uncompressed
        zf.writestr(zipfile.ZipInfo("mimetype"), mimetype)
        zf.writestr("content.xml", content)
    return buf.getvalue()


def build_odt(paragraphs: list[str]) -> bytes:
    inner = "".join(f"<text:p>{p}</text:p>" for p in paragraphs)
    return _build_odf("application/vnd.oasis.opendocument.text",
                      f"<office:text>{inner}</office:text>")


def build_ods(rows: list[list[str]]) -> bytes:
    xml_rows = "".join(
        "<table:table-row>"
        + "".join(f"<table:table-cell><text:p>{v}</text:p>"
                  "</table:table-cell>" for v in row)
        + "</table:table-row>"
        for row in rows)
    return _build_odf(
        "application/vnd.oasis.opendocument.spreadsheet",
        f"<office:spreadsheet><table:table>{xml_rows}</table:table>"
        f"</office:spreadsheet>")


def build_odp(slides: list[list[str]]) -> bytes:
    inner = "".join(
        "<draw-page>" + "".join(f"<text:p>{line}</text:p>" for line in s)
        + "</draw-page>"
        for s in slides)
    return _build_odf("application/vnd.oasis.opendocument.presentation",
                      f"<office:presentation>{inner}</office:presentation>")


def build_eml(subject: str, sender: str, to: str, body: str,
              html_body: str | None = None,
              attachment: bytes | None = None) -> bytes:
    from email.message import EmailMessage
    msg = EmailMessage()
    msg["Subject"] = subject
    msg["From"] = sender
    msg["To"] = to
    msg.set_content(body)
    if html_body is not None:
        msg.add_alternative(html_body, subtype="html")
    if attachment is not None:
        msg.add_attachment(attachment, maintype="application",
                           subtype="octet-stream", filename="blob.bin")
    return msg.as_bytes()


def build_msg(subject: str, sender: str, to: str, body: str,
              ansi: bool = False) -> bytes:
    """Minimal Outlook .msg: OLE2 container with MAPI string-property
    streams (__substg1.0_<tag><type>, [MS-OXMSG])."""
    suffix = "001E" if ansi else "001F"
    enc = "cp1252" if ansi else "utf-16-le"
    streams = {
        f"__substg1.0_0037{suffix}": subject.encode(enc),
        f"__substg1.0_0C1A{suffix}": sender.encode(enc),
        f"__substg1.0_0E04{suffix}": to.encode(enc),
        f"__substg1.0_1000{suffix}": body.encode(enc),
        "__properties_version1.0": b"\x00" * 32,
    }
    return _build_ole2(streams)


def build_epub(chapters: list[str], title: str = "Test Book",
               creator: str = "A. Author",
               mimetype_entry: bool = True) -> bytes:
    """Minimal valid EPUB: OCF mimetype entry (stored, first),
    container.xml → OPF with manifest/spine, one XHTML per chapter."""
    import io
    import zipfile

    items = "".join(
        f'<item id="c{i}" href="ch{i}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for i in range(len(chapters)))
    refs = "".join(f'<itemref idref="c{i}"/>'
                   for i in range(len(chapters)))
    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f'<metadata><dc:title>{title}</dc:title>'
        f'<dc:creator>{creator}</dc:creator>'
        '<dc:language>en</dc:language></metadata>'
        f'<manifest>{items}</manifest><spine>{refs}</spine></package>')
    container = (
        '<?xml version="1.0"?>'
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:'
        'container" version="1.0"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        '</rootfiles></container>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        if mimetype_entry:
            zf.writestr(zipfile.ZipInfo("mimetype"),
                        "application/epub+zip",
                        compress_type=zipfile.ZIP_STORED)
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        for i, ch in enumerate(chapters):
            zf.writestr(
                f"OEBPS/ch{i}.xhtml",
                "<html><head><title>c</title></head>"
                f"<body><p>{ch}</p></body></html>")
    return buf.getvalue()


def build_encrypted_pdf(lines: list[str], mode: str = "rc4-128",
                        user_password: bytes = b"",
                        info_title: str | None = None) -> bytes:
    """build_pdf output re-encrypted under the PDF standard security
    handler (empty user password unless overridden): the content
    stream payload is replaced with ciphertext and an /Encrypt object
    + trailer with /ID is appended. Modes: 'rc4-40' (R2), 'rc4-128'
    (R3), 'aes-128' (R4 /AESV2), 'aes-256' (R6 /AESV3)."""
    import hashlib
    import re as _re
    import struct

    from nifi_extracttext_processor_spark.formats.crypto import (
        aes_cbc_encrypt, rc4,
    )
    from nifi_extracttext_processor_spark.formats.pdf_crypt import (
        PAD, _r6_hash,
    )

    pdf = build_pdf(lines)
    id0 = bytes(range(16))
    o_entry = bytes(range(0x20, 0x40))     # opaque input to Algorithm 2
    p = (-44) & 0xFFFFFFFF
    m = _re.search(rb"(\d+) 0 obj\n<< /Length \d+ >>\nstream\n", pdf)
    objnum = int(m.group(1))
    body_start = m.end()
    body_end = pdf.find(b"\nendstream", body_start)
    plain = pdf[body_start:body_end]

    if mode == "aes-256":
        vsalt, ksalt = bytes(range(8)), bytes(range(8, 16))
        upwd = user_password
        u = _r6_hash(upwd, vsalt) + vsalt + ksalt
        file_key = bytes(range(64, 96))
        ue = aes_cbc_encrypt(_r6_hash(upwd, ksalt), bytes(16),
                             file_key, add_padding=False)
        ct = aes_cbc_encrypt(file_key, bytes(range(100, 116)), plain)
        new_stream = bytes(range(100, 116)) + ct

        def enc_obj(num, gen, raw):
            iv = bytes(range(116, 132))
            return iv + aes_cbc_encrypt(file_key, iv, raw)
        enc_dict = (b"<< /Filter /Standard /V 5 /R 6 /Length 256"
                    b" /O <" + o_entry.hex().encode() + b">"
                    b" /U <" + u.hex().encode() + b">"
                    b" /UE <" + ue.hex().encode() + b"> >>")
    else:
        r, n, aes = {"rc4-40": (2, 5, False),
                     "rc4-128": (3, 16, False),
                     "aes-128": (4, 16, True)}[mode]
        pwd = (user_password + PAD)[:32]
        h = hashlib.md5()
        h.update(pwd)
        h.update(o_entry)
        h.update(struct.pack("<I", p))
        h.update(id0)
        key = h.digest()
        if r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        key = key[:n]
        if r == 2:
            u = rc4(key, PAD)
        else:
            h2 = hashlib.md5(PAD + id0).digest()
            eu = rc4(key, h2)
            for i in range(1, 20):
                eu = rc4(bytes(b ^ i for b in key), eu)
            u = eu + bytes(16)
        def enc_obj(num, gen, raw):
            ext = struct.pack("<I", num)[:3] + struct.pack("<H", gen)
            if aes:
                ext += b"sAlT"
            okey = hashlib.md5(key + ext).digest()[:min(n + 5, 16)]
            if aes:
                iv = bytes(range(116, 132))
                return iv + aes_cbc_encrypt(okey, iv, raw)
            return rc4(okey, raw)

        new_stream = enc_obj(objnum, 0, plain)
        cf = (b" /CF << /StdCF << /CFM /AESV2 >> >> /StmF /StdCF "
              if aes else
              (b" /CF << /StdCF << /CFM /V2 >> >> /StmF /StdCF "
               if r == 4 else b""))
        enc_dict = (b"<< /Filter /Standard /V "
                    + str(4 if r == 4 else (2 if r == 3 else 1)).encode()
                    + b" /R " + str(r).encode()
                    + b" /Length " + str(n * 8).encode() + cf
                    + b" /O <" + o_entry.hex().encode() + b">"
                    + b" /U <" + u.hex().encode() + b">"
                    + b" /P -44 >>")

    out = pdf[:body_start] + new_stream + pdf[body_end:]
    info = b""
    info_ref = b""
    if info_title is not None:
        ct = enc_obj(10, 0, info_title.encode("latin-1"))
        info = (b"10 0 obj\n<< /Title <" + ct.hex().encode()
                + b"> >>\nendobj\n")
        info_ref = b" /Info 10 0 R"
    out += (b"\n9 0 obj\n" + enc_dict + b"\nendobj\n" + info
            + b"trailer\n<< /Encrypt 9 0 R" + info_ref
            + b" /ID [<" + id0.hex().encode() + b"> <"
            + id0.hex().encode() + b">] >>\n%%EOF\n")
    return out


def build_encrypted_docx(paragraphs: list[str], scheme: str = "agile",
                         password: str = "VelvetSweatshop",
                         spin: int = 1000) -> bytes:
    """build_docx output wrapped in MS-OFFCRYPTO encryption (agile or
    standard) inside an OLE2 container — what Excel/Word produce for
    password-protected OOXML. Default password is Excel's well-known
    write-protection default."""
    import hashlib
    import struct
    from base64 import b64encode

    from nifi_extracttext_processor_spark.formats.crypto import (
        AES, aes_ecb_encrypt,
    )
    from nifi_extracttext_processor_spark.formats.ooxml_crypt import (
        BK_KEY_VALUE, BK_VERIFIER_INPUT, BK_VERIFIER_VALUE, _pad36,
    )

    def cbc_enc(key, iv, plain):
        if len(plain) % 16:
            plain += b"\x00" * (16 - len(plain) % 16)
        aes = AES(key)
        out = bytearray()
        prev = iv
        for o in range(0, len(plain), 16):
            blk = bytes(a ^ b for a, b in zip(plain[o:o + 16], prev))
            prev = aes.encrypt_block(blk)
            out += prev
        return bytes(out)

    pkg_plain = build_docx(paragraphs)

    if scheme == "agile":
        kd_salt = bytes(range(16))
        ek_salt = bytes(range(16, 32))
        key_value = bytes(range(32, 64))
        h = hashlib.sha512(ek_salt
                           + password.encode("utf-16-le")).digest()
        for i in range(spin):
            h = hashlib.sha512(struct.pack("<I", i) + h).digest()

        def dk(bk):
            return _pad36(hashlib.sha512(h + bk).digest(), 32)

        iv = _pad36(ek_salt, 16)
        vin = bytes(range(64, 80))
        evhi = cbc_enc(dk(BK_VERIFIER_INPUT), iv, vin)
        evhv = cbc_enc(dk(BK_VERIFIER_VALUE), iv,
                       hashlib.sha512(vin).digest())
        ekv = cbc_enc(dk(BK_KEY_VALUE), iv, key_value)
        enc_pkg = struct.pack("<Q", len(pkg_plain))
        body = pkg_plain
        if len(body) % 16:
            body += b"\x00" * (16 - len(body) % 16)
        for i in range(0, len(body), 4096):
            seg_iv = _pad36(hashlib.sha512(
                kd_salt + struct.pack("<I", i // 4096)).digest(), 16)
            enc_pkg += cbc_enc(key_value, seg_iv, body[i:i + 4096])
        b64 = lambda b: b64encode(b).decode()
        xml = f'''<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<encryption xmlns="http://schemas.microsoft.com/office/2006/encryption"
 xmlns:p="http://schemas.microsoft.com/office/2006/keyEncryptor/password">
 <keyData saltSize="16" blockSize="16" keyBits="256" hashSize="64"
  cipherAlgorithm="AES" cipherChaining="ChainingModeCBC"
  hashAlgorithm="SHA512" saltValue="{b64(kd_salt)}"/>
 <keyEncryptors><keyEncryptor
  uri="http://schemas.microsoft.com/office/2006/keyEncryptor/password">
 <p:encryptedKey spinCount="{spin}" saltSize="16" blockSize="16"
  keyBits="256" hashSize="64" cipherAlgorithm="AES"
  cipherChaining="ChainingModeCBC" hashAlgorithm="SHA512"
  saltValue="{b64(ek_salt)}"
  encryptedVerifierHashInput="{b64(evhi)}"
  encryptedVerifierHashValue="{b64(evhv)}"
  encryptedKeyValue="{b64(ekv)}"/>
 </keyEncryptor></keyEncryptors></encryption>'''
        info = struct.pack("<HHI", 4, 4, 0x40) + xml.encode()
    else:
        salt = bytes(range(16))
        h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
        for i in range(50000):
            h = hashlib.sha1(struct.pack("<I", i) + h).digest()
        h = hashlib.sha1(h + struct.pack("<I", 0)).digest()
        x1 = hashlib.sha1(bytes(0x36 ^ b
                                for b in h.ljust(64, b"\0"))).digest()
        x2 = hashlib.sha1(bytes(0x5C ^ b
                                for b in h.ljust(64, b"\0"))).digest()
        key = (x1 + x2)[:16]
        verifier = bytes(range(16, 32))
        enc_verifier = aes_ecb_encrypt(key, verifier)
        vh = hashlib.sha1(verifier).digest().ljust(32, b"\0")
        enc_vh = aes_ecb_encrypt(key, vh)
        csp = "Microsoft Enhanced RSA and AES Cryptographic Provider"
        hdr = struct.pack("<IIIIIIII", 0x24, 0, 0x660E, 0x8004, 128,
                          0x18, 0, 0) + csp.encode("utf-16-le") + b"\0\0"
        info = (struct.pack("<HHII", 4, 2, 0x24, len(hdr)) + hdr
                + struct.pack("<I", 16) + salt + enc_verifier
                + struct.pack("<I", 20) + enc_vh)
        body = pkg_plain
        if len(body) % 16:
            body += b"\x00" * (16 - len(body) % 16)
        enc_pkg = struct.pack("<Q", len(pkg_plain)) \
            + aes_ecb_encrypt(key, body)

    return _build_ole2({"EncryptionInfo": info,
                        "EncryptedPackage": enc_pkg})
