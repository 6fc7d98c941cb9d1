"""Legacy Word .doc (Word 97–2003 binary, [MS-DOC]) text extraction.

Pure stdlib: OLE2 container via formats.ole2, then the FIB → Clx →
piece-table walk to recover the character stream.

Parity target: Tika golden prefix "A Simple WORD DOC File"
(/root/reference/.../ExtractTextProcessorTest.java:99,216).
"""

from __future__ import annotations

import struct

from .ole2 import Ole2File

_FC_CLX = 0x01A2   # FIB offset of fcClx (FibRgFcLcb97)
_LCB_CLX = 0x01A6


def _clean(ch: str) -> str:
    """Map Word control characters to plain-text equivalents."""
    o = ord(ch)
    if o == 0x0D or o == 0x0B:
        return "\n"
    if o == 0x07:  # cell / row mark
        return "\t"
    if o in (0x13, 0x14, 0x15, 0x01, 0x08, 0x28):  # field/object marks
        return ""
    if o == 0x1E:
        return "-"
    if o == 0x1F:
        return ""
    if o < 0x20 and o not in (0x09, 0x0A):
        return ""
    return ch


def _pieces_text(word_stream: bytes, table_stream: bytes) -> str:
    (fc_clx,) = struct.unpack_from("<I", word_stream, _FC_CLX)
    (lcb_clx,) = struct.unpack_from("<I", word_stream, _LCB_CLX)
    if lcb_clx == 0:
        raise ValueError("empty Clx")
    clx = table_stream[fc_clx : fc_clx + lcb_clx]
    i = 0
    plcpcd = None
    while i < len(clx):
        t = clx[i]
        if t == 0x01:  # Prc: skip property modifier
            (cb,) = struct.unpack_from("<H", clx, i + 1)
            i += 3 + cb
        elif t == 0x02:  # Pcdt
            (lcb,) = struct.unpack_from("<I", clx, i + 1)
            plcpcd = clx[i + 5 : i + 5 + lcb]
            break
        else:
            raise ValueError(f"bad Clx tag {t:#x}")
    if plcpcd is None:
        raise ValueError("no PlcPcd in Clx")
    n = (len(plcpcd) - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plcpcd, 0)
    out: list[str] = []
    for k in range(n):
        off = (n + 1) * 4 + k * 8
        (fc_raw,) = struct.unpack_from("<I", plcpcd, off + 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        nchars = cps[k + 1] - cps[k]
        if compressed:
            raw = word_stream[fc // 2 : fc // 2 + nchars]
            text = raw.decode("cp1252", "replace")
        else:
            raw = word_stream[fc : fc + 2 * nchars]
            text = raw.decode("utf-16-le", "replace")
        out.append("".join(_clean(c) for c in text))
    return "".join(out)


def _fallback_scrape(word_stream: bytes) -> str:
    """fcMin/fcMac contiguous text (pre-piece-table simple files)."""
    (fc_min,) = struct.unpack_from("<I", word_stream, 0x18)
    (fc_mac,) = struct.unpack_from("<I", word_stream, 0x1C)
    raw = word_stream[fc_min:fc_mac]
    text = raw.decode("cp1252", "replace")
    return "".join(_clean(c) for c in text)


def extract_doc_text(data: bytes) -> str:
    ole = Ole2File(data)
    word = ole.read_stream("WordDocument")
    if struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise ValueError("not a Word binary document (bad FIB magic)")
    (flags,) = struct.unpack_from("<H", word, 0x0A)
    table_name = "1Table" if flags & 0x0200 else "0Table"
    try:
        table = ole.read_stream(table_name)
        text = _pieces_text(word, table)
    except (KeyError, ValueError, struct.error):
        text = _fallback_scrape(word)
    return text


def extract_xls_text(data: bytes) -> str:
    """Legacy .xls: minimal BIFF8 scrape of SST + LABEL records."""
    ole = Ole2File(data)
    try:
        wb = ole.read_stream("Workbook")
    except KeyError:
        wb = ole.read_stream("Book")
    out: list[str] = []
    i = 0
    while i + 4 <= len(wb):
        rec, ln = struct.unpack_from("<HH", wb, i)
        body = wb[i + 4 : i + 4 + ln]
        if rec == 0x00FC:  # SST
            j = 8
            while j + 3 <= len(body):
                (cch,) = struct.unpack_from("<H", body, j)
                opts = body[j + 2]
                j += 3
                if opts & 0x04 or opts & 0x08:
                    break  # rich/ext runs — stop simple scrape
                if opts & 0x01:
                    out.append(body[j : j + 2 * cch].decode(
                        "utf-16-le", "replace"))
                    j += 2 * cch
                else:
                    out.append(body[j : j + cch].decode("cp1252", "replace"))
                    j += cch
        elif rec == 0x0204:  # LABEL
            (cch,) = struct.unpack_from("<H", body, 6)
            out.append(body[8 : 8 + cch].decode("cp1252", "replace"))
        i += 4 + ln
    return "\n".join(s for s in out if s.strip()) + ("\n" if out else "")
