"""Minimal pure-stdlib PDF text extraction.

Re-implements (Spark-first, from scratch) the text-mode behavior of the
reference's Tika `parseToString` path for PDFs
(/root/reference/.../ExtractTextProcessor.java:173-176): pull the visible
text out of page content streams.

Supported subset — enough for real-world "text PDFs":
  * standard-security ENCRYPTED documents with an empty user password
    (RC4-40/128, R4 /AESV2, R6 /AESV3 AES-256 — see pdf_crypt.py);
    password-protected / public-key-encrypted documents raise (the
    failure route, matching Tika's EncryptedDocumentException)
  * classic xref / object syntax, incremental updates
  * FlateDecode-compressed and raw content streams
  * object streams (ObjStm, PDF 1.5+) holding page/content objects
  * BT/ET text blocks with Tj / TJ / ' / " show operators
  * paren strings with escapes + octal, and hex strings
  * per-font ToUnicode CMaps ARE parsed (bfchar, bfrange with both
    contiguous-base and array destinations, codespace-derived 1- or
    2-byte code width — see _parse_tounicode_cmap below) and applied
    per Tf-selected font
  * Type0 fonts WITHOUT a ToUnicode CMap: the Unicode-valued
    predefined encodings (/UniJIS-UCS2-H, /UniGB-UTF16-V, ... — their
    source code space IS UCS-2/UTF-16BE, so show-string bytes decode
    directly) are decoded as UTF-16BE; the legacy-charset "encoding
    CMaps" (/90ms-RKSJ-H → Shift-JIS, /GBK-EUC-H → GBK, /ETen-B5-H →
    Big5, /KSCms-UHC-H → UHC, ... — ISO 32000-2 §9.7.5.2: the CMap
    name states the national charset its SOURCE code space is, and
    text extraction needs only source-bytes→Unicode, never the
    code→CID leg) decode through the matching stdlib codec — no
    Adobe CMap tables required; every OTHER predefined CMap
    (/Identity-H with no ToUnicode: codes ARE font-internal CIDs
    with no charset identity) still raises at first USE (→ failure
    route, A6 semantics — silently emitting latin-1 mojibake into a
    corpus would be worse than routing to failure). Fonts merely
    declared but never used do not raise.
  * per-page font namespaces are not tracked — fonts resolve in one
    global namespace, and codes missing from a 1-byte CMap fall back
    to latin-1

This is intentionally not a full PDF parser: malformed input raises
(caught upstream and routed to the failure port, matching the
reference's error semantics at ExtractTextProcessor.java:178-191).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _decompress_if_flate(dict_bytes: bytes, data: bytes) -> bytes | None:
    """Return decoded stream data, or None if the filter is unsupported."""
    if b"/FlateDecode" in dict_bytes:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            # some writers pad streams; try truncating trailing whitespace
            try:
                data = zlib.decompressobj().decompress(data)
            except zlib.error:
                return None
        if b"/Predictor" not in dict_bytes:
            return data
        return _apply_png_predictor(dict_bytes, data)
    if b"/Filter" not in dict_bytes:
        return data
    return None  # DCTDecode / CCITT etc. — image data, no text


def _apply_png_predictor(dict_bytes: bytes, data: bytes) -> bytes:
    m = re.search(rb"/Predictor\s+(\d+)", dict_bytes)
    pred = int(m.group(1)) if m else 1
    if pred < 10:
        return data
    m = re.search(rb"/Columns\s+(\d+)", dict_bytes)
    columns = int(m.group(1)) if m else 1
    rowlen = columns + 1
    out = bytearray()
    prev = bytearray(columns)
    for i in range(0, len(data) - rowlen + 1, rowlen):
        ft = data[i]
        row = bytearray(data[i + 1 : i + rowlen])
        if ft == 2:  # Up — the only predictor xref streams use in practice
            for j in range(columns):
                row[j] = (row[j] + prev[j]) & 0xFF
        out += row
        prev = row
    return bytes(out)


_OBJHDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _decrypt_all_streams(data: bytes, dec) -> bytes:
    """Standard-security documents: one pass replacing every stream
    payload with its decrypted bytes (per-object keys derived from the
    `N G obj` header preceding each stream dict), so the rest of the
    scan-based pipeline runs unchanged. XRef streams are never
    encrypted per spec — they are skipped. Stale /Length values are
    harmless (stream ends are located by `endstream`)."""
    out = bytearray()
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            out += data[pos:]
            return bytes(out)
        dict_end = m.start()
        dstart = data.rfind(b"<<", max(0, dict_end - 2048), dict_end)
        dict_bytes = data[dstart:dict_end] if dstart != -1 else b""
        data_start = m.end()
        end = data.find(b"endstream", data_start)
        if end == -1:
            out += data[pos:]
            return bytes(out)
        raw = data[data_start:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
        plain = raw
        if b"/XRef" not in dict_bytes and dstart != -1:
            hdr = None
            for hdr in _OBJHDR_RE.finditer(
                    data, max(0, dstart - 256), dstart):
                pass
            if hdr is not None:
                plain = dec(int(hdr.group(1)), int(hdr.group(2)), raw)
        out += data[pos:data_start]
        out += plain + b"\n"
        out += data[end:end + len(b"endstream")]
        pos = end + len(b"endstream")


def _iter_streams(buf: bytes):
    """Yield (dict_bytes, raw_stream_bytes) for every stream object."""
    pos = 0
    while True:
        m = _STREAM_RE.search(buf, pos)
        if not m:
            return
        # the stream dict is the << ... >> immediately before `stream`
        dict_end = m.start()
        dstart = buf.rfind(b"<<", max(0, dict_end - 2048), dict_end)
        dict_bytes = buf[dstart:dict_end] if dstart != -1 else b""
        data_start = m.end()
        end = buf.find(b"endstream", data_start)
        if end == -1:
            return
        data = buf[data_start:end]
        # strip the EOL that precedes `endstream`
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n") or data.endswith(b"\r"):
            data = data[:-1]
        yield dict_bytes, data
        pos = end + len(b"endstream")


def _expand_object_streams(buf: bytes) -> list[bytes]:
    """Decode /Type/ObjStm streams so their member objects become scannable."""
    chunks = []
    for dict_bytes, data in _iter_streams(buf):
        if b"/ObjStm" not in dict_bytes:
            continue
        decoded = _decompress_if_flate(dict_bytes, data)
        if decoded is not None:
            chunks.append(decoded)
    return chunks

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _parse_string(buf: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at the '(' at buf[i]."""
    out = []
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal
                oct_digits = chr(e)
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= buf[i] <= 0x37:
                    oct_digits += chr(buf[i])
                    i += 1
                out.append(chr(int(oct_digits, 8) & 0xFF))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _decode_hex_string(h: bytes) -> str:
    h = re.sub(rb"[^0-9a-fA-F]", b"", h)
    if len(h) % 2:
        h += b"0"
    raw = bytes.fromhex(h.decode("ascii", "ignore"))
    # UTF-16BE with BOM, else 2-byte-aligned CID text heuristic, else latin-1
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    if len(raw) >= 2 and raw[0] == 0 and len(raw) % 2 == 0:
        return raw.decode("utf-16-be", "replace")
    return raw.decode("latin-1", "replace")


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")


# ---------------------------------------------------------------------------
# ToUnicode CMap support (maps subsetted-font character codes back to text)
# ---------------------------------------------------------------------------

_HEX_TOKEN_RE = re.compile(rb"<([0-9a-fA-F]+)>")


def _parse_tounicode_cmap(data: bytes) -> tuple[int, dict[int, str]]:
    """Parse a ToUnicode CMap stream → (code_byte_len, code→str map)."""
    cmap: dict[int, str] = {}
    code_len = 2
    m = re.search(
        rb"begincodespacerange\s*<([0-9a-fA-F]+)>", data)
    if m:
        code_len = max(1, len(m.group(1)) // 2)

    def _u(hexs: bytes) -> str:
        raw = bytes.fromhex(hexs.decode("ascii"))
        if len(raw) % 2:
            raw = b"\x00" + raw
        return raw.decode("utf-16-be", "replace")

    for block in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = _HEX_TOKEN_RE.findall(block.group(1))
        for k in range(0, len(toks) - 1, 2):
            cmap[int(toks[k], 16)] = _u(toks[k + 1])
    for block in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = block.group(1)
        i = 0
        # entries: <lo> <hi> <dst>   or   <lo> <hi> [<d0> <d1> ...]
        entry_re = re.compile(
            rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*(\[[^\]]*\]|<[0-9a-fA-F]+>)")
        for m2 in entry_re.finditer(body):
            lo, hi = int(m2.group(1), 16), int(m2.group(2), 16)
            dst = m2.group(3)
            if dst.startswith(b"["):
                dsts = _HEX_TOKEN_RE.findall(dst)
                for off, d in enumerate(dsts):
                    if lo + off <= hi:
                        cmap[lo + off] = _u(d)
            else:
                base_hex = dst[1:-1]
                base_raw = bytes.fromhex(base_hex.decode("ascii"))
                if len(base_raw) % 2:
                    base_raw = b"\x00" + base_raw
                base = int.from_bytes(base_raw, "big")
                width = len(base_raw)
                for off in range(hi - lo + 1):
                    v = base + off
                    cmap[lo + off] = v.to_bytes(width, "big").decode(
                        "utf-16-be", "replace")
    return code_len, cmap


def _apply_cmap(s: str, font: "FontEntry | None") -> str:
    """Map raw string-object code units through the current font's
    CMap / predefined-encoding handler (see module docstring for the
    FontEntry variants)."""
    if not font:
        return s
    if font == "utf16be":
        # Unicode-valued predefined CMap: the code space IS UTF-16BE
        return s.encode("latin-1", "replace").decode("utf-16-be",
                                                     "replace")
    if isinstance(font, tuple) and font[0] == "charset":
        # legacy-charset encoding CMap: show-string bytes ARE bytes
        # of the named national charset — stdlib codec, no CID leg
        return s.encode("latin-1", "replace").decode(font[1], "replace")
    if isinstance(font, tuple) and font[0] == "raise":
        # A6 semantics: route to failure instead of emitting mojibake
        raise ValueError(
            f"unsupported predefined CMap /{font[1]}: character "
            "codes cannot be mapped to text without its code->CID "
            "table")
    code_len, cmap = font
    if not cmap:
        return s
    raw = s.encode("latin-1", "replace")
    out = []
    for k in range(0, len(raw) - code_len + 1, code_len):
        code = int.from_bytes(raw[k : k + code_len], "big")
        ch = cmap.get(code)
        if ch is not None:
            out.append(ch)
        elif code_len == 1:
            out.append(chr(code))
    return "".join(out)


# FontEntry — a fontmap value is one of:
#   (code_len, {code: str})  parsed ToUnicode CMap (the good case)
#   "utf16be"                Unicode-valued predefined CMap: decode
#                            show strings as UTF-16BE directly
#   ("charset", codec)       legacy-charset encoding CMap: decode
#                            show-string bytes with the stdlib codec
#                            the CMap name states (RKSJ=Shift-JIS, ...)
#   ("raise", name)          any other predefined CMap without a
#                            ToUnicode — showing text with it raises
#                            (failure route) instead of mojibaking
FontEntry = "tuple[int, dict[int, str]] | str | tuple[str, str]"

# predefined CMaps whose SOURCE code space is UCS-2 / UTF-16BE
# (ISO 32000-2 §9.7.5.2 predefined CMap names: UniJIS-UCS2-H,
# Uni{GB,CNS,KS,JIS,JIS2004,...}-{UCS2,UTF16}-{H,V})
_UNICODE_CMAP_RE = re.compile(rb"^Uni[A-Za-z0-9]+-(UCS2|UTF16)-[HV]$")

# Predefined "encoding CMaps" whose SOURCE code space is a national
# charset the Python stdlib ships (ISO 32000-2 §9.7.5.2 name list;
# the name itself states the charset: RKSJ = Shift-JIS with Roman/
# Kana, EUC, GBK, B5 = Big5, UHC). Extraction needs only source
# bytes → Unicode, which is exactly what the codec does — the
# code→CID leg (the part that would need Adobe's tables) is a
# glyph-selection concern extraction never touches. The -H/-V suffix
# is writing direction only.
_CHARSET_CMAP_BASES: "dict[bytes, str]" = {
    # Japanese (Adobe-Japan1); cp932 = Microsoft Shift-JIS, the
    # superset the 90ms* (Windows) collections denote; 83pv/90pv are
    # Mac variants whose JIS core cp932 also covers
    b"90ms-RKSJ": "cp932", b"90msp-RKSJ": "cp932",
    b"Ext-RKSJ": "cp932", b"Add-RKSJ": "cp932",
    b"90pv-RKSJ": "cp932", b"83pv-RKSJ": "cp932",
    b"EUC": "euc_jp", b"Ext-EUC": "euc_jp", b"Add-EUC": "euc_jp",
    # Simplified Chinese (Adobe-GB1)
    b"GB-EUC": "gb2312", b"GBpc-EUC": "gb2312",
    b"GBK-EUC": "gbk", b"GBKp-EUC": "gbk", b"GBK2K": "gb18030",
    # Traditional Chinese (Adobe-CNS1)
    b"B5pc": "big5", b"ETen-B5": "big5", b"ETenms-B5": "big5",
    b"HKscs-B5": "big5hkscs",
    # Korean (Adobe-Korea1)
    b"KSC-EUC": "euc_kr",
    b"KSCms-UHC": "cp949", b"KSCms-UHC-HW": "cp949",
}
_CHARSET_CMAPS: "dict[bytes, str]" = {
    base + suffix: codec
    for base, codec in _CHARSET_CMAP_BASES.items()
    for suffix in (b"-H", b"-V")
}


def _build_fontmap(buffers: list[bytes]) -> "dict[bytes, FontEntry]":
    """Resolve /Font resource dicts → per-font decode handlers (see
    FontEntry above), keyed by resource name.

    Heuristic single global namespace: page-level resource names (/F1, /TT0…)
    rarely collide with different meanings inside one document.
    """
    # 1. object number → (dict_bytes, decoded stream | None) and raw bodies
    objstreams: dict[int, bytes] = {}
    objbodies: dict[int, bytes] = {}
    for buf in buffers:
        for m in _OBJ_RE.finditer(buf):
            num = int(m.group(1))
            end = buf.find(b"endobj", m.end())
            body = buf[m.end() : end if end != -1 else m.end() + 4096]
            objbodies[num] = body
            sm = _STREAM_RE.search(body)
            if sm:
                raw = body[sm.end() : body.find(b"endstream", sm.end())]
                dec = _decompress_if_flate(body[: sm.start()], raw)
                if dec is not None:
                    objstreams[num] = dec
    # 2. font objects: ToUnicode wins; else Type0 predefined CMaps
    font_cmaps: "dict[int, FontEntry]" = {}
    for num, body in objbodies.items():
        if b"/Font" not in body and b"/BaseFont" not in body:
            continue
        m = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
        if m:
            ref = int(m.group(1))
            if ref in objstreams:
                font_cmaps[num] = _parse_tounicode_cmap(objstreams[ref])
            continue
        if re.search(rb"/Subtype\s*/Type0\b", body):
            e = re.search(rb"/Encoding\s*/([^\s/<>\[\]()]+)", body)
            if e is None:
                continue
            enc = e.group(1)
            if _UNICODE_CMAP_RE.match(enc):
                font_cmaps[num] = "utf16be"
            elif enc in _CHARSET_CMAPS:
                font_cmaps[num] = ("charset", _CHARSET_CMAPS[enc])
            else:
                # Identity-H/V without ToUnicode and the rest —
                # raising is deferred to first USE so documents that
                # merely embed the font still extract
                font_cmaps[num] = ("raise", enc.decode("latin-1"))
    # 3. /Font << /Name N 0 R ... >> resource dicts anywhere
    fontmap: "dict[bytes, FontEntry]" = {}
    for body in objbodies.values():
        for m in re.finditer(rb"/Font\s*<<(.*?)>>", body, re.S):
            for e in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R",
                                 m.group(1)):
                ref = int(e.group(2))
                if ref in font_cmaps:
                    fontmap[e.group(1)] = font_cmaps[ref]
    return fontmap


def _extract_text_ops(
    content: bytes,
    fontmap: "dict[bytes, FontEntry] | None" = None,
) -> str:
    """Walk a content stream, collecting show-text operators into lines."""
    fontmap = fontmap or {}
    lines: list[str] = []
    cur: list[str] = []
    i, n = 0, len(content)
    pending: str | None = None  # last parsed string awaiting its operator
    last_name: bytes | None = None
    cur_font: "FontEntry | None" = None
    in_array = False

    def flush_line():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    def _emit(s: str):
        nonlocal pending
        if in_array and pending is not None:
            pending += s
        else:
            pending = s

    while i < n:
        c = content[i]
        if c == 0x28:  # ( literal string
            s, i = _parse_string(content, i)
            _emit(_apply_cmap(s, cur_font))
            continue
        if c == 0x3C and i + 1 < n and content[i + 1] != 0x3C:  # <hex>
            j = content.find(b">", i)
            if j == -1:
                break
            if cur_font:
                hexs = re.sub(rb"[^0-9a-fA-F]", b"",
                              content[i + 1 : j]).decode("ascii")
                if len(hexs) % 2:
                    hexs += "0"
                raw = bytes.fromhex(hexs)
                _emit(_apply_cmap(raw.decode("latin-1"), cur_font))
            else:
                _emit(_decode_hex_string(content[i + 1 : j]))
            i = j + 1
            continue
        if c == 0x2F:  # /Name token
            j = i + 1
            while j < n and content[j] not in b" \t\r\n()<>[]/%":
                j += 1
            last_name = content[i + 1 : j]
            i = j
            continue
        if c == 0x5B:  # [ TJ array start — accumulate member strings
            in_array = True
            pending = ""
            i += 1
            continue
        if c == 0x5D:  # ] end of TJ array
            in_array = False
            i += 1
            continue
        # operator tokens
        if 0x21 <= c <= 0x7E and not (0x30 <= c <= 0x39):
            j = i
            while j < n and content[j] not in b" \t\r\n()<>[]/%":
                j += 1
            op = content[i:j]
            if op == b"BI":  # inline image: skip to EI to avoid binary noise
                e = content.find(b"EI", j)
                i = n if e == -1 else e + 2
                continue
            if op == b"Tf":
                cur_font = fontmap.get(last_name) if last_name else None
            elif op in (b"Tj", b"TJ"):
                if pending is not None:
                    cur.append(pending)
                    pending = None
            elif op == b"'":
                flush_line()
                if pending is not None:
                    cur.append(pending)
                    pending = None
            elif op == b'"':
                flush_line()
                if pending is not None:
                    cur.append(pending)
                    pending = None
            elif op in (b"Td", b"TD", b"T*", b"ET"):
                flush_line()
            i = j if j > i else i + 1
            continue
        i += 1
    flush_line()
    return "\n".join(lines)


def pdf_has_images(data: bytes) -> bool:
    """True when the document carries raster content: an image
    XObject stream (`/Subtype /Image`) anywhere, or an inline image
    (BI..ID..EI) inside a content stream. Cheap structural scan —
    no pixel decode."""
    if not data.startswith(b"%PDF"):
        return False
    try:
        from .pdf_crypt import decryptor_for

        dec = decryptor_for(data)
        if dec is not None:
            data = _decrypt_all_streams(data, dec)
    except Exception:
        return False
    for buf in [data] + _expand_object_streams(data):
        for dict_bytes, raw in _iter_streams(buf):
            if b"/ObjStm" in dict_bytes or b"/XRef" in dict_bytes:
                continue
            if b"/Image" in dict_bytes:
                return True
            if b"/FontFile" in dict_bytes:
                continue
            decoded = _decompress_if_flate(dict_bytes, raw)
            if decoded is None:
                continue
            # inline image: BI <dict> ID <bytes> EI
            m = re.search(rb"(?:^|[\s>])BI[\s/]", decoded)
            if m and decoded.find(b"ID", m.start()) != -1 \
                    and decoded.find(b"EI", m.start()) != -1:
                return True
    return False


def pdf_needs_ocr(data: bytes) -> bool:
    """Scanned-document detector: True when the PDF yields NO
    extractable text but DOES contain raster images — the image-only
    signature Tika's stack hands to Tesseract (the OCRParser warning
    visible in the reference's surefire test output). This engine has
    no OCR (pure-stdlib determination, SURVEY §7); the flag exists so
    such documents surface on a distinct route instead of passing
    silently with empty text."""
    try:
        if extract_pdf_text(data).strip():
            return False
    except ValueError:
        return False  # corrupt/encrypted-unreadable → failure route
    return pdf_has_images(data)


def extract_pdf_text(data: bytes, max_length: int = -1) -> str:
    """Extract plain text from PDF bytes.

    Parity target: Tika `parseToString` golden prefixes in
    /root/reference/.../ExtractTextProcessorTest.java:69,249-295.
    """
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF: missing %PDF header")
    if not _OBJ_RE.search(data):
        # parity with Tika: structurally-empty/truncated PDFs throw
        # (TikaException → failure route, ExtractTextProcessor.java:178)
        raise ValueError("corrupt PDF: no indirect objects found")
    from .pdf_crypt import decryptor_for
    dec = decryptor_for(data)   # ValueError (→ failure route) when a
    if dec is not None:         # real password / unsupported handler
        data = _decrypt_all_streams(data, dec)
    buffers = [data]
    buffers += _expand_object_streams(data)
    fontmap = _build_fontmap(buffers)
    parts: list[str] = []
    for buf in buffers:
        for dict_bytes, raw in _iter_streams(buf):
            if b"/ObjStm" in dict_bytes or b"/XRef" in dict_bytes:
                continue
            if b"/Image" in dict_bytes or b"/FontFile" in dict_bytes:
                continue
            decoded = _decompress_if_flate(dict_bytes, raw)
            if decoded is None:
                continue
            # only streams that actually contain text-showing operators
            if b"BT" not in decoded and b"Tj" not in decoded and b"TJ" not in decoded:
                continue
            text = _extract_text_ops(decoded, fontmap)
            if text.strip():
                parts.append(text)
            if max_length >= 0 and sum(len(p) for p in parts) >= max_length:
                break
    text = "\n".join(parts)
    text = re.sub(r"[ \t]+\n", "\n", text)
    if max_length >= 0:
        text = text[:max_length]
    return text
