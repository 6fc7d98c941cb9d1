"""Image header metadata — pure-stdlib dimension/depth extraction.

B3 parity widening: Tika's ImageParser family surfaces image metadata
as attributes (reference routes everything through AutoDetectParser +
ExtractMediaMetadata, 56409-tika.xml:1761 region). Keys follow Tika's
property names: ``tiff:ImageWidth`` / ``tiff:ImageLength`` (the shared
dimension properties across Tika's image parsers) plus
``tiff:BitsPerSample`` where the header states it.

Supported headers (no codec decode, header fields only — works on
truncated files past the header): PNG, GIF, JPEG (SOF scan), BMP,
binary netpbm (P5/P6).
"""

from __future__ import annotations

import struct

_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}

# TIFF IFD0 tags → Tika property names (TiffParser/ImageMetadataExtractor
# surface; reference routes photos through ExtractMediaMetadata,
# 56409-tika.xml:1761 region)
_TIFF_TAG_KEYS = {
    256: "tiff:ImageWidth", 257: "tiff:ImageLength",
    258: "tiff:BitsPerSample", 271: "tiff:Make", 272: "tiff:Model",
    274: "tiff:Orientation", 282: "tiff:XResolution",
    283: "tiff:YResolution", 296: "tiff:ResolutionUnit",
    305: "tiff:Software", 306: "tiff:DateTime",
}
# EXIF sub-IFD tags → Tika exif:* property names
_EXIF_TAG_KEYS = {
    0x829A: "exif:ExposureTime", 0x829D: "exif:FNumber",
    0x8827: "exif:IsoSpeedRatings", 0x9003: "exif:DateTimeOriginal",
    0x9209: "exif:Flash", 0x920A: "exif:FocalLength",
    0xA002: "exif:PixelXDimension", 0xA003: "exif:PixelYDimension",
}
_EXIF_IFD_POINTER = 0x8769
_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _tiff_values(data: bytes, entry_off: int, typ: int, count: int,
                 e: str):
    """Decode one IFD entry's value list. Values longer than 4 bytes
    live at an offset (relative to the TIFF header = data[0])."""
    size = _TIFF_TYPE_SIZES.get(typ)
    if size is None or count <= 0 or count > 4096:
        return None
    total = size * count
    if total <= 4:
        base = entry_off + 8
    else:
        (base,) = struct.unpack_from(f"{e}I", data, entry_off + 8)
    if base + total > len(data):
        return None
    if typ == 2:    # ASCII: NUL-terminated string
        raw = data[base:base + count]
        return [raw.split(b"\x00", 1)[0]
                .decode("ascii", "replace").strip()]
    vals = []
    for i in range(count):
        o = base + size * i
        if typ == 1 or typ == 7:
            vals.append(data[o])
        elif typ == 3:
            vals.append(struct.unpack_from(f"{e}H", data, o)[0])
        elif typ == 4:
            vals.append(struct.unpack_from(f"{e}I", data, o)[0])
        elif typ == 9:
            vals.append(struct.unpack_from(f"{e}i", data, o)[0])
        else:       # RATIONAL / SRATIONAL
            fmt = f"{e}II" if typ == 5 else f"{e}ii"
            num, den = struct.unpack_from(fmt, data, o)
            if den == 0:
                return None
            vals.append(num / den)
    return vals


def _fmt_tag(vals) -> str:
    parts = []
    for v in vals:
        if isinstance(v, float):
            parts.append(f"{v:g}")
        else:
            parts.append(str(v))
    return " ".join(parts)


def _walk_ifd(data: bytes, ifd_off: int, e: str,
              keymap: dict[int, str]) -> tuple[dict[str, str], int | None]:
    """One IFD pass: surface keymap'd tags, return (attrs, exif_ptr)."""
    out: dict[str, str] = {}
    exif_ptr: int | None = None
    # a valid IFD can never overlap the 8-byte TIFF header, so offsets
    # < 8 (e.g. a malformed IFD0 pointer of 0) would reinterpret the
    # header magic as an entry count and walk garbage — reject them
    if ifd_off < 8 or ifd_off + 2 > len(data):
        return out, None
    (n_tags,) = struct.unpack_from(f"{e}H", data, ifd_off)
    for t in range(min(n_tags, 256)):
        off = ifd_off + 2 + t * 12
        if off + 12 > len(data):
            break
        tag, typ = struct.unpack_from(f"{e}HH", data, off)
        (count,) = struct.unpack_from(f"{e}I", data, off + 4)
        if tag == _EXIF_IFD_POINTER and typ in (3, 4):
            vals = _tiff_values(data, off, typ, count, e)
            if vals:
                exif_ptr = int(vals[0])
            continue
        if tag not in keymap:
            continue
        vals = _tiff_values(data, off, typ, count, e)
        if vals:
            out[keymap[tag]] = _fmt_tag(vals)
    return out, exif_ptr


def tiff_metadata(data: bytes) -> dict[str, str]:
    """TIFF header (standalone .tif or a JPEG APP1 Exif payload) →
    Tika-keyed attributes: IFD0 tiff:* tags plus the EXIF sub-IFD's
    exif:* tags when the 0x8769 pointer is present."""
    if data[:4] not in (b"II*\x00", b"MM\x00*") or len(data) < 8:
        return {}
    e = ">" if data[:2] == b"MM" else "<"
    (ifd_off,) = struct.unpack_from(f"{e}I", data, 4)
    out, exif_ptr = _walk_ifd(data, ifd_off, e, _TIFF_TAG_KEYS)
    if exif_ptr is not None:
        exif, _ = _walk_ifd(data, exif_ptr, e, _EXIF_TAG_KEYS)
        out.update(exif)
    return out


def exif_metadata(data: bytes) -> dict[str, str]:
    """JPEG APP1 'Exif' segment → tiff:*/exif:* attributes (empty dict
    when absent). The TIFF blob inside APP1 is self-relative, so the
    shared IFD walker runs on the slice unchanged."""
    if not data.startswith(b"\xff\xd8\xff"):
        return {}
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        # consume 0xFF fill bytes before the marker (T.81 B.1.1.2)
        while i + 1 < len(data) and data[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(data):
            break
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:  # start of scan: no more metadata segments
            break
        seg_len = struct.unpack_from(">H", data, i + 2)[0]
        if marker == 0xE1 and data[i + 4:i + 10] == b"Exif\x00\x00":
            return tiff_metadata(data[i + 10:i + 2 + seg_len])
        i += 2 + seg_len
    return {}


def _gif_animation_meta(data: bytes) -> dict[str, str]:
    """Animation surface from a structural block walk (no LZW decode):
    frame count, NETSCAPE2.0 loop count (0 = infinite), and total
    duration from per-frame GCE delays. Damaged containers return
    whatever was countable before the damage — metadata is
    best-effort, unlike decode."""
    i = 13
    packed = data[10] if len(data) > 10 else 0
    if packed & 0x80:
        i += 3 * (2 << (packed & 0x07))
    frames = 0
    loop: int | None = None
    delay_cs = 0
    while i < len(data):
        b = data[i]
        if b == 0x21:  # extension
            if (data[i + 1:i + 2] == b"\xf9" and i + 5 < len(data)
                    and data[i + 2] >= 4):
                delay_cs += struct.unpack_from("<H", data, i + 4)[0]
            elif (data[i + 1:i + 2] == b"\xff"
                  and data[i + 3:i + 14] == b"NETSCAPE2.0"
                  and i + 17 < len(data) and data[i + 14] == 3):
                loop = struct.unpack_from("<H", data, i + 16)[0]
            i += 2
            while i < len(data) and data[i] != 0:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:  # image descriptor: skip table + LZW blocks
            if i + 10 > len(data):
                break
            p = data[i + 9]
            i += 10
            if p & 0x80:
                i += 3 * (2 << (p & 0x07))
            i += 1  # LZW min code size
            while i < len(data) and data[i] != 0:
                i += 1 + data[i]
            i += 1
            frames += 1
        elif b == 0x3B:
            break
        else:
            break  # structural damage: stop counting
    if frames == 0:
        return {}
    out = {"gif:FrameCount": str(frames)}
    if frames > 1:
        out["gif:AnimationDuration"] = str(round(delay_cs / 100.0, 2))
        if loop is not None:
            out["gif:LoopCount"] = str(loop)
    return out


_PNG_TEXT_KEYS = {"title": "dc:title", "author": "dc:creator",
                  "description": "dc:description",
                  "copyright": "dc:rights", "software": "png:Software",
                  "comment": "png:Comment"}


def _png_text_meta(data: bytes, max_val: int = 4096) -> dict[str, str]:
    """tEXt / zTXt / iTXt chunks -> Tika-style keys (PNG 1.2 §4.2.3).
    zTXt/compressed-iTXt inflate is BOUNDED at max_val bytes."""
    import zlib

    out: dict[str, str] = {}
    i = 8
    while i + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, i)
        cid = data[i + 4:i + 8]
        if cid == b"IEND" or clen > len(data) - i - 8:
            break
        body = data[i + 8:i + 8 + clen]
        try:
            if cid == b"tEXt":
                key, _, val = body.partition(b"\x00")
                txt = val[:max_val].decode("latin-1", "replace")
            elif cid == b"zTXt":
                key, _, rest = body.partition(b"\x00")
                if not rest or rest[0] != 0:   # method 0 = deflate
                    raise ValueError
                d = zlib.decompressobj()
                txt = d.decompress(rest[1:], max_val).decode(
                    "latin-1", "replace")
            elif cid == b"iTXt":
                key, _, rest = body.partition(b"\x00")
                if len(rest) < 2:
                    raise ValueError
                comp_flag, comp_method = rest[0], rest[1]
                rest = rest[2:]
                _lang, _, rest = rest.partition(b"\x00")
                _trans, _, text = rest.partition(b"\x00")
                if comp_flag:
                    if comp_method != 0:
                        raise ValueError
                    d = zlib.decompressobj()
                    text = d.decompress(text, max_val)
                txt = text[:max_val].decode("utf-8", "replace")
            else:
                i += 12 + clen
                continue
            k = key.decode("latin-1", "replace")
            if k and txt:
                out.setdefault(
                    _PNG_TEXT_KEYS.get(k.lower(), f"png:{k}"), txt)
        except Exception:
            pass            # malformed text chunk: skip, keep walking
        i += 12 + clen
    return out


def _webp_dimensions(data: bytes) -> dict[str, str]:
    """WebP dims from the first VP8 / VP8L / VP8X chunk (RIFF walk).
    Pixel decode is out of scope (VP8 codec); this is the Tika
    metadata surface only."""
    out: dict[str, str] = {}
    i = 12
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        (sz,) = struct.unpack_from("<I", data, i + 4)
        body = data[i + 8:i + 8 + sz]
        if cid == b"VP8X" and len(body) >= 10:
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
            out = {"tiff:ImageWidth": str(w), "tiff:ImageLength": str(h)}
            if body[0] & 0x02:
                out["webp:Animation"] = "true"
            break
        if cid == b"VP8 " and len(body) >= 10:
            # lossy: 3-byte frame tag, 0x9D012A sync, 14-bit dims
            if body[3:6] == b"\x9d\x01\x2a":
                w = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
                h = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
                out = {"tiff:ImageWidth": str(w),
                       "tiff:ImageLength": str(h)}
            break
        if cid == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            bits = struct.unpack_from("<I", body, 1)[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            out = {"tiff:ImageWidth": str(w), "tiff:ImageLength": str(h)}
            break
        i += 8 + sz + (sz & 1)
    return out


_XMP_SIG = b"http://ns.adobe.com/xap/1.0/\x00"

# XMP property localnames -> Tika keys; values live either as element
# text inside rdf:Alt/Seq/Bag li items or as attributes on
# rdf:Description
_XMP_KEYS = {"title": "dc:title", "creator": "dc:creator",
             "description": "dc:description", "rights": "dc:rights",
             "CreatorTool": "xmp:CreatorTool",
             "CreateDate": "xmp:CreateDate"}


def _xmp_properties(xml_bytes: bytes) -> dict[str, str]:
    """Best-effort XMP packet parse (stdlib ElementTree): dc:* and
    xmp:* simple properties, first rdf:li of Alt/Seq/Bag containers.
    Returns {} on any malformation."""
    import xml.etree.ElementTree as ET

    out: dict[str, str] = {}
    try:
        root = ET.fromstring(xml_bytes.decode("utf-8", "replace"))
    except ET.ParseError:
        return out
    for el in root.iter():
        local = el.tag.rsplit("}", 1)[-1]
        key = _XMP_KEYS.get(local)
        if key is None or key in out:
            continue
        # simple element text, or the first rdf:li descendant
        txt = (el.text or "").strip()
        if not txt:
            for li in el.iter():
                if li.tag.endswith("}li") and (li.text or "").strip():
                    txt = li.text.strip()
                    break
        if txt:
            out[key] = txt
    # attribute-form properties on rdf:Description
    for el in root.iter():
        if not el.tag.endswith("}Description"):
            continue
        for attr, val in el.attrib.items():
            local = attr.rsplit("}", 1)[-1]
            key = _XMP_KEYS.get(local)
            if key and key not in out and val.strip():
                out[key] = val.strip()
    return out


_JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"


def _jp2_dimensions(data: bytes) -> dict[str, str]:
    """JPEG 2000: jp2 container (jp2h/ihdr box walk) or raw J2K
    codestream (SOC + SIZ marker segment, ISO 15444-1 A.5.1)."""
    if data[:4] == b"\xff\x4f\xff\x51" and len(data) >= 24:
        # SOC(2) SIZ(2) Lsiz(2) Rsiz(2) then Xsiz/Ysiz/XOsiz/YOsiz
        xsiz, ysiz, xosiz, yosiz = struct.unpack_from(">IIII", data, 8)
        if xsiz > xosiz and ysiz > yosiz:
            return {"tiff:ImageWidth": str(xsiz - xosiz),
                    "tiff:ImageLength": str(ysiz - yosiz)}
        return {}
    if not data.startswith(_JP2_SIG):
        return {}
    i = 12
    depth = 0
    while i + 8 <= len(data) and depth < 8:
        (sz,) = struct.unpack_from(">I", data, i)
        typ = data[i + 4:i + 8]
        if sz == 0:
            sz = len(data) - i
        if sz < 8 or i + sz > len(data):
            break
        if typ == b"jp2h":          # superbox: descend
            i += 8
            depth += 1
            continue
        if typ == b"ihdr" and sz >= 22:
            h, w = struct.unpack_from(">II", data, i + 8)
            nc, = struct.unpack_from(">H", data, i + 16)
            bpc = data[i + 18]
            out = {"tiff:ImageWidth": str(w),
                   "tiff:ImageLength": str(h)}
            if bpc != 255:          # 255 = per-component, skip
                out["tiff:BitsPerSample"] = str((bpc & 0x7F) + 1)
            return out
        i += sz
    return {}


def _ico_dimensions(data: bytes) -> dict[str, str]:
    """ICO/CUR: largest ICONDIRENTRY (0 byte means 256)."""
    count = struct.unpack_from("<H", data, 4)[0]
    best = None
    for e in range(min(count, 64)):
        off = 6 + 16 * e
        if off + 16 > len(data):
            break
        w = data[off] or 256
        h = data[off + 1] or 256
        if best is None or w * h > best[0] * best[1]:
            best = (w, h)
    if best is None:
        return {}
    return {"tiff:ImageWidth": str(best[0]),
            "tiff:ImageLength": str(best[1])}


def _svg_dimensions(data: bytes) -> dict[str, str]:
    """SVG root width/height attributes (unit suffixes stripped) or
    the viewBox fallback; dc:title from the first <title>."""
    import re
    head = data[:4096].decode("utf-8", "replace")
    m = re.search(r"<svg\b[^>]*>", head, re.S)
    out: dict[str, str] = {}
    if m:
        tag = m.group(0)

        def attr(name):
            # (?<![-\w]) so stroke-width never matches as width
            a = re.search(r'(?<![-\w])' + name
                          + r'\s*=\s*["\']([^"\']+)["\']', tag)
            return a.group(1).strip() if a else None

        w, h = attr("width"), attr("height")

        def px(v):
            n = re.match(r"(\d+(?:\.\d+)?)\s*(px)?$", v or "")
            if not n:
                return None
            try:
                f = float(n.group(1))
            except ValueError:
                return None
            if not (0 < f < 1e9):
                return None
            return str(int(f)) if f.is_integer() else str(f)

        pw, ph = px(w), px(h)
        if pw and ph:
            out = {"tiff:ImageWidth": pw, "tiff:ImageLength": ph}
        else:
            vb = attr("viewBox")
            parts = (vb or "").replace(",", " ").split()
            if len(parts) == 4:
                try:
                    vw, vh = float(parts[2]), float(parts[3])
                    if 0 < vw < 1e9 and 0 < vh < 1e9:
                        out = {"tiff:ImageWidth": str(int(vw)),
                               "tiff:ImageLength": str(int(vh))}
                except (ValueError, OverflowError):
                    pass
    t = re.search(r"<title[^>]*>([^<]{1,256})</title>", head)
    if t and t.group(1).strip():
        out["dc:title"] = t.group(1).strip()
    return out


def image_dimensions(data: bytes) -> dict[str, str]:
    """(width, height[, bit depth]) from the image header, as Tika-keyed
    string attributes. Empty dict when the format isn't recognized."""
    if data.startswith(b"\x89PNG\r\n\x1a\n") and len(data) >= 26:
        w, h = struct.unpack_from(">II", data, 16)
        depth = data[24]
        out = {"tiff:ImageWidth": str(w), "tiff:ImageLength": str(h),
               "tiff:BitsPerSample": str(depth)}
        out.update(_png_text_meta(data))
        return out
    if (data[:4] == b"RIFF" and data[8:12] == b"WEBP"
            and len(data) >= 30):
        return _webp_dimensions(data)
    if (data.startswith(_JP2_SIG)
            or data[:4] == b"\xff\x4f\xff\x51"):
        return _jp2_dimensions(data)
    if (data[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00")
            and len(data) >= 22
            and struct.unpack_from("<H", data, 4)[0] >= 1):
        return _ico_dimensions(data)
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack_from("<HH", data, 6)
        out = {"tiff:ImageWidth": str(w), "tiff:ImageLength": str(h)}
        out.update(_gif_animation_meta(data))
        return out
    if data.startswith(b"\xff\xd8\xff"):
        # Single segment walk capturing both the APP1 Exif payload and
        # the SOF frame header; SOF's actual frame dimensions override
        # any EXIF-claimed tiff:* dims. (One pass, not exif_metadata +
        # a second SOF scan — this runs per row in media_metadata.)
        exif_slice: bytes | None = None
        xmp_slice: bytes | None = None
        sof: tuple[int, int, int] | None = None
        jfif_dpi: tuple[int, int] | None = None
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            # consume 0xFF fill bytes before the marker (T.81 B.1.1.2)
            while i + 1 < len(data) and data[i + 1] == 0xFF:
                i += 1
            if i + 4 > len(data):
                break
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xDA:  # start of scan: no more metadata
                break
            seg_len = struct.unpack_from(">H", data, i + 2)[0]
            if (marker == 0xE1 and exif_slice is None
                    and data[i + 4:i + 10] == b"Exif\x00\x00"):
                exif_slice = data[i + 10:i + 2 + seg_len]
            elif (marker == 0xE1 and xmp_slice is None
                    and data[i + 4:i + 4 + len(_XMP_SIG)] == _XMP_SIG):
                xmp_slice = data[i + 4 + len(_XMP_SIG):i + 2 + seg_len]
            elif (marker == 0xE0 and jfif_dpi is None
                    and data[i + 4:i + 9] == b"JFIF\x00"
                    and seg_len >= 14 and i + 16 <= len(data)
                    and data[i + 11] == 1):  # units 1 = dots/inch
                jfif_dpi = struct.unpack_from(">HH", data, i + 12)
            elif (marker in _JPEG_SOF and sof is None
                    and i + 9 <= len(data)):
                precision = data[i + 4]
                h, w = struct.unpack_from(">HH", data, i + 5)
                sof = (w, h, precision)
            # no early exit: XMP APP1 may legally follow SOF, and the
            # walk stops at SOS anyway (segment-level hops are cheap)
            i += 2 + seg_len
        out = tiff_metadata(exif_slice) if exif_slice is not None else {}
        if xmp_slice is not None:
            for k, v in _xmp_properties(xmp_slice).items():
                out.setdefault(k, v)
        if jfif_dpi is not None:
            out.setdefault("tiff:XResolution", str(jfif_dpi[0]))
            out.setdefault("tiff:YResolution", str(jfif_dpi[1]))
        if sof is not None:
            w, h, precision = sof
            out.update({"tiff:ImageWidth": str(w),
                        "tiff:ImageLength": str(h),
                        "tiff:BitsPerSample": str(precision)})
        return out
    if data.startswith(b"BM") and len(data) >= 54:
        w = struct.unpack_from("<i", data, 18)[0]
        h = abs(struct.unpack_from("<i", data, 22)[0])
        bpp = struct.unpack_from("<H", data, 28)[0]
        return {"tiff:ImageWidth": str(w), "tiff:ImageLength": str(h),
                "tiff:BitsPerSample": str(bpp)}
    if data[:4] in (b"II*\x00", b"MM\x00*") and len(data) >= 8:
        # TIFF: full IFD0 walk (typed values, EXIF sub-IFD included)
        return tiff_metadata(data)
    if data[:2] in (b"P5", b"P6") and data[2:3].isspace():
        toks: list[int] = []
        i = 2
        while len(toks) < 2 and i < len(data):
            while i < len(data) and data[i:i + 1].isspace():
                i += 1
            if data[i:i + 1] == b"#":
                while i < len(data) and data[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(data) and not data[j:j + 1].isspace():
                j += 1
            try:
                toks.append(int(data[i:j]))
            except ValueError:
                return {}
            i = j
        if len(toks) == 2:
            return {"tiff:ImageWidth": str(toks[0]),
                    "tiff:ImageLength": str(toks[1])}
    # SVG LAST: text sniff only after every magic-number format missed
    # (binary payloads can contain "<svg" by chance), and only for
    # markup-looking content (optional BOM, leading whitespace, '<')
    head = data[:1024]
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    if head.lstrip()[:1] == b"<" and b"<svg" in head:
        return _svg_dimensions(data)
    return {}


def wav_metadata(data: bytes) -> dict[str, str]:
    """RIFF/WAVE fmt-chunk metadata under Tika's xmpDM property names
    (sample rate, channels, bits, and duration where computable)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return {}
    out: dict[str, str] = {}
    i = 12
    byte_rate = 0
    data_size = None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        if cid == b"fmt " and i + 24 <= len(data):
            _, channels, rate = struct.unpack_from("<HHI", data, i + 8)
            (byte_rate,) = struct.unpack_from("<I", data, i + 16)
            (bits,) = struct.unpack_from("<H", data, i + 22)
            out["xmpDM:audioSampleRate"] = str(rate)
            out["channels"] = str(channels)
            out["bits"] = str(bits)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)
    if data_size is not None and byte_rate:
        out["xmpDM:duration"] = str(round(data_size / byte_rate, 3))
    return out


def _id3_text(payload: bytes) -> str:
    if not payload:
        return ""
    enc = payload[0]
    body = payload[1:]
    if enc == 0:
        return body.decode("latin-1", "replace").rstrip("\x00")
    if enc == 1:
        return body.decode("utf-16", "replace").rstrip("\x00")
    if enc == 2:
        return body.decode("utf-16-be", "replace").rstrip("\x00")
    return body.decode("utf-8", "replace").rstrip("\x00")


_ID3_KEYS = {b"TIT2": "dc:title", b"TPE1": "xmpDM:artist",
             b"TALB": "xmpDM:album"}
# ID3v2.2: 3-char frame ids, 3-byte big-endian sizes
_ID3V22_KEYS = {b"TT2": "dc:title", b"TP1": "xmpDM:artist",
                b"TAL": "xmpDM:album"}


# MPEG audio frame-header tables (ISO/IEC 11172-3 / 13818-3).
# Bitrates in kbps, indexed [layer][bitrate_index]; layer_bits:
# 3 = Layer I, 2 = Layer II, 1 = Layer III.
_MP3_BR_V1 = {
    3: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
        416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
        384),
    1: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320),
}
_MP3_BR_V2 = {
    3: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
        256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    1: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_SR_BASE = (44100, 48000, 32000)


def _mp3_frame_walk(data: bytes, i: int) -> dict[str, str]:
    """Duration/bitrate/samplerate estimate from a CBR/VBR MPEG audio
    frame-header walk — header arithmetic only, no audio decode.
    Returns {} if no valid frame starts at `i`."""
    n = len(data)
    frames = 0
    dur = 0.0
    kbps_sum = 0
    sr_out = None
    mode_out = None
    while i + 4 <= n and frames < 200_000:
        if data[i] != 0xFF or (data[i + 1] & 0xE0) != 0xE0:
            break  # lost sync (trailing tags, truncation)
        b1, b2, b3 = data[i + 1], data[i + 2], data[i + 3]
        ver_bits = (b1 >> 3) & 3    # 0=MPEG2.5, 2=MPEG2, 3=MPEG1
        layer_bits = (b1 >> 1) & 3  # 1=III, 2=II, 3=I
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        if (ver_bits == 1 or layer_bits == 0 or sr_idx == 3
                or br_idx in (0, 15)):  # reserved / free-format
            break
        v1 = ver_bits == 3
        kbps = (_MP3_BR_V1 if v1 else _MP3_BR_V2)[layer_bits][br_idx]
        sr = _MP3_SR_BASE[sr_idx] >> (0 if v1 else
                                      (1 if ver_bits == 2 else 2))
        if layer_bits == 3:        # Layer I: 384 samples, slot = 4 B
            spf = 384
            flen = (12 * kbps * 1000 // sr + pad) * 4
        else:
            spf = 1152 if (layer_bits == 2 or v1) else 576
            flen = spf // 8 * kbps * 1000 // sr + pad
        if flen <= 4 or i + flen > n:
            break  # malformed, or frame body truncated: don't count
        dur += spf / sr
        kbps_sum += kbps
        sr_out = sr
        mode_out = "Mono" if (b3 >> 6) == 3 else "Stereo"
        frames += 1
        i += flen
    if not frames:
        return {}
    return {
        "xmpDM:duration": str(round(dur, 3)),
        "xmpDM:audioSampleRate": str(sr_out),
        "xmpDM:audioChannelType": mode_out,
        "xmpDM:audioCompressor": "MP3",
        "xmpDM:fileDataRate": str(round(kbps_sum / frames, 1)),
    }


def mp3_metadata(data: bytes) -> dict[str, str]:
    """ID3v2.3/2.4 text frames under Tika property names (dc:title,
    xmpDM:artist, xmpDM:album), plus duration/bitrate/samplerate from
    an MPEG frame-header walk (no audio decode)."""
    if data[:3] != b"ID3" or len(data) < 10:
        # raw MPEG stream without an ID3v2 tag: frame walk only
        if len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
            return _mp3_frame_walk(data, 0)
        return {}
    ver = data[3]
    syncsafe_frames = ver >= 4
    tag_size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
    out: dict[str, str] = {}
    i = 10
    end = min(10 + tag_size, len(data))
    if ver == 2:            # ID3v2.2: 6-byte frame headers
        while i + 6 <= end:
            fid = data[i:i + 3]
            if fid == b"\x00\x00\x00":
                break
            size = int.from_bytes(data[i + 3:i + 6], "big")
            if size <= 0 or i + 6 + size > end:
                break
            if fid in _ID3V22_KEYS:
                val = _id3_text(data[i + 6:i + 6 + size])
                if val:
                    out[_ID3V22_KEYS[fid]] = val
            i += 6 + size
        i = end
    while i + 10 <= end:
        fid = data[i:i + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        if syncsafe_frames:
            size = ((data[i + 4] & 0x7F) << 21 | (data[i + 5] & 0x7F) << 14
                    | (data[i + 6] & 0x7F) << 7 | (data[i + 7] & 0x7F))
        else:
            (size,) = struct.unpack_from(">I", data, i + 4)
        if size <= 0 or i + 10 + size > end:
            break
        if fid in _ID3_KEYS:
            val = _id3_text(data[i + 10:i + 10 + size])
            if val:
                out[_ID3_KEYS[fid]] = val
        i += 10 + size
    # audio frames follow the tag (a bounded scan tolerates padding)
    j = 10 + tag_size
    for j in range(j, min(j + 4096, len(data) - 3)):
        if data[j] == 0xFF and (data[j + 1] & 0xE0) == 0xE0:
            out.update(_mp3_frame_walk(data, j))
            break
    return out
