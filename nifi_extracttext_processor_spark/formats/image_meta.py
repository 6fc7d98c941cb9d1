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


def image_dimensions(data: bytes) -> dict[str, str]:
    """(width, height[, bit depth]) from the image header, as Tika-keyed
    string attributes. Empty dict when the format isn't recognized."""
    if data.startswith(b"\x89PNG\r\n\x1a\n") and len(data) >= 26:
        w, h = struct.unpack_from(">II", data, 16)
        depth = data[24]
        return {"tiff:ImageWidth": str(w), "tiff:ImageLength": str(h),
                "tiff:BitsPerSample": str(depth)}
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack_from("<HH", data, 6)
        return {"tiff:ImageWidth": str(w), "tiff:ImageLength": str(h)}
    if data.startswith(b"\xff\xd8\xff"):
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > len(data):
                break
            seg_len = struct.unpack_from(">H", data, i + 2)[0]
            if marker in _JPEG_SOF and i + 9 <= len(data):
                precision = data[i + 4]
                h, w = struct.unpack_from(">HH", data, i + 5)
                return {"tiff:ImageWidth": str(w),
                        "tiff:ImageLength": str(h),
                        "tiff:BitsPerSample": str(precision)}
            i += 2 + seg_len
        return {}
    if data.startswith(b"BM") and len(data) >= 54:
        w = struct.unpack_from("<i", data, 18)[0]
        h = abs(struct.unpack_from("<i", data, 22)[0])
        bpp = struct.unpack_from("<H", data, 28)[0]
        return {"tiff:ImageWidth": str(w), "tiff:ImageLength": str(h),
                "tiff:BitsPerSample": str(bpp)}
    if data[:4] in (b"II*\x00", b"MM\x00*") and len(data) >= 8:
        # TIFF: walk the first IFD for ImageWidth(256)/ImageLength(257)
        big = data[:2] == b"MM"
        e = ">" if big else "<"
        (ifd_off,) = struct.unpack_from(f"{e}I", data, 4)
        out: dict[str, str] = {}
        if ifd_off + 2 <= len(data):
            (n_tags,) = struct.unpack_from(f"{e}H", data, ifd_off)
            for t in range(min(n_tags, 64)):
                off = ifd_off + 2 + t * 12
                if off + 12 > len(data):
                    break
                tag, typ = struct.unpack_from(f"{e}HH", data, off)
                if typ == 3:    # SHORT
                    (val,) = struct.unpack_from(f"{e}H", data, off + 8)
                elif typ == 4:  # LONG
                    (val,) = struct.unpack_from(f"{e}I", data, off + 8)
                else:
                    continue
                if tag == 256:
                    out["tiff:ImageWidth"] = str(val)
                elif tag == 257:
                    out["tiff:ImageLength"] = str(val)
                elif tag == 258:
                    out["tiff:BitsPerSample"] = str(val)
        return out
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


def mp3_metadata(data: bytes) -> dict[str, str]:
    """ID3v2.3/2.4 text frames under Tika property names (dc:title,
    xmpDM:artist, xmpDM:album). Frame walk only — no audio decode."""
    if data[:3] != b"ID3" or len(data) < 10:
        return {}
    ver = data[3]
    syncsafe_frames = ver >= 4
    tag_size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
    out: dict[str, str] = {}
    i = 10
    end = min(10 + tag_size, len(data))
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
    return out
