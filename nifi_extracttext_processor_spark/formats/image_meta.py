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
