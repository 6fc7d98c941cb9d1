"""MIME detection from magic bytes + filename — pure stdlib.

Re-implements the behavior of `tika.detect(stream, filename)` used at
/root/reference/.../ExtractTextProcessor.java:145,153,156 for the formats
the reference exercises (PDF, legacy Office, OOXML), with sensible
fallbacks for text/HTML/JSON and unknown binary.
"""

from __future__ import annotations

import io
import zipfile

MIME_PDF = "application/pdf"
MIME_DOC = "application/msword"
MIME_XLS = "application/vnd.ms-excel"
MIME_PPT = "application/vnd.ms-powerpoint"
MIME_DOCX = ("application/vnd.openxmlformats-officedocument"
             ".wordprocessingml.document")
MIME_XLSX = ("application/vnd.openxmlformats-officedocument"
             ".spreadsheetml.sheet")
MIME_PPTX = ("application/vnd.openxmlformats-officedocument"
             ".presentationml.presentation")
MIME_RTF = "application/rtf"
MIME_HTML = "text/html"
MIME_TEXT = "text/plain"
MIME_JSON = "application/json"
MIME_ZIP = "application/zip"
MIME_EPUB = "application/epub+zip"
MIME_OLE = "application/x-tika-msoffice"
MIME_OOXML_PROTECTED = "application/x-tika-ooxml-protected"
MIME_BIN = "application/octet-stream"
MIME_ODT = "application/vnd.oasis.opendocument.text"
MIME_ODS = "application/vnd.oasis.opendocument.spreadsheet"
MIME_ODP = "application/vnd.oasis.opendocument.presentation"
MIME_XML = "application/xml"
MIME_EML = "message/rfc822"
MIME_GZIP = "application/gzip"
MIME_CSV = "text/csv"
MIME_TAR = "application/x-tar"
MIME_PNG = "image/png"
MIME_GIF = "image/gif"
MIME_JPEG = "image/jpeg"
MIME_BMP = "image/bmp"
MIME_PGM = "image/x-portable-graymap"
MIME_PPM = "image/x-portable-pixmap"
MIME_MSG = "application/vnd.ms-outlook"
MIME_TIFF = "image/tiff"
MIME_WAV = "audio/x-wav"
MIME_BZIP2 = "application/x-bzip2"
MIME_XZ = "application/x-xz"
MIME_MP3 = "audio/mpeg"
MIME_FLAC = "audio/x-flac"
MIME_WEBP = "image/webp"
MIME_JP2 = "image/jp2"
MIME_ICO = "image/vnd.microsoft.icon"
MIME_SVG = "image/svg+xml"
MIME_AVI = "video/x-msvideo"

_EML_HEADS = (b"Received:", b"Return-Path:", b"From:", b"Subject:",
              b"Date:", b"To:", b"Message-ID:", b"MIME-Version:",
              b"Delivered-To:")

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _ole_kind(data: bytes) -> str:
    """Distinguish legacy Office types by directory stream names."""
    try:
        from .ole2 import Ole2File
        streams = set(Ole2File(data).list_streams())
    except Exception:
        streams = set()
    if "EncryptionInfo" in streams and "EncryptedPackage" in streams:
        return MIME_OOXML_PROTECTED
    if "WordDocument" in streams:
        return MIME_DOC
    if "Workbook" in streams or "Book" in streams:
        return MIME_XLS
    if "PowerPoint Document" in streams:
        return MIME_PPT
    if any(s.startswith(("__substg1.0_", "__properties_version1.0"))
           for s in streams):
        return MIME_MSG
    return MIME_OLE


def _zip_kind(data: bytes, filename: str | None) -> str:
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
    except Exception:
        return MIME_ZIP
    if "word/document.xml" in names:
        return MIME_DOCX
    if "xl/workbook.xml" in names:
        return MIME_XLSX
    if any(n.startswith("ppt/") for n in names):
        return MIME_PPTX
    if "mimetype" in names:
        try:
            with zipfile.ZipFile(io.BytesIO(data)) as zf:
                # bounded read: the member is attacker-supplied and
                # detect_mime runs before any bomb guard — 128 bytes
                # covers every real declaration
                with zf.open("mimetype") as f:
                    declared = f.read(128).decode("ascii", "replace")
        except Exception:
            declared = ""
        declared = declared.strip()  # trailing \n/\r\n in real EPUBs
        if declared == MIME_EPUB:
            return MIME_EPUB
        if declared in (MIME_ODT, MIME_ODS, MIME_ODP) \
                and "content.xml" in names:
            return declared
    if "META-INF/container.xml" in names and (
            filename or "").lower().endswith(".epub"):
        return MIME_EPUB  # OCF container missing its mimetype entry
    if filename:
        low = filename.lower()
        if low.endswith(".docx"):
            return MIME_DOCX
        if low.endswith(".xlsx"):
            return MIME_XLSX
        if low.endswith(".pptx"):
            return MIME_PPTX
    return MIME_ZIP


def _looks_html(head: bytes) -> bool:
    h = head.lstrip()[:256].lower()
    return (h.startswith(b"<!doctype html") or h.startswith(b"<html")
            or b"<head" in h[:64] or b"<body" in h[:64])


def detect_mime(data: bytes | None, filename: str | None = None) -> str:
    if not data:
        return MIME_BIN
    head = data[:512]
    if head.startswith(b"%PDF"):
        return MIME_PDF
    if head.startswith(_OLE_MAGIC):
        return _ole_kind(data)
    if head.startswith(b"PK\x03\x04"):
        return _zip_kind(data, filename)
    if head.startswith(b"\x1f\x8b"):
        return MIME_GZIP
    if head[:3] == b"BZh" and head[3:4].isdigit():
        return MIME_BZIP2
    if head.startswith(b"\xfd7zXZ\x00"):
        return MIME_XZ
    if head.startswith(b"ID3") or head[:2] in (b"\xff\xfb", b"\xff\xf3",
                                               b"\xff\xf2"):
        if head.startswith(b"ID3") and len(data) >= 10:
            # older taggers wrap FLAC in an ID3v2 tag — peek past it
            from .av_meta import _skip_id3v2
            off = _skip_id3v2(data)
            if data[off:off + 4] == b"fLaC":
                return MIME_FLAC
        return MIME_MP3
    if head.startswith(b"\x89PNG\r\n\x1a\n"):
        return MIME_PNG
    if head.startswith((b"GIF87a", b"GIF89a")):
        return MIME_GIF
    if head.startswith(b"\xff\xd8\xff"):
        return MIME_JPEG
    if head.startswith(b"BM") and len(data) >= 54:
        import struct
        if struct.unpack_from("<I", data, 14)[0] in (12, 40, 52, 56, 64,
                                                     108, 124):
            return MIME_BMP
    if head[:2] in (b"P5", b"P6") and head[2:3].isspace():
        return MIME_PGM if head[:2] == b"P5" else MIME_PPM
    if head[:4] in (b"II*\x00", b"MM\x00*"):
        return MIME_TIFF
    if head.startswith(b"\x00\x00\x00\x0cjP  \r\n\x87\n") \
            or head[:4] == b"\xff\x4f\xff\x51":
        return MIME_JP2
    if (head[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00")
            and len(data) >= 22):
        import struct
        if struct.unpack_from("<H", data, 4)[0] >= 1:
            return MIME_ICO
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return MIME_WAV
    if head[:4] == b"RIFF" and head[8:12] == b"WEBP":
        return MIME_WEBP
    if head[:4] == b"RIFF" and head[8:12] == b"AVI ":
        return MIME_AVI
    if head[:4] == b"fLaC":
        return MIME_FLAC
    if head[:4] == b"OggS":
        from .av_meta import ogg_mime
        return ogg_mime(data) or MIME_BIN
    if len(head) >= 12 and head[4:8] == b"ftyp":
        from .av_meta import mp4_mime
        return mp4_mime(data) or MIME_BIN
    if data[257:262] == b"ustar":
        return MIME_TAR
    if head.startswith(b"{\\rtf"):
        return MIME_RTF
    if _looks_html(head):
        return MIME_HTML
    stripped = head.lstrip()
    if stripped[:1] == b"<" and b"<svg" in head:
        return MIME_SVG
    if stripped.startswith(b"<?xml") or (
            stripped[:1] == b"<" and (filename or "").lower().endswith(".xml")):
        return MIME_XML
    if head.startswith(_EML_HEADS) or (filename or "").lower().endswith(".eml"):
        return MIME_EML
    if stripped[:1] in (b"{", b"[") and (filename or "").lower().endswith(".json"):
        return MIME_JSON
    # printable-ratio heuristic for text
    sample = head
    printable = sum(1 for b in sample if 32 <= b < 127 or b in (9, 10, 13))
    try:
        data[:4096].decode("utf-8")
        utf8_ok = True
    except UnicodeDecodeError:
        utf8_ok = False
    if sample and (printable / len(sample) > 0.9 or utf8_ok):
        if (filename or "").lower().endswith(".csv"):
            return MIME_CSV
        return MIME_TEXT
    return MIME_BIN
