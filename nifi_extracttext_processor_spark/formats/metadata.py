"""Document metadata extraction (B3 ExtractMediaMetadata surface) —
pure stdlib, Tika-style key names.

The reference's ExtractMediaMetadata (56409-tika.xml:1761 region) emits
the full Tika metadata map as attributes. This module covers the
metadata the reference's own formats carry:

  * PDF Info dictionary (Title/Author/Subject/Keywords/Creator/
    Producer/CreationDate/ModDate)
  * OOXML docProps/core.xml + docProps/app.xml (docx/xlsx/pptx)
  * HTML <title>

Keys follow Tika's naming (dc:*, xmp:CreatorTool, pdf:Producer,
extended-properties:Application) so downstream attribute consumers see
familiar names.
"""

from __future__ import annotations

import html as _html
import io
import re
import zipfile
import xml.etree.ElementTree as ET

from .pdf import _decode_hex_string, _parse_string

_INFO_REF_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")
_PDF_INFO_KEYS = {
    b"Title": "dc:title",
    b"Author": "dc:creator",
    b"Subject": "dc:subject",
    b"Keywords": "meta:keyword",
    b"Creator": "xmp:CreatorTool",
    b"Producer": "pdf:Producer",
    b"CreationDate": "meta:creation-date",
    b"ModDate": "dcterms:modified",
}


def pdf_info(data: bytes) -> dict[str, str]:
    """Scrape the trailer's /Info object key/values."""
    out: dict[str, str] = {}
    m = None
    for m in _INFO_REF_RE.finditer(data):
        pass  # last /Info wins (incremental updates append new trailers)
    if m is None:
        return out
    obj_no = int(m.group(1))
    om = re.search(rb"(?<![0-9])%d\s+0\s+obj\b" % obj_no, data)
    if om is None:
        return out
    try:  # standard-security docs: Info strings are encrypted too
        from .pdf_crypt import decryptor_for
        dec = decryptor_for(data)
    except ValueError:
        return out          # passworded/unsupported: no metadata
    end = data.find(b"endobj", om.end())
    body = data[om.end(): end if end != -1 else len(data)]
    for km in re.finditer(rb"/(\w+)\s*(\(|<(?!<))", body):
        key = km.group(1)
        name = _PDF_INFO_KEYS.get(key)
        if name is None:
            continue
        if km.group(2) == b"(":
            try:
                val, _ = _parse_string(body, km.end() - 1)
            except Exception:
                continue
            if dec is not None:
                try:
                    raw = dec(obj_no, 0, val.encode("latin-1",
                                                    "replace"))
                except Exception:
                    continue
                val = raw.decode("latin-1", "replace")
            if val[:2] == "\xfe\xff":  # UTF-16BE literal string
                val = val.encode("latin-1", "replace") \
                         .decode("utf-16-be", "replace")[1:]
        else:
            hm = re.match(rb"<([0-9a-fA-F\s]*)>", body[km.end() - 1:])
            if not hm:
                continue
            h = re.sub(rb"\s", b"", hm.group(1))
            if dec is not None:
                try:
                    raw = dec(obj_no, 0, bytes.fromhex(
                        h.decode("ascii")))
                except Exception:
                    continue
                val = _decode_hex_string(raw.hex().encode())
            else:
                val = _decode_hex_string(h)
        if val:
            out[name] = val
    return out


_CORE_TAGS = {
    "{http://purl.org/dc/elements/1.1/}title": "dc:title",
    "{http://purl.org/dc/elements/1.1/}creator": "dc:creator",
    "{http://purl.org/dc/elements/1.1/}subject": "dc:subject",
    ("{http://schemas.openxmlformats.org/package/2006/metadata/"
     "core-properties}keywords"): "meta:keyword",
    ("{http://schemas.openxmlformats.org/package/2006/metadata/"
     "core-properties}lastModifiedBy"): "meta:last-author",
    "{http://purl.org/dc/terms/}created": "dcterms:created",
    "{http://purl.org/dc/terms/}modified": "dcterms:modified",
}


def ooxml_core_props(data: bytes) -> dict[str, str]:
    """docProps/core.xml + app.xml properties of any OOXML package."""
    out: dict[str, str] = {}
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
            if "docProps/core.xml" in names:
                root = ET.fromstring(zf.read("docProps/core.xml"))
                for el in root.iter():
                    name = _CORE_TAGS.get(el.tag)
                    if name and el.text:
                        out[name] = el.text
            if "docProps/app.xml" in names:
                root = ET.fromstring(zf.read("docProps/app.xml"))
                app_tags = {"Application": "extended-properties:Application",
                            "Words": "meta:word-count",
                            "Pages": "meta:page-count",
                            "Lines": "meta:line-count",
                            "Characters": "meta:character-count",
                            "Company": "extended-properties:Company",
                            "TotalTime": "extended-properties:TotalTime"}
                for el in root.iter():
                    local = el.tag.rsplit("}", 1)[-1]
                    key = app_tags.get(local)
                    if key and el.text:
                        out[key] = el.text
    except Exception:
        pass  # malformed package → no props, not an error
    return out


_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>",
                       re.IGNORECASE | re.DOTALL)


def html_title(data: bytes) -> str | None:
    m = _TITLE_RE.search(data)
    if not m:
        return None
    title = _html.unescape(
        m.group(1).decode("utf-8", "replace")).strip()
    return title or None


_ODF_META_TAGS = {
    "{http://purl.org/dc/elements/1.1/}title": "dc:title",
    "{http://purl.org/dc/elements/1.1/}creator": "dc:creator",
    "{http://purl.org/dc/elements/1.1/}subject": "dc:subject",
    "{http://purl.org/dc/elements/1.1/}date": "dcterms:modified",
    ("{urn:oasis:names:tc:opendocument:xmlns:meta:1.0}"
     "generator"): "meta:generator",
    ("{urn:oasis:names:tc:opendocument:xmlns:meta:1.0}"
     "initial-creator"): "meta:initial-author",
}


def odf_meta(data: bytes) -> dict[str, str]:
    """meta.xml properties of an OpenDocument package (Tika key names)."""
    out: dict[str, str] = {}
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            if "meta.xml" not in zf.namelist():
                return out
            root = ET.fromstring(zf.read("meta.xml"))
        for el in root.iter():
            name = _ODF_META_TAGS.get(el.tag)
            if name and el.text:
                out[name] = el.text
    except Exception:
        pass  # malformed package → no props, not an error
    return out


def eml_headers(data: bytes) -> dict[str, str]:
    """RFC-822 header metadata (Tika's RFC822Parser key names)."""
    import email
    import email.policy

    out: dict[str, str] = {}
    try:
        msg = email.message_from_bytes(data, policy=email.policy.default)
        for header, key in (("Subject", "dc:title"),
                            ("From", "Message-From"),
                            ("To", "Message-To"),
                            ("Cc", "Message-Cc"),
                            ("Date", "dcterms:created"),
                            ("Message-ID", "Message-ID")):
            v = msg[header]
            if v:
                out[key] = str(v)
    except Exception:
        pass
    return out
