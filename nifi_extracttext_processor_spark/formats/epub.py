"""EPUB (OCF container) text + metadata extraction, pure stdlib.

Tika's EpubParser parity surface for the reference's AutoDetectParser
path (ExtractTextProcessor.java:173): an EPUB is a zip whose
`mimetype` entry declares application/epub+zip, whose
META-INF/container.xml points at the OPF package document, and whose
OPF lists a manifest (id → href) plus a spine (reading order).
Chapters are XHTML, so each spine document goes through the shared
html_to_text path; package metadata surfaces the dc:* fields.
"""

from __future__ import annotations

import io
import posixpath
import xml.etree.ElementTree as ET
import zipfile

from . import MAX_DECOMPRESSED_BYTES
from .html import html_to_text
from .mime import MIME_EPUB  # single definition, re-exported here


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _read_capped(zf: zipfile.ZipFile, path: str, budget: int) -> bytes:
    """Read a zip member through a streaming handle, never expanding
    more than `budget` bytes — zf.read() trusts the member's declared
    size, so an EPUB-flagged DEFLATE bomb (~1000:1) would otherwise
    bypass the MAX_DECOMPRESSED_BYTES guard the generic archive path
    enforces."""
    with zf.open(path) as f:
        out = f.read(budget + 1)
    if len(out) > budget:
        raise ValueError(
            f"EPUB member {path!r} exceeds the remaining "
            f"{budget}-byte share of the {MAX_DECOMPRESSED_BYTES} "
            "expanded-bytes budget")
    return out


def _opf_path(zf: zipfile.ZipFile) -> str:
    root = ET.fromstring(
        _read_capped(zf, "META-INF/container.xml",
                     MAX_DECOMPRESSED_BYTES))
    for el in root.iter():
        if _local(el.tag) == "rootfile":
            p = el.get("full-path")
            if p:
                return p
    raise ValueError("EPUB container.xml declares no rootfile")


def _package(zf: zipfile.ZipFile) -> tuple[str, ET.Element]:
    opf = _opf_path(zf)
    return opf, ET.fromstring(
        _read_capped(zf, opf, MAX_DECOMPRESSED_BYTES))


def extract_epub_text(data: bytes) -> str:
    """Spine-ordered text of every readable XHTML chapter, one
    chapter per paragraph block (newline-joined)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        opf, pkg = _package(zf)
        base = posixpath.dirname(opf)
        manifest: dict[str, str] = {}
        spine: list[str] = []
        for el in pkg.iter():
            tag = _local(el.tag)
            if tag == "item" and el.get("id") and el.get("href"):
                manifest[el.get("id")] = el.get("href")
            elif tag == "itemref" and el.get("idref"):
                spine.append(el.get("idref"))
        names = set(zf.namelist())
        parts: list[str] = []
        budget = MAX_DECOMPRESSED_BYTES  # shared across all chapters
        for idref in spine:
            href = manifest.get(idref)
            if not href:
                continue
            path = (posixpath.normpath(posixpath.join(base, href))
                    if base else href)
            if path not in names:
                continue
            chapter = _read_capped(zf, path, budget)
            budget -= len(chapter)
            text = html_to_text(chapter)
            if text:
                parts.append(text)
        if not parts:
            raise ValueError("EPUB has no readable spine documents")
        return "\n".join(parts)


def epub_metadata(data: bytes) -> dict[str, str]:
    """dc:title / dc:creator / dc:language from the OPF package
    (Tika property names); empty dict when `data` is not an EPUB."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            if "META-INF/container.xml" not in zf.namelist():
                return {}
            _, pkg = _package(zf)
    except Exception:
        return {}
    out: dict[str, str] = {}
    keys = {"title": "dc:title", "creator": "dc:creator",
            "language": "dc:language"}
    for el in pkg.iter():
        key = keys.get(_local(el.tag))
        if key and el.text and el.text.strip():
            out.setdefault(key, el.text.strip())
    return out
