"""OpenDocument (.odt / .ods / .odp) text extraction — pure stdlib.

Parity target: the reference routes every format through Tika's
AutoDetectParser (/root/reference/.../ExtractTextProcessor.java:158,173),
whose OpenDocumentParser reads content.xml. Same here: one zipfile read,
one ElementTree walk — paragraph-per-line for text documents and
presentations, tab-separated rows for spreadsheets.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"

ODF_TEXT = "application/vnd.oasis.opendocument.text"
ODF_SPREADSHEET = "application/vnd.oasis.opendocument.spreadsheet"
ODF_PRESENTATION = "application/vnd.oasis.opendocument.presentation"


def _emit(node: ET.Element, parts: list[str]) -> None:
    """Depth-first flatten of one inline element: its own text, then each
    child in document order with the child's tail AFTER returning from it
    (a flat iter() walk misorders nested runs: tails of outer elements
    would land before inner descendants)."""
    tag = node.tag
    if tag == f"{_TEXT}tab":
        parts.append("\t")
        return
    if tag == f"{_TEXT}line-break":
        parts.append("\n")
        return
    if tag == f"{_TEXT}s":
        parts.append(" " * int(node.get(f"{_TEXT}c", "1")))
        return
    if node.text:
        parts.append(node.text)
    for child in node:
        _emit(child, parts)
        if child.tail:
            parts.append(child.tail)


def _para_text(p: ET.Element) -> str:
    """Flatten one text:p / text:h, honoring tab/line-break/space elems."""
    parts: list[str] = []
    if p.text:
        parts.append(p.text)
    for child in p:
        _emit(child, parts)
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


def extract_odf_text(data: bytes) -> str:
    """Text from content.xml: body paragraphs/headings in document order;
    spreadsheet cells joined with tabs, one row per line."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        if "content.xml" not in zf.namelist():
            raise ValueError("not an OpenDocument file: content.xml missing")
        root = ET.fromstring(zf.read("content.xml"))
    body = root.find(f"{_OFFICE}body")
    if body is None:
        raise ValueError("OpenDocument content.xml has no office:body")
    lines: list[str] = []
    spreadsheet = body.find(f"{_OFFICE}spreadsheet")
    if spreadsheet is not None:
        for row in spreadsheet.iter(f"{_TABLE}table-row"):
            cells = ["\n".join(_para_text(p) for p in cell.iter(f"{_TEXT}p"))
                     for cell in row.iter(f"{_TABLE}table-cell")]
            if any(cells):
                lines.append("\t".join(cells))
    else:
        # odt body text / odp slides: every text:p / text:h in order.
        for p in body.iter():
            if p.tag in (f"{_TEXT}p", f"{_TEXT}h"):
                lines.append(_para_text(p))
    return "\n".join(lines).rstrip() + ("\n" if lines else "")
