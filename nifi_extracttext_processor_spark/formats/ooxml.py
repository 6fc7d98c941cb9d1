"""Office Open XML (.docx / .xlsx / .pptx) text extraction — pure stdlib.

Parity target: Tika parseToString on the reference fixtures
(/root/reference/.../ExtractTextProcessorTest.java:103-133 — docx golden
prefix "A Simple WORD DOCX File"); PPTX handled by the reference via
AutoDetectParser (ExtractTextProcessor.java:158,173).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


def _docx_paragraph_text(p: ET.Element) -> str:
    parts: list[str] = []
    for node in p.iter():
        tag = node.tag
        if tag == f"{_W}t" and node.text:
            parts.append(node.text)
        elif tag == f"{_W}tab":
            parts.append("\t")
        elif tag == f"{_W}br" or tag == f"{_W}cr":
            parts.append("\n")
    return "".join(parts)


def extract_docx_text(data: bytes) -> str:
    """Paragraph-per-line text from word/document.xml (+ headers/footers)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = set(zf.namelist())
        if "word/document.xml" not in names:
            raise ValueError("not a DOCX: word/document.xml missing")
        doc = ET.fromstring(zf.read("word/document.xml"))
        lines = [_docx_paragraph_text(p) for p in doc.iter(f"{_W}p")]
    return "\n".join(lines).rstrip() + ("\n" if lines else "")


def extract_pptx_text(data: bytes) -> str:
    """Slide text: one line per a:p paragraph, slides in numeric order
    (ppt/slides/slide1.xml, slide2.xml, …), notes slides appended after
    their deck position like Tika's AutoDetectParser does."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = zf.namelist()

        def slide_no(name: str, prefix: str) -> int:
            m = re.match(rf"{prefix}(\d+)\.xml$", name)
            return int(m.group(1)) if m else -1

        slides = sorted(
            (n for n in names if re.match(r"ppt/slides/slide\d+\.xml$", n)),
            key=lambda n: slide_no(n, "ppt/slides/slide"))
        notes = sorted(
            (n for n in names
             if re.match(r"ppt/notesSlides/notesSlide\d+\.xml$", n)),
            key=lambda n: slide_no(n, "ppt/notesSlides/notesSlide"))
        lines: list[str] = []
        for part in slides + notes:
            root = ET.fromstring(zf.read(part))
            for p in root.iter(f"{_A}p"):
                runs = []
                for node in p.iter():
                    if node.tag == f"{_A}t" and node.text:
                        runs.append(node.text)
                    elif node.tag == f"{_A}br":
                        runs.append("\n")
                lines.append("".join(runs))
        if not slides and not notes:
            raise ValueError("not a PPTX: no ppt/slides/*.xml parts")
    return "\n".join(lines).rstrip() + ("\n" if lines else "")


def extract_xlsx_text(data: bytes) -> str:
    """Cell values row-per-line, tab-separated, sheet order preserved."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = zf.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_S}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
        lines: list[str] = []
        sheets = sorted(n for n in names
                        if re.match(r"xl/worksheets/sheet\d+\.xml$", n))
        for sheet in sheets:
            root = ET.fromstring(zf.read(sheet))
            for row in root.iter(f"{_S}row"):
                cells: list[str] = []
                for c in row.iter(f"{_S}c"):
                    v = c.find(f"{_S}v")
                    if v is None or v.text is None:
                        it = c.find(f"{_S}is")
                        if it is not None:
                            cells.append("".join(
                                t.text or "" for t in it.iter(f"{_S}t")))
                        continue
                    if c.get("t") == "s":
                        idx = int(v.text)
                        cells.append(shared[idx] if idx < len(shared) else "")
                    else:
                        cells.append(v.text)
                if cells:
                    lines.append("\t".join(cells))
    return "\n".join(lines) + ("\n" if lines else "")
