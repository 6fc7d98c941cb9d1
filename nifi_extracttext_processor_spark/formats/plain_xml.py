"""Generic XML text extraction — pure stdlib.

Parity target: Tika's DcXMLParser (via the reference's AutoDetectParser,
/root/reference/.../ExtractTextProcessor.java:173) concatenates the
character content of an arbitrary XML document.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def extract_xml_text(data: bytes) -> str:
    """All text nodes in document order, whitespace-normalized per node,
    one space between nodes — mirroring Tika's SAX character handler."""
    root = ET.fromstring(data)
    parts = [t.strip() for t in root.itertext() if t and t.strip()]
    return (" ".join(parts) + "\n") if parts else ""
