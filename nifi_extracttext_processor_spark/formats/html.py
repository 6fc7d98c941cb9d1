"""HTML input parsing and XHTML output rendering — pure stdlib.

* `html_to_text` — Tika-ish text extraction from HTML input.
* `render_xhtml` — the reference's HTML output mode
  (/root/reference/.../ExtractTextProcessor.java:158-172: SAX
  TransformerHandler, method=html, UTF-8, ExpandedTitleContentHandler).
  We emit structurally-equivalent minimal XHTML — title head + one <p>
  per text block — not byte-identical Tika markup (SURVEY §7 "don't
  chase Tika's exact XHTML").
"""

from __future__ import annotations

import re
from html import escape, unescape

_BLOCK_TAGS = r"p|div|br|li|tr|h[1-6]|table|ul|ol|section|article|header|footer"


def html_to_text(data: bytes) -> str:
    try:
        s = data.decode("utf-8")
    except UnicodeDecodeError:
        s = data.decode("latin-1")
    s = re.sub(r"(?is)<(script|style)[^>]*>.*?</\1>", "", s)
    s = re.sub(rf"(?i)</?(?:{_BLOCK_TAGS})[^>]*>", "\n", s)
    s = re.sub(r"(?s)<[^>]+>", "", s)
    s = unescape(s)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r"\n{2,}", "\n", s)
    return s.strip("\n")


def render_xhtml(text: str, title: str = "") -> str:
    """Wrap extracted plain text in minimal XHTML (one <p> per block)."""
    paras = [p for p in re.split(r"\n{1,}", text) if p.strip()]
    body = "\n".join(f"<p>{escape(p)}</p>" for p in paras)
    return (
        '<html xmlns="http://www.w3.org/1999/xhtml">\n'
        f"<head><meta charset=\"UTF-8\"/><title>{escape(title)}</title></head>\n"
        f"<body>\n{body}\n</body>\n</html>\n"
    )
