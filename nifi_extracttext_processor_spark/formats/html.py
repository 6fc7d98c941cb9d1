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


class _TableCollector(__import__("html.parser", fromlist=["HTMLParser"]).HTMLParser):
    """Collect <table> contents as nested [table][row][cell] text.
    Nested tables are flattened into their own top-level entries (the
    inner table's cells stop contributing to the outer row — layout
    tables nest arbitrarily in real pages)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []
        self._stack: list[list[list[str]]] = []  # open tables
        self._ctx: list[list[str] | None] = []   # outer rows, saved
        self._row: list[str] | None = None
        self._cell: list[str] | None = None
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in ("script", "style"):
            self._skip += 1
        elif tag == "table":
            # entering a (possibly nested) table: land any open outer
            # cell text first, save the outer row for restoration
            self._flush_cell()
            self._ctx.append(self._row)
            t: list[list[str]] = []
            self.tables.append(t)
            self._stack.append(t)
            self._row = None
            self._cell = None
        elif self._stack and tag == "tr":
            self._row = []
            self._stack[-1].append(self._row)
            self._cell = None
        elif self._stack and tag in ("td", "th"):
            if self._row is None:  # tr omitted (legal in the wild)
                self._row = []
                self._stack[-1].append(self._row)
            self._cell = []
            self._row.append("")  # reserve slot; filled at close

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in ("script", "style"):
            self._skip = max(0, self._skip - 1)
        elif tag == "table":
            if self._stack:
                self._stack.pop()
            self._flush_cell()
            self._row = self._ctx.pop() if self._ctx else None
            self._cell = None
        elif tag in ("td", "th"):
            self._flush_cell()
        elif tag == "tr":
            self._flush_cell()
            self._row = None

    def _flush_cell(self):
        if self._cell is not None and self._row:
            self._row[-1] = " ".join("".join(self._cell).split())
            self._cell = None

    def handle_data(self, data):
        if self._skip:
            return
        if self._cell is not None:
            self._cell.append(data)


def extract_html_tables(data: bytes | str) -> list[list[list[str]]]:
    """Structured <table> extraction: [table][row][cell-text]. Total
    function — damaged markup degrades to fewer/partial tables, never
    raises. Rows of zero cells are dropped; empty tables kept out."""
    if isinstance(data, bytes):
        try:
            s = data.decode("utf-8")
        except UnicodeDecodeError:
            s = data.decode("latin-1")
    else:
        s = data
    p = _TableCollector()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass
    p._flush_cell()
    return [[row for row in t if row] for t in p.tables
            if any(row for row in t)]
