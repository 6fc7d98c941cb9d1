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
from html.parser import HTMLParser

_BLOCK_TAGS = r"p|div|br|li|tr|h[1-6]|table|ul|ol|section|article|header|footer"


def _to_str(data: "bytes | str") -> str:
    if isinstance(data, str):
        return data
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return data.decode("latin-1")


def html_to_text(data: bytes) -> str:
    s = _to_str(data)
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


class _TableCollector(HTMLParser):
    """Collect <table> contents as nested [table][row][cell] text.
    Nested tables are flattened into their own top-level entries; the
    OUTER cell stays open across an embedded table, so text after the
    inner </table> lands back in it (layout tables nest arbitrarily
    in real pages). Omitted </td>/</tr> close tags (spec-legal and
    pervasive in crawl data) implicitly flush the open cell."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []
        self._stack: list[list[list[str]]] = []  # open tables
        # saved (outer row, cell-was-open) per nested table
        self._ctx: list[tuple[list[str] | None, bool]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in ("script", "style"):
            self._skip += 1
        elif tag == "table":
            # entering a (possibly nested) table: land any open outer
            # cell text so far, save (row, was a cell open) so the
            # cell can reopen after the inner table closes
            cell_open = self._cell is not None
            self._flush_cell()
            self._ctx.append((self._row, cell_open))
            t: list[list[str]] = []
            self.tables.append(t)
            self._stack.append(t)
            self._row = None
            self._cell = None
        elif self._stack and tag == "tr":
            self._flush_cell()  # omitted </td> before a new row
            self._row = []
            self._stack[-1].append(self._row)
        elif self._stack and tag in ("td", "th"):
            self._flush_cell()  # omitted </td> before a new cell
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
            row, cell_open = self._ctx.pop() if self._ctx \
                else (None, False)
            self._row = row
            # the outer cell was open across the inner table: reopen
            # it seeded with its earlier text so trailing data appends
            if cell_open and row:
                self._cell = [row[-1], " "]
            else:
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
    s = _to_str(data)
    p = _TableCollector()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass
    p._flush_cell()
    return [[row for row in t if row] for t in p.tables
            if any(row for row in t)]
