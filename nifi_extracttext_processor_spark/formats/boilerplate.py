"""Main-content extraction from HTML (boilerplate removal) — a
jusText-style block classifier (Pomikálek 2011, public thesis /
algorithm description), pure stdlib.

Where `html.py:html_to_text` flattens EVERYTHING (the Tika-parity
extraction quirk the reference requires), a training-data pipeline
wants only the article text — navigation, cookie banners, footers and
"related links" rails poison LM training sets. The classic recipe:

1. Segment the DOM into text blocks at block-level tags; <a> text is
   tracked separately for link density.
2. Context-free classify each block: BAD (high link density, or short
   with links), GOOD (long enough, low link density, stopword-dense),
   SHORT otherwise.
3. Context-sensitive pass: SHORT blocks inherit GOOD when adjacent to
   a GOOD block (headings ahead of good content are promoted too),
   else BAD — boilerplate clusters, so neighborhood is signal.

The classifier is deterministic (fixed thresholds, tiny built-in
stopword set shared with the Gopher rules) and total: any bytes in,
text out, never raises (damaged markup degrades to fewer blocks).

Spark integration (`extract_main_content` in operators/text_analysis
style): Arrow-batched mapInPandas kernel, one row per document —
map-only, no shuffle; at 100 TB the cost is the HTML parse itself,
embarrassingly parallel next to the other extraction kernels.
"""

from __future__ import annotations

from html.parser import HTMLParser

# thresholds (jusText defaults, shortened block scale for web prose)
MAX_LINK_DENSITY_GOOD = 0.2
MAX_LINK_DENSITY_KEEP = 0.5
LENGTH_LOW = 70          # chars: below → SHORT (needs context)
LENGTH_HIGH = 200        # chars: above + clean → GOOD outright
STOPWORD_LOW = 0.18      # stopword char fraction for GOOD

_STOPWORDS = frozenset((
    "the", "be", "is", "are", "was", "were", "to", "of", "and", "a",
    "an", "in", "that", "have", "has", "had", "it", "for", "not",
    "on", "with", "he", "she", "as", "you", "do", "at", "this",
    "but", "his", "her", "by", "from", "they", "we", "say", "or",
    "will", "my", "one", "all", "would", "there", "their", "what",
))

_BLOCK_TAGS = frozenset((
    "p", "div", "li", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "section", "article", "header", "footer",
    "nav", "aside", "main", "figure", "figcaption", "table", "tr",
    "ul", "ol", "dl", "dt", "dd", "br", "form",
))
_SKIP_TAGS = frozenset(("script", "style", "noscript", "template",
                        "svg", "iframe", "object"))
_HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))


class _BlockCollector(HTMLParser):
    """Stream the document into (text, link_chars, is_heading) blocks,
    splitting at block-level tag boundaries."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._in_head = False
        self._a_depth = 0
        self._heading = False

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append({
                "text": text,
                "link_chars": min(self._link_chars, len(text)),
                "heading": self._heading,
            })
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        # <head> is NOT in _SKIP_TAGS: HTML5 allows omitting </head>
        # (common on real/minified pages) and stdlib HTMLParser never
        # implicitly closes it — a depth counter would then skip the
        # entire body. A flag cleared by </head> OR the first
        # body-level tag keeps the loss bounded to actual head content.
        if tag == "head":
            self._in_head = True
            return
        if tag == "body":
            self._in_head = False
            self._skip_depth = 0  # unclosed script/style can't span body
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            self._a_depth += 1
        if tag in _BLOCK_TAGS:
            self._in_head = False  # block content implies head is over
            self._flush()
            self._heading = tag in _HEADING_TAGS

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag == "head":
            self._in_head = False
            return
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()
            self._heading = False

    def handle_data(self, data):
        if self._skip_depth or self._in_head:
            return
        self._buf.append(data)
        if self._a_depth:
            self._link_chars += len(" ".join(data.split()))


def _stopword_fraction(text: str) -> float:
    words = text.lower().split()
    if not words:
        return 0.0
    sw = sum(len(w) for w in words
             if w.strip(".,;:!?\"'()[]") in _STOPWORDS)
    return sw / sum(len(w) for w in words)


def _classify_block(b: dict) -> str:
    """Context-free pass (jusText §3.2 shape): bad on link-heavy or
    copyright blocks; short blocks with ANY link chars are bad (nav
    items), link-free shorts stay undecided; headings stay undecided
    (resolved by the content that follows them); medium/long clean
    blocks are good when long or stopword-dense."""
    text = b["text"]
    n = len(text)
    link_density = b["link_chars"] / n if n else 1.0
    if link_density > MAX_LINK_DENSITY_KEEP:
        return "bad"
    if "©" in text:
        return "bad"
    if b["heading"]:
        return "short"
    if n < LENGTH_LOW:
        return "bad" if b["link_chars"] > 0 else "short"
    if link_density > MAX_LINK_DENSITY_GOOD:
        return "bad"
    if n >= LENGTH_HIGH or _stopword_fraction(text) >= STOPWORD_LOW:
        return "good"
    return "short"


def segment_blocks(html: str) -> list[dict]:
    """Parse HTML into classified blocks: each dict carries text,
    link_chars, heading, and `label` in {good, bad, short} (the
    context-free pass)."""
    p = _BlockCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # total function: keep whatever blocks parsed
    p._flush()
    for b in p.blocks:
        b["label"] = _classify_block(b)
    return p.blocks


def html_main_content(data: bytes | str) -> str:
    """Extract the main (non-boilerplate) text of an HTML document:
    jusText-style two-pass classification, GOOD blocks joined by
    newlines. Total: never raises; non-HTML or all-boilerplate input
    yields ''."""
    if isinstance(data, bytes):
        try:
            s = data.decode("utf-8")
        except UnicodeDecodeError:
            s = data.decode("latin-1")
    else:
        s = data
    blocks = segment_blocks(unescape_preserving(s))
    labels = [b["label"] for b in blocks]
    resolved = list(labels)
    # context-sensitive pass 1: non-heading SHORT blocks inherit GOOD
    # when a nearest decided neighbor (either direction, headings and
    # other shorts transparent) is good — boilerplate clusters, so a
    # short sentence inside an article neighborhood is article text
    for i, lab in enumerate(labels):
        if lab != "short" or blocks[i]["heading"]:
            continue
        prev_good = next((resolved[j] == "good"
                          for j in range(i - 1, -1, -1)
                          if resolved[j] != "short"), False)
        next_good = next((labels[j] == "good"
                          for j in range(i + 1, len(labels))
                          if labels[j] != "short"), False)
        resolved[i] = "good" if (prev_good or next_good) else "bad"
    # pass 2: headings live or die by the content they introduce —
    # kept iff the next non-heading resolved block is good
    for i, b in enumerate(blocks):
        if b["heading"] and resolved[i] == "short":
            nxt = next((resolved[j] for j in range(i + 1, len(blocks))
                        if not blocks[j]["heading"]), "bad")
            resolved[i] = "good" if nxt == "good" else "bad"
    return "\n".join(b["text"] for b, lab in zip(blocks, resolved)
                     if lab == "good")


def unescape_preserving(s: str) -> str:
    """Entities inside tags must survive until after tag parsing;
    HTMLParser(convert_charrefs=True) already unescapes text nodes, so
    this is the identity — kept as a named seam for charset-quirk
    handling."""
    return s
