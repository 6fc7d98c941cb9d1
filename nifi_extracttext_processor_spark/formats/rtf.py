"""RTF text extraction — pure stdlib tokenizer.

Standard RTF-to-text walk: a group stack tracks ignorable destinations
(\\fonttbl, \\colortbl, \\*\\… etc.) and the \\ucN unicode-fallback skip
count; \\uN, \\'hh, and the common symbol control words are decoded.

Reference parity: the reference handles RTF via Tika AutoDetectParser
(/root/reference/.../ExtractTextProcessor.java:158,173).
"""

from __future__ import annotations

import re

# destination groups whose content is metadata, not body text
_DESTINATIONS = frozenset({
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "themedata", "colorschememapping",
    "listtable", "listoverridetable", "latentstyles", "datastore",
    "generator", "xmlnstbl", "operator", "creatim", "revtim",
})

_SPECIAL = {
    "par": "\n", "sect": "\n", "page": "\n", "line": "\n", "tab": "\t",
    "emdash": "\u2014", "endash": "\u2013", "emspace": "\u2003",
    "enspace": "\u2002", "bullet": "\u2022", "lquote": "\u2018",
    "rquote": "\u2019", "ldblquote": "\u201c", "rdblquote": "\u201d",
    "~": "\u00a0", "-": "\u00ad", "_": "\u2011",
}

_TOKEN = re.compile(
    r"\\([a-z]{1,32})(-?\d{1,10})?[ ]?"   # control word [+ numeric param]
    r"|\\'([0-9a-fA-F]{2})"               # hex-escaped cp1252 byte
    r"|\\([^a-z])"                        # control symbol
    r"|([{}])"                            # group delimiters
    r"|([^\\{}]+)")                       # plain text run


def extract_rtf_text(data: bytes) -> str:
    try:
        s = data.decode("cp1252")
    except UnicodeDecodeError:
        s = data.decode("latin-1", "replace")
    if not s.startswith("{\\rtf"):
        raise ValueError("not an RTF document")
    out: list[str] = []
    # group state: (ignorable, ucskip)
    stack: list[tuple[bool, int]] = []
    ignorable, ucskip = False, 1
    pending_skip = 0  # fallback chars to swallow after \uN
    just_opened = False  # previous token was '{' (for \* destination marker)

    for m in _TOKEN.finditer(s):
        word, num, hexb, sym, brace, text = m.groups()
        if brace == "{":
            stack.append((ignorable, ucskip))
            just_opened = True
            continue
        opened = just_opened
        just_opened = False
        if brace == "}":
            if stack:
                ignorable, ucskip = stack.pop()
            continue
        if sym is not None:
            if sym == "*":
                # \* marks an ignorable destination ONLY as the first
                # token of a group ({\*\dest …}); a stray \* in running
                # text is a no-op (Tika keeps the following text)
                if opened:
                    ignorable = True
            elif sym in "\\{}":
                if not ignorable:
                    out.append(sym)
            elif sym in ("\n", "\r"):
                if not ignorable:
                    out.append("\n")
            elif sym in _SPECIAL:
                if not ignorable:
                    out.append(_SPECIAL[sym])
            continue
        if hexb is not None:
            if pending_skip > 0:
                pending_skip -= 1
            elif not ignorable:
                out.append(bytes([int(hexb, 16)]).decode("cp1252", "replace"))
            continue
        if word is not None:
            if word in _DESTINATIONS:
                ignorable = True
            elif word == "uc":
                ucskip = int(num or 1)
            elif word == "u":
                if not ignorable:
                    cp = int(num or 0)
                    out.append(chr(cp + 65536 if cp < 0 else cp))
                pending_skip = ucskip
            elif word in _SPECIAL:
                if not ignorable:
                    out.append(_SPECIAL[word])
            # any other control word: formatting — no text contribution
            continue
        if text is not None and not ignorable:
            if pending_skip:
                cut = min(pending_skip, len(text))
                pending_skip -= cut
                text = text[cut:]
            out.append(text.replace("\r", "").replace("\n", ""))

    body = "".join(out)
    return body.rstrip() + ("\n" if body.strip() else "")
