"""Text normalization & cleanup — the first transform a web corpus
hits after extraction (CCNet/RefinedWeb pipelines normalize before
any hashing so dedup keys are stable across byte-level variants).

Two layers, split by where they can run:

  * `clean_text` — pure Catalyst (regexp_replace chains, whole-stage
    codegen, zero Python): strip C0/C1 control chars (tab/newline
    kept), zero-width & soft-hyphen characters, collapse runs of
    spaces/tabs, trim around newlines, squeeze 3+ blank lines, trim.
    `clean_text_sql` is the DuckDB twin (same patterns, 'g' flag —
    DuckDB's regexp_replace is first-match-only by default).
  * `normalize_unicode` — Arrow-batched mapInPandas kernel for what
    Catalyst cannot express: Unicode NFC/NFKC normalization
    (unicodedata via pandas .str.normalize) and optional
    mojibake repair (UTF-8-bytes-misread-as-latin1/cp1252 — the
    ftfy core trick: re-encode latin-1, re-decode UTF-8, accept only
    when it round-trips and strictly shrinks). Map-only, no shuffle.

Order: normalize_unicode FIRST (byte-level repair), clean_text after
(whitespace discipline on repaired text) — `normalize_and_clean`
composes both.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C0 except tab/newline/CR, DEL, C1 (raw control codepoints that
# survive extraction of damaged sources). Stripped AFTER mojibake
# repair -- latin-1-misread text legitimately carries C1 codepoints
# the repair needs intact (normalize_unicode runs first).
# engine-level \x escapes (NOT Python escapes): the same ASCII-only
# pattern source must survive embedding into DuckDB SQL, where raw
# control characters would break the statement; Java regex and RE2
# both accept \xhh and \x{hhhh}
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]"
# zero-width space/joiner/non-joiner, BOM/ZWNBSP, soft hyphen
ZERO_WIDTH_RE = r"[\x{200b}\x{200c}\x{200d}\x{feff}\x{ad}]"


def clean_text_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # line endings FIRST: CRLF/CR → LF, else stray \r defeats every
    # newline-anchored rule below (CRLF vs LF copies of a page must
    # clean to identical bytes — that's the point of this stage)
    c = F.regexp_replace(c, r"\r\n?", "\n")
    c = F.regexp_replace(c, CONTROL_RE, "")
    c = F.regexp_replace(c, ZERO_WIDTH_RE, "")
    c = F.regexp_replace(c, "[ \t]+", " ")
    c = F.regexp_replace(c, " ?\n ?", "\n")
    c = F.regexp_replace(c, "\n{3,}", "\n\n")
    # trim() strips spaces only — boundary newlines need their own rule
    c = F.regexp_replace(c, r"^\n+|\n+$", "")
    return F.trim(c)


def clean_text(df: DataFrame, text_col: str = "text",
               out_col: str = "clean_text") -> DataFrame:
    """Whitespace/control-character discipline, Catalyst-only (one
    narrow projection inside whole-stage codegen — free at 100 TB)."""
    return df.withColumn(out_col, clean_text_col(text_col))


def clean_text_sql(text_expr: str) -> str:
    """DuckDB twin of clean_text_col — identical patterns; the 'g'
    flag matches Spark's replace-all semantics."""
    c = f"coalesce({text_expr}, '')"
    for pat, rep in ((r"\r\n?", "\n"),
                     (CONTROL_RE, ""), (ZERO_WIDTH_RE, ""),
                     ("[ \t]+", " "), (" ?\n ?", "\n"),
                     ("\n{3,}", "\n\n"), (r"^\n+|\n+$", "")):
        p = pat.replace("'", "''")
        c = f"regexp_replace({c}, '{p}', '{rep}', 'g')"
    return f"trim({c})"


def _sloppy_cp1252_encode(s: str) -> bytes | None:
    """cp1252 encode with ftfy's 'sloppy' twist: the five codepoints
    cp1252 leaves undefined (0x81 8D 8F 90 9D) pass through as their
    raw byte — decoders routinely emit them as-is, so a faithful
    un-decode must accept them back."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if o > 0xFF:
                return None
            out.append(o)
    return bytes(out)


# characters a single-byte misread can produce: Latin-1 Supplement
# plus the 27 printable cp1252 remappings of the C1 range — mojibake
# runs consist ONLY of these, so repair operates on maximal runs of
# them (length >= 2: a lone accented letter is never touched) and
# legitimate Unicode elsewhere in the string survives
import re as _re

_HIGH = {chr(i) for i in range(0x80, 0x100)}
for _b in range(0x80, 0xA0):
    try:
        _HIGH.add(bytes([_b]).decode("cp1252"))
    except UnicodeDecodeError:
        pass
_CAND_RE = _re.compile("[" + _re.escape("".join(sorted(_HIGH))) + "]{2,}")
# fast pre-gate: a misread UTF-8 sequence always CONTAINS a char whose
# single-byte value is a UTF-8 lead byte (0xC2-0xF4) — as latin-1/
# cp1252 chars that's Â..ô. Covers every script (Polish Å‚, CJK æ—,
# Cyrillic Ð..), unlike a hardcoded Western-European signature list.
_SIG_RE = _re.compile("[Â-ô]")


def _fix_mojibake_once(s: str) -> str:
    """One round of the ftfy core repair, per candidate run: re-encode
    the run through sloppy cp1252 and accept the UTF-8 decode only
    when it round-trips and strictly shrinks. Strictly-shorter +
    run-local keeps the repair from touching legitimate accented prose
    (single accents are sub-threshold; multi-accent runs re-encode to
    invalid UTF-8 and stay put). Known residual: a LITERAL two-char
    sequence that happens to spell valid UTF-8 (e.g. the string
    "Ãœ" meant verbatim) is indistinguishable from mojibake and gets
    folded — the same trade every misread-repair heuristic makes."""
    if not _SIG_RE.search(s):
        return s  # no lead-byte signature anywhere — skip the scan

    def _repair_run(m: "_re.Match[str]") -> str:
        seg = m.group(0)
        raw = _sloppy_cp1252_encode(seg)
        if raw is None:
            return seg
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            return seg
        return fixed if len(fixed) < len(seg) else seg

    return _CAND_RE.sub(_repair_run, s)


def fix_mojibake(s: str | None, max_rounds: int = 2) -> str | None:
    """Repair up-to-`max_rounds`-times-mangled UTF-8 (double-mojibake
    is common: crawl → latin-1 DB → utf-8 dump)."""
    if s is None:
        return None
    for _ in range(max_rounds):
        fixed = _fix_mojibake_once(s)
        if fixed == s:
            break
        s = fixed
    return s


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    repair_mojibake: bool = True,
) -> DataFrame:
    """Unicode normalization (+ optional mojibake repair) as an
    Arrow-batched kernel — map-only; cost is the unicodedata pass.
    `form` ∈ NFC/NFKC/NFD/NFKD (NFC for storage, NFKC when dedup
    keys should also fold compatibility variants: ligatures,
    full-width forms). In-place when out_col is None."""
    import pandas as pd

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"bad normalization form {form}")
    target = out_col or text_col
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in df.schema.fields]
    if out_col and out_col not in df.columns:
        fields.append(f"`{out_col}` STRING")
    schema = ", ".join(fields)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata

        def norm_one(s: str) -> str:
            # exact fast path: every normalization form and the
            # mojibake repair are the identity on pure-ASCII text
            # (repair candidates are all >= U+0080), and str.isascii
            # is a single C scan — the common web/English row skips
            # both passes entirely
            if s.isascii():
                return s
            if repair_mojibake:
                s = fix_mojibake(s)
            return unicodedata.normalize(form, s)

        for pdf in batches:
            pdf = pdf.copy()
            pdf[target] = pdf[text_col].map(norm_one, na_action="ignore")
            yield pdf

    return df.mapInPandas(_run, schema=schema)


def normalize_and_clean(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    repair_mojibake: bool = True,
) -> DataFrame:
    """The composed pre-dedup normalization stage: byte-level repair +
    Unicode form first, whitespace discipline second (in place)."""
    out = normalize_unicode(df, text_col, form=form,
                            repair_mojibake=repair_mojibake)
    return out.withColumn(text_col, clean_text_col(text_col))
