"""B4 SplitText + B5 ExtractText(regex) — pure Catalyst expressions.

Reference behavior:
  B4: SplitText with Line Split Count=1, Remove Trailing Newlines=true
      (56409-tika.xml:887-902) — one output row per line.
  B5: ExtractText with user property `sentence=(^.*$)` — first capture
      group to an attribute (56409-tika.xml:2063, flags 1990-2060 all
      default-off).

Both are whole-stage-codegen'd JVM expressions: no UDF, no shuffle —
`posexplode` is a narrow generate, so this scales linearly with input
partitions at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "line",
    pos_col: str = "line_no",
    delimiter: str = "\n",
    remove_trailing_newlines: bool = True,
    drop_text: bool = True,
) -> DataFrame:
    """Explode text into one row per line with a 0-based position.

    `remove_trailing_newlines=True` mirrors the template config by
    trimming trailing empty lines before the explode (so a final "\\n"
    doesn't emit an empty split).
    """
    import re

    delim = re.escape(delimiter)  # regex-special delimiters (".", "|") split literally
    src = F.col(text_col)
    if remove_trailing_newlines:
        # strip only TRAILING newline runs — interior empties survive,
        # matching SplitText's Remove Trailing Newlines semantics
        src = F.regexp_replace(src, f"{delim}+$", "")
    parts = F.split(src, delim)
    keep = [c for c in df.columns if not (drop_text and c == text_col)]
    return (df
            .withColumn("__parts", parts)
            .select(*keep,
                    F.posexplode(F.col("__parts")).alias(pos_col, out_col)))


def extract_regex(
    df: DataFrame,
    patterns: dict[str, str],
    text_col: str = "line",
    group: int = 1,
    case_insensitive: bool = False,
    dotall: bool = False,
    multiline: bool = False,
) -> DataFrame:
    """One new column per named pattern, first capture group (B5).

    Regex flags map to inline modifiers, mirroring the template's
    DOTALL / MULTILINE / case-insensitive toggles (default off).
    Returns '' (not null) when the pattern misses — Java
    regexp_extract semantics, identical in DuckDB.
    """
    prefix = ""
    if case_insensitive:
        prefix += "(?i)"
    if dotall:
        prefix += "(?s)"
    if multiline:
        prefix += "(?m)"
    out = df
    for name, pat in patterns.items():
        out = out.withColumn(
            name, F.regexp_extract(F.col(text_col), prefix + pat, group))
    return out


def filter_matched(df: DataFrame, attr_col: str) -> DataFrame:
    """ExtractText's `matched` relationship: rows where the capture hit
    (unmatched rows leave the flow, 56409-tika.xml connection :105)."""
    return df.filter(F.col(attr_col) != F.lit(""))
