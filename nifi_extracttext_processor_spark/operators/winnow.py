"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
the MOSS plagiarism detector's core): select the minimum k-gram hash
in every sliding window of w consecutive k-grams. The guarantee that
makes it the standard: any shared substring of length ≥ w+k−1
produces at least one SHARED fingerprint (no gaps a copied paragraph
can hide in), while the fingerprint density stays ~2/(w+1) — a
bounded sketch per document.

Where it sits in the dedup family: MinHash answers "are these DOCS
similar overall"; exact_substring_dedup removes verbatim spans
corpus-wide; winnowing is the middle ground — bounded positional
fingerprints that localize WHICH regions overlap (the plagiarism /
partial-copy / quote-detection shape), cheap enough to keep per doc.

Selection convention (determinism contract, both engines): window s
selects argmin over positions p ∈ [s, s+w−1] of (hash, RIGHTMOST on
ties) — packed as one integer key hash·2²⁰ + (2²⁰−1−p), so the
argmin is a plain integer MIN a window function computes and DuckDB
replays bit-for-bit. Positions are capped at 2²⁰ k-grams per doc
(guard raises — a million-token doc should be chunked first).

Scale shape: k-gram hashing is a narrow explode (positions + u32
md5); selection is ONE keyed window (partition by doc, ordered by
position, ROWS w-1 FOLLOWING) + distinct — the sessionize shuffle
shape; `winnow_overlap_pairs` then joins fingerprints by hash
(id/hash-only shuffle, documents never move) with a `max_hash_freq`
ubiquity cut (the audio-dedup skew defense: a boilerplate k-gram
shared by every page would otherwise quadratically explode the
join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_POS_CAP = 1 << 20


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(id_col, pos, fp) — the selected fingerprints: `pos` is the
    0-based k-gram position (word k-grams over lower-cased whitespace
    tokens, the house shingle convention), `fp` the u32 k-gram hash.
    Documents shorter than k tokens emit nothing."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0)
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", *[
                F.element_at(toks, i + j + 1) for j in range(k)]))
    ).otherwise(F.array().cast("array<string>"))
    g = (df.select(F.col(id_col),
                   F.posexplode(grams).alias("pos", "gram"))
         .withColumn("fp", F.conv(
             F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
             .cast("long"))
         .drop("gram"))
    # packed argmin key: hash * 2^20 + (2^20-1-pos) — integer MIN =
    # (min hash, rightmost position on ties); fail-closed above cap
    key = F.when(
        F.col("pos") >= _POS_CAP,
        F.raise_error(F.lit(
            f"winnow_fingerprints: doc exceeds {_POS_CAP} k-grams; "
            "chunk it first")).cast("long")
    ).otherwise(F.col("fp") * F.lit(_POS_CAP)
                + (F.lit(_POS_CAP - 1) - F.col("pos")))
    win = Window.partitionBy(id_col).orderBy("pos") \
        .rowsBetween(Window.currentRow, w - 1)
    picked = (g.withColumn("__k", key)
              .withColumn("__m", F.min("__k").over(win))
              # a window starting at pos only exists while a full w
              # k-grams remain... the ORIGINAL algorithm windows every
              # position (trailing short windows select too) — keep
              # that convention, it preserves the coverage guarantee
              .select(id_col,
                      (F.lit(_POS_CAP - 1)
                       - F.col("__m") % F.lit(_POS_CAP))
                      .alias("pos"),
                      (F.col("__m") / F.lit(_POS_CAP))
                      .cast("long").alias("fp")))
    return picked.distinct()


def winnow_fingerprints_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    k: int = 5,
    w: int = 4,
) -> str:
    """DuckDB twin of winnow_fingerprints (same packed-key argmin,
    same trailing-window convention)."""
    toks = (f"list_filter(string_split_regex(lower(trim({text_expr})),"
            f" '\\s+'), t -> length(t) > 0)")
    gram = " || ' ' || ".join(f"ts[p.i + {j}]" for j in range(k))
    cap = _POS_CAP
    return f"""
WITH docs AS (
  SELECT {id_col}, {toks} AS ts FROM {table}
),
grams AS (
  SELECT d.{id_col}, p.i - 1 AS pos,
         ('0x' || substr(md5({gram}), 1, 8))::BIGINT AS fp
  FROM (SELECT * FROM docs WHERE len(ts) >= {k}) d,
       LATERAL (SELECT unnest(range(1, len(d.ts) - {k} + 2)) AS i) p
),
keyed AS (
  SELECT {id_col}, pos, fp,
         fp * {cap} + ({cap} - 1 - pos) AS kk
  FROM grams
),
picked AS (
  SELECT {id_col},
         min(kk) OVER (PARTITION BY {id_col} ORDER BY pos
                       ROWS BETWEEN CURRENT ROW
                       AND {w - 1} FOLLOWING) AS m
  FROM keyed
)
SELECT DISTINCT {id_col},
       ({cap} - 1 - (m % {cap})) AS pos,
       (m // {cap}) AS fp
FROM picked
"""


def winnow_overlap_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_hash_freq: int | None = None,
) -> DataFrame:
    """(id1, id2, shared) for id1 < id2 sharing ≥ `min_shared`
    distinct fingerprints — the MOSS candidate-pair report over a
    winnow_fingerprints table. `max_hash_freq` drops fingerprints
    present in more than that many documents before the join
    (boilerplate cut + join-skew defense)."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    f = fps.select(F.col(id_col).alias("id"), "fp").distinct()
    if max_hash_freq is not None:
        freq = (f.groupBy("fp")
                .agg(F.count("*").alias("nf"))
                .filter(F.col("nf") <= max_hash_freq)
                .select("fp"))
        f = f.join(freq, "fp")
    a = f.select(F.col("id").alias("id1"), "fp")
    b = f.select(F.col("id").alias("id2"), "fp")
    return (a.join(b, "fp")
            .filter(F.col("id1") < F.col("id2"))
            .groupBy("id1", "id2")
            .agg(F.count("*").cast("long").alias("shared"))
            .filter(F.col("shared") >= min_shared))


def winnow_overlap_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_hash_freq: int | None = None,
) -> str:
    """DuckDB twin of winnow_fingerprints → winnow_overlap_pairs."""
    fp_sql = winnow_fingerprints_sql(table, id_col, text_expr, k, w)
    freq = (f"""
f AS (
  SELECT * FROM f0 WHERE fp IN (
    SELECT fp FROM f0 GROUP BY fp
    HAVING count(*) <= {max_hash_freq})
)""" if max_hash_freq is not None else "f AS (SELECT * FROM f0)")
    return f"""
WITH f0 AS (
  SELECT DISTINCT {id_col} AS id, fp FROM ({fp_sql})
),
{freq}
SELECT a.id AS id1, b.id AS id2, count(*)::BIGINT AS shared
FROM f a JOIN f b ON a.fp = b.fp AND a.id < b.id
GROUP BY a.id, b.id
HAVING count(*) >= {min_shared}
"""
