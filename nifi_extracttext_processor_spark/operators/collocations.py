"""Collocation extraction: ranked bigram association scores (PMI and
Dunning's log-likelihood ratio) over a corpus — the classic
corpus-analysis primitive (Manning & Schütze 1999 ch. 5; Dunning
1993) behind tokenizer vocabulary curation, multi-word-expression
mining, and phrase-aware indexing.

Event model: every CONSECUTIVE token pair inside a document is one
bigram event; N = total bigram events, and the unigram margins are
taken from the same event table (c(x,·) = bigrams with x on the
left, c(·,y) = bigrams with y on the right) so the 2×2 contingency
table is exactly consistent:

              y        ¬y
    x        k11      k12     k11 = c(xy), k12 = c(x,·) − c(xy)
    ¬x       k21      k22     k21 = c(·,y) − c(xy), k22 = N − rest

    pmi = ln( k11·N / (c(x,·)·c(·,y)) )
    llr = 2·( Σ kij·ln kij  −  Σ rowᵢ·ln rowᵢ  −  Σ colⱼ·ln colⱼ
              + N·ln N )            (0·ln 0 := 0)

PMI over-rewards hapax pairs (a 1-count pair of 1-count words gets
the maximum score), which is why min_count exists and why LLR — which
grows with evidence — is the default ranking.

Scale design: the bigram pairing is NARROW (array slice + zip inside
each document row — no shuffle, no self-join); the only wide
operations are the (w1, w2) count aggregation and two margin
aggregations derived FROM it (all map-side combinable; the pair table
is the corpus's distinct-bigram set, orders of magnitude smaller than
the token stream). Margins join back on single-word keys — plain
hash joins that scale with distinct vocabulary, never with corpus
rows. Top-k lands as TakeOrderedAndProject, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


from .classifier import _TOKEN_SPLIT_RE


def _xlogx(c):
    return F.when(c > 0, c * F.log(c)).otherwise(F.lit(0.0))


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-k bigrams by LLR: (w1, w2, n, pmi, llr), pmi/llr rounded
    to 4 dp, ordered (llr desc, w1, w2) with the tie-break making the
    cut deterministic. Documents with fewer than two tokens
    contribute no events."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0)
    # consecutive pairs, narrow: zip the array against itself shifted
    pairs = (df.select(toks.alias("ts"))
             .filter(F.size("ts") >= 2)
             .select(F.explode(F.arrays_zip(
                 F.slice("ts", 1, F.size("ts") - 1).alias("w1"),
                 F.slice("ts", 2, F.size("ts") - 1).alias("w2")))
                 .alias("bg"))
             .select(F.col("bg.w1").alias("w1"),
                     F.col("bg.w2").alias("w2")))
    from .lifecycle import track_persist

    counts = track_persist(
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("double").alias("n")))
    left = counts.groupBy("w1").agg(F.sum("n").alias("cx"))
    right = counts.groupBy("w2").agg(F.sum("n").alias("cy"))
    total = counts.agg(F.sum("n").alias("nn"))
    k11 = F.col("n")
    k12 = F.col("cx") - F.col("n")
    k21 = F.col("cy") - F.col("n")
    k22 = F.col("nn") - F.col("cx") - F.col("cy") + F.col("n")
    llr = 2.0 * (
        _xlogx(k11) + _xlogx(k12) + _xlogx(k21) + _xlogx(k22)
        - _xlogx(F.col("cx")) - _xlogx(F.col("nn") - F.col("cx"))
        - _xlogx(F.col("cy")) - _xlogx(F.col("nn") - F.col("cy"))
        + _xlogx(F.col("nn")))
    scored = (counts.filter(F.col("n") >= float(min_count))
              .join(left, "w1").join(right, "w2")
              .crossJoin(F.broadcast(total))
              .select(
                  "w1", "w2", F.col("n").cast("long").alias("n"),
                  dround(F.log(F.col("n") * F.col("nn")
                                / (F.col("cx") * F.col("cy"))), 4)
                  .alias("pmi"),
                  dround(llr, 4).alias("llr")))
    return (scored
            .orderBy(F.desc("llr"), "w1", "w2")
            .limit(top_k))


def collocations_sql(
    table: str = "documents",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> str:
    """DuckDB twin: same event model (parallel unnests of the token
    list against its own shift replay the consecutive pairing),
    margins, PMI/LLR arithmetic, rounding, and (llr desc, w1, w2)
    cut."""
    def xlogx(c):
        return f"(CASE WHEN {c} > 0 THEN ({c}) * ln({c}) ELSE 0.0 END)"

    k11, k12 = "n", "(cx - n)"
    k21, k22 = "(cy - n)", "(nn - cx - cy + n)"
    llr = (f"2.0 * ({xlogx(k11)} + {xlogx(k12)} + {xlogx(k21)} + "
           f"{xlogx(k22)} - {xlogx('cx')} - {xlogx('(nn - cx)')} - "
           f"{xlogx('cy')} - {xlogx('(nn - cy)')} + {xlogx('nn')})")
    return f"""
WITH doc_toks AS (
  SELECT list_filter(string_split_regex(lower(trim({text_col})),
                                        '{_TOKEN_SPLIT_RE}'),
                     x -> len(x) > 0) AS ts
  FROM {table}
), pairs AS (
  SELECT unnest(ts[1:len(ts)-1]) AS w1,
         unnest(ts[2:len(ts)]) AS w2
  FROM doc_toks WHERE len(ts) >= 2
), counts AS (
  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS n
  FROM pairs GROUP BY 1, 2
), lft AS (SELECT w1, sum(n) AS cx FROM counts GROUP BY 1),
rgt AS (SELECT w2, sum(n) AS cy FROM counts GROUP BY 1),
total AS (SELECT sum(n) AS nn FROM counts)
SELECT w1, w2, CAST(n AS BIGINT) AS n,
       round(ln(n * nn / (cx * cy)), 4) AS pmi,
       round({llr}, 4) AS llr
FROM counts JOIN lft USING (w1) JOIN rgt USING (w2)
CROSS JOIN total
WHERE n >= {float(min_count)!r}
ORDER BY round({llr}, 4) DESC, w1, w2
LIMIT {int(top_k)}
"""


def reference_llr(k11: float, k12: float, k21: float,
                  k22: float) -> float:
    """Independent LLR from an explicit 2×2 table — the test oracle
    (Dunning 1993 eq. 10, via the entropy formulation)."""
    import math

    def xlx(c):
        return c * math.log(c) if c > 0 else 0.0

    n = k11 + k12 + k21 + k22
    return 2.0 * (xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
                  - xlx(k11 + k12) - xlx(k21 + k22)
                  - xlx(k11 + k21) - xlx(k12 + k22)
                  + xlx(n))
