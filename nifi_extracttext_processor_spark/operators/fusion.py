"""Hybrid-retrieval result fusion: reciprocal-rank fusion (RRF,
Cormack/Clarke/Buettcher 2009) and weighted min-max score fusion
(CombSUM over normalized scores, Fox & Shaw 1994). The glue between
the lexical and vector retrieval families: `search.py` (BM25) and
`similarity.py`/`quantization.py` (ANN) each emit per-query ranked
lists; these operators merge them into one list per query, which is
how a 100 TB RAG/data-curation pipeline actually consumes retrieval
(nobody serves raw BM25 OR raw cosine — they serve the fusion).

RRF scores each (query, doc) as Σ_sources 1/(k + rank_s(doc)), rank
computed per (query, source) by score descending with doc-id ascending
as the deterministic tie-break; docs absent from a source simply
contribute nothing (the standard convention — no missing-rank
penalty). Score fusion min-max normalizes each source's scores to
[0,1] within the query (a single-result or constant-score source
normalizes to 1.0 — the doc is that source's best) and sums
per-source weights × normalized scores.

Scale design: inputs are ALREADY bounded — upstream retrieval emits
top-k per (query, source), so the fusion input is k·|sources| rows
per query, never corpus-sized. One shuffle keyed by query carries
(query, source, doc, score) tuples only; ranks and min/max are keyed
windows inside that partition, the fused sum is one groupBy on
(query, doc), and the final top-k is one more per-query window. No
joins, no payloads, no driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround



def rrf_fuse(
    df: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    source_col: str = "source",
    score_col: str = "score",
    k_const: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Fuse per-source ranked lists with reciprocal-rank fusion.

    Input: one row per (query, source, doc) with that source's score.
    Output: per query the `top_k` docs by RRF score — (query_id,
    doc_id, n_sources, best_rank, rrf_score) ordered by query id,
    fused score descending, doc id ascending; score rounded to 6 dp
    AFTER ranking (exact ties in the unrounded sum can only come from
    identical rank multisets, so the order is engine-independent)."""
    if k_const < 1:
        raise ValueError("k_const must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    w_src = Window.partitionBy(query_col, source_col).orderBy(
        F.desc(score_col), F.col(id_col))
    ranked = df.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.row_number().over(w_src).alias("rnk"))
    fused = (ranked.groupBy("query_id", "doc_id")
             .agg(F.count("*").alias("n_sources"),
                  F.min("rnk").alias("best_rank"),
                  F.sum(1.0 / (F.lit(float(k_const)) + F.col("rnk")))
                  .alias("fused")))
    w_q = Window.partitionBy("query_id").orderBy(
        F.desc("fused"), F.col("doc_id"))
    return (fused.withColumn("__rn", F.row_number().over(w_q))
            .filter(F.col("__rn") <= top_k)
            .select("query_id", "doc_id", "n_sources", "best_rank",
                    dround("fused", 6).alias("rrf_score"))
            .orderBy("query_id", F.desc("rrf_score"), "doc_id"))


def rrf_fuse_sql(
    rankings: str,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    source_col: str = "source",
    score_col: str = "score",
    k_const: int = 60,
    top_k: int = 10,
) -> str:
    """DuckDB twin over `rankings(query, doc, source, score)`: same
    per-source rank tie-break, reciprocal sum, top-k cutoff, 6 dp."""
    kc, tk = int(k_const), int(top_k)
    return f"""
WITH ranked AS (
  SELECT {query_col} AS query_id, {id_col} AS doc_id,
         row_number() OVER (PARTITION BY {query_col}, {source_col}
                            ORDER BY {score_col} DESC, {id_col})
           AS rnk
  FROM {rankings}
), fused AS (
  SELECT query_id, doc_id, count(*) AS n_sources,
         CAST(min(rnk) AS INTEGER) AS best_rank,
         sum(1.0 / ({kc} + rnk)) AS fused
  FROM ranked GROUP BY 1, 2
), cut AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY fused DESC, doc_id) AS rn
  FROM fused
)
SELECT query_id, doc_id, n_sources, best_rank,
       round(fused, 6) AS rrf_score
FROM cut WHERE rn <= {tk}
ORDER BY query_id, rrf_score DESC, doc_id
"""


def score_fuse(
    df: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    source_col: str = "source",
    score_col: str = "score",
    weights: dict[str, float] | None = None,
    top_k: int = 10,
) -> DataFrame:
    """Weighted CombSUM over per-query min-max normalized scores.

    Each source's scores normalize to [0,1] within the query
    ((s−min)/(max−min); a constant-score source yields 1.0 for all
    its docs). `weights` maps source → weight (default 1.0 for
    unlisted sources). Output: per query the `top_k` docs —
    (query_id, doc_id, n_sources, fused_score) ordered by query id,
    fused descending, doc ascending; 6 dp."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    w_src = Window.partitionBy(query_col, source_col)
    mn, mx = F.min(score_col).over(w_src), F.max(score_col).over(w_src)
    norm = F.when(mx > mn,
                  (F.col(score_col) - mn) / (mx - mn)).otherwise(1.0)
    wexpr = F.lit(1.0)
    for src, wt in sorted((weights or {}).items()):
        wexpr = F.when(F.col(source_col) == src,
                       F.lit(float(wt))).otherwise(wexpr)
    contrib = df.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        (wexpr * norm).alias("part"))
    fused = (contrib.groupBy("query_id", "doc_id")
             .agg(F.count("*").alias("n_sources"),
                  F.sum("part").alias("fused")))
    w_q = Window.partitionBy("query_id").orderBy(
        F.desc("fused"), F.col("doc_id"))
    return (fused.withColumn("__rn", F.row_number().over(w_q))
            .filter(F.col("__rn") <= top_k)
            .select("query_id", "doc_id", "n_sources",
                    dround("fused", 6).alias("fused_score"))
            .orderBy("query_id", F.desc("fused_score"), "doc_id"))


def score_fuse_sql(
    rankings: str,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    source_col: str = "source",
    score_col: str = "score",
    weights: dict[str, float] | None = None,
    top_k: int = 10,
) -> str:
    """DuckDB twin of score_fuse: identical normalization convention
    (constant source → 1.0), weight CASE, cutoff, ordering, 6 dp."""
    tk = int(top_k)
    wcase = "1.0"
    for src, wt in sorted((weights or {}).items()):
        esc = str(src).replace("'", "''")
        wcase = (f"CASE WHEN {source_col} = '{esc}' "
                 f"THEN {float(wt)!r} ELSE {wcase} END")
    return f"""
WITH normed AS (
  SELECT {query_col} AS query_id, {id_col} AS doc_id,
         ({wcase}) * (CASE
            WHEN max({score_col}) OVER w > min({score_col}) OVER w
            THEN ({score_col} - min({score_col}) OVER w)
                 / (max({score_col}) OVER w - min({score_col}) OVER w)
            ELSE 1.0 END) AS part
  FROM {rankings}
  WINDOW w AS (PARTITION BY {query_col}, {source_col})
), fused AS (
  SELECT query_id, doc_id, count(*) AS n_sources,
         sum(part) AS fused
  FROM normed GROUP BY 1, 2
), cut AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY fused DESC, doc_id) AS rn
  FROM fused
)
SELECT query_id, doc_id, n_sources, round(fused, 6) AS fused_score
FROM cut WHERE rn <= {tk}
ORDER BY query_id, fused_score DESC, doc_id
"""
