"""Chi-square (χ²) term–class association — supervised feature
selection for the corpus-quality classifiers (operators/classifier.py,
operators/nbayes.py): "which terms most strongly indicate this
class?". The classic selection statistic for text categorization
(Yang & Pedersen 1997's χ² beat DF/MI on Reuters); also the
vocabulary-audit primitive ("what vocabulary makes source X differ").

Per (term t, class c), the 2×2 presence contingency over N docs:

    n11 = docs in c containing t        n10 = docs not-in-c with t
    n01 = docs in c without t           n00 = the rest
    χ² = N·(n11·n00 − n10·n01)² /
         ((n11+n10)(n01+n00)(n11+n01)(n10+n00))

All four cells derive from THREE integer aggregates — (term,class)
presence counts, per-term doc frequency (a re-aggregation of the
same counts, no second text scan), and per-class doc totals (a
label-only scan: parquet column pruning never touches the text
column) — so the statistic is exact integer data fed to one shared
double formula tree; twins replay it bit-for-bit.

Scale shape: explode(distinct tokens) → groupBy(term,label) with
map-side combine is the only payload-width shuffle, and it carries
(term, label, count) triples, never text. df_t re-aggregates those
triples; class totals are a tiny broadcast. Top-k per class is a
window over label partitions of the already-aggregated (term,class)
table — bounded by vocabulary, not corpus. Nothing in the plan holds
a document after tokenization.

Zero-count (term,class) pairs are NOT scored: with
`positive_only=True` (default) selection wants over-represented
terms (observed n11 > expected df_t·Nc/N, an exact integer
comparison), and an absent pair is maximally under-represented.
χ² for absent pairs is well-defined but only meaningful for
negative-marker mining; flip the flag and those still only appear
when observed in SOME class (a term absent everywhere has no row at
all — and no χ² worth ranking)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WS = r"\s+"


def _doc_terms(df: DataFrame, label_col: str, text_col: str) -> DataFrame:
    toks = F.array_distinct(F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), _WS),
        lambda t: F.length(t) > 0))
    return (df.where(F.col(label_col).isNotNull())
            .select(F.col(label_col).alias("label"),
                    F.explode(toks).alias("term")))


def chi2_terms(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    k: int = 20,
    min_doc_freq: int = 2,
    positive_only: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """(label, term, n11, df_t, chi2, rank) — top-k terms per class
    by χ², ties broken by term ascending. See module docstring for
    the cell derivation and the positive_only contract."""
    if k < 1:
        raise ValueError("k must be >= 1")
    src = df.where(F.col(label_col).isNotNull())
    tl = (_doc_terms(src, label_col, text_col)
          .groupBy("term", "label").agg(F.count("*").alias("n11")))
    dft = tl.groupBy("term").agg(F.sum("n11").alias("df_t"))
    classes = src.groupBy(F.col(label_col).alias("label")) \
        .agg(F.count("*").alias("n_c"))
    totals = classes.agg(F.sum("n_c").alias("n_docs"))
    scored = (tl.join(dft, "term")
              .join(F.broadcast(classes), "label")
              .crossJoin(F.broadcast(totals))
              .where(F.col("df_t") >= min_doc_freq))
    if positive_only:
        # observed > expected, exactly: n11·N > df_t·n_c (integers)
        scored = scored.where(
            F.col("n11") * F.col("n_docs") > F.col("df_t") * F.col("n_c"))
    n11 = F.col("n11").cast("double")
    n10 = (F.col("df_t") - F.col("n11")).cast("double")
    n01 = (F.col("n_c") - F.col("n11")).cast("double")
    n00 = (F.col("n_docs") - F.col("df_t") - F.col("n_c")
           + F.col("n11")).cast("double")
    nn = F.col("n_docs").cast("double")
    num = nn * (n11 * n00 - n10 * n01) * (n11 * n00 - n10 * n01)
    den = (n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00)
    scored = scored.withColumn(
        "chi2", F.when(den != 0, num / den).otherwise(F.lit(0.0)))
    w = Window.partitionBy("label").orderBy(
        F.col("chi2").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("label", "term", "n11", "df_t",
                    F.round("chi2", round_to).alias("chi2"), "rank"))


def chi2_terms_sql(
    table: str,
    label_col: str,
    text_expr: str = "text",
    k: int = 20,
    min_doc_freq: int = 2,
    positive_only: bool = True,
    round_to: int = 6,
) -> str:
    """DuckDB twin of chi2_terms — same tokenization (lower +
    whitespace split + per-doc distinct) and the same double formula
    tree over the same integer cells."""
    pos = ("AND n11 * n_docs > df_t * n_c" if positive_only else "")
    return f"""
WITH docs AS (
  SELECT {label_col} AS label,
         list_distinct(list_filter(
           string_split_regex(trim(lower({text_expr})), '{_WS}'),
           t -> len(t) > 0)) AS toks
  FROM {table} WHERE {label_col} IS NOT NULL
),
tl AS (
  SELECT term, label, count(*) AS n11
  FROM (SELECT label, unnest(toks) AS term FROM docs)
  GROUP BY term, label
),
dft AS (SELECT term, CAST(sum(n11) AS BIGINT) AS df_t
        FROM tl GROUP BY term),
classes AS (
  SELECT {label_col} AS label, count(*) AS n_c
  FROM {table} WHERE {label_col} IS NOT NULL GROUP BY 1
),
totals AS (SELECT CAST(sum(n_c) AS BIGINT) AS n_docs FROM classes),
scored AS (
  SELECT tl.label, tl.term, tl.n11, dft.df_t,
         CASE WHEN (CAST(n11 AS DOUBLE) + CAST(df_t - n11 AS DOUBLE))
                 * (CAST(n_c - n11 AS DOUBLE)
                    + CAST(n_docs - df_t - n_c + n11 AS DOUBLE))
                 * (CAST(n11 AS DOUBLE) + CAST(n_c - n11 AS DOUBLE))
                 * (CAST(df_t - n11 AS DOUBLE)
                    + CAST(n_docs - df_t - n_c + n11 AS DOUBLE)) <> 0
         THEN CAST(n_docs AS DOUBLE)
              * (CAST(n11 AS DOUBLE) * CAST(n_docs - df_t - n_c + n11 AS DOUBLE)
                 - CAST(df_t - n11 AS DOUBLE) * CAST(n_c - n11 AS DOUBLE))
              * (CAST(n11 AS DOUBLE) * CAST(n_docs - df_t - n_c + n11 AS DOUBLE)
                 - CAST(df_t - n11 AS DOUBLE) * CAST(n_c - n11 AS DOUBLE))
              / ((CAST(n11 AS DOUBLE) + CAST(df_t - n11 AS DOUBLE))
                 * (CAST(n_c - n11 AS DOUBLE)
                    + CAST(n_docs - df_t - n_c + n11 AS DOUBLE))
                 * (CAST(n11 AS DOUBLE) + CAST(n_c - n11 AS DOUBLE))
                 * (CAST(df_t - n11 AS DOUBLE)
                    + CAST(n_docs - df_t - n_c + n11 AS DOUBLE)))
         ELSE 0.0 END AS chi2
  FROM tl JOIN dft USING (term)
          JOIN classes ON tl.label = classes.label
          CROSS JOIN totals
  WHERE df_t >= {min_doc_freq} {pos}
)
SELECT label, term, n11, df_t, round(chi2, {round_to}) AS chi2, rank
FROM (SELECT *, row_number() OVER
        (PARTITION BY label ORDER BY chi2 DESC, term ASC) AS rank
      FROM scored)
WHERE rank <= {k}
"""
