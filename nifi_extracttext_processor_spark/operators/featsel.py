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
from .rounding import dround


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
                    dround("chi2", round_to).alias("chi2"), "rank"))


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
FROM (SELECT *, CAST(row_number() OVER
        (PARTITION BY label ORDER BY chi2 DESC, term ASC)
        AS INTEGER) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def cramers_v(
    df: DataFrame,
    col_a: str,
    col_b: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n, n_a, n_b, chi2, v) — Cramér's V association
    between two categorical columns: the normalized chi-square
    (0 = independent, 1 = perfectly associated),

        V = sqrt( chi2 / (n · (min(R, C) − 1)) )

    the "does source predict language" / "does platform predict
    variant" screen beside chi2_lang_terms' per-term ranking. NULLs
    on either side are excluded (not categories).

    Exactness: observed counts are integers; each cell's
    (o − r·c/n)²/(r·c/n) is one fixed chain from exact integers, and
    the cross-CELL sum folds in (a, b) cell order (the km_logrank
    discipline; cells are bounded by the category cardinalities).
    Degenerate tables (single row or column: min(R,C)=1) emit NULL v
    — association is undefined, not zero."""
    gb = list(group_by or [])
    a = F.col(col_a).cast("string")
    b = F.col(col_b).cast("string")
    base = (df.filter(a.isNotNull() & b.isNotNull())
            .select(*gb, a.alias("__a"), b.alias("__b")))
    obs = (base.groupBy(*gb, "__a", "__b")
           .agg(F.count("*").alias("__o")))
    da = base.groupBy(*gb, "__a").agg(F.count("*").alias("__r"))
    db = base.groupBy(*gb, "__b").agg(F.count("*").alias("__c"))
    # FULL R x C grid: unobserved cells carry o = 0 and contribute
    # (0 - e)^2 / e = e to chi2 — dropping them understates the
    # statistic (a perfect 3x3 association would read 0.82, not 1)
    grid = da.join(db, gb) if gb else da.crossJoin(db)
    cells = (grid.join(obs, [*gb, "__a", "__b"], "left")
             .withColumn("__o", F.coalesce("__o", F.lit(0))))
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    cells = cells.withColumn("__n", F.sum("__o").over(wtot))
    e = (F.col("__r").cast("double") * F.col("__c").cast("double")
         / F.col("__n").cast("double"))
    term = ((F.col("__o").cast("double") - e)
            * (F.col("__o").cast("double") - e) / e)
    folded = (cells
              .withColumn("__t", F.struct(F.col("__a"), F.col("__b"),
                                          term.alias("x")))
              .groupBy(*gb)
              .agg(F.max("__n").alias("n"),
                   F.count_distinct("__a").alias("n_a"),
                   F.count_distinct("__b").alias("n_b"),
                   F.expr(
                       "aggregate(array_sort(collect_list(__t)),"
                       " CAST(0.0 AS DOUBLE),"
                       " (acc, x) -> acc + x.x)").alias("__chi2")))
    k = F.least("n_a", "n_b").cast("double") - F.lit(1.0)
    v = F.when(k > 0,
               F.sqrt(F.col("__chi2")
                      / (F.col("n").cast("double") * k)))
    out = folded.select(
        *gb, "n", "n_a", "n_b",
        dround("__chi2", round_dp).alias("chi2"),
        dround(v, round_dp).alias("v"))
    return out.orderBy(*gb) if gb else out


def cramers_v_sql(
    table: str,
    a_expr: str,
    b_expr: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of cramers_v (same cell-ordered fold, same
    chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gsel2 = (", ".join(f"grid.{g}" for g in gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    order = ("ORDER BY " + ", ".join(gb)) if gb else ""
    grid_join = "JOIN" if gb else "CROSS JOIN"
    grid_using = ("USING (" + ", ".join(gb) + ")") if gb else ""
    cell_key = ", ".join([*gb, "a", "b"])
    return f"""
WITH base AS (
  SELECT {gsel}CAST({a_expr} AS VARCHAR) AS a,
         CAST({b_expr} AS VARCHAR) AS b
  FROM {table}
  WHERE {a_expr} IS NOT NULL AND {b_expr} IS NOT NULL
),
obs AS (
  SELECT {gsel}a, b, count(*) AS o FROM base GROUP BY {gsel}a, b
),
da AS (SELECT {gsel}a, count(*) AS r FROM base GROUP BY {gsel}a),
db AS (SELECT {gsel}b, count(*) AS c FROM base GROUP BY {gsel}b),
grid AS (
  SELECT {gsel}a, b, r, c FROM da {grid_join} db {grid_using}
),
marg AS (
  SELECT {gsel2}grid.a, grid.b, coalesce(o, 0) AS o, r, c,
         sum(coalesce(o, 0)) OVER ({part}) AS n
  FROM grid LEFT JOIN obs USING ({cell_key})
),
folded AS (
  SELECT {gsel}CAST(max(n) AS BIGINT) AS n,
         count(DISTINCT a) AS n_a, count(DISTINCT b) AS n_b,
         list_reduce(list_prepend(0.0::DOUBLE,
           list((o::DOUBLE - r::DOUBLE * c::DOUBLE / n::DOUBLE)
                * (o::DOUBLE - r::DOUBLE * c::DOUBLE / n::DOUBLE)
                / (r::DOUBLE * c::DOUBLE / n::DOUBLE)
                ORDER BY a, b)),
           (acc, x) -> acc + x) AS chi2
  FROM marg {gkey}
)
SELECT {gsel}n, n_a, n_b,
       round(chi2, {round_dp}) AS chi2,
       round(CASE WHEN least(n_a, n_b) > 1
                  THEN sqrt(chi2 / (n::DOUBLE
                       * (least(n_a, n_b)::DOUBLE - 1.0))) END,
             {round_dp}) AS v
FROM folded
{order}
"""
