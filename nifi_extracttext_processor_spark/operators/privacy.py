"""Re-identification risk audit: k-anonymity equivalence classes
(Sweeney 2002) and l-diversity (Machanavalhala 2007) over a chosen
set of quasi-identifier columns. The privacy complement of
`text_analysis.py`'s PII scrubbing: scrubbing removes DIRECT
identifiers from text, this measures whether the remaining STRUCTURED
columns still single people out — the release gate a 100 TB training
corpus with user-derived metadata needs before the metadata ships.

A record's equivalence class is the set of rows sharing its
quasi-identifier tuple; k = class size (an attacker matching on the
quasi-identifiers narrows to k candidates), l = distinct sensitive
values inside the class (k big but l=1 still leaks the sensitive
attribute). NULL quasi values are their own bucket (NULL = "value
withheld" is itself an observable, so it groups like any value).

Scale design: one groupBy on the quasi columns with map-side
combinable count + exact count_distinct(sensitive) — rows collapse to
one tuple per class before the shuffle; the summary is a second agg
over the (already tiny) class table. No payloads, no joins, no
windows, no driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround



def anonymity_classes(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """One row per equivalence class: the quasi-identifier columns,
    `k` (class size) and — when `sensitive_col` is given —
    `l_diversity` (distinct sensitive values in the class). Ordered
    by k ascending (riskiest first), then quasi values ascending."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    aggs = [F.count("*").alias("k")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col))
                    .alias("l_diversity"))
    return (df.groupBy(*quasi_cols).agg(*aggs)
            .orderBy("k", *quasi_cols))


def anonymity_classes_sql(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
) -> str:
    """DuckDB twin of anonymity_classes (same NULL-groups-as-value
    semantics — GROUP BY treats NULL as a key in both engines)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    qc = ", ".join(quasi_cols)
    # Spark ASC defaults to NULLS FIRST; DuckDB to NULLS LAST — pin it
    ob = ", ".join(f"{c} NULLS FIRST" for c in quasi_cols)
    ldiv = (f", count(DISTINCT {sensitive_col}) AS l_diversity"
            if sensitive_col is not None else "")
    return f"""
SELECT {qc}, count(*) AS k{ldiv}
FROM {table}
GROUP BY {qc}
ORDER BY k, {ob}
"""


def anonymity_summary(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k_threshold: int = 5,
) -> DataFrame:
    """One-row release-gate verdict: n_rows, n_classes, min_k
    (the dataset's k-anonymity), n_violating_classes /
    n_violating_rows / pct_violating_rows (classes with k <
    `k_threshold` — the rows generalization or suppression must
    touch), and min_l (the dataset's l-diversity) when
    `sensitive_col` is given. pct rounded to 6 dp."""
    if k_threshold < 1:
        raise ValueError("k_threshold must be >= 1")
    classes = anonymity_classes(df, quasi_cols, sensitive_col)
    viol = F.col("k") < k_threshold
    aggs = [
        F.sum("k").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.min("k").alias("min_k"),
        F.sum(viol.cast("long")).alias("n_violating_classes"),
        F.sum(F.when(viol, F.col("k")).otherwise(0))
        .alias("n_violating_rows"),
        dround(F.sum(F.when(viol, F.col("k")).otherwise(0))
                / F.sum("k"), 6).alias("pct_violating_rows"),
    ]
    if sensitive_col is not None:
        aggs.append(F.min("l_diversity").alias("min_l"))
    return classes.agg(*aggs)


def suppress_small_classes(
    df: DataFrame,
    quasi_cols: list[str],
    k_threshold: int = 5,
) -> DataFrame:
    """k-anonymity REPAIR by suppression: drop every row whose
    equivalence class (see anonymity_classes) has k < `k_threshold`.
    The surviving frame is k-anonymous at the threshold by
    construction (anonymity_summary on the output reports
    min_k >= k_threshold, or an empty frame).

    Scale: the violating-class table (classes with k < threshold)
    is computed by the same map-side-collapsing groupBy as the audit,
    then removed with a LEFT ANTI join on the quasi keys. Violating
    classes are small BY DEFINITION (each holds < k_threshold rows),
    so the anti-join side is bounded by (#violating classes) tuples
    — AQE broadcasts it in the common case where violations are the
    tail, and the payload rows never shuffle. NULL quasi values
    match as a bucket (null-safe equality), mirroring the audit's
    NULL-groups-as-value semantics."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k_threshold < 1:
        raise ValueError("k_threshold must be >= 1")
    viol = (df.groupBy(*quasi_cols).agg(F.count("*").alias("k"))
            .filter(F.col("k") < k_threshold)
            .select(*[F.col(c).alias(f"__viol_{c}") for c in quasi_cols]))
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__viol_{c}"))
        cond = eq if cond is None else cond & eq
    return df.join(viol, on=cond, how="left_anti")


def suppress_small_classes_sql(
    table: str,
    quasi_cols: list[str],
    k_threshold: int = 5,
) -> str:
    """DuckDB twin of suppress_small_classes (COUNT(*) OVER the quasi
    partition keeps k >= threshold; PARTITION BY groups NULLs
    together exactly like the null-safe anti-join)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k_threshold < 1:
        raise ValueError("k_threshold must be >= 1")
    qc = ", ".join(quasi_cols)
    return f"""
SELECT * EXCLUDE (__k) FROM (
  SELECT *, count(*) OVER (PARTITION BY {qc}) AS __k
  FROM {table}
) WHERE __k >= {int(k_threshold)}
"""


def generalize_numeric(col, width: float):
    """Generalize a numeric quasi-identifier to its fixed-width bin
    label: floor(x / width) * width, the bin's inclusive lower edge
    (age 37 @ width 10 → 30.0; -3 @ 10 → -10.0 — floor, not
    truncate). NULL stays NULL (still its own audit bucket). Coarser
    width → bigger equivalence classes → higher k; compose with
    anonymity_summary to pick the narrowest width that clears the
    threshold. Pure narrow expression — usable in select/withColumn."""
    if width <= 0:
        raise ValueError("width must be positive")
    return F.floor(F.col(col) / F.lit(width)) * F.lit(width)


def generalize_numeric_sql(col: str, width: float) -> str:
    """DuckDB twin expression for generalize_numeric."""
    if width <= 0:
        raise ValueError("width must be positive")
    return f"floor({col} / {width}) * {width}"


def generalize_prefix(col, keep: int, pad: str = "*"):
    """Generalize a string quasi-identifier to its first `keep`
    characters, padding the remainder with `pad` so the generalized
    value keeps the original length ('02138' @ keep=3 → '021**' —
    the classic ZIP-code hierarchy step). Strings at or under `keep`
    chars pass through unchanged; NULL stays NULL."""
    if keep < 0:
        raise ValueError("keep must be >= 0")
    c = F.col(col)
    return F.when(
        c.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(F.substring(c, 1, keep),
                 F.repeat(F.lit(pad),
                          F.greatest(F.length(c) - keep, F.lit(0)))))


def generalize_prefix_sql(col: str, keep: int, pad: str = "*") -> str:
    """DuckDB twin expression for generalize_prefix."""
    if keep < 0:
        raise ValueError("keep must be >= 0")
    return (f"CASE WHEN {col} IS NULL THEN NULL ELSE "
            f"substr({col}, 1, {keep}) || "
            f"repeat('{pad}', greatest(length({col}) - {keep}, 0)) END")


def anonymity_summary_sql(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k_threshold: int = 5,
) -> str:
    if k_threshold < 1:
        raise ValueError("k_threshold must be >= 1")
    qc = ", ".join(quasi_cols)
    ldiv_in = (f", count(DISTINCT {sensitive_col}) AS l_diversity"
               if sensitive_col is not None else "")
    ldiv_out = (", min(l_diversity) AS min_l"
                if sensitive_col is not None else "")
    kt = int(k_threshold)
    return f"""
WITH classes AS (
  SELECT {qc}, count(*) AS k{ldiv_in}
  FROM {table}
  GROUP BY {qc}
)
SELECT CAST(sum(k) AS BIGINT) AS n_rows,
       count(*) AS n_classes,
       min(k) AS min_k,
       CAST(sum(CASE WHEN k < {kt} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_classes,
       CAST(sum(CASE WHEN k < {kt} THEN k ELSE 0 END) AS BIGINT)
         AS n_violating_rows,
       round(sum(CASE WHEN k < {kt} THEN k ELSE 0 END)
             / CAST(sum(k) AS DOUBLE), 6) AS pct_violating_rows{ldiv_out}
FROM classes
"""
