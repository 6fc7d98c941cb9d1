"""Table profiling: per-column null/distinct/range statistics in ONE
scan — the data-quality health check a 100 TB ingestion runs before
(and after) every pipeline stage.

The whole profile is a single aggregation pass: every column's
count/nulls/distinct/min/max are expressions in ONE agg (Catalyst
computes them all in the same partial-aggregate traversal), and the
1-row result unpivots to one row per column via `stack` — so profile
cost is one scan regardless of column count, never a per-column job.

Exact count(DISTINCT) across many columns expands [1]; default is
therefore approx_count_distinct (HLL++, mergeable, single-pass),
with `exact=True` as the DuckDB-replayable oracle mode for driver
parity at test scale.

[1] each exact distinct adds an Expand + distinct-agg; at profile
    time the approx sketch is what every production profiler
    (Deequ-style) uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# atomic types whose min/max are well-defined and portably comparable
# (df.dtypes SQL spellings)
_ORDERED_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "decimal", "string", "date", "timestamp", "timestamp_ntz",
    "boolean",
}


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls, null_frac,
    n_distinct, min_value, max_value) — min/max cast to string so
    heterogeneous columns share one schema; non-orderable columns
    (arrays, maps, structs) profile nulls/distinct only (min/max
    NULL). `exact` switches HLL++ distinct counts to exact
    count(DISTINCT) — the oracle-replayable mode."""
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns {missing}")
    if not cols:
        raise ValueError("no columns to profile")

    nd = (F.count_distinct if exact
          else F.approx_count_distinct)
    aggs = [F.count(F.lit(1)).alias("__n")]
    dtypes = dict(df.dtypes)
    for c in cols:
        base = dtypes[c].split("(")[0]
        ordered = base in _ORDERED_TYPES
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(nd(F.col(c)).alias(f"__nd_{c}"))
        if ordered:
            aggs.append(F.min(F.col(c)).cast("string")
                        .alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("string")
                        .alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)

    def q(s: str) -> str:
        return "'" + s.replace("'", "\\'") + "'"

    parts = []
    for c in cols:
        parts.append(", ".join([
            q(c), q(dtypes[c]), "__n", f"`__nn_{c}`", f"`__nd_{c}`",
            f"`__min_{c}`", f"`__max_{c}`"]))
    stacked = one.select(F.expr(
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(column, dtype, n_rows, n_notnull, n_distinct, "
        "min_value, max_value)"))
    return stacked.select(
        "column", "dtype",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("n_notnull")).cast("long")
        .alias("n_nulls"),
        F.round((F.col("n_rows") - F.col("n_notnull"))
                / F.col("n_rows"), 4).alias("null_frac"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value", "max_value")


def profile_table_sql(
    table: str,
    cols: list[tuple[str, str]],
) -> str:
    """DuckDB twin of profile_table(exact=True): same single-agg +
    unpivot shape, same string casts and rounding. `cols` is
    [(name, spark_dtype_string), ...] — the dtype literal Spark
    reports, supplied by the caller (the two engines' catalogs name
    types differently, and the profile row carries Spark's)."""
    if not cols:
        raise ValueError("no columns to profile")
    aggs = ["count(*) AS __n"]
    for c, _ in cols:
        aggs += [f"count({c}) AS __nn_{c}",
                 f"count(DISTINCT {c}) AS __nd_{c}",
                 f"CAST(min({c}) AS VARCHAR) AS __min_{c}",
                 f"CAST(max({c}) AS VARCHAR) AS __max_{c}"]
    selects = []
    for c, dtype in cols:
        selects.append(f"""
SELECT '{c}' AS column, '{dtype}' AS dtype,
       CAST(__n AS BIGINT) AS n_rows,
       CAST(__n - __nn_{c} AS BIGINT) AS n_nulls,
       round((__n - __nn_{c}) / CAST(__n AS DOUBLE), 4) AS null_frac,
       CAST(__nd_{c} AS BIGINT) AS n_distinct,
       __min_{c} AS min_value, __max_{c} AS max_value
FROM _one""")
    return (f"WITH _one AS (SELECT {', '.join(aggs)} FROM {table})"
            + " UNION ALL ".join(selects))
