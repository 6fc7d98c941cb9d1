"""Grouped ordinary-least-squares trend fitting and Pearson
correlation — the "is this metric drifting, and how fast?" primitive
for per-key monitoring at corpus scale (per-host crawl latency trend,
per-source document-quality trend, per-event-type value trend).
Complements operators/timeseries.py (gap fill, CUSUM changepoints):
CUSUM answers "did the level SHIFT?", this answers "what is the
LINEAR RATE of change, and how much variance does the line explain?".

Closed-form sufficient statistics, one pass:

    n, Sx, Sy, Sxx, Syy, Sxy    per group
    slope     = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
    intercept = (Sy − slope·Sx) / n
    r2        = (n·Sxy − Sx·Sy)² / ((n·Sxx − Sx²)(n·Syy − Sy²))

Pearson r (grouped_corr) is the signed square root of r2 computed
from the same six sums — one aggregation serves both.

Scale shape: ONE groupBy producing six scalar sums — map-side
partial aggregation (partial_sum combine), so each executor ships
6 doubles + a count per (partition, group), never rows. No window,
no join, no second pass; this is the floor for a grouped fit. Groups
with n < 2 or zero x-variance emit NULL slope/r2 (vertical or
degenerate fits), never a divide-by-zero.

Numerical determinism: double sums are order-dependent under
parallel aggregation, so callers feeding an oracle comparison should
(a) keep |x| small — pass `x_shift` to center x against a constant
epoch (constant shift is order-independent and leaves slope/r2
mathematically unchanged, only the intercept's frame moves), and
(b) round outputs (house convention, see __spark_entry__ rows). The
DuckDB twins replay the same six-sum arithmetic, not regr_slope(),
so both engines run the identical formula tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .rounding import dround



def _six_sums(df: DataFrame, group_cols: "list[str]", x: Column,
              y: Column) -> DataFrame:
    pairs = df.select(*group_cols, x.cast("double").alias("_x"),
                      y.cast("double").alias("_y")).where(
        F.col("_x").isNotNull() & F.col("_y").isNotNull())
    return pairs.groupBy(*group_cols).agg(
        F.count("*").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"))


def grouped_ols(
    df: DataFrame,
    group_cols: "list[str] | tuple[str, ...]",
    x_col: "str | Column",
    y_col: "str | Column",
    x_shift: float = 0.0,
    round_to: "int | None" = None,
) -> DataFrame:
    """(group..., n_points, slope, intercept, r2) — least-squares
    line of y over (x − x_shift) per group. slope/intercept/r2 are
    NULL when n < 2 or x has zero variance; r2 additionally NULL
    when y has zero variance (a flat series has no explainable
    variance — r2 is 0/0, not 1)."""
    gcols = list(group_cols)
    x = (F.col(x_col) if isinstance(x_col, str) else x_col)
    y = (F.col(y_col) if isinstance(y_col, str) else y_col)
    s = _six_sums(df, gcols, x.cast("double") - F.lit(float(x_shift)), y)
    n, sx, sy = F.col("_n").cast("double"), F.col("_sx"), F.col("_sy")
    dxx = n * F.col("_sxx") - sx * sx
    dyy = n * F.col("_syy") - sy * sy
    dxy = n * F.col("_sxy") - sx * sy
    slope = F.when((F.col("_n") >= 2) & (dxx != 0), dxy / dxx)
    intercept = ((sy - slope * sx) / n)
    r2 = F.when((F.col("_n") >= 2) & (dxx != 0) & (dyy != 0),
                (dxy * dxy) / (dxx * dyy))
    out = [F.col("_n").alias("n_points"), slope.alias("slope"),
           intercept.alias("intercept"), r2.alias("r2")]
    if round_to is not None:
        # + 0.0 on the signed stats: signed-zero normalization
        # (see kruskal_wallis note in ranktest.py)
        out = [out[0]] + [
            (dround(slope, round_to) + F.lit(0.0)).alias("slope"),
            (dround(intercept, round_to) + F.lit(0.0))
            .alias("intercept"),
            dround(r2, round_to).alias("r2")]
    return s.select(*gcols, *out)


def grouped_ols_sql(
    table: str,
    group_cols: "list[str] | tuple[str, ...]",
    x_expr: str,
    y_expr: str,
    x_shift: float = 0.0,
    round_to: "int | None" = None,
) -> str:
    """DuckDB twin of grouped_ols — replays the six-sum closed form
    (NOT regr_slope(), so the arithmetic tree matches Spark's)."""
    g = ", ".join(group_cols)
    xs = f"(CAST({x_expr} AS DOUBLE) - {float(x_shift)!r})"
    ys = f"CAST({y_expr} AS DOUBLE)"
    rnd = (lambda e: f"round({e}, {round_to})") if round_to is not None \
        else (lambda e: e)
    return f"""
WITH s AS (
  SELECT {g}, count(*) AS _n,
         sum(_x) AS _sx, sum(_y) AS _sy,
         sum(_x*_x) AS _sxx, sum(_y*_y) AS _syy,
         sum(_x*_y) AS _sxy
  FROM (SELECT {g}, {xs} AS _x, {ys} AS _y FROM {table}
        WHERE {xs} IS NOT NULL AND {ys} IS NOT NULL)
  GROUP BY {g}
)
SELECT {g}, _n AS n_points,
       {rnd("slope")}{" + 0.0" if round_to is not None else ""} AS slope,
       {rnd("(_sy - slope*_sx) / _n")}{" + 0.0" if round_to is not None else ""}
         AS intercept,
       {rnd("CASE WHEN _n >= 2 AND (_n*_sxx - _sx*_sx) <> 0 "
            "AND (_n*_syy - _sy*_sy) <> 0 THEN "
            "(_n*_sxy - _sx*_sy)*(_n*_sxy - _sx*_sy) / "
            "((_n*_sxx - _sx*_sx)*(_n*_syy - _sy*_sy)) END")} AS r2
FROM (SELECT *, CASE WHEN _n >= 2 AND (_n*_sxx - _sx*_sx) <> 0
                THEN (_n*_sxy - _sx*_sy) / (_n*_sxx - _sx*_sx)
                END AS slope FROM s)
"""


def grouped_corr(
    df: DataFrame,
    group_cols: "list[str] | tuple[str, ...]",
    x_col: "str | Column",
    y_col: "str | Column",
    round_to: "int | None" = None,
) -> DataFrame:
    """(group..., n_points, pearson_r) — Pearson correlation per
    group from the same six sums. NULL when either side has zero
    variance or n < 2."""
    gcols = list(group_cols)
    x = (F.col(x_col) if isinstance(x_col, str) else x_col)
    y = (F.col(y_col) if isinstance(y_col, str) else y_col)
    s = _six_sums(df, gcols, x, y)
    n, sx, sy = F.col("_n").cast("double"), F.col("_sx"), F.col("_sy")
    dxx = n * F.col("_sxx") - sx * sx
    dyy = n * F.col("_syy") - sy * sy
    dxy = n * F.col("_sxy") - sx * sy
    r = F.when((F.col("_n") >= 2) & (dxx > 0) & (dyy > 0),
               dxy / F.sqrt(dxx * dyy))
    if round_to is not None:
        # + 0.0: signed-zero normalization (kruskal_wallis note)
        r = dround(r, round_to) + F.lit(0.0)
    return s.select(*gcols, F.col("_n").alias("n_points"),
                    r.alias("pearson_r"))


def grouped_corr_sql(
    table: str,
    group_cols: "list[str] | tuple[str, ...]",
    x_expr: str,
    y_expr: str,
    round_to: "int | None" = None,
) -> str:
    """DuckDB twin of grouped_corr (six-sum formula, not corr())."""
    g = ", ".join(group_cols)
    r = ("CASE WHEN _n >= 2 AND (_n*_sxx - _sx*_sx) > 0 "
         "AND (_n*_syy - _sy*_sy) > 0 THEN "
         "(_n*_sxy - _sx*_sy) / "
         "sqrt((_n*_sxx - _sx*_sx)*(_n*_syy - _sy*_sy)) END")
    if round_to is not None:
        r = f"round({r}, {round_to}) + 0.0"
    return f"""
SELECT {g}, _n AS n_points, {r} AS pearson_r
FROM (
  SELECT {g}, count(*) AS _n,
         sum(_x) AS _sx, sum(_y) AS _sy,
         sum(_x*_x) AS _sxx, sum(_y*_y) AS _syy,
         sum(_x*_y) AS _sxy
  FROM (SELECT {g}, CAST({x_expr} AS DOUBLE) AS _x,
               CAST({y_expr} AS DOUBLE) AS _y FROM {table}
        WHERE {x_expr} IS NOT NULL AND {y_expr} IS NOT NULL)
  GROUP BY {g}
)
"""
