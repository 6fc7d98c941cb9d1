"""Mergeable fixed-grid histogram state + grid-precision quantiles —
the deterministic quantile leg beside the rollup family's algebraic
metrics: medians and tail percentiles are NOT algebraic (you cannot
merge two medians), so the state is per-bin integer counts over a
CONSTANT [lo, hi) frame (the drift.py binning convention: fixed
width, edge bins absorb outliers). Counts are integers, merging is
addition, and the quantile read is an integer cumulative walk — so
unlike t-digest/approx_percentile sketches, every engine, every
merge order, and every rerun produces the SAME answer (the house
determinism bar), at the documented grid precision: the true
quantile's bin is exact; the reported value is that bin's midpoint,
so the error bound is width/2, chosen by n_bins.

Scale shape: build = one map-side-combinable groupBy bounded by
groups·n_bins cells; merge = union + sum; quantile = one keyed
window over ≤ n_bins rows per group. The rollup pattern applies
verbatim: key the build by (day bucket, dims), re-aggregate to any
coarser grain by re-summing counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround



def _check(lo: float, hi: float, n_bins: int) -> None:
    if not (hi > lo):
        raise ValueError("need hi > lo")
    if n_bins < 2:
        raise ValueError("need n_bins >= 2")


def histogram_build(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
    group_by: "list[str] | None" = None,
    weight_col: str | None = None,
) -> DataFrame:
    """(group..., bin, cnt) integer state; NULL values excluded,
    outliers clamp into the edge bins (observable as mass at bin 0 /
    n_bins-1 — widen the frame if the edges dominate). With
    `weight_col` (an INTEGER column — token counts, byte sizes) each
    row contributes its weight instead of 1, turning the quantile
    read into a weighted quantile (e.g. "the document length such
    that half of all TOKENS live in shorter docs"); integer weights
    keep the state exact and mergeable — fractional weights would
    reintroduce float-sum ordering, so they are rejected."""
    _check(lo, hi, n_bins)
    gb = list(group_by or [])
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), F.floor(
        (v - F.lit(float(lo))) / F.lit(width)))).cast("int")
    base = df.filter(v.isNotNull())
    if weight_col is None:
        return (base.select(*gb, b.alias("bin"))
                .groupBy(*gb, "bin")
                .agg(F.count("*").alias("cnt")))
    if dict(df.dtypes)[weight_col] not in ("int", "bigint",
                                           "smallint", "tinyint"):
        raise ValueError("weight_col must be an integer column")
    return (base.filter(F.col(weight_col).isNotNull()
                        & (F.col(weight_col) > 0))
            .select(*gb, b.alias("bin"), F.col(weight_col))
            .groupBy(*gb, "bin")
            .agg(F.sum(weight_col).alias("cnt")))


def histogram_merge(*states: DataFrame) -> DataFrame:
    """Union histogram states (same frame/group columns) and re-sum."""
    if not states:
        raise ValueError("nothing to merge")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    gb = [c for c in out.columns if c not in ("bin", "cnt")]
    return out.groupBy(*gb, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    state: DataFrame,
    qs: "list[float]",
    lo: float,
    hi: float,
    n_bins: int = 128,
    group_by: "list[str] | None" = None,
    round_dp: int = 6,
) -> DataFrame:
    """(group..., q, value) — value = midpoint of the bin containing
    the ceil(q·n)-th ordered element (grid precision: ±width/2).
    q=0 reads the first occupied bin, q=1 the last."""
    _check(lo, hi, n_bins)
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    gb = list(group_by or [])
    width = (hi - lo) / n_bins
    w = (Window.partitionBy(*gb).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy(*gb) if gb else \
        Window.partitionBy(F.lit(1))
    cum = (state
           .withColumn("cum", F.sum("cnt").over(w))
           .withColumn("total", F.sum("cnt").over(wt)))
    qdf = cum.crossJoin(
        F.broadcast(cum.sparkSession.createDataFrame(
            [(float(q),) for q in qs], "q double")))
    # target rank: max(1, ceil(q * total)); the quantile bin is the
    # first whose cumulative count reaches it
    target = F.greatest(F.lit(1),
                        F.ceil(F.col("q") * F.col("total")))
    hit = qdf.filter(F.col("cum") >= target)
    wq = Window.partitionBy(*gb, "q").orderBy("bin")
    return (hit.withColumn("__rn", F.row_number().over(wq))
            .filter(F.col("__rn") == 1)
            .select(*gb, "q",
                    dround(F.lit(float(lo))
                            + (F.col("bin") + 0.5) * F.lit(width),
                            round_dp).alias("value")))


def histogram_quantiles_sql(
    table: str,
    value_expr: str,
    qs: "list[float]",
    lo: float,
    hi: float,
    n_bins: int = 128,
    group_by: "list[str] | None" = None,
    round_dp: int = 6,
) -> str:
    """DuckDB twin: build + quantile walk over the raw table in one
    statement (identical clamp, rank rule, midpoint)."""
    _check(lo, hi, n_bins)
    gb = list(group_by or [])
    width = (hi - lo) / n_bins
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = (", ".join(gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    # ::DOUBLE everywhere literals meet arithmetic — DuckDB parses
    # bare decimals as DECIMAL and returns Decimal objects
    qvals = ", ".join(f"({q!r}::DOUBLE)" for q in qs)
    return f"""
WITH binned AS (
  SELECT {gsel}
         CAST(least({n_bins - 1}, greatest(0,
             floor((CAST({value_expr} AS DOUBLE) - {float(lo)!r})
                   / {width!r}))) AS INT) AS bin
  FROM {table} WHERE {value_expr} IS NOT NULL
),
state AS (
  SELECT {gsel}bin, count(*) AS cnt FROM binned
  GROUP BY {gkey}bin
),
cum AS (
  SELECT {gsel}bin, cnt,
         sum(cnt) OVER ({part} ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS cum,
         sum(cnt) OVER ({part}) AS total
  FROM state
),
hit AS (
  SELECT {gsel}q.q, bin,
         row_number() OVER ({('PARTITION BY ' + ', '.join(gb) + ', q.q')
                             if gb else 'PARTITION BY q.q'}
                            ORDER BY bin) AS rn
  FROM cum CROSS JOIN (VALUES {qvals}) q(q)
  WHERE cum >= greatest(1, ceil(q.q * total))
)
SELECT {gsel}q, round({float(lo)!r}::DOUBLE
                      + (bin + 0.5) * {width!r}::DOUBLE,
                      {round_dp}) AS value
FROM hit WHERE rn = 1
"""
