"""Distribution-drift monitoring — Population Stability Index (PSI)
and a binned Kolmogorov–Smirnov statistic between a reference and a
current snapshot of a metric, per group. The "did the data change
under me?" gate for long-running ingestion: a quality-score
distribution that drifts between crawls, a feature whose shape moves
between training snapshots, an upstream schema change surfacing as a
value shift. Complements operators/diff.py (keyed row diff — WHICH
rows changed) and timeseries.py CUSUM (WHEN a level shifted): this
answers "did the SHAPE move, and by how much".

    PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)
    KS  = max_bins |CDF_ref − CDF_cur|

Binning is fixed-width over a caller-supplied [lo, hi) frame with
the outermost bins absorbing outliers (standard PSI practice):

    bin = clamp(floor((x − lo) / width), 0, bins−1)

— a pure-arithmetic assignment both engines replay bit-for-bit (no
data-derived quantile edges, whose approximation would differ across
engines; derive lo/hi once from the reference with derive_frame()).
Proportions use additive smoothing (α pseudo-count per bin) so an
empty bin contributes a finite, deterministic penalty instead of
ln(0) — the α default 0.5 is the Jeffreys prior. Convention:
PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action.

Scale shape: each snapshot collapses to (group, bin) integer counts
in its own map-side-combined aggregation — a shuffle of at most
|groups|·bins triples regardless of input size; the bin spine
(groups × range(bins)) is generated, not scanned, so zero-count bins
on EITHER side are represented without a full outer join; the PSI/KS
reduction runs over that bounded spine. Nothing after the first
aggregation scales with row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


from .guards import DEFAULT_MAX_DISTINCT, guard_max_distinct


def derive_frame(ref: DataFrame, value_col: str) -> "tuple[float, float]":
    """[lo, hi] of the reference metric (exact min/max — order-
    independent aggregates), for feeding psi_drift as constants."""
    r = ref.agg(F.min(value_col).alias("lo"),
                F.max(value_col).alias("hi")).collect()[0]
    return float(r["lo"]), float(r["hi"])


def _bin_counts(df: DataFrame, group_cols: "list[str]", value_col: str,
                lo: float, hi: float, bins: int, tag: str) -> DataFrame:
    width = (hi - lo) / bins
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), F.floor(
        (F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
        .cast("int")))
    return (df.where(F.col(value_col).isNotNull())
            .select(*group_cols, b.alias("bin"))
            .groupBy(*group_cols, "bin")
            .agg(F.count("*").alias(tag)))


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_cols: "list[str] | tuple[str, ...]" = (),
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 10,
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """(group..., n_ref, n_cur, psi, ks) — one row per group seen in
    EITHER snapshot (a group absent from one side maximally drifted,
    not silently dropped). See module docstring for formulas."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not hi > lo:
        raise ValueError("need hi > lo")
    gcols = list(group_cols)
    rc = _bin_counts(ref, gcols, value_col, lo, hi, bins, "n_r")
    cc = _bin_counts(cur, gcols, value_col, lo, hi, bins, "n_c")
    spine_bins = F.explode(F.sequence(F.lit(0), F.lit(bins - 1))) \
        .alias("bin")
    if gcols:
        groups = rc.select(*gcols).union(cc.select(*gcols)).distinct()
        spine = groups.select(*gcols, spine_bins)
    else:
        spine = rc.sparkSession.range(1).select(spine_bins)
    keys = gcols + ["bin"]
    j = (spine.join(rc, keys, "left").join(cc, keys, "left")
         .select(*keys,
                 F.coalesce("n_r", F.lit(0)).alias("n_r"),
                 F.coalesce("n_c", F.lit(0)).alias("n_c")))
    w = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    j = j.withColumn("tot_r", F.sum("n_r").over(w)) \
         .withColumn("tot_c", F.sum("n_c").over(w))
    a = F.lit(float(alpha))
    p_r = (F.col("n_r") + a) / (F.col("tot_r") + a * bins)
    p_c = (F.col("n_c") + a) / (F.col("tot_c") + a * bins)
    term = (p_c - p_r) * F.log(p_c / p_r)
    # binned CDFs use the raw (unsmoothed) proportions; empty
    # snapshots (tot=0) yield NULL ks rather than 0/0
    cdf_w = w.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf_r = F.try_divide(F.sum("n_r").over(cdf_w), F.col("tot_r"))
    cdf_c = F.try_divide(F.sum("n_c").over(cdf_w), F.col("tot_c"))
    per_bin = j.select(
        *gcols, F.col("n_r"), F.col("n_c"),
        term.alias("_psi_term"),
        F.abs(cdf_r - cdf_c).alias("_ks_term"))
    return (per_bin.groupBy(*gcols) if gcols else per_bin.groupBy()) \
        .agg(F.sum("n_r").alias("n_ref"),
             F.sum("n_c").alias("n_cur"),
             dround(F.sum("_psi_term"), round_to).alias("psi"),
             dround(F.max("_ks_term"), round_to).alias("ks"))


def distribution_drift_sql(
    ref_table: str,
    cur_table: str,
    value_expr: str,
    group_cols: "list[str] | tuple[str, ...]" = (),
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 10,
    alpha: float = 0.5,
    round_to: int = 6,
) -> str:
    """DuckDB twin of distribution_drift — same bin assignment,
    smoothing, and formula trees. `ref_table`/`cur_table` may be any
    FROM-able expression (a table name or a parenthesized subquery
    with alias)."""
    gcols = list(group_cols)
    g = ", ".join(gcols)
    gsel = (g + "," if gcols else "")
    width = (hi - lo) / bins
    binx = (f"least({bins - 1}, greatest(0, CAST(floor("
            f"(CAST({value_expr} AS DOUBLE) - {lo!r}) / {width!r}) "
            f"AS INT)))")
    part = f"PARTITION BY {g}" if gcols else "PARTITION BY 1"
    spine_src = (f"(SELECT DISTINCT {g} FROM "
                 f"(SELECT {g} FROM rc UNION ALL SELECT {g} FROM cc)) "
                 f"CROSS JOIN " if gcols else "")
    join_keys = " AND ".join(
        [f"s.{c} IS NOT DISTINCT FROM t.{c}" for c in gcols]
        + ["s.bin = t.bin"])
    ssel = (", ".join(f"s.{c}" for c in gcols) + "," if gcols else "")
    grp_by = f"GROUP BY {g}" if gcols else ""
    return f"""
WITH rc AS (
  SELECT {gsel} {binx} AS bin, count(*) AS n_r
  FROM {ref_table} WHERE {value_expr} IS NOT NULL
  GROUP BY {gsel} bin
),
cc AS (
  SELECT {gsel} {binx} AS bin, count(*) AS n_c
  FROM {cur_table} WHERE {value_expr} IS NOT NULL
  GROUP BY {gsel} bin
),
spine AS (
  SELECT {gsel} CAST(b.range AS INT) AS bin
  FROM {spine_src}range({bins}) b
),
j AS (
  SELECT {ssel} s.bin,
         coalesce((SELECT n_r FROM rc t WHERE {join_keys}), 0) AS n_r,
         coalesce((SELECT n_c FROM cc t WHERE {join_keys}), 0) AS n_c
  FROM spine s
),
tot AS (
  SELECT *, CAST(sum(n_r) OVER ({part}) AS BIGINT) AS tot_r,
            CAST(sum(n_c) OVER ({part}) AS BIGINT) AS tot_c,
            CAST(sum(n_r) OVER ({part} ORDER BY bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_r,
            CAST(sum(n_c) OVER ({part} ORDER BY bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
  FROM j
)
SELECT {gsel} CAST(sum(n_r) AS BIGINT) AS n_ref,
       CAST(sum(n_c) AS BIGINT) AS n_cur,
       round(sum(((n_c + {alpha!r}) / (tot_c + {alpha!r} * {bins})
                  - (n_r + {alpha!r}) / (tot_r + {alpha!r} * {bins}))
                 * ln(((n_c + {alpha!r}) / (tot_c + {alpha!r} * {bins}))
                      / ((n_r + {alpha!r}) / (tot_r + {alpha!r} * {bins})))),
             {round_to}) AS psi,
       round(max(CASE WHEN tot_r = 0 OR tot_c = 0 THEN NULL
                 ELSE abs(CAST(cum_r AS DOUBLE) / tot_r
                          - CAST(cum_c AS DOUBLE) / tot_c) END),
             {round_to}) AS ks
FROM tot
{grp_by}
"""


def ks_test_exact(
    df: DataFrame,
    side_col: str,
    value_col: str,
    side_a: str,
    side_b: str,
    group_by: "list[str] | None" = None,
    alpha: float = 0.05,
    round_dp: int = 6,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """(group..., n_a, n_b, ks_d, ks_crit, significant) — EXACT
    two-sample Kolmogorov–Smirnov distance (no binning; the binned
    `distribution_drift` KS is the streaming-friendly monitor, this
    is the adjudicator): D = max over observed values of
    |ECDF_a − ECDF_b|, computed as the INTEGER max of
    |cum_a·n_b − cum_b·n_a| with one final division by n_a·n_b — the
    ECDF comparison is exact-rational, so both engines agree
    bit-for-bit. `ks_crit` is the large-sample rejection bound
    c(α)·√((n_a+n_b)/(n_a·n_b)) with c(α) = √(−ln(α/2)/2) embedded
    as a repr Python constant (Smirnov 1948 asymptotic).

    Scale shape (the KM/Mann-Whitney discipline): rows collapse to
    one (group, DISTINCT value) count pair map-side — the shuffle and
    the ECDF window carry distinct metric values, never rows. Callers
    with continuous ultra-high-cardinality metrics quantize upstream
    (the documented exact-percentile contract) — and since r15 that
    contract is ENFORCED: `max_distinct` gates the distinct-value
    collapse through guards.guard_max_distinct before the ECDF
    window's single-task sort could materialize (`None` opts out)."""
    import math
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    gb = list(group_by or [])
    v = F.col(value_col)
    base = (df.filter(F.col(side_col).isin(side_a, side_b)
                      & v.isNotNull())
            .withColumn("__b",
                        (F.col(side_col) == side_b).cast("long")))
    per_v = base.groupBy(*gb, v.alias("__v")).agg(
        F.sum(1 - F.col("__b")).alias("ca"),
        F.sum("__b").alias("cb"))
    per_v = guard_max_distinct(per_v, gb, max_distinct,
                               "ks_test_exact")
    w = (Window.partitionBy(*gb).orderBy("__v")
         if gb else Window.partitionBy().orderBy("__v"))
    wt = (Window.partitionBy(*gb) if gb else Window.partitionBy())
    cum_a = F.sum("ca").over(w)
    cum_b = F.sum("cb").over(w)
    n_a = F.sum("ca").over(wt)
    n_b = F.sum("cb").over(wt)
    d_int = F.abs(cum_a * n_b - cum_b * n_a)
    stepped = per_v.select(*gb, d_int.alias("__d"),
                           n_a.alias("n_a"), n_b.alias("n_b"))
    agg = (stepped.groupBy(*gb)
           .agg(F.max("__d").alias("dmax"),
                F.max("n_a").alias("n_a"),
                F.max("n_b").alias("n_b")))
    c = repr(float(math.sqrt(-math.log(alpha / 2.0) / 2.0)))
    ks = F.try_divide(F.col("dmax").cast("double"),
                      (F.col("n_a") * F.col("n_b")).cast("double"))
    crit = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.lit(float(c)) * F.sqrt(
            (F.col("n_a") + F.col("n_b")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")))
    ksr = dround(ks, round_dp)
    return agg.select(
        *gb, "n_a", "n_b",
        ksr.alias("ks_d"),
        dround(crit, round_dp).alias("ks_crit"),
        F.coalesce(ksr > dround(crit, round_dp), F.lit(False))
        .alias("significant"))


def ks_test_exact_sql(
    table: str,
    side_col: str,
    value_col: str,
    side_a: str,
    side_b: str,
    group_by: "list[str] | None" = None,
    alpha: float = 0.05,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of ks_test_exact (same integer ECDF distances,
    same repr-embedded Smirnov constant)."""
    import math
    from ..sqlutil import sql_lit
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = f"PARTITION BY {', '.join(gb)} " if gb else ""
    partt = f"PARTITION BY {', '.join(gb)}" if gb else ""
    c = repr(float(math.sqrt(-math.log(alpha / 2.0) / 2.0)))
    return f"""
WITH per_v AS (
  SELECT {gsel}{value_col} AS v,
         sum(1 - CAST({side_col} = {sql_lit(side_b)} AS BIGINT))
           AS ca,
         sum(CAST({side_col} = {sql_lit(side_b)} AS BIGINT)) AS cb
  FROM {table}
  WHERE {side_col} IN ({sql_lit(side_a)}, {sql_lit(side_b)})
    AND {value_col} IS NOT NULL
  GROUP BY {gsel.rstrip(', ') + (',' if gb else '')} {value_col}
),
stepped AS (
  SELECT {gsel}
         abs(sum(ca) OVER ({part}ORDER BY v) * sum(cb) OVER ({partt})
             - sum(cb) OVER ({part}ORDER BY v)
               * sum(ca) OVER ({partt})) AS d,
         sum(ca) OVER ({partt}) AS n_a,
         sum(cb) OVER ({partt}) AS n_b
  FROM per_v
),
agg AS (
  SELECT {gsel}max(d) AS dmax, CAST(max(n_a) AS BIGINT) AS n_a,
         CAST(max(n_b) AS BIGINT) AS n_b
  FROM stepped
  {gkey}
)
SELECT {gsel}n_a, n_b,
       round(CAST(dmax AS DOUBLE)
             / nullif(CAST(n_a * n_b AS DOUBLE), 0), {round_dp})
         AS ks_d,
       round(CASE WHEN n_a > 0 AND n_b > 0
                  THEN {c} * sqrt(CAST(n_a + n_b AS DOUBLE)
                                  / CAST(n_a * n_b AS DOUBLE)) END,
             {round_dp}) AS ks_crit,
       coalesce(round(CAST(dmax AS DOUBLE)
                      / nullif(CAST(n_a * n_b AS DOUBLE), 0),
                      {round_dp})
                > round(CASE WHEN n_a > 0 AND n_b > 0
                             THEN {c} * sqrt(CAST(n_a + n_b AS DOUBLE)
                                             / CAST(n_a * n_b
                                                    AS DOUBLE)) END,
                        {round_dp}), FALSE) AS significant
FROM agg
"""
