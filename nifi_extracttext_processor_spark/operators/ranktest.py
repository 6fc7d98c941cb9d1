"""Rank-based inference — the distribution-free A/B readouts:
Mann-Whitney U (Wilcoxon rank-sum; Mann & Whitney 1947) for "did the
treatment shift the distribution" when means are meaningless
(heavy-tailed latencies, bounded scores, ordinal ratings), and
Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995) for the
metric-sweep problem: test 200 metrics at alpha=.05 and ~10 "wins"
are false discoveries unless the thresholds adapt to the sweep.

Cross-engine exactness (the decayed_agg discipline): both operators
collapse to the DISTINCT-VALUE aggregate first (the Kaplan-Meier
shape), so every rank quantity is an INTEGER prefix sum — midranks
are carried as 2x-integers (2*left + t + 1, always odd/even exact),
the rank-sum and tie correction are exact integer sums, and the
handful of closing IEEE divisions/sqrt are written with the same
association on both engines. No transcendentals: significance is
|z| >= caller critical value, never a p-value (the abtest family
convention); BH consumes caller-provided p-values and only compares
them against exact-rational thresholds.

Scale shape: the shuffle carries DISTINCT metric values (Mann-
Whitney) or DISTINCT p-values (BH), never rows. METRIC CONTRACT
(same as survival.py's duration contract): callers quantize
continuous metrics to a practical grain (the events table's value
is already 2dp) so distinct values per group stay bounded; the keyed
window then runs over that bounded table, not the data.

Twin-SQL caveat: the generated DuckDB twins use short internal CTE
aliases (g, v, c, t, mid2, ...); a caller whose group_by column is
literally named one of these collides with the alias and must rename
the column first. The Spark operators have no such restriction
(internal columns are __-prefixed).

The contract is ENFORCED, not just documented (VERDICT r13): every
operator that ends in an ordered window over a distinct-value
collapse gates that collapse through guards.guard_max_distinct —
a parallel count on the already-computed collapse that raises
loudly (USER_RAISED_EXCEPTION, naming the op and the knob) before
the single-task sort would materialize. `max_distinct=None` opts
out for domains bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


from ..sqlutil import sql_lit
from .guards import DEFAULT_MAX_DISTINCT, guard_max_distinct


def ab_mann_whitney(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.96,
    round_dp: int = 4,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """(group..., n_control, n_treatment, u, z, significant) — the
    Mann-Whitney U statistic for the treatment side with the normal
    approximation z (tie-corrected variance):

        U1 = R1 − n1(n1+1)/2          (R1 = treatment rank-sum,
                                       midranks for ties)
        E[U1] = n0·n1/2
        Var   = (n0·n1/12)·((n+1) − ΣT(t³−t)/(n(n−1)))

    Exactness: per-(group, distinct value) counts (c0, c1) are one
    map-side-combinable agg; 2·midrank = 2·left + t + 1 and
    2·R1 = Σ c1·(2·left + t + 1) stay in exact integer arithmetic
    (order-independent), accumulated as decimal(38,0) / HUGEINT
    since r15 (2R1 ~ N² and the t³ tie term silently wrap int64 at
    ~2·10⁹ / ~2·10⁶ rows respectively, where the HUGEINT twin
    raises instead — the same engine-divergence class ADVICE r14
    flagged on kruskal_wallis), as is 2U1 = 2R1 − n1(n1+1). The closing z
    is a fixed-order chain of IEEE ops both engines replay. Cells
    with an empty side or all values tied emit NULL z /
    significant=false. NULL values are excluded (not observations)."""
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & v.isNotNull())
            .withColumn("__t",
                        (F.col(variant_col) == treatment).cast("long")))
    per_v = (base.groupBy(*gb, v.alias("__v"))
             .agg(F.sum(1 - F.col("__t")).alias("c0"),
                  F.sum("__t").alias("c1")))
    per_v = per_v.withColumn("t", F.col("c0") + F.col("c1"))
    per_v = guard_max_distinct(per_v, gb, max_distinct,
                               "ab_mann_whitney")
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wprev = (wtot.orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, -1))
    left = F.coalesce(F.sum("t").over(wprev), F.lit(0))
    # 2x-integer midrank of the tied block at __v
    mid2 = 2 * left + F.col("t") + 1
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = (per_v
           .select(*gb,
                   (dec(F.col("c1")) * dec(mid2)).alias("__r1x2"),
                   "c0", "c1",
                   (dec(F.col("t")) * dec(F.col("t")) * dec(F.col("t"))
                    - dec(F.col("t"))).alias("__tt"))
           .groupBy(*gb)
           .agg(F.sum("c0").alias("n0"),
                F.sum("c1").alias("n1"),
                F.sum("__r1x2").alias("r1x2"),
                F.sum("__tt").alias("tie")))
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    n = (F.col("n0") + F.col("n1")).cast("double")
    # 2*U1, exact decimal (n1*(n1+1) ~ N^2 wraps int64 at ~3e9 rows)
    u1x2 = F.col("r1x2") - F.col("n1").cast("decimal(38,0)") \
        * (F.col("n1").cast("decimal(38,0)") + F.lit(1))
    # fixed-association variance chain (both engines as written):
    var = (n0 * n1 / F.lit(12.0)) \
        * ((n + F.lit(1.0))
           - F.col("tie").cast("double") / (n * (n - F.lit(1.0))))
    z = F.when(
        (F.col("n0") > 0) & (F.col("n1") > 0) & (var > 0),
        (u1x2.cast("double") - n0 * n1)
        / (F.lit(2.0) * F.sqrt(var)))
    # + 0.0: normalize the signed zero a tiny-negative z rounds to
    # (engine round()s disagree on -0.0 — see kruskal_wallis note)
    zr = dround(z, round_dp) + F.lit(0.0)
    return agg.select(
        *gb,
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        (u1x2.cast("double") / F.lit(2.0)).alias("u"),
        zr.alias("z"),
        F.coalesce(F.abs(zr) >= F.lit(float(z_alpha)),
                   F.lit(False)).alias("significant"))


def ab_mann_whitney_sql(
    table: str,
    variant_col: str,
    value_expr: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.96,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_mann_whitney: identical distinct-value
    aggregate, integer prefix sums, 2x midranks, and closing IEEE
    chain (same association)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({value_expr} AS DOUBLE) AS v,
         CAST({variant_col} = {sql_lit(treatment)} AS BIGINT) AS g1
  FROM {table}
  WHERE {value_expr} IS NOT NULL
    AND {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
),
per_v AS (
  SELECT {gsel}v, sum(1 - g1) AS c0, sum(g1) AS c1,
         count(*) AS t
  FROM base GROUP BY {gsel}v
),
ranked AS (
  SELECT {gsel}c0, c1, t,
         2 * coalesce(sum(t) OVER ({part} ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + t + 1 AS mid2
  FROM per_v
),
agg AS (
  SELECT {gsel}sum(c0) AS n0, sum(c1) AS n1,
         sum(CAST(c1 AS HUGEINT) * mid2) AS r1x2,
         sum(CAST(t AS HUGEINT) * t * t - t) AS tie
  FROM ranked {('GROUP BY ' + ', '.join(gb)) if gb else ''}
),
calc AS (
  SELECT {gsel}n0, n1,
         r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2,
         (n0::DOUBLE * n1::DOUBLE / 12.0)
         * (((n0 + n1)::DOUBLE + 1.0)
            - tie::DOUBLE / ((n0 + n1)::DOUBLE
                             * ((n0 + n1)::DOUBLE - 1.0))) AS var
  FROM agg
),
zc AS (
  SELECT {gsel}n0, n1, u1x2,
         CASE WHEN n0 > 0 AND n1 > 0 AND var > 0
              THEN (u1x2::DOUBLE - n0::DOUBLE * n1::DOUBLE)
                   / (2.0 * sqrt(var)) END AS z
  FROM calc
)
SELECT {gsel}CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       u1x2::DOUBLE / 2.0 AS u,
       round(z, {round_dp}) + 0.0 AS z,
       coalesce(abs(round(z, {round_dp})) >= {float(z_alpha)!r},
                FALSE) AS significant
FROM zc
"""


def bh_adjust(
    df: DataFrame,
    p_col: str,
    q: float = 0.05,
    group_by: "list[str] | None" = None,
    round_dp: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a table of test
    results (one row per metric/test): within each family (group_by),
    find k = max{i : p_(i) <= i·q/m} and reject every p <= p_(k) —
    the procedure that bounds the EXPECTED false-discovery fraction
    of a metric sweep at q, where per-test alpha bounds only each
    test alone.

    Output: input rows + (m, p_rank, bh_critical, rejected), where
    p_rank is the index of the row's tied block END in the ordered
    p-sequence and bh_critical = p_rank·q/m (the threshold the block
    was judged at). Tie-safe and deterministic: the criterion is
    evaluated once per DISTINCT p at its block-end index — if
    p_(i) <= i·q/m holds anywhere inside a tied block it holds at the
    block end (RHS grows with i), and rejection is p <= p_(k), so
    equal p-values always decide together. NULL p rows pass through
    with rejected=false and NULL rank columns (not tests).

    Scale shape: the distinct-p aggregate bounds the window input by
    the number of distinct p-values; sweeps are metrics-sized tables
    anyway. No transcendentals: comparisons are p·m <= i·q in
    doubles both engines compute identically."""
    if not 0.0 < q < 1.0:
        raise ValueError("q must be in (0, 1)")
    gb = list(group_by or [])
    p = F.col(p_col).cast("double")
    good = df.filter(p.isNotNull())
    per_p = (good.groupBy(*gb, p.alias("__p"))
             .agg(F.count("*").alias("__c")))
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wpref = (wtot.orderBy("__p")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    per_p = (per_p
             .withColumn("__i", F.sum("__c").over(wpref))  # block end
             .withColumn("__m", F.sum("__c").over(wtot)))
    flag = (F.col("__p") * F.col("__m").cast("double")
            <= F.col("__i").cast("double") * F.lit(float(q)))
    # p_(k): largest p whose block passes the step-up criterion
    per_p = per_p.withColumn(
        "__pk", F.max(F.when(flag, F.col("__p"))).over(wtot))
    dec = per_p.select(
        *gb, "__p",
        F.col("__m").alias("m"),
        F.col("__i").alias("p_rank"),
        dround(F.col("__i").cast("double") * F.lit(float(q))
                / F.col("__m").cast("double"), round_dp)
        .alias("bh_critical"),
        F.coalesce(F.col("__p") <= F.col("__pk"),
                   F.lit(False)).alias("rejected"))
    # join decisions back on (group, p); NULL-p rows pass through
    joined = (good.withColumn("__p", p)
              .join(dec, [*gb, "__p"])
              .drop("__p"))
    nulls = (df.filter(p.isNull())
             .withColumn("m", F.lit(None).cast("long"))
             .withColumn("p_rank", F.lit(None).cast("long"))
             .withColumn("bh_critical", F.lit(None).cast("double"))
             .withColumn("rejected", F.lit(False)))
    return joined.unionByName(nulls)


def bh_adjust_sql(
    table: str,
    p_expr: str,
    q: float = 0.05,
    group_by: "list[str] | None" = None,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of bh_adjust (same distinct-p block-end criterion,
    same join-back, same NULL passthrough)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    on = ", ".join([*gb, "__p"])
    return f"""
WITH good AS (
  SELECT *, CAST({p_expr} AS DOUBLE) AS __p FROM {table}
  WHERE {p_expr} IS NOT NULL
),
per_p AS (
  SELECT {gsel}__p, count(*) AS c FROM good GROUP BY {gsel}__p
),
idx AS (
  SELECT {gsel}__p,
         sum(c) OVER ({part} ORDER BY __p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS i,
         sum(c) OVER ({part}) AS m
  FROM per_p
),
dec AS (
  SELECT {gsel}__p, m, i AS p_rank,
         round(i::DOUBLE * {float(q)!r} / m::DOUBLE,
               {round_dp}) AS bh_critical,
         coalesce(__p <= max(CASE WHEN __p * m::DOUBLE
                                       <= i::DOUBLE * {float(q)!r}
                                  THEN __p END) OVER ({part}),
                  FALSE) AS rejected
  FROM idx
)
SELECT good.* EXCLUDE (__p), CAST(m AS BIGINT) AS m,
       CAST(p_rank AS BIGINT) AS p_rank, bh_critical, rejected
FROM good JOIN dec USING ({on})
UNION ALL BY NAME
SELECT *, NULL::BIGINT AS m, NULL::BIGINT AS p_rank,
       NULL::DOUBLE AS bh_critical, FALSE AS rejected
FROM {table} WHERE {p_expr} IS NULL
"""


def corr_spearman(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 6,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """(group..., n, rho, significant) — Spearman rank correlation:
    monotone association robust to outliers and nonlinearity (the
    relation Pearson has to Mann-Whitney's relation to Welch). The
    corpus/metrics readout for "does quality score track document
    length", "does latency grow with payload" — without trusting
    either scale.

    Exactness end-to-end (the module's 2×-midrank discipline): both
    margins collapse to DISTINCT values, midranks are carried as
    2×-integers (2·left + cnt + 1), and ρ is Pearson over the
    integer (2rx, 2ry) pairs weighted by integer pair counts:

        ρ = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²)·(n·Syy − Sy²))

    — every sufficient statistic an exact integer sum accumulated
    as decimal(38,0) / HUGEINT (r15: Sxx ~ 4N³/3 silently wrapped
    int64 at only ~2·10⁶ rows per group — the lowest threshold in
    the family; see tests/test_ranktest.py's past-int64 regression
    fixture), decimal→double promotion at the SAME spelled points
    in both engines, ONE closing divide/sqrt chain. Shuffle carries distinct (x, y)
    pairs and the two value margins, never rows (the module's METRIC
    CONTRACT: quantize continuous metrics so distinct values stay
    bounded). Significance: |z| ≥ z_alpha with the large-sample
    z = ρ·sqrt(n−1). NULL rho when either margin is constant."""
    gb = list(group_by or [])
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = (df.filter(x.isNotNull() & y.isNotNull())
            .select(*gb, x.alias("__x"), y.alias("__y")))
    pairs = (base.groupBy(*gb, "__x", "__y")
             .agg(F.count("*").alias("c")))
    mx = (pairs.groupBy(*gb, "__x").agg(F.sum("c").alias("cx")))
    mx = guard_max_distinct(mx, gb, max_distinct,
                            "corr_spearman (x margin)")
    wgx = (Window.partitionBy(*gb) if gb else Window.partitionBy()) \
        .orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    mx = mx.withColumn(
        "rx2", F.lit(2) * F.coalesce(F.sum("cx").over(wgx), F.lit(0))
        + F.col("cx") + F.lit(1))
    my = (pairs.groupBy(*gb, "__y").agg(F.sum("c").alias("cy")))
    my = guard_max_distinct(my, gb, max_distinct,
                            "corr_spearman (y margin)")
    wgy = (Window.partitionBy(*gb) if gb else Window.partitionBy()) \
        .orderBy("__y").rowsBetween(Window.unboundedPreceding, -1)
    my = my.withColumn(
        "ry2", F.lit(2) * F.coalesce(F.sum("cy").over(wgy), F.lit(0))
        + F.col("cy") + F.lit(1))
    j = (pairs.join(mx.select(*gb, "__x", "rx2"), [*gb, "__x"])
         .join(my.select(*gb, "__y", "ry2"), [*gb, "__y"]))
    # rank-product sums carry as decimal(38,0): sxx/syy/sxy ~ 4N^3/3
    # would silently wrap int64 at only ~2e6 rows per group (and the
    # HUGEINT twin would raise loudly instead) — the kruskal_wallis
    # accumulation discipline, r15
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = (j.groupBy(*gb)
           .agg(F.sum("c").alias("n"),
                F.sum(dec(F.col("c")) * dec(F.col("rx2")))
                .alias("sx"),
                F.sum(dec(F.col("c")) * dec(F.col("ry2")))
                .alias("sy"),
                F.sum(dec(F.col("c")) * dec(F.col("rx2"))
                      * dec(F.col("ry2"))).alias("sxy"),
                F.sum(dec(F.col("c")) * dec(F.col("rx2"))
                      * dec(F.col("rx2"))).alias("sxx"),
                F.sum(dec(F.col("c")) * dec(F.col("ry2"))
                      * dec(F.col("ry2"))).alias("syy")))
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx").cast("double") \
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    vy = nd * F.col("syy").cast("double") \
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    cov = nd * F.col("sxy").cast("double") \
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    # + 0.0: signed-zero normalization (see kruskal_wallis note)
    rho = F.when((vx > 0) & (vy > 0),
                 dround(cov / F.sqrt(vx * vy), round_dp)
                 + F.lit(0.0))
    z = rho * F.sqrt(nd - F.lit(1.0))
    return agg.select(
        *gb, "n", rho.alias("rho"),
        F.coalesce(F.abs(z) >= F.lit(float(z_alpha)), F.lit(False))
        .alias("significant"))


def corr_spearman_sql(
    table: str,
    x_col: str,
    y_col: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of corr_spearman (same distinct-margin midrank
    integers, same spelled promotion points)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    on_x = " AND ".join([*(f"p.{g} = mx.{g}" for g in gb),
                         "p.x = mx.x"])
    on_y = " AND ".join([*(f"p.{g} = my.{g}" for g in gb),
                         "p.y = my.y"])
    psel = "".join(f"p.{g}, " for g in gb)
    pgkey = ("GROUP BY " + ", ".join(f"p.{g}" for g in gb)) if gb \
        else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({x_col} AS DOUBLE) AS x,
         CAST({y_col} AS DOUBLE) AS y
  FROM {table}
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
pairs AS (
  SELECT {gsel}x, y, count(*) AS c FROM base GROUP BY {gsel}x, y
),
mx AS (
  SELECT {gsel}x, cx,
         2 * coalesce(sum(cx) OVER ({part} ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + cx + 1 AS rx2
  FROM (SELECT {gsel}x, CAST(sum(c) AS BIGINT) AS cx
        FROM pairs GROUP BY {gsel}x)
),
my AS (
  SELECT {gsel}y, cy,
         2 * coalesce(sum(cy) OVER ({part} ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + cy + 1 AS ry2
  FROM (SELECT {gsel}y, CAST(sum(c) AS BIGINT) AS cy
        FROM pairs GROUP BY {gsel}y)
),
agg AS (
  SELECT {psel}
         CAST(sum(p.c) AS BIGINT) AS n,
         CAST(sum(CAST(p.c AS HUGEINT) * mx.rx2) AS HUGEINT) AS sx,
         CAST(sum(CAST(p.c AS HUGEINT) * my.ry2) AS HUGEINT) AS sy,
         CAST(sum(CAST(p.c AS HUGEINT) * mx.rx2 * my.ry2)
              AS HUGEINT) AS sxy,
         CAST(sum(CAST(p.c AS HUGEINT) * mx.rx2 * mx.rx2)
              AS HUGEINT) AS sxx,
         CAST(sum(CAST(p.c AS HUGEINT) * my.ry2 * my.ry2)
              AS HUGEINT) AS syy
  FROM pairs p JOIN mx ON {on_x} JOIN my ON {on_y}
  {pgkey}
)
SELECT {gsel}n,
       CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE
                 > 0
             AND n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE
                 > 0
            THEN round((n::DOUBLE * sxy::DOUBLE
                        - sx::DOUBLE * sy::DOUBLE)
                       / sqrt((n::DOUBLE * sxx::DOUBLE
                               - sx::DOUBLE * sx::DOUBLE)
                              * (n::DOUBLE * syy::DOUBLE
                                 - sy::DOUBLE * sy::DOUBLE)),
                       {round_dp})
       END + 0.0 AS rho,
       coalesce(abs(CASE WHEN n::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE > 0
                          AND n::DOUBLE * syy::DOUBLE
                              - sy::DOUBLE * sy::DOUBLE > 0
                         THEN round((n::DOUBLE * sxy::DOUBLE
                                     - sx::DOUBLE * sy::DOUBLE)
                                    / sqrt((n::DOUBLE * sxx::DOUBLE
                                            - sx::DOUBLE
                                              * sx::DOUBLE)
                                           * (n::DOUBLE
                                              * syy::DOUBLE
                                              - sy::DOUBLE
                                                * sy::DOUBLE)),
                                    {round_dp})
                    END * sqrt(n::DOUBLE - 1.0))
                >= {float(z_alpha)!r}, FALSE) AS significant
FROM agg
"""


def ab_wilcoxon_signed(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    ts_col: str,
    split: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """(group..., n_units, n_zero, w_plus_x2, z, significant) — the
    Wilcoxon signed-rank test on per-unit pre→post changes: the
    distribution-free sibling of abtest.ab_paired_t exactly as
    ab_mann_whitney is ab_welch_test's — the rollout readout when
    per-unit deltas are heavy-tailed and a mean-of-diffs t would
    chase outliers. Only units observed on BOTH sides of `split`
    enter; zero diffs are EXCLUDED and counted (`n_zero`, the
    standard convention).

    Module discipline end-to-end: per-unit diffs quantize to the
    exact 1e-6 integer grid FIRST (tie structure is engine-exact —
    the robust_trend lesson), |d| collapses to DISTINCT magnitudes,
    midranks carry as 2×-integers, and

        z = (2W⁺ − n(n+1)/2) /
            sqrt((2·n(n+1)(2n+1) − Σ(t³−t)) / 12)

    (tie-corrected variance) closes in ONE spelled IEEE chain with
    promotions at the same points in both engines; 2W⁺ (~2N²) and
    the t³ tie term accumulate as decimal(38,0) / HUGEINT (r15 —
    an all-tied block wraps int64 at t ~ 2·10⁶; past-int64
    regression fixture in tests/test_ranktest.py). Shuffle carries
    units then distinct magnitudes, never events. NULL z when every
    magnitude ties into one group or n < 2."""
    gb = list(group_by or [])
    y = F.col(value_col).cast("double")
    post = (F.col(ts_col) >= F.to_timestamp(F.lit(split))) \
        .cast("int")
    # values quantize to the 1e-6 grid BEFORE the per-unit sums, so
    # every unit's pre/post mean is an exact rational of exact
    # integers — no float-association drift can move a diff across a
    # grid boundary (the km-class lesson applied one level earlier)
    yq = F.round(y * 1e6).cast("decimal(38,0)")
    base = (df.filter(y.isNotNull())
            .select(*gb, F.col(unit_col).alias("__u"),
                    yq.alias("__yq"), post.alias("__p")))
    per_u = (base.groupBy(*gb, "__u")
             .agg(F.sum(1 - F.col("__p")).alias("npre"),
                  F.sum("__p").alias("npost"),
                  F.sum(F.when(F.col("__p") == 0, F.col("__yq"))
                        .otherwise(F.lit(0).cast("decimal(38,0)")))
                  .alias("spre"),
                  F.sum(F.when(F.col("__p") == 1, F.col("__yq"))
                        .otherwise(F.lit(0).cast("decimal(38,0)")))
                  .alias("spost"))
             .filter((F.col("npre") > 0) & (F.col("npost") > 0)))
    dq = F.round(F.col("spost").cast("double")
                 / F.col("npost").cast("double")
                 - F.col("spre").cast("double")
                 / F.col("npre").cast("double")).cast("long")
    units = per_u.select(*gb, dq.alias("__dq"))
    nz = (units.filter(F.col("__dq") == 0)
          .groupBy(*gb).agg(F.count("*").alias("n_zero")))
    nonzero = units.filter(F.col("__dq") != 0)
    per_a = (nonzero
             .groupBy(*gb, F.abs(F.col("__dq")).alias("__a"))
             .agg(F.count("*").alias("cnt"),
                  F.sum((F.col("__dq") > 0).cast("long"))
                  .alias("pos")))
    per_a = guard_max_distinct(per_a, gb, max_distinct,
                               "ab_wilcoxon_signed")
    wg = Window.partitionBy(*gb) if gb else Window.partitionBy()
    left = F.coalesce(
        F.sum("cnt").over(
            wg.orderBy("__a")
            .rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    contrib = dec(F.col("pos")) * dec(F.lit(2) * left + F.col("cnt")
                                      + F.lit(1))
    agg = (per_a.withColumn("__c", contrib)
           .groupBy(*gb)
           .agg(F.sum("__c").alias("w2"),
                F.sum("cnt").alias("n_units"),
                F.sum(dec(F.col("cnt")) * dec(F.col("cnt"))
                      * dec(F.col("cnt")) - dec(F.col("cnt")))
                .alias("tt")))
    nd = F.col("n_units").cast("double")
    num = (F.col("w2").cast("double")
           - nd * (nd + F.lit(1.0)) / F.lit(2.0))
    var2 = ((F.lit(2.0) * nd * (nd + F.lit(1.0))
             * (F.lit(2.0) * nd + F.lit(1.0))
             - F.col("tt").cast("double")) / F.lit(12.0))
    z = F.when((F.col("n_units") >= 2) & (var2 > 0),
               dround(num / F.sqrt(var2), round_dp) + F.lit(0.0))
    # attach the zero-diff count: keyed left join when grouped, a
    # 1-row (possibly empty) broadcast left join otherwise
    j = agg.join(nz, gb, "left") if gb \
        else agg.join(F.broadcast(nz), F.lit(True), "left")
    return j.select(
        *gb,
        F.col("n_units").cast("long").alias("n_units"),
        F.coalesce(F.col("n_zero"), F.lit(0)).cast("long")
        .alias("n_zero"),
        F.col("w2").cast("long").alias("w_plus_x2"),
        z.alias("z"),
        F.coalesce(F.abs(z) >= F.lit(float(z_alpha)), F.lit(False))
        .alias("significant"))


def ab_wilcoxon_signed_sql(
    table: str,
    unit_col: str,
    value_col: str,
    ts_col: str,
    split: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_wilcoxon_signed (same 1e-6 diff grid, same
    2×-midrank integers, same tie-corrected closing chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    join_on = (" USING (" + ", ".join(gb) + ")") if gb else " ON TRUE"
    za = float(z_alpha)
    return f"""
WITH base AS (
  SELECT {gsel}{unit_col} AS u,
         CAST(round(CAST({value_col} AS DOUBLE) * 1e6) AS HUGEINT)
           AS yq,
         CAST({ts_col} >= TIMESTAMP {sql_lit(split)} AS INT) AS p
  FROM {table} WHERE {value_col} IS NOT NULL
),
per_u AS (
  SELECT {gsel}u,
         sum(1 - p) AS npre, sum(p) AS npost,
         sum(CASE WHEN p = 0 THEN yq ELSE 0 END) AS spre,
         sum(CASE WHEN p = 1 THEN yq ELSE 0 END) AS spost
  FROM base GROUP BY {gsel}u
  HAVING sum(1 - p) > 0 AND sum(p) > 0
),
units AS (
  SELECT {gsel}CAST(round(CAST(spost AS DOUBLE)
                          / CAST(npost AS DOUBLE)
                          - CAST(spre AS DOUBLE)
                          / CAST(npre AS DOUBLE))
                    AS BIGINT) AS dq
  FROM per_u
),
nz AS (
  SELECT {gsel}count(*) AS n_zero FROM units WHERE dq = 0 {gkey}
),
per_a AS (
  SELECT {gsel}abs(dq) AS a, count(*) AS cnt,
         CAST(sum(CAST(dq > 0 AS INT)) AS BIGINT) AS pos
  FROM units WHERE dq <> 0 GROUP BY {gsel}abs(dq)
),
ranked AS (
  SELECT {gsel}pos, cnt,
         coalesce(sum(cnt) OVER ({part} ORDER BY a
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS lft
  FROM per_a
),
agg AS (
  SELECT {gsel}CAST(sum(CAST(pos AS HUGEINT)
                      * (2 * lft + cnt + 1)) AS HUGEINT) AS w2,
         CAST(sum(cnt) AS BIGINT) AS n_units,
         CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt)
              AS HUGEINT) AS tt
  FROM ranked {gkey}
)
SELECT {gsel}n_units,
       CAST(coalesce(n_zero, 0) AS BIGINT) AS n_zero,
       CAST(w2 AS BIGINT) AS w_plus_x2,
       CASE WHEN n_units >= 2
             AND (2.0 * n_units::DOUBLE * (n_units::DOUBLE + 1.0)
                  * (2.0 * n_units::DOUBLE + 1.0) - tt::DOUBLE)
                 / 12.0 > 0
            THEN round((w2::DOUBLE - n_units::DOUBLE
                        * (n_units::DOUBLE + 1.0) / 2.0)
                       / sqrt((2.0 * n_units::DOUBLE
                               * (n_units::DOUBLE + 1.0)
                               * (2.0 * n_units::DOUBLE + 1.0)
                               - tt::DOUBLE) / 12.0), {round_dp})
       END + 0.0 AS z,
       coalesce(abs(CASE WHEN n_units >= 2
                          AND (2.0 * n_units::DOUBLE
                               * (n_units::DOUBLE + 1.0)
                               * (2.0 * n_units::DOUBLE + 1.0)
                               - tt::DOUBLE) / 12.0 > 0
                         THEN round((w2::DOUBLE - n_units::DOUBLE
                                     * (n_units::DOUBLE + 1.0)
                                     / 2.0)
                                    / sqrt((2.0 * n_units::DOUBLE
                                            * (n_units::DOUBLE + 1.0)
                                            * (2.0 * n_units::DOUBLE
                                               + 1.0)
                                            - tt::DOUBLE) / 12.0),
                                    {round_dp})
                    END) >= {za!r}, FALSE) AS significant
FROM agg LEFT JOIN nz{join_on}
"""


def kruskal_wallis(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """(group..., k_groups, n_total, h, df, epsilon_sq) — the
    Kruskal-Wallis k-sample rank test (Kruskal & Wallis 1952): the
    k-arm omnibus this family's Mann-Whitney is the 2-arm member of,
    exactly as ab_anova is ab_welch_test's — run FIRST when an
    experiment has k variants, then pairwise rank tests only on a
    significant omnibus. Tie-corrected:

        H  = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
        H' = H / (1 − ΣT(t³−t)/(N³−N))

    with R_g the arm's midrank sum. ε² = (H'−k+1)/(N−k) is the
    effect size (the rank analogue of η²). No p-value emitted —
    compare h against the caller's χ²_{k−1} critical value (the
    abtest convention).

    Module discipline end-to-end: per-(group, variant, distinct
    value) counts are one map-side agg; pooled midranks carry as
    2×-integers so 2R_g = Σ c_g·(2·left+t+1) and the tie term are
    EXACT INTEGER sums, accumulated as decimal(38,0) / HUGEINT (the
    cusum/brier discipline — an int64 product c·mid2 would silently
    wrap at ~3·10⁹ rows per group since 2R_g ~ N²); the one
    cross-variant float reduction (Σ R_g²/n_g) is a variant-ordered
    left fold with the decimal→double promotion BEFORE the square
    ((2R_g)² ~ N⁴ would exceed even decimal(38) at ~10¹⁰ rows —
    both engines square in double at the same spelled point). Shuffle carries distinct (variant, value)
    pairs, never rows; the METRIC CONTRACT guard gates the pooled
    distinct-value collapse. NULL h when k < 2 or every value ties
    into one group; NULL epsilon_sq additionally when N == k."""
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    base = (df.filter(F.col(variant_col).isNotNull() & v.isNotNull())
            .select(*gb,
                    F.col(variant_col).cast("string").alias("__g"),
                    v.alias("__v")))
    per_gv = (base.groupBy(*gb, "__g", "__v")
              .agg(F.count("*").alias("c")))
    per_v = (per_gv.groupBy(*gb, "__v")
             .agg(F.sum("c").alias("t")))
    per_v = guard_max_distinct(per_v, gb, max_distinct,
                               "kruskal_wallis")
    wprev = ((Window.partitionBy(*gb) if gb else Window.partitionBy())
             .orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, -1))
    per_v = per_v.withColumn(
        "mid2", F.lit(2) * F.coalesce(F.sum("t").over(wprev),
                                      F.lit(0))
        + F.col("t") + F.lit(1)).withColumn(
        "tt", F.col("t").cast("decimal(38,0)")
        * F.col("t").cast("decimal(38,0)")
        * F.col("t").cast("decimal(38,0)") - F.col("t"))
    j = per_gv.join(per_v.select(*gb, "__v", "mid2"), [*gb, "__v"])
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_g = (j.groupBy(*gb, "__g")
             .agg(F.sum(dec(F.col("c")) * dec(F.col("mid2")))
                  .alias("r2"),
                  F.sum("c").alias("ng")))
    cell = F.struct(F.col("__g").alias("g"),
                    F.col("r2").cast("decimal(38,0)").alias("r2"),
                    F.col("ng").cast("long").alias("ng"))
    arms = (per_g.withColumn("__c", cell)
            .groupBy(*gb)
            .agg(F.count("*").alias("k_groups"),
                 F.sum("ng").alias("n_total"),
                 F.collect_list("__c").alias("__cells")))
    ties = (per_v.groupBy(*gb).agg(F.sum("tt").alias("__tt"))
            if gb else per_v.agg(F.sum("tt").alias("__tt")))
    a = arms.join(ties, gb) if gb \
        else arms.join(F.broadcast(ties), F.lit(True))
    # Σ_g R_g²/n_g = Σ_g (2R_g)²/(4 n_g), squared in DOUBLE
    q = F.expr(
        "aggregate(array_sort(__cells), CAST(0.0 AS DOUBLE),"
        " (a, x) -> a + (CAST(x.r2 AS DOUBLE) * CAST(x.r2 AS DOUBLE))"
        "              / (4.0 * CAST(x.ng AS DOUBLE)))")
    nn = F.col("n_total").cast("double")
    h_raw = (F.lit(12.0) / (nn * (nn + F.lit(1.0)))) * q \
        - F.lit(3.0) * (nn + F.lit(1.0))
    corr = F.lit(1.0) - F.col("__tt").cast("double") \
        / (nn * nn * nn - nn)
    # + 0.0 after round: Spark and DuckDB disagree on the SIGN of a
    # zero rounded from a tiny negative (-0.0 vs 0.0 — same value,
    # different IEEE bytes, red driver hash); x + 0.0 is the IEEE
    # identity that maps -0.0 to +0.0 on both engines (observed on
    # epsilon_sq at sf1)
    h = F.when((F.col("k_groups") >= 2) & (corr > 0),
               dround(h_raw / corr, round_dp) + F.lit(0.0))
    eps = F.when((F.col("k_groups") >= 2) & (corr > 0)
                 & (F.col("n_total") > F.col("k_groups")),
                 dround((h_raw / corr
                          - F.col("k_groups").cast("double")
                          + F.lit(1.0))
                         / (nn - F.col("k_groups").cast("double")),
                         round_dp) + F.lit(0.0))
    return a.select(
        *gb,
        F.col("k_groups").cast("long").alias("k_groups"),
        F.col("n_total").cast("long").alias("n_total"),
        h.alias("h"),
        (F.col("k_groups") - F.lit(1)).cast("long").alias("df"),
        eps.alias("epsilon_sq"))


def kruskal_wallis_sql(
    table: str,
    variant_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of kruskal_wallis (same pooled 2×-midrank
    integers with HUGEINT accumulation mirroring Spark's
    decimal(38,0), same variant-ordered fold with the square in
    DOUBLE, same tie correction and closing chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    jkeys = " AND ".join(
        f"a.{k} = b.{k}" for k in gb) if gb else "TRUE"
    asel = (", ".join(f"a.{k}" for k in gb) + ", ") if gb else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({variant_col} AS VARCHAR) AS g,
         CAST({value_col} AS DOUBLE) AS v
  FROM {table}
  WHERE {variant_col} IS NOT NULL AND {value_col} IS NOT NULL
),
per_gv AS (
  SELECT {gsel}g, v, count(*) AS c FROM base GROUP BY {gsel}g, v
),
per_v AS (
  SELECT {gsel}v, CAST(sum(c) AS BIGINT) AS t
  FROM per_gv GROUP BY {gsel}v
),
mids AS (
  SELECT {gsel}v,
         2 * coalesce(sum(t) OVER ({part} ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS mid2,
         CAST(t AS HUGEINT) * t * t - t AS tt
  FROM per_v
),
per_g AS (
  SELECT {asel}a.g,
         CAST(sum(CAST(a.c AS HUGEINT) * CAST(b.mid2 AS HUGEINT))
              AS HUGEINT) AS r2,
         CAST(sum(a.c) AS BIGINT) AS ng
  FROM per_gv a JOIN mids b
    ON {jkeys}{" AND " if gb else " "}a.v = b.v
  GROUP BY {asel}a.g
),
arms AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS k_groups,
         CAST(sum(ng) AS BIGINT) AS n_total,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list((CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE))
                  / (4.0 * CAST(ng AS DOUBLE)) ORDER BY g)),
             (a, x) -> a + x) AS q
  FROM per_g {gkey}
),
ties AS (
  SELECT {gsel}CAST(sum(tt) AS HUGEINT) AS tt FROM mids {gkey}
)
SELECT {asel.replace('a.', 'arms.') if gb else ''}arms.k_groups,
       arms.n_total,
       round(CASE WHEN arms.k_groups >= 2 AND
                  1.0 - ties.tt::DOUBLE
                  / (arms.n_total::DOUBLE * arms.n_total::DOUBLE
                     * arms.n_total::DOUBLE - arms.n_total::DOUBLE)
                  > 0
             THEN ((12.0 / (arms.n_total::DOUBLE
                            * (arms.n_total::DOUBLE + 1.0))) * arms.q
                   - 3.0 * (arms.n_total::DOUBLE + 1.0))
                  / (1.0 - ties.tt::DOUBLE
                     / (arms.n_total::DOUBLE * arms.n_total::DOUBLE
                        * arms.n_total::DOUBLE
                        - arms.n_total::DOUBLE)) END,
             {round_dp}) + 0.0 AS h,
       arms.k_groups - 1 AS df,
       round(CASE WHEN arms.k_groups >= 2 AND
                  1.0 - ties.tt::DOUBLE
                  / (arms.n_total::DOUBLE * arms.n_total::DOUBLE
                     * arms.n_total::DOUBLE - arms.n_total::DOUBLE)
                  > 0 AND arms.n_total > arms.k_groups
             THEN (((12.0 / (arms.n_total::DOUBLE
                             * (arms.n_total::DOUBLE + 1.0)))
                    * arms.q
                    - 3.0 * (arms.n_total::DOUBLE + 1.0))
                   / (1.0 - ties.tt::DOUBLE
                      / (arms.n_total::DOUBLE * arms.n_total::DOUBLE
                         * arms.n_total::DOUBLE
                         - arms.n_total::DOUBLE))
                   - arms.k_groups::DOUBLE + 1.0)
                  / (arms.n_total::DOUBLE - arms.k_groups::DOUBLE)
             END, {round_dp}) + 0.0 AS epsilon_sq
FROM arms JOIN ties
  ON {jkeys.replace('a.', 'arms.').replace('b.', 'ties.')}
"""
