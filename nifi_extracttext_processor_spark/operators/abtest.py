"""A/B experiment readouts — the measurement half of the
deterministic hash assignment the corpus module already provides
(corpus.assign_shards / split_by_hash ARE the variant assigners:
pure functions of (id, seed), so exposure is reproducible and
consistent across sessions): two-proportion z-tests for conversion
metrics and Welch's unequal-variance t-test for continuous metrics,
per experiment cell.

    z = (p1 − p0) / sqrt( p̂(1−p̂)(1/n0 + 1/n1) )      (pooled)
    t = (m1 − m0) / sqrt( s0²/n0 + s1²/n1 )           (Welch)

Normal-approximation p-values via erfc — Spark and DuckDB both
expose the complementary error function family only through exp;
instead of a transcendental chain per engine, the twin-parity
surface stops at the STATISTIC (z / t, rounded), and significance is
reported as |stat| ≥ z_alpha with the caller's critical value — an
exact comparison both engines replay (the decayed_agg lesson:
transcendental tails differ across libm implementations; integers
and fixed literals don't).

Scale shape: ONE map-side-combinable agg per metric — each variant
collapses to (n, sum, sumsq); everything downstream is scalar
arithmetic on a variants×groups-sized frame. Welch df (for a
reader's own table lookup) ships as the Welch-Satterthwaite value,
round-2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ab_proportion_test(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.96,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_control, n_treatment, p_control, p_treatment,
    lift, z, significant) — pooled two-proportion z-test.
    `success_col` is 0/1/boolean; NULL successes are excluded (not
    exposed ≠ failed). Degenerate cells (empty side, zero pooled
    variance) emit NULL z / significant=false."""
    gb = list(group_by or [])
    s = F.col(success_col).cast("int")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & s.isNotNull())
            .withColumn("__t",
                        (F.col(variant_col) == treatment).cast("int")))
    agg = base.groupBy(*gb).agg(
        F.sum(1 - F.col("__t")).alias("n0"),
        F.sum("__t").alias("n1"),
        F.sum(s * (1 - F.col("__t"))).alias("s0"),
        F.sum(s * F.col("__t")).alias("s1"))
    p0 = F.try_divide(F.col("s0"), F.col("n0"))
    p1 = F.try_divide(F.col("s1"), F.col("n1"))
    pp = F.try_divide(F.col("s0") + F.col("s1"),
                      F.col("n0") + F.col("n1"))
    se = F.sqrt(pp * (1 - pp)
                * (F.try_divide(F.lit(1.0), F.col("n0"))
                   + F.try_divide(F.lit(1.0), F.col("n1"))))
    z = F.when(se > 0, (p1 - p0) / se)
    zr = F.round(z, round_dp)
    return agg.select(
        *gb,
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        F.round(p0, round_dp).alias("p_control"),
        F.round(p1, round_dp).alias("p_treatment"),
        F.round(p1 - p0, round_dp).alias("lift"),
        zr.alias("z"),
        F.coalesce(F.abs(zr) >= F.lit(float(z_alpha)),
                   F.lit(False)).alias("significant"))


def ab_proportion_test_sql(
    table: str,
    variant_col: str,
    success_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.96,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_proportion_test."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    s = f"CAST({success_col} AS INT)"
    t = f"CAST({variant_col} = '{treatment}' AS INT)"
    return f"""
WITH agg AS (
  SELECT {gsel}
         sum(1 - {t}) AS n0, sum({t}) AS n1,
         sum({s} * (1 - {t})) AS s0, sum({s} * {t}) AS s1
  FROM {table}
  WHERE {variant_col} IN ('{control}', '{treatment}')
    AND {success_col} IS NOT NULL
  {gkey}
),
calc AS (
  SELECT *,
         s0::DOUBLE / nullif(n0, 0) AS p0,
         s1::DOUBLE / nullif(n1, 0) AS p1,
         (s0 + s1)::DOUBLE / nullif(n0 + n1, 0) AS pp
  FROM agg
),
zc AS (
  SELECT *,
         CASE WHEN sqrt(pp * (1 - pp) * (1.0 / nullif(n0, 0)
                   + 1.0 / nullif(n1, 0))) > 0
              THEN (p1 - p0) / sqrt(pp * (1 - pp)
                   * (1.0 / nullif(n0, 0) + 1.0 / nullif(n1, 0)))
         END AS z
  FROM calc
)
SELECT {gsel}
       n0 AS n_control, n1 AS n_treatment,
       round(p0, {round_dp}) AS p_control,
       round(p1, {round_dp}) AS p_treatment,
       round(p1 - p0, {round_dp}) AS lift,
       round(z, {round_dp}) AS z,
       coalesce(abs(round(z, {round_dp})) >= {float(z_alpha)!r},
                FALSE) AS significant
FROM zc
"""


def ab_welch_test(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_control, n_treatment, mean_control,
    mean_treatment, diff, t, df_welch, significant) — Welch's
    unequal-variance t-test on a continuous metric. NULL values
    excluded; cells with n < 2 on a side or zero variance emit NULL
    t."""
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & v.isNotNull())
            .withColumn("__t",
                        (F.col(variant_col) == treatment).cast("int")))

    agg = base.groupBy(*gb).agg(
        F.sum(1 - F.col("__t")).alias("n0"),
        F.sum("__t").alias("n1"),
        F.sum(v * (1 - F.col("__t"))).alias("sv0"),
        F.sum(v * F.col("__t")).alias("sv1"),
        F.sum(v * v * (1 - F.col("__t"))).alias("ss0"),
        F.sum(v * v * F.col("__t")).alias("ss1"))
    m0 = F.try_divide(F.col("sv0"), F.col("n0"))
    m1 = F.try_divide(F.col("sv1"), F.col("n1"))
    var0 = F.try_divide(F.col("ss0") - F.col("n0") * m0 * m0,
                        F.col("n0") - 1)
    var1 = F.try_divide(F.col("ss1") - F.col("n1") * m1 * m1,
                        F.col("n1") - 1)
    a = F.try_divide(var0, F.col("n0"))
    b = F.try_divide(var1, F.col("n1"))
    se = F.sqrt(a + b)
    t = F.when(se > 0, (m1 - m0) / se)
    dfw = F.try_divide(
        (a + b) * (a + b),
        F.try_divide(a * a, F.col("n0") - 1)
        + F.try_divide(b * b, F.col("n1") - 1))
    tr = F.round(t, round_dp)
    return agg.select(
        *gb,
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        F.round(m0, round_dp).alias("mean_control"),
        F.round(m1, round_dp).alias("mean_treatment"),
        F.round(m1 - m0, round_dp).alias("diff"),
        tr.alias("t"),
        F.round(dfw, 2).alias("df_welch"),
        F.coalesce(F.abs(tr) >= F.lit(float(t_alpha)),
                   F.lit(False)).alias("significant"))


def ab_welch_test_sql(
    table: str,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_welch_test (same sufficient statistics,
    same Welch-Satterthwaite df, same rounding)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    v = f"CAST({value_col} AS DOUBLE)"
    t = f"CAST({variant_col} = '{treatment}' AS INT)"
    return f"""
WITH agg AS (
  SELECT {gsel}
         sum(1 - {t}) AS n0, sum({t}) AS n1,
         sum({v} * (1 - {t})) AS sv0, sum({v} * {t}) AS sv1,
         sum({v} * {v} * (1 - {t})) AS ss0,
         sum({v} * {v} * {t}) AS ss1
  FROM {table}
  WHERE {variant_col} IN ('{control}', '{treatment}')
    AND {value_col} IS NOT NULL
  {gkey}
),
calc AS (
  SELECT *,
         sv0 / nullif(n0, 0) AS m0, sv1 / nullif(n1, 0) AS m1,
         (ss0 - n0 * (sv0 / nullif(n0, 0)) * (sv0 / nullif(n0, 0)))
           / nullif(n0 - 1, 0) / nullif(n0, 0) AS a,
         (ss1 - n1 * (sv1 / nullif(n1, 0)) * (sv1 / nullif(n1, 0)))
           / nullif(n1 - 1, 0) / nullif(n1, 0) AS b
  FROM agg
),
tc AS (
  SELECT *,
         CASE WHEN sqrt(a + b) > 0
              THEN (m1 - m0) / sqrt(a + b) END AS t,
         (a + b) * (a + b)
           / nullif(a * a / nullif(n0 - 1, 0)
                    + b * b / nullif(n1 - 1, 0), 0) AS dfw
  FROM calc
)
SELECT {gsel}
       n0 AS n_control, n1 AS n_treatment,
       round(m0, {round_dp}) AS mean_control,
       round(m1, {round_dp}) AS mean_treatment,
       round(m1 - m0, {round_dp}) AS diff,
       round(t, {round_dp}) AS t,
       round(dfw, 2) AS df_welch,
       coalesce(abs(round(t, {round_dp})) >= {float(t_alpha)!r},
                FALSE) AS significant
FROM tc
"""
