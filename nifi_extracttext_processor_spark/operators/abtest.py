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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


from ..sqlutil import sql_ident, sql_lit
from .guards import DEFAULT_MAX_DISTINCT, guard_max_distinct


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
    zr = dround(z, round_dp) + F.lit(0.0)
    return agg.select(
        *gb,
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        dround(p0, round_dp).alias("p_control"),
        dround(p1, round_dp).alias("p_treatment"),
        (dround(p1 - p0, round_dp) + F.lit(0.0)).alias("lift"),
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
    t = f"CAST({variant_col} = {sql_lit(treatment)} AS INT)"
    return f"""
WITH agg AS (
  SELECT {gsel}
         sum(1 - {t}) AS n0, sum({t}) AS n1,
         sum({s} * (1 - {t})) AS s0, sum({s} * {t}) AS s1
  FROM {table}
  WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
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
       CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       round(p0, {round_dp}) AS p_control,
       round(p1, {round_dp}) AS p_treatment,
       round(p1 - p0, {round_dp}) + 0.0 AS lift,
       round(z, {round_dp}) + 0.0 AS z,
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
    tr = dround(t, round_dp) + F.lit(0.0)
    return agg.select(
        *gb,
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        dround(m0, round_dp).alias("mean_control"),
        dround(m1, round_dp).alias("mean_treatment"),
        (dround(m1 - m0, round_dp) + F.lit(0.0)).alias("diff"),
        tr.alias("t"),
        dround(dfw, 2).alias("df_welch"),
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
    t = f"CAST({variant_col} = {sql_lit(treatment)} AS INT)"
    return f"""
WITH agg AS (
  SELECT {gsel}
         sum(1 - {t}) AS n0, sum({t}) AS n1,
         sum({v} * (1 - {t})) AS sv0, sum({v} * {t}) AS sv1,
         sum({v} * {v} * (1 - {t})) AS ss0,
         sum({v} * {v} * {t}) AS ss1
  FROM {table}
  WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
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
       CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       round(m0, {round_dp}) AS mean_control,
       round(m1, {round_dp}) AS mean_treatment,
       round(m1 - m0, {round_dp}) + 0.0 AS diff,
       round(t, {round_dp}) + 0.0 AS t,
       round(dfw, 2) AS df_welch,
       coalesce(abs(round(t, {round_dp})) >= {float(t_alpha)!r},
                FALSE) AS significant
FROM tc
"""


def ab_cuped_test(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    covariate_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): adjust the metric
    with a PRE-EXPERIMENT covariate — y' = y − θ(x − x̄) with
    θ = cov(x,y)/var(x) pooled over both variants (x predates
    treatment, so pooling is unbiased) — then run Welch's t on the
    adjusted metric. Reported var_reduction = 1 − var(y')/var(y)
    (pooled) ≈ corr², the sample-size saving the covariate buys.

    Everything derives from ONE map-side-combinable agg of
    per-(group, variant) sufficient statistics (n, Σx, Σy, Σxy, Σxx,
    Σyy): θ folds the two variants' sums; per-variant adjusted
    means/variances come from the moment identities
    mean' = ȳ_v − θ(x̄_v − x̄) and var' = var_v(y) − 2θcov_v + θ²var_v(x).
    Rows with NULL value or covariate are excluded. Degenerate cells
    (zero covariate variance) fall back to θ=0 — plain Welch."""
    gb = list(group_by or [])
    y = F.col(value_col).cast("double")
    x = F.col(covariate_col).cast("double")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & y.isNotNull() & x.isNotNull())
            .withColumn("__t",
                        (F.col(variant_col) == treatment).cast("int")))
    legs = {}
    for tag, flag in (("0", 1 - F.col("__t")), ("1", F.col("__t"))):
        legs.update({
            f"n{tag}": F.sum(flag),
            f"sx{tag}": F.sum(x * flag),
            f"sy{tag}": F.sum(y * flag),
            f"sxy{tag}": F.sum(x * y * flag),
            f"sxx{tag}": F.sum(x * x * flag),
            f"syy{tag}": F.sum(y * y * flag)})
    agg = base.groupBy(*gb).agg(
        *[v.alias(k) for k, v in legs.items()])
    c = {k: F.col(k) for k in legs}
    n = c["n0"] + c["n1"]
    sx = c["sx0"] + c["sx1"]
    sy = c["sy0"] + c["sy1"]
    sxy = c["sxy0"] + c["sxy1"]
    sxx = c["sxx0"] + c["sxx1"]
    syy = c["syy0"] + c["syy1"]
    # pooled covariance/variance numerators (n-divisors cancel in θ)
    cov_num = sxy - sx * sy / n
    varx_num = sxx - sx * sx / n
    vary_num = syy - sy * sy / n
    theta = F.when(varx_num > 0, cov_num / varx_num).otherwise(0.0)
    xbar = sx / n

    def adj(tag):
        nn = c[f"n{tag}"]
        my = F.try_divide(c[f"sy{tag}"], nn)
        mx = F.try_divide(c[f"sx{tag}"], nn)
        mean_adj = my - theta * (mx - xbar)
        vy = F.try_divide(c[f"syy{tag}"] - nn * my * my, nn - 1)
        vx = F.try_divide(c[f"sxx{tag}"] - nn * mx * mx, nn - 1)
        cxy = F.try_divide(c[f"sxy{tag}"] - nn * mx * my, nn - 1)
        var_adj = vy - 2 * theta * cxy + theta * theta * vx
        return mean_adj, var_adj

    m0a, v0a = adj("0")
    m1a, v1a = adj("1")
    a = F.try_divide(v0a, c["n0"])
    b = F.try_divide(v1a, c["n1"])
    se = F.sqrt(a + b)
    t = F.when(se > 0, (m1a - m0a) / se)
    tr = dround(t, round_dp) + F.lit(0.0)
    var_red = F.when(
        (varx_num > 0) & (vary_num > 0),
        (cov_num * cov_num) / (varx_num * vary_num))
    return agg.select(
        *gb,
        c["n0"].alias("n_control"), c["n1"].alias("n_treatment"),
        (dround(theta, round_dp) + F.lit(0.0)).alias("theta"),
        (dround(m1a - m0a, round_dp) + F.lit(0.0)).alias("adj_diff"),
        tr.alias("t"),
        dround(var_red, round_dp).alias("var_reduction"),
        F.coalesce(F.abs(tr) >= F.lit(float(t_alpha)),
                   F.lit(False)).alias("significant"))


def ab_cuped_test_sql(
    table: str,
    variant_col: str,
    value_col: str,
    covariate_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_cuped_test (same sufficient statistics and
    moment identities)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    y = f"CAST({value_col} AS DOUBLE)"
    x = f"CAST({covariate_col} AS DOUBLE)"
    t = f"CAST({variant_col} = {sql_lit(treatment)} AS INT)"
    sums = []
    for tag, flag in (("0", f"(1 - {t})"), ("1", t)):
        sums += [f"sum({flag}) AS n{tag}",
                 f"sum({x} * {flag}) AS sx{tag}",
                 f"sum({y} * {flag}) AS sy{tag}",
                 f"sum({x} * {y} * {flag}) AS sxy{tag}",
                 f"sum({x} * {x} * {flag}) AS sxx{tag}",
                 f"sum({y} * {y} * {flag}) AS syy{tag}"]
    return f"""
WITH agg AS (
  SELECT {gsel}{', '.join(sums)}
  FROM {table}
  WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
    AND {value_col} IS NOT NULL AND {covariate_col} IS NOT NULL
  {gkey}
),
th AS (
  SELECT *,
         (sxy0 + sxy1) - (sx0 + sx1) * (sy0 + sy1) / (n0 + n1)
           AS cov_num,
         (sxx0 + sxx1) - (sx0 + sx1) * (sx0 + sx1) / (n0 + n1)
           AS varx_num,
         (syy0 + syy1) - (sy0 + sy1) * (sy0 + sy1) / (n0 + n1)
           AS vary_num,
         (sx0 + sx1) / (n0 + n1) AS xbar
  FROM agg
),
tt AS (
  SELECT *,
         CASE WHEN varx_num > 0 THEN cov_num / varx_num
              ELSE 0.0 END AS theta
  FROM th
),
adj AS (
  SELECT *,
         (sy0 / n0) - theta * ((sx0 / n0) - xbar) AS m0a,
         (sy1 / n1) - theta * ((sx1 / n1) - xbar) AS m1a,
         ((syy0 - n0 * (sy0 / n0) * (sy0 / n0)) / nullif(n0 - 1, 0)
          - 2 * theta * ((sxy0 - n0 * (sx0 / n0) * (sy0 / n0))
                         / nullif(n0 - 1, 0))
          + theta * theta * ((sxx0 - n0 * (sx0 / n0) * (sx0 / n0))
                             / nullif(n0 - 1, 0))) / nullif(n0, 0)
           AS a,
         ((syy1 - n1 * (sy1 / n1) * (sy1 / n1)) / nullif(n1 - 1, 0)
          - 2 * theta * ((sxy1 - n1 * (sx1 / n1) * (sy1 / n1))
                         / nullif(n1 - 1, 0))
          + theta * theta * ((sxx1 - n1 * (sx1 / n1) * (sx1 / n1))
                             / nullif(n1 - 1, 0))) / nullif(n1, 0)
           AS b
  FROM tt
)
SELECT {gsel}
       CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       round(theta, {round_dp}) + 0.0 AS theta,
       round(m1a - m0a, {round_dp}) + 0.0 AS adj_diff,
       round(CASE WHEN sqrt(a + b) > 0
                  THEN (m1a - m0a) / sqrt(a + b) END,
             {round_dp}) + 0.0 AS t,
       round(CASE WHEN varx_num > 0 AND vary_num > 0
                  THEN cov_num * cov_num / (varx_num * vary_num)
             END, {round_dp}) AS var_reduction,
       coalesce(abs(round(CASE WHEN sqrt(a + b) > 0
                          THEN (m1a - m0a) / sqrt(a + b) END,
                    {round_dp})) >= {float(t_alpha)!r}, FALSE)
         AS significant
FROM adj
"""


def ab_srm_check(
    df: DataFrame,
    variant_col: str,
    expected: "dict[str, float]",
    group_by: "list[str] | None" = None,
    chi2_alpha: float = 3.841,
    round_dp: int = 4,
) -> DataFrame:
    """Sample-ratio mismatch guardrail — the FIRST check any experiment
    readout runs: if the observed variant split deviates from the
    declared assignment weights, the randomization (or logging) is
    broken and every downstream metric is invalid. Pearson χ² against
    `expected` ({variant: weight}, normalized internally):

        chi2 = Σ_v (o_v − e_v)² / e_v,   e_v = w_v · n

    `srm_suspected` = chi2 ≥ chi2_alpha (default 3.841 = χ²₁ at
    p=0.05 — the right critical value for TWO variants; pass the
    χ²_{k−1} value for k>2). Variants absent from `expected` are a
    contract violation and raise. One map-side-combinable count agg;
    groups missing a variant entirely count it as 0 observed."""
    gb = list(group_by or [])
    if not expected or any(w <= 0 for w in expected.values()):
        raise ValueError("expected needs positive weights per variant")
    total_w = float(sum(expected.values()))
    counts = (df.filter(F.col(variant_col).isin(*expected))
              .groupBy(*gb)
              .agg(F.count("*").alias("n"),
                   *[F.sum((F.col(variant_col) == v).cast("int"))
                     .alias(f"__o_{i}")
                     for i, v in enumerate(expected)]))
    chi2 = F.lit(0.0)
    for i, (v, w) in enumerate(expected.items()):
        e = F.col("n") * F.lit(w / total_w)
        o = F.col(f"__o_{i}")
        chi2 = chi2 + F.try_divide((o - e) * (o - e), e)
    cr = dround(chi2, round_dp)
    return counts.select(
        *gb, "n",
        *[F.col(f"__o_{i}").alias(f"n_{v}")
          for i, v in enumerate(expected)],
        cr.alias("chi2"),
        F.coalesce(cr >= F.lit(float(chi2_alpha)),
                   F.lit(False)).alias("srm_suspected"))


def ab_srm_check_sql(
    table: str,
    variant_col: str,
    expected: "dict[str, float]",
    group_by: "list[str] | None" = None,
    chi2_alpha: float = 3.841,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_srm_check. Variant names are interpolated as
    both string literals and output-column names (`n_<variant>`, to
    match the Spark side's aliases), so both forms are escaped: single
    quotes doubled inside literals, the alias rendered as a
    double-quoted identifier with embedded double quotes doubled — an
    adversarial variant name yields valid SQL, never injection."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    total_w = float(sum(expected.values()))
    names = list(expected)

    # escaping rules factored into the shared sqlutil (ADVICE r11): one
    # spelling for every *_sql generator that interpolates caller names
    def lit(v: str) -> str:
        return sql_lit(v)

    def ident(v: str) -> str:
        return sql_ident(v, "n_")

    quoted = ", ".join(lit(v) for v in names)
    osel = ", ".join(
        f"CAST(sum(CAST({variant_col} = {lit(v)} AS INT)) AS BIGINT)"
        f" AS {ident(v)}"
        for v in names)
    chi_terms = " + ".join(
        f"({ident(v)} - n * {w / total_w!r})"
        f" * ({ident(v)} - n * {w / total_w!r})"
        f" / nullif(n * {w / total_w!r}, 0)"
        for v, w in expected.items())
    return f"""
WITH counts AS (
  SELECT {gsel}count(*) AS n, {osel}
  FROM {table} WHERE {variant_col} IN ({quoted})
  {gkey}
)
SELECT {gsel}n, {', '.join(ident(v) for v in names)},
       round({chi_terms}, {round_dp}) AS chi2,
       coalesce(round({chi_terms}, {round_dp})
                >= {float(chi2_alpha)!r}, FALSE) AS srm_suspected
FROM counts
"""


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence intervals
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds (exp(-1) * sum 1/j!), embedded as repr()
# literals so both engines evaluate the identical CASE chain. P(K > 12)
# < 1e-10: with a 32-bit hash uniform the cap is effectively never hit,
# and when it is, BOTH engines cap identically.
_POIS_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402,
    0.9999998885745216, 0.9999999899522336, 0.9999999991683892,
)
_U32 = 4294967296.0


# r17 escape hatch for equivalence tests / paired A/B: False forces
# the pre-r17 JVM explode+md5 plan for md5=True (the Arrow weight
# kernel in operators/md5boot.py is the default — see its docstring
# for the exactness contract and the ~10x CPU measurement)
_MD5_KERNEL = True


def _boot_uniform(b_col, seed: int, md5: bool):
    """32-bit hash uniform in (0,1) from (__id, b, seed). md5=True is
    the oracle-replayable default (DuckDB twin recomputes it exactly);
    md5=False swaps xxhash64 — ~5x cheaper per row on the 100 TB path,
    same distribution, but not twin-replayable (the corpus-module
    md5/xxhash dual convention)."""
    if md5:
        h = F.conv(F.substring(
            F.md5(F.concat(F.col("__id"), F.lit("#"), b_col,
                           F.lit(f"#{seed}"))), 1, 8), 16, 10) \
            .cast("long")
    else:
        h = F.pmod(F.xxhash64(F.col("__id"), b_col, F.lit(seed)),
                   F.lit(1 << 32))
    return (h.cast("double") + 0.5) / F.lit(_U32)


def _boot_indices(n_boot: int, alpha: float) -> tuple[int, int]:
    import math
    lo = max(1, math.ceil(n_boot * alpha / 2.0))
    hi = min(n_boot, math.ceil(n_boot * (1.0 - alpha / 2.0)))
    return lo, hi


def ab_bootstrap_ci(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    group_by: "list[str] | None" = None,
    seed: int = 7,
    round_dp: int = 4,
    md5: bool = True,
) -> DataFrame:
    """Per-variant mean with a Poisson-bootstrap percentile CI
    (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
    Streams" — the resampling scheme that works in ONE distributed
    pass: resample b gives each row an independent Poisson(1) weight,
    approximating multinomial resampling without materializing B
    copies of the data or coordinating a global n). The
    nonparametric companion to ab_welch_test for metrics whose means
    are NOT normal-ish (heavy-tailed revenue, ratios).

    Determinism/cross-engine exactness (the decayed_agg discipline):
    the weight is an inverse-CDF lookup of a 32-bit md5 uniform from
    (id, b, seed) against repr()-embedded Poisson thresholds (no RNG,
    no library Poisson); values quantize to a 1e-6 integer grid and
    resample sums run in decimal/int128 (exact, order-independent);
    each resample mean is ONE double division of exact integers;
    the percentile is an index lookup in the sorted B-vector. Every
    step is engine-exact, so the DuckDB twin replays the CI
    bit-for-bit.

    Scale shape: the explode is map-side (B weighted copies feed
    straight into a map-side-combinable agg — the shuffle carries
    groups x variants x B rows, never data x B); the second agg and
    the sort are over B-bounded vectors. ID CONTRACT: `id_col`
    non-null unique per row (same as assign_shards_balanced —
    duplicate ids would correlate weights across rows).

    Output: (group..., variant, n, mean, ci_lo, ci_hi). Cells where
    any resample zeroed out entirely (only possible for tiny n) emit
    NULL bounds rather than a biased interval.
    """
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    # the B-way explode multiplies per-row hash/CASE work by n_boot;
    # a single-file local scan would run that entire stage on one
    # task (_spread no-ops at scale where the scan is already wide).
    # Safe: every accumulation below is an exact integer/decimal sum,
    # so partitioning cannot change any value.
    from .dedup import _spread

    base = _spread(
        df.filter(v.isNotNull() & F.col(id_col).isNotNull())
        .select(*gb, F.col(variant_col).alias("variant"),
                F.col(id_col).cast("string").alias("__id"),
                F.round(v * 1e6).cast("decimal(38,0)").alias("__xq")))

    from .md5boot import boot_weight_partials, kernel_groupable

    if md5 and _MD5_KERNEL and kernel_groupable(base, [*gb, "variant"]):
        # Arrow weight kernel (md5boot.py): vectorized single-block
        # md5 + in-kernel partial sums — same exact-integer
        # accumulation, one Python crossing instead of the 60-way
        # explode through the JVM md5 expression chain (guide §4.2;
        # value-identical by the kernel's exactness contract, pinned
        # by tests/test_md5boot.py and the oracle battery).
        part = boot_weight_partials(
            base, [*gb, "variant"], n_boot=int(n_boot), seed=seed,
            thresholds=_POIS_CDF, vals={"__pswx": "__xq"},
            with_sw=True)
        res = (part.groupBy(*gb, "variant", "b")
               .agg(F.sum("__pswx").alias("__swx"),
                    F.sum("__psw").alias("__sw")))
    else:
        ex = base.withColumn(
            "b", F.explode(F.sequence(F.lit(0), F.lit(int(n_boot) - 1))))
        u = _boot_uniform(F.col("b"), seed, md5)
        w = F.lit(12)
        for k in range(len(_POIS_CDF) - 1, -1, -1):
            w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)

        res = (ex.withColumn("__w", w)
               .groupBy(*gb, "variant", "b")
               .agg(F.sum(F.col("__w").cast("decimal(38,0)")
                          * F.col("__xq")).alias("__swx"),
                    F.sum("__w").alias("__sw")))
    mean_b = F.when(
        F.col("__sw") > 0,
        F.col("__swx").cast("double")
        / (F.col("__sw").cast("double") * F.lit(1e6)))
    means = (res.withColumn("__mb", mean_b)
             .groupBy(*gb, "variant")
             .agg(F.sort_array(F.collect_list("__mb")).alias("__s"),
                  F.count("__mb").alias("__ok")))
    ilo, ihi = _boot_indices(n_boot, alpha)
    full = F.col("__ok") == n_boot
    ci = means.select(
        *gb, "variant",
        F.when(full, dround(F.element_at("__s", ilo), round_dp))
        .alias("ci_lo"),
        F.when(full, dround(F.element_at("__s", ihi), round_dp))
        .alias("ci_hi"))

    pt = (base.groupBy(*gb, "variant")
          .agg(F.count("*").alias("n"),
               F.sum("__xq").alias("__sx")))
    pt = pt.select(
        *gb, "variant", "n",
        dround(F.col("__sx").cast("double")
                / (F.col("n").cast("double") * F.lit(1e6)),
                round_dp).alias("mean"))
    return pt.join(ci, [*gb, "variant"]).select(
        *gb, "variant", "n", "mean", "ci_lo", "ci_hi")


def ab_bootstrap_ci_sql(
    table: str,
    variant_col: str,
    value_expr: str,
    id_expr: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    group_by: "list[str] | None" = None,
    seed: int = 7,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_bootstrap_ci: identical uniform, thresholds,
    integer-grid sums, division order, sort, and index lookups."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ", ".join(gb + ["variant"])
    case = "CASE " + " ".join(
        f"WHEN u < {c!r} THEN {k}"
        for k, c in enumerate(_POIS_CDF)) + " ELSE 12 END"
    ilo, ihi = _boot_indices(n_boot, alpha)
    return f"""
WITH base AS (
  SELECT {gsel}{variant_col} AS variant,
         CAST({id_expr} AS VARCHAR) AS id,
         CAST(round(CAST({value_expr} AS DOUBLE) * 1e6)
              AS HUGEINT) AS xq
  FROM {table}
  WHERE {value_expr} IS NOT NULL AND {id_expr} IS NOT NULL
),
ex AS (
  SELECT base.*, b,
         ((('0x' || substr(md5(id || '#' || b || '#{seed}'), 1, 8))
           ::BIGINT)::DOUBLE + 0.5) / {_U32!r} AS u
  FROM base CROSS JOIN (SELECT unnest(range({int(n_boot)})) AS b)
),
res AS (
  SELECT {gsel}variant, b,
         sum(({case})::HUGEINT * xq) AS swx,
         sum({case}) AS sw
  FROM ex GROUP BY {gkey}, b
),
m AS (
  SELECT {gsel}variant,
         CASE WHEN sw > 0
              THEN swx::DOUBLE / (sw::DOUBLE * 1000000.0) END AS mb
  FROM res
),
ci AS (
  SELECT {gsel}variant, count(mb) AS ok,
         list_sort(list(mb) FILTER (WHERE mb IS NOT NULL)) AS s
  FROM m GROUP BY {gkey}
),
pt AS (
  SELECT {gsel}variant, count(*) AS n,
         round(sum(xq)::DOUBLE / (count(*)::DOUBLE * 1000000.0),
               {round_dp}) AS mean
  FROM base GROUP BY {gkey}
)
SELECT {gsel}variant, n, mean,
       CASE WHEN ok = {int(n_boot)}
            THEN round(s[{ilo}], {round_dp}) END AS ci_lo,
       CASE WHEN ok = {int(n_boot)}
            THEN round(s[{ihi}], {round_dp}) END AS ci_hi
FROM pt JOIN ci USING ({gkey})
"""


# ---------------------------------------------------------------------------
# Winsorized Welch — outlier-robust continuous-metric readout
# ---------------------------------------------------------------------------


def ab_welch_test_winsorized(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    trim: float = 0.01,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
) -> DataFrame:
    """ab_welch_test on per-cell winsorized values: within each
    (group, variant) cell, values clamp to that cell's [trim, 1-trim]
    quantiles before the sufficient-statistics pass — the standard
    robustness guard for heavy-tailed metrics (one whale order should
    not flip a revenue experiment; winsorizing beats trimming because
    n is preserved and the estimator stays a mean of the SAME rows).

    Quantiles are exact interpolated percentiles (Spark `percentile`
    and DuckDB `quantile_cont` share the (n-1)p definition — verified
    to the bit on both engines); the threshold table is
    groups x variants-sized and broadcast back, so raw rows never
    shuffle for the clamp. Everything downstream IS ab_welch_test —
    same output columns, same NULL conventions.

    100 TB note: Spark's exact `percentile` aggregate buffers a
    value->count map per cell, so a cell with ~10^8+ DISTINCT metric
    values needs the documented alternative — quantize the metric
    upstream (e.g. cents) or take thresholds from
    histogram.histogram_quantiles at grid precision; the clamp and
    Welch pass are unchanged either way."""
    if not 0.0 <= trim < 0.5:
        raise ValueError("trim must be in [0, 0.5)")
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    base = df.filter(F.col(variant_col).isin(control, treatment)
                     & v.isNotNull())
    th = (base.groupBy(*gb, variant_col)
          .agg(F.percentile(v, F.lit(float(trim))).alias("__lo"),
               F.percentile(v, F.lit(1.0 - float(trim)))
               .alias("__hi")))
    clamped = (base.join(F.broadcast(th), [*gb, variant_col])
               .withColumn("__wz",
                           F.greatest(F.col("__lo"),
                                      F.least(F.col("__hi"), v))))
    return ab_welch_test(clamped, variant_col, "__wz", control,
                         treatment, group_by=gb, t_alpha=t_alpha,
                         round_dp=round_dp)


def ab_welch_test_winsorized_sql(
    table: str,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    trim: float = 0.01,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_welch_test_winsorized (same quantile
    definition, same clamp, then the ab_welch_test twin over the
    clamped derived table)."""
    gb = list(group_by or [])
    gcols = ", ".join([*gb, variant_col])
    gsel = (", ".join(gb) + ", ") if gb else ""
    v = f"CAST({value_col} AS DOUBLE)"
    clamped = f"""
  WITH th AS (
    SELECT {gsel}{variant_col},
           quantile_cont({v}, {float(trim)!r}) AS lo,
           quantile_cont({v}, {1.0 - float(trim)!r}) AS hi
    FROM {table}
    WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
      AND {value_col} IS NOT NULL
    GROUP BY {gcols}
  )
  SELECT {gsel}t.{variant_col},
         greatest(th.lo, least(th.hi, {v})) AS __wz
  FROM {table} t JOIN th USING ({gcols})
  WHERE t.{variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
    AND t.{value_col} IS NOT NULL"""
    return ab_welch_test_sql(f"({clamped})", variant_col, "__wz",
                             control, treatment, group_by=gb,
                             t_alpha=t_alpha, round_dp=round_dp)


def ab_bootstrap_ratio_ci(
    df: DataFrame,
    variant_col: str,
    num_col: str,
    den_col: str,
    id_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    group_by: "list[str] | None" = None,
    seed: int = 7,
    round_dp: int = 4,
    md5: bool = True,
) -> DataFrame:
    """Ratio-of-sums metric (Σnum/Σden — revenue per session, CTR at
    user granularity, tokens per document) with a Poisson-bootstrap
    percentile CI. THE case that motivates bootstrap over Welch: the
    denominator is random too, so treating per-row num/den as i.i.d.
    observations (or Welch on them) is statistically wrong — the
    resample must move numerator and denominator TOGETHER, which the
    shared per-row Poisson weight does.

    Same determinism contract as ab_bootstrap_ci (shared uniform,
    thresholds, 1e-6 integer grids, exact decimal sums); the per-
    resample ratio is swx/swy — the grid factor cancels, so it is ONE
    IEEE division of two exactly-derived doubles. Rows where either
    side is NULL are excluded (a unit must contribute both sides);
    resamples with a zero denominator yield NULL and void the CI.

    Output: (group..., variant, n, ratio, ci_lo, ci_hi)."""
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    gb = list(group_by or [])
    x = F.col(num_col).cast("double")
    y = F.col(den_col).cast("double")
    # same single-task-explode guard as ab_bootstrap_ci (exact sums,
    # partitioning-independent)
    from .dedup import _spread

    base = _spread(
        df.filter(x.isNotNull() & y.isNotNull()
                  & F.col(id_col).isNotNull())
        .select(*gb, F.col(variant_col).alias("variant"),
                F.col(id_col).cast("string").alias("__id"),
                F.round(x * 1e6).cast("decimal(38,0)").alias("__xq"),
                F.round(y * 1e6).cast("decimal(38,0)")
                .alias("__yq")))
    from .md5boot import boot_weight_partials, kernel_groupable

    if md5 and _MD5_KERNEL and kernel_groupable(base, [*gb, "variant"]):
        # same Arrow weight kernel as ab_bootstrap_ci — the shared
        # per-row weight multiplies BOTH sides inside one crossing
        part = boot_weight_partials(
            base, [*gb, "variant"], n_boot=int(n_boot), seed=seed,
            thresholds=_POIS_CDF,
            vals={"__pswx": "__xq", "__pswy": "__yq"}, with_sw=False)
        res = (part.groupBy(*gb, "variant", "b")
               .agg(F.sum("__pswx").alias("__swx"),
                    F.sum("__pswy").alias("__swy")))
    else:
        ex = base.withColumn(
            "b", F.explode(F.sequence(F.lit(0), F.lit(int(n_boot) - 1))))
        u = _boot_uniform(F.col("b"), seed, md5)
        w = F.lit(12)
        for k in range(len(_POIS_CDF) - 1, -1, -1):
            w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
        wd = w.cast("decimal(38,0)")
        res = (ex.withColumn("__w", wd)
               .groupBy(*gb, "variant", "b")
               .agg(F.sum(F.col("__w") * F.col("__xq")).alias("__swx"),
                    F.sum(F.col("__w") * F.col("__yq")).alias("__swy")))
    ratio_b = F.when(
        F.col("__swy") != 0,
        F.col("__swx").cast("double") / F.col("__swy").cast("double"))
    means = (res.withColumn("__rb", ratio_b)
             .groupBy(*gb, "variant")
             .agg(F.sort_array(F.collect_list("__rb")).alias("__s"),
                  F.count("__rb").alias("__ok")))
    ilo, ihi = _boot_indices(n_boot, alpha)
    full = F.col("__ok") == n_boot
    ci = means.select(
        *gb, "variant",
        F.when(full, dround(F.element_at("__s", ilo), round_dp))
        .alias("ci_lo"),
        F.when(full, dround(F.element_at("__s", ihi), round_dp))
        .alias("ci_hi"))
    pt = (base.groupBy(*gb, "variant")
          .agg(F.count("*").alias("n"),
               F.sum("__xq").alias("__sx"),
               F.sum("__yq").alias("__sy")))
    pt = pt.select(
        *gb, "variant", "n",
        F.when(F.col("__sy") != 0,
               dround(F.col("__sx").cast("double")
                       / F.col("__sy").cast("double"), round_dp))
        .alias("ratio"))
    return pt.join(ci, [*gb, "variant"]).select(
        *gb, "variant", "n", "ratio", "ci_lo", "ci_hi")


def ab_bootstrap_ratio_ci_sql(
    table: str,
    variant_col: str,
    num_expr: str,
    den_expr: str,
    id_expr: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    group_by: "list[str] | None" = None,
    seed: int = 7,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_bootstrap_ratio_ci."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ", ".join(gb + ["variant"])
    case = "CASE " + " ".join(
        f"WHEN u < {c!r} THEN {k}"
        for k, c in enumerate(_POIS_CDF)) + " ELSE 12 END"
    ilo, ihi = _boot_indices(n_boot, alpha)
    return f"""
WITH base AS (
  SELECT {gsel}{variant_col} AS variant,
         CAST({id_expr} AS VARCHAR) AS id,
         CAST(round(CAST({num_expr} AS DOUBLE) * 1e6)
              AS HUGEINT) AS xq,
         CAST(round(CAST({den_expr} AS DOUBLE) * 1e6)
              AS HUGEINT) AS yq
  FROM {table}
  WHERE {num_expr} IS NOT NULL AND {den_expr} IS NOT NULL
    AND {id_expr} IS NOT NULL
),
ex AS (
  SELECT base.*, b,
         ((('0x' || substr(md5(id || '#' || b || '#{seed}'), 1, 8))
           ::BIGINT)::DOUBLE + 0.5) / {_U32!r} AS u
  FROM base CROSS JOIN (SELECT unnest(range({int(n_boot)})) AS b)
),
res AS (
  SELECT {gsel}variant, b,
         sum(({case})::HUGEINT * xq) AS swx,
         sum(({case})::HUGEINT * yq) AS swy
  FROM ex GROUP BY {gkey}, b
),
m AS (
  SELECT {gsel}variant,
         CASE WHEN swy != 0
              THEN swx::DOUBLE / swy::DOUBLE END AS rb
  FROM res
),
ci AS (
  SELECT {gsel}variant, count(rb) AS ok,
         list_sort(list(rb) FILTER (WHERE rb IS NOT NULL)) AS s
  FROM m GROUP BY {gkey}
),
pt AS (
  SELECT {gsel}variant, count(*) AS n,
         CASE WHEN sum(yq) != 0
              THEN round(sum(xq)::DOUBLE / sum(yq)::DOUBLE,
                         {round_dp}) END AS ratio
  FROM base GROUP BY {gkey}
)
SELECT {gsel}variant, n, ratio,
       CASE WHEN ok = {int(n_boot)}
            THEN round(s[{ilo}], {round_dp}) END AS ci_lo,
       CASE WHEN ok = {int(n_boot)}
            THEN round(s[{ihi}], {round_dp}) END AS ci_hi
FROM pt JOIN ci USING ({gkey})
"""


def ab_quantile_lift(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    probs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """Quantile treatment effects — mean lift (Welch) hides WHERE the
    distribution moved: a latency experiment can leave the mean flat
    while blowing up p99, and a revenue test can lift the median while
    a whale regression cancels it in the mean. One row per (group,
    prob): q_control, q_treatment, lift (treatment − control).

    Quantiles are the exact interpolated percentile (the winsorized-
    Welch primitive — Spark `percentile` ≡ DuckDB `quantile_cont`);
    same 100 TB note as there: for cells with ~10^8+ DISTINCT values,
    quantize the metric upstream or read thresholds from the grid
    histograms. One agg per variant side, arrays unzipped to rows —
    everything downstream of the two aggregates is probs-bounded."""
    if not probs or any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError("probs must be within [0, 1]")
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    base = df.filter(F.col(variant_col).isin(control, treatment)
                     & v.isNotNull())
    parr = F.array(*[F.lit(float(p)) for p in probs])

    def side(name):
        return F.percentile(
            F.when(F.col(variant_col) == name, v), parr)

    agg = base.groupBy(*gb).agg(
        side(control).alias("__qc"), side(treatment).alias("__qt"))
    out = (agg.select(
        *gb,
        F.posexplode(F.arrays_zip(parr.alias("p"),
                                  F.col("__qc").alias("qc"),
                                  F.col("__qt").alias("qt"))))
        .select(*gb,
                F.col("col.p").alias("prob"),
                dround(F.col("col.qc"), round_dp).alias("q_control"),
                dround(F.col("col.qt"), round_dp)
                .alias("q_treatment"),
                (dround(F.col("col.qt") - F.col("col.qc"), round_dp)
                 + F.lit(0.0)).alias("lift")))
    return out.orderBy(*gb, "prob")


def ab_quantile_lift_sql(
    table: str,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    probs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_quantile_lift: quantile_cont FILTER per
    side, same interpolation; lift = round(qt − qc) over the RAW
    (un-rounded) quantiles on both engines."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    v = f"CAST({value_col} AS DOUBLE)"
    parts = []
    for p in probs:
        parts.append(f"""
SELECT {gsel}CAST({float(p)!r} AS DOUBLE) AS prob,
       round(quantile_cont({v}, {float(p)!r})
             FILTER (WHERE {variant_col} = {sql_lit(control)}),
             {round_dp}) AS q_control,
       round(quantile_cont({v}, {float(p)!r})
             FILTER (WHERE {variant_col} = {sql_lit(treatment)}),
             {round_dp}) AS q_treatment,
       round(quantile_cont({v}, {float(p)!r})
             FILTER (WHERE {variant_col} = {sql_lit(treatment)})
             - quantile_cont({v}, {float(p)!r})
             FILTER (WHERE {variant_col} = {sql_lit(control)}),
             {round_dp}) + 0.0 AS lift
FROM {table}
WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
  AND {value_col} IS NOT NULL
{gkey}""")
    order = ", ".join([*gb, "prob"])
    return " UNION ALL ".join(parts) + f" ORDER BY {order}"


# ---------------------------------------------------------------------------
# Delta-method ratio test — closed-form companion to the ratio bootstrap
# ---------------------------------------------------------------------------


def ab_ratio_delta_test(
    df: DataFrame,
    variant_col: str,
    num_col: str,
    den_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.96,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_control, n_treatment, ratio_control,
    ratio_treatment, diff, z, significant) — the linearization
    (delta-method) z-test for ratio-of-sums metrics (revenue per
    session, CTR at user granularity; Deng, Knoblich & Lu 2018's
    standard practice): per variant with per-unit (x_i, y_i),

        r = Σx / Σy
        Var(r) ≈ (s_xx − 2·r·s_xy + r²·s_yy) / (n · ȳ²)

    using sample (co)variances. The closed-form companion to
    ab_bootstrap_ratio_ci — ONE pass and no B factor, at the cost of
    the large-n normality assumption the bootstrap avoids.

    Exactness: x, y quantize to the 1e-6 integer grid and all five
    sufficient statistics (n, Σx, Σy, Σxx, Σyy, Σxy) accumulate in
    decimal/int128 — exact, order-independent; the closing chain is
    fixed-order IEEE both engines replay. Cells with n < 2, Σy = 0,
    or zero variance emit NULL z / significant=false. Rows with NULL
    x or y are excluded (not exposed units)."""
    gb = list(group_by or [])
    x = F.col(num_col).cast("double")
    y = F.col(den_col).cast("double")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & x.isNotNull() & y.isNotNull())
            .select(*gb,
                    (F.col(variant_col) == treatment).cast("int")
                    .alias("__t"),
                    F.round(x * 1e6).cast("decimal(38,0)").alias("__x"),
                    F.round(y * 1e6).cast("decimal(38,0)").alias("__y")))

    def side(tag: int):
        m = (F.col("__t") == tag).cast("decimal(38,0)")
        sfx = str(tag)
        return [
            F.sum(m).alias("n" + sfx),
            F.sum(m * F.col("__x")).alias("sx" + sfx),
            F.sum(m * F.col("__y")).alias("sy" + sfx),
            F.sum(m * F.col("__x") * F.col("__x")).alias("sxx" + sfx),
            F.sum(m * F.col("__y") * F.col("__y")).alias("syy" + sfx),
            F.sum(m * F.col("__x") * F.col("__y")).alias("sxy" + sfx),
        ]

    agg = base.groupBy(*gb).agg(*side(0), *side(1))

    def stats(sfx: str):
        n = F.col("n" + sfx).cast("double")
        sx = F.col("sx" + sfx).cast("double") / F.lit(1e6)
        sy = F.col("sy" + sfx).cast("double") / F.lit(1e6)
        sxx = F.col("sxx" + sfx).cast("double") / F.lit(1e12)
        syy = F.col("syy" + sfx).cast("double") / F.lit(1e12)
        sxy = F.col("sxy" + sfx).cast("double") / F.lit(1e12)
        r = F.when(sy != 0, sx / sy)
        ybar = sy / n
        # sample (co)variances, computational form, fixed association
        vxx = (sxx - sx * sx / n) / (n - F.lit(1.0))
        vyy = (syy - sy * sy / n) / (n - F.lit(1.0))
        vxy = (sxy - sx * sy / n) / (n - F.lit(1.0))
        se2 = F.when(
            (n > 1) & (sy != 0),
            (vxx - F.lit(2.0) * r * vxy + r * r * vyy)
            / (n * (ybar * ybar)))
        return r, se2

    r0, se20 = stats("0")
    r1, se21 = stats("1")
    se = F.sqrt(se20 + se21)
    z = F.when(se > 0, (r1 - r0) / se)
    zr = dround(z, round_dp) + F.lit(0.0)
    return agg.select(
        *gb,
        F.col("n0").cast("long").alias("n_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        dround(r0, round_dp).alias("ratio_control"),
        dround(r1, round_dp).alias("ratio_treatment"),
        (dround(r1 - r0, round_dp) + F.lit(0.0)).alias("diff"),
        zr.alias("z"),
        F.coalesce(F.abs(zr) >= F.lit(float(z_alpha)),
                   F.lit(False)).alias("significant"))


def ab_ratio_delta_test_sql(
    table: str,
    variant_col: str,
    num_expr: str,
    den_expr: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.96,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_ratio_delta_test (same integer-grid exact
    sufficient statistics, same fixed-association closing chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""

    def side(tag: int):
        m = f"(g1 = {tag})::HUGEINT"
        s = str(tag)
        return (f"sum({m}) AS n{s}, sum({m} * xq) AS sx{s}, "
                f"sum({m} * yq) AS sy{s}, sum({m} * xq * xq) AS sxx{s}, "
                f"sum({m} * yq * yq) AS syy{s}, "
                f"sum({m} * xq * yq) AS sxy{s}")

    def stats(s: str):
        return f"""
         n{s}::DOUBLE AS nd{s},
         sx{s}::DOUBLE / 1e6 AS dsx{s}, sy{s}::DOUBLE / 1e6 AS dsy{s},
         sxx{s}::DOUBLE / 1e12 AS dsxx{s},
         syy{s}::DOUBLE / 1e12 AS dsyy{s},
         sxy{s}::DOUBLE / 1e12 AS dsxy{s}"""

    def chain(s: str):
        return f"""
         CASE WHEN dsy{s} != 0 THEN dsx{s} / dsy{s} END AS r{s},
         CASE WHEN nd{s} > 1 AND dsy{s} != 0 THEN
           ((dsxx{s} - dsx{s} * dsx{s} / nd{s}) / (nd{s} - 1.0)
            - 2.0 * (dsx{s} / dsy{s})
              * ((dsxy{s} - dsx{s} * dsy{s} / nd{s}) / (nd{s} - 1.0))
            + (dsx{s} / dsy{s}) * (dsx{s} / dsy{s})
              * ((dsyy{s} - dsy{s} * dsy{s} / nd{s}) / (nd{s} - 1.0)))
           / (nd{s} * ((dsy{s} / nd{s}) * (dsy{s} / nd{s})))
         END AS se2{s}"""

    return f"""
WITH base AS (
  SELECT {gsel}CAST({variant_col} = {sql_lit(treatment)} AS INT) AS g1,
         CAST(round(CAST({num_expr} AS DOUBLE) * 1e6) AS HUGEINT) AS xq,
         CAST(round(CAST({den_expr} AS DOUBLE) * 1e6) AS HUGEINT) AS yq
  FROM {table}
  WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
    AND {num_expr} IS NOT NULL AND {den_expr} IS NOT NULL
),
agg AS (
  SELECT {gsel}{side(0)}, {side(1)}
  FROM base {gkey}
),
doubled AS (
  SELECT {gsel}n0, n1, {stats('0')}, {stats('1')} FROM agg
),
calc AS (
  SELECT {gsel}n0, n1, {chain('0')}, {chain('1')},
         dsx0, dsy0, dsx1, dsy1
  FROM doubled
),
zc AS (
  SELECT {gsel}n0, n1, r0, r1,
         CASE WHEN sqrt(se20 + se21) > 0
              THEN (r1 - r0) / sqrt(se20 + se21) END AS z
  FROM calc
)
SELECT {gsel}CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       round(r0, {round_dp}) AS ratio_control,
       round(r1, {round_dp}) AS ratio_treatment,
       round(r1 - r0, {round_dp}) + 0.0 AS diff,
       round(z, {round_dp}) + 0.0 AS z,
       coalesce(abs(round(z, {round_dp})) >= {float(z_alpha)!r},
                FALSE) AS significant
FROM zc
"""


# ---------------------------------------------------------------------------
# Post-stratification — the design-free sibling of CUPED
# ---------------------------------------------------------------------------


def ab_post_stratified(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    strata_cols: "list[str]",
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.96,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_control, n_treatment, n_strata_used,
    mean_control, mean_treatment, diff, z, significant) —
    post-stratification variance reduction (Miratrix, Sekhon & Yu
    2013; the categorical-covariate sibling of CUPED): reweight each
    variant's per-stratum means by the POOLED stratum shares,

        ȳ'_v  = Σ_s w_s · ȳ_{s,v}        w_s = n_s / N
        se²_v = Σ_s w_s² · var_{s,v} / n_{s,v}

    which removes the variance contributed by stratum-mix imbalance
    between the arms (country mix, platform mix, new-vs-returning).

    A stratum is USED only when both arms have n >= 2 there (means
    and variances both estimable); weights renormalize over used
    strata and n_strata_used reports the coverage. Zero used strata
    emit NULL everywhere (significant=false).

    Exactness: per-stratum sums are exact 1e-6-grid decimals; the
    cross-STRATA sums of the four double terms are s-ordered left
    folds (the km_logrank discipline — never a partition-order float
    agg), so both engines agree bit-for-bit before rounding. Scale
    shape: one map-side agg to strata x variants rows, one
    groups-sized integer agg for N, one bounded fold."""
    gb = list(group_by or [])
    if not strata_cols:
        raise ValueError("strata_cols must be non-empty")
    y = F.col(value_col).cast("double")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & y.isNotNull())
            .select(*gb, *strata_cols,
                    (F.col(variant_col) == treatment).cast("int")
                    .alias("__t"),
                    F.round(y * 1e6).cast("decimal(38,0)").alias("__yq")))

    def side(tag: int):
        m = (F.col("__t") == tag).cast("decimal(38,0)")
        s = str(tag)
        return [F.sum(m).alias("n" + s),
                F.sum(m * F.col("__yq")).alias("s" + s),
                F.sum(m * F.col("__yq") * F.col("__yq")).alias("ss" + s)]

    per_s = (base.groupBy(*gb, *strata_cols)
             .agg(*side(0), *side(1))
             .filter((F.col("n0") >= 2) & (F.col("n1") >= 2)))
    nw = (F.col("n0") + F.col("n1")).cast("long")
    per_s = per_s.withColumn("__nw", nw)
    tot = per_s.groupBy(*gb).agg(
        F.sum("__nw").alias("__N"),
        F.sum(F.col("n0").cast("long")).alias("n_control"),
        F.sum(F.col("n1").cast("long")).alias("n_treatment"),
        F.count("*").alias("n_strata_used"))
    j = per_s.join(tot, gb) if gb else per_s.crossJoin(tot)

    def stats(s: str):
        n = F.col("n" + s).cast("double")
        sx = F.col("s" + s).cast("double") / F.lit(1e6)
        sxx = F.col("ss" + s).cast("double") / F.lit(1e12)
        mean = sx / n
        var = (sxx - sx * sx / n) / (n - F.lit(1.0))
        return n, mean, var

    n0d, m0, v0 = stats("0")
    n1d, m1, v1 = stats("1")
    w = F.col("__nw").cast("double") / F.col("__N").cast("double")
    term = F.struct(
        *[F.col(c) for c in strata_cols],
        (w * m0).alias("mc"),
        (w * m1).alias("mt"),
        (w * w * (v0 / n0d + v1 / n1d)).alias("se2"))
    j = j.withColumn("__term", term)
    folded = (j.groupBy(*gb, "__N", "n_control", "n_treatment",
                        "n_strata_used")
              .agg(F.expr(
                  "aggregate(array_sort(collect_list(__term)),"
                  " named_struct('mc', CAST(0.0 AS DOUBLE),"
                  "              'mt', CAST(0.0 AS DOUBLE),"
                  "              'se2', CAST(0.0 AS DOUBLE)),"
                  " (acc, x) -> named_struct("
                  "   'mc', acc.mc + x.mc,"
                  "   'mt', acc.mt + x.mt,"
                  "   'se2', acc.se2 + x.se2))").alias("__s")))
    diff = F.col("__s.mt") - F.col("__s.mc")
    z = F.when(F.sqrt(F.col("__s.se2")) > 0,
               diff / F.sqrt(F.col("__s.se2")))
    zr = dround(z, round_dp) + F.lit(0.0)
    out = folded.select(
        *gb, "n_control", "n_treatment", "n_strata_used",
        dround(F.col("__s.mc"), round_dp).alias("mean_control"),
        dround(F.col("__s.mt"), round_dp).alias("mean_treatment"),
        (dround(diff, round_dp) + F.lit(0.0)).alias("diff"),
        zr.alias("z"),
        F.coalesce(F.abs(zr) >= F.lit(float(z_alpha)),
                   F.lit(False)).alias("significant"))
    return out


def ab_post_stratified_sql(
    table: str,
    variant_col: str,
    value_expr: str,
    strata_cols: "list[str]",
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.96,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_post_stratified (same grid sums, same
    strata-ordered fold, same closing chain)."""
    gb = list(group_by or [])
    sc = list(strata_cols)
    gsel = (", ".join(gb) + ", ") if gb else ""
    ssel = ", ".join(sc)
    skey = ", ".join([*gb, *sc])
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    join = ("USING (" + ", ".join(gb) + ")") if gb else "ON TRUE"
    order = ", ".join(sc)
    return f"""
WITH base AS (
  SELECT {gsel}{ssel},
         CAST({variant_col} = {sql_lit(treatment)} AS INT) AS t,
         CAST(round(CAST({value_expr} AS DOUBLE) * 1e6) AS HUGEINT)
           AS yq
  FROM {table}
  WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
    AND {value_expr} IS NOT NULL
),
per_s AS (
  SELECT {gsel}{ssel},
         sum((t = 0)::HUGEINT) AS n0,
         sum((t = 0)::HUGEINT * yq) AS s0,
         sum((t = 0)::HUGEINT * yq * yq) AS ss0,
         sum((t = 1)::HUGEINT) AS n1,
         sum((t = 1)::HUGEINT * yq) AS s1,
         sum((t = 1)::HUGEINT * yq * yq) AS ss1
  FROM base GROUP BY {skey}
  HAVING sum((t = 0)::HUGEINT) >= 2 AND sum((t = 1)::HUGEINT) >= 2
),
tot AS (
  SELECT {gsel}sum(n0 + n1)::BIGINT AS N,
         sum(n0)::BIGINT AS n_control,
         sum(n1)::BIGINT AS n_treatment,
         count(*) AS n_strata_used
  FROM per_s {gkey}
),
terms AS (
  SELECT {gsel}{ssel},
         ((n0 + n1)::DOUBLE / N::DOUBLE)
           * ((s0::DOUBLE / 1e6) / n0::DOUBLE) AS mc,
         ((n0 + n1)::DOUBLE / N::DOUBLE)
           * ((s1::DOUBLE / 1e6) / n1::DOUBLE) AS mt,
         ((n0 + n1)::DOUBLE / N::DOUBLE)
           * ((n0 + n1)::DOUBLE / N::DOUBLE)
           * (((ss0::DOUBLE / 1e12
                - (s0::DOUBLE / 1e6) * (s0::DOUBLE / 1e6) / n0::DOUBLE)
               / (n0::DOUBLE - 1.0)) / n0::DOUBLE
              + ((ss1::DOUBLE / 1e12
                  - (s1::DOUBLE / 1e6) * (s1::DOUBLE / 1e6)
                    / n1::DOUBLE)
                 / (n1::DOUBLE - 1.0)) / n1::DOUBLE) AS se2
  FROM per_s JOIN tot {join}
),
folded AS (
  SELECT {gsel}
         list_reduce(
           list_prepend({{'mc': 0.0::DOUBLE, 'mt': 0.0::DOUBLE,
                          'se2': 0.0::DOUBLE}},
                        list({{'mc': mc, 'mt': mt, 'se2': se2}}
                             ORDER BY {order})),
           (a, x) -> {{'mc': a.mc + x.mc, 'mt': a.mt + x.mt,
                       'se2': a.se2 + x.se2}}) AS s
  FROM terms {gkey}
)
SELECT {gsel}n_control, n_treatment, n_strata_used,
       round(s.mc, {round_dp}) AS mean_control,
       round(s.mt, {round_dp}) AS mean_treatment,
       round(s.mt - s.mc, {round_dp}) + 0.0 AS diff,
       round(CASE WHEN sqrt(s.se2) > 0
                  THEN (s.mt - s.mc) / sqrt(s.se2) END,
             {round_dp}) + 0.0 AS z,
       coalesce(abs(round(CASE WHEN sqrt(s.se2) > 0
                               THEN (s.mt - s.mc) / sqrt(s.se2) END,
                          {round_dp})) >= {float(z_alpha)!r}, FALSE)
         AS significant
FROM folded JOIN tot {join}
"""


# ---------------------------------------------------------------------------
# Jackknife (delete-one-bucket) variance — the aggregate-anything CI
# ---------------------------------------------------------------------------


def ab_jackknife_ci(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 50,
    z: float = 1.96,
    group_by: "list[str] | None" = None,
    seed: int = 0,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., variant, n, n_buckets_used, mean, se_jack, ci_lo,
    ci_hi) — delete-one-bucket jackknife CI for the mean (the
    big-data variance workhorse: Chamandy et al. 2012 discuss it
    beside the Poisson bootstrap; unlike the bootstrap there is no B
    explode — ONE pass, B leave-one-out estimates from totals minus
    per-bucket sums):

        m_b  = (S − s_b) / (N − n_b)
        var  = (B−1)/B · Σ_b (m_b − m̄)²

    Buckets are md5-uniform(id, seed) mod n_buckets — deterministic,
    engine-replayable, and unit-respecting (all of a user's rows land
    in one bucket when id_col is the user id, which is what makes the
    jackknife valid under within-user correlation — the reason to
    prefer it over row-level formulas for per-event metrics).

    Exactness: per-bucket sums are exact grid decimals; N and S are
    exact integer folds; each m_b is one division; the cross-BUCKET
    sums (Σm, Σm²) are bucket-ordered left folds (the km_logrank
    discipline); Σ(m_b−m̄)² closes as Σm² − B·m̄². Empty hash buckets
    simply don't occur in the table — n_buckets_used reports the
    actual B (documented: with n >> B² the difference is nil).
    Cells with fewer than 2 used buckets emit NULL se/CI."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    base = (df.filter(v.isNotNull() & F.col(id_col).isNotNull())
            .select(*gb,
                    F.col(variant_col).alias("variant"),
                    F.pmod(
                        F.conv(F.substring(
                            F.md5(F.concat(
                                F.col(id_col).cast("string"),
                                F.lit(f"#jk#{seed}"))), 1, 8),
                            16, 10).cast("long"),
                        F.lit(int(n_buckets))).alias("__b"),
                    F.round(v * 1e6).cast("decimal(38,0)").alias("__xq")))
    per_b = (base.groupBy(*gb, "variant", "__b")
             .agg(F.count("*").alias("__nb"),
                  F.sum("__xq").alias("__sb")))
    tot = (per_b.groupBy(*gb, "variant")
           .agg(F.sum("__nb").alias("__N"),
                F.sum("__sb").alias("__S"),
                F.count("*").alias("n_buckets_used")))
    j = per_b.join(tot, [*gb, "variant"])
    # guard the single-bucket degenerate (N == n_b): ANSI division
    # raises instead of NaN-ing; NULL here flows to NULL se/CI
    m_b = F.when(
        F.col("__N") > F.col("__nb"),
        (F.col("__S") - F.col("__sb")).cast("double")
        / ((F.col("__N") - F.col("__nb")).cast("double")
           * F.lit(1e6)))
    j = j.withColumn(
        "__t", F.struct(F.col("__b"),
                        m_b.alias("m"),
                        (m_b * m_b).alias("m2")))
    folded = (j.groupBy(*gb, "variant", "__N", "__S",
                        "n_buckets_used")
              .agg(F.expr(
                  "aggregate(array_sort(collect_list(__t)),"
                  " named_struct('m', CAST(0.0 AS DOUBLE),"
                  "              'm2', CAST(0.0 AS DOUBLE)),"
                  " (acc, x) -> named_struct('m', acc.m + x.m,"
                  "                          'm2', acc.m2 + x.m2))")
                  .alias("__fold")))
    bu = F.col("n_buckets_used").cast("double")
    mbar = F.col("__fold.m") / bu
    ss = F.col("__fold.m2") - bu * (mbar * mbar)
    var = (bu - F.lit(1.0)) / bu * ss
    se = F.when((F.col("n_buckets_used") >= 2) & (var >= 0),
                F.sqrt(var))
    mean = (F.col("__S").cast("double")
            / (F.col("__N").cast("double") * F.lit(1e6)))
    return folded.select(
        *gb, "variant",
        F.col("__N").alias("n"), "n_buckets_used",
        dround(mean, round_dp).alias("mean"),
        dround(se, round_dp).alias("se_jack"),
        dround(mean - F.lit(float(z)) * se, round_dp).alias("ci_lo"),
        dround(mean + F.lit(float(z)) * se, round_dp).alias("ci_hi"))


def ab_jackknife_ci_sql(
    table: str,
    variant_col: str,
    value_expr: str,
    id_expr: str,
    n_buckets: int = 50,
    z: float = 1.96,
    group_by: "list[str] | None" = None,
    seed: int = 0,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_jackknife_ci (same md5 buckets, same exact
    sums, same bucket-ordered fold and closing chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ", ".join([*gb, "variant"])
    return f"""
WITH base AS (
  SELECT {gsel}{variant_col} AS variant,
         (('0x' || substr(md5(CAST({id_expr} AS VARCHAR) ||
            {sql_lit(f'#jk#{seed}')}), 1, 8))::BIGINT
          % {int(n_buckets)}) AS b,
         CAST(round(CAST({value_expr} AS DOUBLE) * 1e6) AS HUGEINT)
           AS xq
  FROM {table}
  WHERE {value_expr} IS NOT NULL AND {id_expr} IS NOT NULL
),
per_b AS (
  SELECT {gsel}variant, b, count(*) AS nb, sum(xq) AS sb
  FROM base GROUP BY {gkey}, b
),
tot AS (
  SELECT {gsel}variant, sum(nb) AS N, sum(sb) AS S,
         count(*) AS n_buckets_used
  FROM per_b GROUP BY {gkey}
),
terms AS (
  SELECT {gsel}variant, b,
         CASE WHEN N > nb THEN
           (S - sb)::DOUBLE / ((N - nb)::DOUBLE * 1e6) END AS m
  FROM per_b JOIN tot USING ({gkey})
),
folded AS (
  SELECT {gsel}variant,
         list_reduce(
           list_prepend({{'m': 0.0::DOUBLE, 'm2': 0.0::DOUBLE}},
                        list({{'m': m, 'm2': m * m}} ORDER BY b)),
           (a, x) -> {{'m': a.m + x.m, 'm2': a.m2 + x.m2}}) AS fl
  FROM terms GROUP BY {gkey}
),
calc AS (
  SELECT {gsel}variant, N, S, n_buckets_used,
         S::DOUBLE / (N::DOUBLE * 1e6) AS mean,
         CASE WHEN n_buckets_used >= 2
               AND (n_buckets_used - 1.0) / n_buckets_used::DOUBLE
                   * (fl.m2 - n_buckets_used::DOUBLE
                      * ((fl.m / n_buckets_used::DOUBLE)
                         * (fl.m / n_buckets_used::DOUBLE))) >= 0
              THEN sqrt((n_buckets_used - 1.0)
                        / n_buckets_used::DOUBLE
                        * (fl.m2 - n_buckets_used::DOUBLE
                           * ((fl.m / n_buckets_used::DOUBLE)
                              * (fl.m / n_buckets_used::DOUBLE))))
         END AS se
  FROM folded JOIN tot USING ({gkey})
)
SELECT {gsel}variant, CAST(N AS BIGINT) AS n, n_buckets_used,
       round(mean, {round_dp}) AS mean,
       round(se, {round_dp}) AS se_jack,
       round(mean - {float(z)!r} * se, {round_dp}) AS ci_lo,
       round(mean + {float(z)!r} * se, {round_dp}) AS ci_hi
FROM calc
"""


# ---------------------------------------------------------------------------
# Covariate balance — the randomization-health companion to SRM
# ---------------------------------------------------------------------------


def ab_covariate_balance(
    df: DataFrame,
    variant_col: str,
    covariates: "list[str]",
    control: str,
    treatment: str,
    smd_threshold: float = 0.1,
    round_dp: int = 4,
) -> DataFrame:
    """(covariate, n_control, n_treatment, mean_control,
    mean_treatment, smd, imbalanced) — standardized mean differences
    of PRE-experiment covariates across arms:

        SMD = (m̄_t − m̄_c) / sqrt((s²_c + s²_t) / 2)

    the randomization-health check that catches a broken bucketing
    SRM can't see (counts can match while the POPULATIONS differ);
    |SMD| >= 0.1 is the conventional imbalance flag (Austin 2009).

    One map-side agg for ALL covariates (each contributes six
    conditional sums to the same aggregate — the expectations-module
    one-scan shape), exact 1e-6-grid decimal sums, fixed-association
    closing chain. Per-covariate NULLs are excluded covariate-wise
    (a NULL height row still balances on age). Zero pooled variance
    emits NULL smd / imbalanced=false."""
    if not covariates:
        raise ValueError("covariates must be non-empty")
    t = (F.col(variant_col) == treatment).cast("int")
    base = df.filter(F.col(variant_col).isin(control, treatment)) \
        .withColumn("__t", t)
    aggs = []
    for i, c in enumerate(covariates):
        x = F.col(c).cast("double")
        ok = x.isNotNull()
        xq = F.when(ok, F.round(x * 1e6).cast("decimal(38,0)")) \
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        for tag in (0, 1):
            m = (ok & (F.col("__t") == tag)).cast("decimal(38,0)")
            aggs += [
                F.sum(m).alias(f"__n{tag}_{i}"),
                F.sum(m * xq).alias(f"__s{tag}_{i}"),
                F.sum(m * xq * xq).alias(f"__q{tag}_{i}"),
            ]
    one = base.agg(*aggs)
    rows = []
    for i, c in enumerate(covariates):
        def stats(tag):
            n = F.col(f"__n{tag}_{i}").cast("double")
            s = F.col(f"__s{tag}_{i}").cast("double") / F.lit(1e6)
            q = F.col(f"__q{tag}_{i}").cast("double") / F.lit(1e12)
            mean = F.when(n > 0, s / n)
            var = F.when(n > 1, (q - s * s / n) / (n - F.lit(1.0)))
            return n, mean, var
        n0, m0, v0 = stats(0)
        n1, m1, v1 = stats(1)
        denom = F.sqrt((v0 + v1) / F.lit(2.0))
        smd = F.when(denom > 0, (m1 - m0) / denom)
        smd_r = dround(smd, round_dp)
        rows.append(F.struct(
            F.lit(i).alias("ord"), F.lit(c).alias("covariate"),
            n0.cast("long").alias("n_control"),
            n1.cast("long").alias("n_treatment"),
            dround(m0, round_dp).alias("mean_control"),
            dround(m1, round_dp).alias("mean_treatment"),
            smd_r.alias("smd"),
            F.coalesce(F.abs(smd_r) >= F.lit(float(smd_threshold)),
                       F.lit(False)).alias("imbalanced")))
    exploded = one.select(F.explode(F.array(*rows)).alias("r"))
    return (exploded.select("r.ord", "r.covariate", "r.n_control",
                            "r.n_treatment", "r.mean_control",
                            "r.mean_treatment", "r.smd",
                            "r.imbalanced")
            .orderBy("ord").drop("ord"))


def ab_covariate_balance_sql(
    table: str,
    variant_col: str,
    covariates: "list[str]",
    control: str,
    treatment: str,
    smd_threshold: float = 0.1,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_covariate_balance (same one-scan conditional
    sums, same closing chain)."""
    if not covariates:
        raise ValueError("covariates must be non-empty")
    aggs = []
    sel = []
    for i, c in enumerate(covariates):
        xq = (f"CASE WHEN {c} IS NOT NULL THEN "
              f"CAST(round(CAST({c} AS DOUBLE) * 1e6) AS HUGEINT) "
              f"ELSE 0::HUGEINT END")
        for tag in (0, 1):
            m = (f"({c} IS NOT NULL AND t = {tag})::HUGEINT")
            aggs += [f"sum({m}) AS n{tag}_{i}",
                     f"sum({m} * ({xq})) AS s{tag}_{i}",
                     f"sum({m} * ({xq}) * ({xq})) AS q{tag}_{i}"]

        def ch(tag):
            n = f"n{tag}_{i}::DOUBLE"
            s = f"(s{tag}_{i}::DOUBLE / 1e6)"
            q = f"(q{tag}_{i}::DOUBLE / 1e12)"
            mean = f"CASE WHEN {n} > 0 THEN {s} / {n} END"
            var = (f"CASE WHEN {n} > 1 THEN "
                   f"({q} - {s} * {s} / {n}) / ({n} - 1.0) END")
            return n, mean, var
        n0, m0, v0 = ch(0)
        n1, m1, v1 = ch(1)
        denom = f"sqrt((({v0}) + ({v1})) / 2.0)"
        smd = (f"round(CASE WHEN {denom} > 0 THEN "
               f"(({m1}) - ({m0})) / {denom} END, {round_dp})")
        sel.append(f"""
SELECT {i} AS ord, {sql_lit(c)} AS covariate,
       n0_{i}::BIGINT AS n_control, n1_{i}::BIGINT AS n_treatment,
       round({m0}, {round_dp}) AS mean_control,
       round({m1}, {round_dp}) AS mean_treatment,
       {smd} AS smd,
       coalesce(abs({smd}) >= {float(smd_threshold)!r}, FALSE)
         AS imbalanced
FROM one""")
    return (f"WITH flagged AS (SELECT *, CAST({variant_col} = "
            f"{sql_lit(treatment)} AS INT) AS t FROM {table} "
            f"WHERE {variant_col} IN ({sql_lit(control)}, "
            f"{sql_lit(treatment)})), "
            f"one AS (SELECT {', '.join(aggs)} FROM flagged) "
            f"SELECT covariate, n_control, n_treatment, mean_control, "
            f"mean_treatment, smd, imbalanced "
            f"FROM ({' UNION ALL '.join(sel)}) ORDER BY ord")


# ---------------------------------------------------------------------------
# Always-valid inference: mixture sequential probability ratio test
# (Johari, Koomen, Pekelis & Walsh 2017, "Peeking at A/B tests";
# Robbins 1970 mixture SPRT). The fixed-horizon tests above are only
# valid at ONE pre-registered look; a dashboard that re-reads the
# experiment daily inflates its false-positive rate without bound.
# The mSPRT's likelihood-ratio martingale Λ_n is valid at EVERY n
# simultaneously: reject when Λ_n ≥ 1/α, always-valid p = min(1, 1/Λ).
#
# Two-sample mean form with a N(0, tau2) mixing prior on the effect:
#   V_n        = s0²/n0 + s1²/n1          (Welch variance of the diff)
#   ln Λ_n     = ½·ln(V/(V+τ²)) + δ̂²τ² / (2V(V+τ²))
# — sufficient statistics only (count/sum/sum-of-squares per arm), so
# the whole test is ONE map-side-combinable aggregate; 100 TB of raw
# observations collapse to six numbers per (group, arm) before any
# shuffle. ln/exp run at query time on data-dependent doubles, so
# outputs are rounded (the kn_perplexity precedent); the α threshold
# ln(1/α) is a repr-embedded Python constant, identical both engines.
# ---------------------------------------------------------------------------


def ab_msprt(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    tau2: float = 1.0,
    alpha: float = 0.05,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_control, n_treatment, diff, log_lambda,
    always_valid_p, significant) — mixture-SPRT always-valid test on
    a continuous metric. NULL values excluded; cells with an empty or
    constant arm emit NULL log_lambda / significant=false. `tau2` is
    the mixing-prior variance on the effect size (match it to the
    metric's scale; too small ≈ slow detection, too large ≈
    conservative early on)."""
    import math
    if tau2 <= 0 or not (0 < alpha < 1):
        raise ValueError("tau2 must be > 0 and alpha in (0, 1)")
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
    vn = F.try_divide(var0, F.col("n0")) \
        + F.try_divide(var1, F.col("n1"))
    d = m1 - m0
    t2 = F.lit(float(tau2))
    ll = F.when(
        vn > 0,
        F.lit(0.5) * F.log(vn / (vn + t2))
        + F.try_divide(d * d * t2, F.lit(2.0) * vn * (vn + t2)))
    llr = dround(ll, round_dp) + F.lit(0.0)
    thresh = math.log(1.0 / alpha)
    avp = dround(F.least(F.lit(1.0), F.exp(-ll)), round_dp)
    return agg.select(
        *gb,
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        (dround(d, round_dp) + F.lit(0.0)).alias("diff"),
        llr.alias("log_lambda"),
        avp.alias("always_valid_p"),
        F.coalesce(llr >= F.lit(float(thresh)), F.lit(False))
        .alias("significant"))


def ab_msprt_sql(
    table: str,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    tau2: float = 1.0,
    alpha: float = 0.05,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_msprt (same sufficient statistics, same
    repr-embedded ln(1/α) threshold, same rounding)."""
    import math
    if tau2 <= 0 or not (0 < alpha < 1):
        raise ValueError("tau2 must be > 0 and alpha in (0, 1)")
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    v = f"CAST({value_col} AS DOUBLE)"
    t = f"CAST({variant_col} = {sql_lit(treatment)} AS INT)"
    t2 = repr(float(tau2))
    thresh = repr(float(math.log(1.0 / alpha)))
    return f"""
WITH agg AS (
  SELECT {gsel}
         sum(1 - {t}) AS n0, sum({t}) AS n1,
         sum({v} * (1 - {t})) AS sv0, sum({v} * {t}) AS sv1,
         sum({v} * {v} * (1 - {t})) AS ss0,
         sum({v} * {v} * {t}) AS ss1
  FROM {table}
  WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
    AND {value_col} IS NOT NULL
  {gkey}
),
calc AS (
  SELECT *,
         sv1 / nullif(n1, 0) - sv0 / nullif(n0, 0) AS d,
         (ss0 - n0 * (sv0 / nullif(n0, 0)) * (sv0 / nullif(n0, 0)))
           / nullif(n0 - 1, 0) / nullif(n0, 0)
         + (ss1 - n1 * (sv1 / nullif(n1, 0)) * (sv1 / nullif(n1, 0)))
           / nullif(n1 - 1, 0) / nullif(n1, 0) AS vn
  FROM agg
),
lam AS (
  SELECT *,
         CASE WHEN vn > 0
              THEN 0.5 * ln(vn / (vn + {t2}))
                   + d * d * {t2} / (2.0 * vn * (vn + {t2})) END
           AS ll
  FROM calc
)
SELECT {gsel}
       CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       round(d, {round_dp}) + 0.0 AS diff,
       round(ll, {round_dp}) + 0.0 AS log_lambda,
       round(least(1.0, exp(-ll)), {round_dp}) AS always_valid_p,
       coalesce(round(ll, {round_dp}) >= {thresh}, FALSE)
         AS significant
FROM lam
"""


def ab_power_mde(
    df: DataFrame,
    value_col: str,
    group_by: "list[str] | None" = None,
    mde_rel: float = 0.05,
    z_alpha: float = 1.959963984540054,
    z_power: float = 0.8416212335729143,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n, mean, sd, n_per_arm_required, mde_abs_at_n,
    mde_rel_at_n) — pre-experiment power planning from BASELINE data:
    for a 50/50 two-arm test on this metric, the per-arm sample size
    that detects a `mde_rel` relative lift at the given z constants
    (defaults: two-sided α=0.05, power=0.80, repr-exact), and the
    relative MDE the CURRENT population would already support.

    n_per_arm = 2σ²(z_α + z_β)² / (mde_rel·mean)²  (Lehr's formula,
    exact z form). Pure sufficient-statistics arithmetic + sqrt —
    one map-side-combinable aggregate, fully deterministic."""
    if mde_rel <= 0:
        raise ValueError("mde_rel must be > 0")
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    agg = (df.filter(v.isNotNull())
           .groupBy(*gb)
           .agg(F.count("*").alias("n"),
                F.sum(v).alias("sv"),
                F.sum(v * v).alias("ss")))
    m = F.try_divide(F.col("sv"), F.col("n"))
    var = F.try_divide(F.col("ss") - F.col("n") * m * m,
                       F.col("n") - 1)
    k2 = float((z_alpha + z_power) ** 2)
    need = F.ceil(F.try_divide(F.lit(2.0 * k2) * var,
                               (F.lit(float(mde_rel)) * m)
                               * (F.lit(float(mde_rel)) * m)))
    n_arm = F.floor(F.col("n") / 2)
    mde_abs = F.when(
        n_arm > 0,
        F.lit(float((z_alpha + z_power))) *
        F.sqrt(F.try_divide(F.lit(2.0) * var, n_arm.cast("double"))))
    return agg.select(
        *gb,
        F.col("n"),
        dround(m, round_dp).alias("mean"),
        dround(F.sqrt(var), round_dp).alias("sd"),
        need.cast("long").alias("n_per_arm_required"),
        dround(mde_abs, round_dp).alias("mde_abs_at_n"),
        dround(F.try_divide(mde_abs, m), round_dp)
        .alias("mde_rel_at_n"))


def ab_power_mde_sql(
    table: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    mde_rel: float = 0.05,
    z_alpha: float = 1.959963984540054,
    z_power: float = 0.8416212335729143,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_power_mde (same sufficient statistics, same
    repr-embedded z constants)."""
    if mde_rel <= 0:
        raise ValueError("mde_rel must be > 0")
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    v = f"CAST({value_col} AS DOUBLE)"
    k2 = repr(float((z_alpha + z_power) ** 2))
    k = repr(float(z_alpha + z_power))
    mr = repr(float(mde_rel))
    return f"""
WITH agg AS (
  SELECT {gsel}count(*) AS n, sum({v}) AS sv, sum({v} * {v}) AS ss
  FROM {table} WHERE {value_col} IS NOT NULL
  {gkey}
),
calc AS (
  SELECT *,
         sv / nullif(n, 0) AS m,
         (ss - n * (sv / nullif(n, 0)) * (sv / nullif(n, 0)))
           / nullif(n - 1, 0) AS var,
         CAST(floor(n / 2) AS BIGINT) AS n_arm
  FROM agg
),
mde AS (
  SELECT *,
         CASE WHEN n_arm > 0
              THEN {k} * sqrt(2.0 * var / CAST(n_arm AS DOUBLE)) END
           AS mde_abs
  FROM calc
)
SELECT {gsel}n,
       round(m, {round_dp}) AS mean,
       round(sqrt(var), {round_dp}) AS sd,
       CAST(ceil(2.0 * {k2} * var / nullif(({mr} * m) * ({mr} * m),
                                           0)) AS BIGINT)
         AS n_per_arm_required,
       round(mde_abs, {round_dp}) AS mde_abs_at_n,
       round(mde_abs / nullif(m, 0), {round_dp}) AS mde_rel_at_n
FROM mde
"""


def ab_anova(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., k_groups, n_total, f_stat, df_between, df_within,
    eta_sq) — one-way ANOVA F across ALL variants present (the A/B/n
    omnibus: k pairwise Welch tests at α inflate; run this first,
    then pairwise on a significant omnibus only).

    Decomposition from exact sufficient statistics on the 1e-6 grid
    (the ab_post_stratified discipline): per-variant n/Σy/Σy² are
    exact decimals; the ONLY cross-variant float reduction is
    Q = Σ_g (Σy_g)²/n_g, computed as a variant-ordered left fold so
    both engines associate identically. Then
        SSB = Q − S²/N,  SSW = SStot − Q,
        F   = (SSB/(k−1)) / (SSW/(N−k)),  η² = SSB/SStot
    with S, SStot, N exact. Degenerate cells (k<2, N≤k, zero SSW)
    emit NULL f_stat. Scale shape: one map-side agg to k rows per
    group, one bounded fold — no second data pass."""
    gb = list(group_by or [])
    y = F.col(value_col).cast("double")
    base = (df.filter(F.col(variant_col).isNotNull() & y.isNotNull())
            .select(*gb, F.col(variant_col).cast("string")
                    .alias("__v"),
                    F.round(y * 1e6).cast("decimal(38,0)")
                    .alias("__yq")))
    per_v = (base.groupBy(*gb, "__v")
             .agg(F.count("*").alias("n"),
                  F.sum("__yq").alias("s"),
                  F.sum(F.col("__yq") * F.col("__yq")).alias("ss")))
    sx = F.col("s").cast("double") / F.lit(1e6)
    q = sx * sx / F.col("n").cast("double")
    per_v = per_v.withColumn(
        "__term", F.struct(F.col("__v"), q.alias("q")))
    folded = (per_v.groupBy(*gb)
              .agg(F.count("*").alias("k_groups"),
                   F.sum("n").alias("n_total"),
                   F.sum("s").alias("s_tot"),
                   F.sum("ss").alias("ss_tot"),
                   F.expr("aggregate(array_sort(collect_list(__term)),"
                          " CAST(0.0 AS DOUBLE),"
                          " (acc, x) -> acc + x.q)").alias("qsum")))
    n = F.col("n_total").cast("double")
    k = F.col("k_groups").cast("double")
    s_d = F.col("s_tot").cast("double") / F.lit(1e6)
    sst = (F.col("ss_tot").cast("double") / F.lit(1e12)
           - s_d * s_d / n)
    ssb = F.col("qsum") - s_d * s_d / n
    ssw = (F.col("ss_tot").cast("double") / F.lit(1e12)
           - F.col("qsum"))
    fstat = F.when(
        (F.col("k_groups") >= 2)
        & (F.col("n_total") > F.col("k_groups")) & (ssw > 0),
        (ssb / (k - F.lit(1.0))) / (ssw / (n - k)))
    return folded.select(
        *gb,
        F.col("k_groups").cast("long").alias("k_groups"),
        F.col("n_total").cast("long").alias("n_total"),
        dround(fstat, round_dp).alias("f_stat"),
        (F.col("k_groups") - 1).cast("long").alias("df_between"),
        (F.col("n_total") - F.col("k_groups")).cast("long")
        .alias("df_within"),
        dround(F.when(sst > 0, ssb / sst), round_dp)
        .alias("eta_sq"))


def ab_anova_sql(
    table: str,
    variant_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_anova (same exact decimals, same
    variant-ordered fold — list_reduce's first-element seed equals
    Spark's 0.0+x₁ exactly under IEEE)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH per_v AS (
  SELECT {gsel}CAST({variant_col} AS VARCHAR) AS v,
         count(*) AS n,
         sum(CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                  AS HUGEINT)) AS s,
         sum(CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                  AS HUGEINT)
             * CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                    AS HUGEINT)) AS ss
  FROM {table}
  WHERE {variant_col} IS NOT NULL AND {value_col} IS NOT NULL
  GROUP BY {gsel.rstrip(', ') + (',' if gb else '')} CAST({variant_col} AS VARCHAR)
),
folded AS (
  SELECT {gsel}count(*) AS k_groups, sum(n) AS n_total,
         sum(s) AS s_tot, sum(ss) AS ss_tot,
         list_reduce(
           list(CAST(s AS DOUBLE) / 1e6 * (CAST(s AS DOUBLE) / 1e6)
                / CAST(n AS DOUBLE) ORDER BY v),
           (a, b) -> a + b) AS qsum
  FROM per_v
  {gkey}
),
calc AS (
  SELECT *,
         CAST(s_tot AS DOUBLE) / 1e6 AS s_d,
         CAST(ss_tot AS DOUBLE) / 1e12 AS sst_raw,
         CAST(n_total AS DOUBLE) AS nd,
         CAST(k_groups AS DOUBLE) AS kd
  FROM folded
)
SELECT {gsel}
       CAST(k_groups AS BIGINT) AS k_groups,
       CAST(n_total AS BIGINT) AS n_total,
       round(CASE WHEN k_groups >= 2 AND n_total > k_groups
                       AND sst_raw - qsum > 0
                  THEN ((qsum - s_d * s_d / nd) / (kd - 1.0))
                       / ((sst_raw - qsum) / (nd - kd)) END,
             {round_dp}) AS f_stat,
       CAST(k_groups - 1 AS BIGINT) AS df_between,
       CAST(n_total - k_groups AS BIGINT) AS df_within,
       round(CASE WHEN sst_raw - s_d * s_d / nd > 0
                  THEN (qsum - s_d * s_d / nd)
                       / (sst_raw - s_d * s_d / nd) END,
             {round_dp}) AS eta_sq
FROM calc
"""


def ab_diff_in_diff(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    ts_col: str,
    control: str,
    treatment: str,
    split: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_pre_c, n_post_c, n_pre_t, n_post_t, diff_control,
    diff_treatment, did, se, z, significant) — two-period
    difference-in-differences (Card & Krueger 1994 form): the
    treatment group's pre→post change minus the control group's,
    which nets out any shared time shock a naive post-only
    comparison absorbs as lift. `split` (ISO date string) separates
    the periods; SE is the large-sample four-cell form
    √(Σ s²_cell/n_cell) under independence.

    One map-side aggregate carries all four cells' n/Σy/Σy²
    (conditional sums over variant × period in a single scan — the
    covariate-balance shape); everything after is arithmetic on four
    triples. Degenerate cells (any n<2 or zero variance in all
    cells) emit NULL z."""
    gb = list(group_by or [])
    y = F.col(value_col).cast("double")
    post = (F.col(ts_col) >= F.to_timestamp(F.lit(split))) \
        .cast("int")
    t = (F.col(variant_col) == treatment).cast("int")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & y.isNotNull())
            .select(*gb, y.alias("__y"), post.alias("__p"),
                    t.alias("__t")))

    def cell(pt: int, tt: int, tag: str):
        m = ((F.col("__p") == pt) & (F.col("__t") == tt)) \
            .cast("int")
        return [F.sum(m).alias("n" + tag),
                F.sum(m * F.col("__y")).alias("s" + tag),
                F.sum(m * F.col("__y") * F.col("__y"))
                .alias("ss" + tag)]

    agg = base.groupBy(*gb).agg(
        *cell(0, 0, "_pre_c"), *cell(1, 0, "_post_c"),
        *cell(0, 1, "_pre_t"), *cell(1, 1, "_post_t"))

    def stats(tag: str):
        n = F.col("n" + tag).cast("double")
        s = F.col("s" + tag)
        ss = F.col("ss" + tag)
        mean = F.try_divide(s, n)
        var = F.try_divide(ss - n * mean * mean, n - 1)
        return n, mean, var

    npc, mpc, vpc = stats("_pre_c")
    noc, moc, voc = stats("_post_c")
    npt, mpt, vpt = stats("_pre_t")
    not_, mot, vot = stats("_post_t")
    dc = moc - mpc
    dt = mot - mpt
    did = dt - dc
    se = F.sqrt(F.try_divide(vpc, npc) + F.try_divide(voc, noc)
                + F.try_divide(vpt, npt) + F.try_divide(vot, not_))
    z = F.when(se > 0, did / se)
    zr = dround(z, round_dp) + F.lit(0.0)
    return agg.select(
        *gb,
        F.col("n_pre_c").alias("n_pre_c"),
        F.col("n_post_c").alias("n_post_c"),
        F.col("n_pre_t").alias("n_pre_t"),
        F.col("n_post_t").alias("n_post_t"),
        (dround(dc, round_dp) + F.lit(0.0)).alias("diff_control"),
        (dround(dt, round_dp) + F.lit(0.0)).alias("diff_treatment"),
        (dround(did, round_dp) + F.lit(0.0)).alias("did"),
        dround(se, round_dp).alias("se"),
        zr.alias("z"),
        F.coalesce(F.abs(zr) >= F.lit(float(z_alpha)), F.lit(False))
        .alias("significant"))


def ab_diff_in_diff_sql(
    table: str,
    variant_col: str,
    value_col: str,
    ts_col: str,
    control: str,
    treatment: str,
    split: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_diff_in_diff (same four-cell conditional
    sums, same SE expression order)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    y = f"CAST({value_col} AS DOUBLE)"
    p = (f"CAST({ts_col} >= CAST({sql_lit(split)} AS TIMESTAMP) "
         f"AS INT)")
    t = f"CAST({variant_col} = {sql_lit(treatment)} AS INT)"

    def cell(pt: int, tt: int, tag: str) -> str:
        m = f"CAST({p} = {pt} AND {t} = {tt} AS INT)"
        return (f"sum({m}) AS n{tag}, sum({m} * {y}) AS s{tag}, "
                f"sum({m} * {y} * {y}) AS ss{tag}")

    cells = ", ".join([cell(0, 0, "_pre_c"), cell(1, 0, "_post_c"),
                       cell(0, 1, "_pre_t"), cell(1, 1, "_post_t")])

    def st(tag: str) -> "tuple[str, str, str]":
        n = f"CAST(n{tag} AS DOUBLE)"
        mean = f"(s{tag} / nullif({n}, 0))"
        var = (f"((ss{tag} - {n} * {mean} * {mean})"
               f" / nullif({n} - 1, 0))")
        return n, mean, var

    npc, mpc, vpc = st("_pre_c")
    noc, moc, voc = st("_post_c")
    npt, mpt, vpt = st("_pre_t")
    nott, mot, vot = st("_post_t")
    dc = f"({moc} - {mpc})"
    dt = f"({mot} - {mpt})"
    did = f"({dt} - {dc})"
    se = (f"sqrt({vpc} / nullif({npc}, 0) + {voc} / nullif({noc}, 0)"
          f" + {vpt} / nullif({npt}, 0) + {vot} / nullif({nott}, 0))")
    return f"""
WITH agg AS (
  SELECT {gsel}{cells}
  FROM {table}
  WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
    AND {value_col} IS NOT NULL
  {gkey}
)
SELECT {gsel}
       CAST(n_pre_c AS BIGINT) AS n_pre_c,
       CAST(n_post_c AS BIGINT) AS n_post_c,
       CAST(n_pre_t AS BIGINT) AS n_pre_t,
       CAST(n_post_t AS BIGINT) AS n_post_t,
       round({dc}, {round_dp}) + 0.0 AS diff_control,
       round({dt}, {round_dp}) + 0.0 AS diff_treatment,
       round({did}, {round_dp}) + 0.0 AS did,
       round({se}, {round_dp}) AS se,
       round(CASE WHEN {se} > 0 THEN {did} / {se} END, {round_dp})
         + 0.0 AS z,
       coalesce(abs(round(CASE WHEN {se} > 0 THEN {did} / {se} END,
                          {round_dp})) >= {float(z_alpha)!r}, FALSE)
         AS significant
FROM agg
"""


def ab_group_sequential(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    ts_col: str,
    control: str,
    treatment: str,
    looks: "list[str]",
    z_final: float = 1.959963984540054,
    boundary: str = "obf",
    round_dp: int = 4,
) -> DataFrame:
    """(look, look_date, n_control, n_treatment, diff, z, z_boundary,
    significant) — group-sequential monitoring at PLANNED interim
    looks (the third leg of the peeking triad: fixed-horizon Welch
    for one look, mSPRT for continuous dashboards, this for K
    scheduled analyses): at each look the cumulative-data z is
    compared against an inflated boundary —
      obf:    z_final·√(K/k)  (O'Brien & Fleming 1979 approximation —
                               very conservative early, ≈ z_final at
                               the final look)
      pocock: the flat classic tabled constant c(K) at overall
              two-sided α = 0.05 (Pocock 1977), K ≤ 10, embedded.
    Cumulative cells for ALL K looks come from ONE conditional-sum
    scan (K·6 aggregates in a single map-side agg — no per-look
    pass); boundaries are repr-embedded Python constants."""
    import math
    if not looks:
        raise ValueError("looks must be non-empty")
    if boundary not in ("obf", "pocock"):
        raise ValueError("boundary must be 'obf' or 'pocock'")
    K = len(looks)
    # Pocock constant c(K) at overall alpha=.05, two-sided — the
    # classic table (Pocock 1977); K>10 unsupported.
    _POCOCK = {1: 1.960, 2: 2.178, 3: 2.289, 4: 2.361, 5: 2.413,
               6: 2.453, 7: 2.485, 8: 2.512, 9: 2.535, 10: 2.555}
    if boundary == "pocock" and K > 10:
        raise ValueError("pocock table covers K <= 10")
    # The Pocock table is hard-wired to overall two-sided alpha=0.05;
    # z_final only parameterizes the obf boundary. Combining them
    # would silently ignore the caller's alpha intent (ADVICE r12) —
    # refuse instead of guessing.
    if boundary == "pocock" and abs(float(z_final)
                                    - 1.959963984540054) > 1e-9:
        raise ValueError(
            "boundary='pocock' uses the fixed alpha=0.05 table; "
            "z_final only affects boundary='obf' — pass the default "
            "z_final or use the obf boundary")
    y = F.col(value_col).cast("double")
    t = (F.col(variant_col) == treatment).cast("int")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & y.isNotNull())
            .select(y.alias("__y"), t.alias("__t"),
                    F.col(ts_col).alias("__ts")))
    aggs = []
    for k, d in enumerate(looks):
        m = (F.col("__ts") < F.to_timestamp(F.lit(d))).cast("int")
        tag = str(k)
        aggs += [
            F.sum(m * (1 - F.col("__t"))).alias("n0_" + tag),
            F.sum(m * F.col("__t")).alias("n1_" + tag),
            F.sum(m * (1 - F.col("__t")) * F.col("__y"))
            .alias("s0_" + tag),
            F.sum(m * F.col("__t") * F.col("__y")).alias("s1_" + tag),
            F.sum(m * (1 - F.col("__t")) * F.col("__y")
                  * F.col("__y")).alias("q0_" + tag),
            F.sum(m * F.col("__t") * F.col("__y") * F.col("__y"))
            .alias("q1_" + tag),
        ]
    one = base.agg(*aggs)
    rows = []
    for k, d in enumerate(looks):
        tag = str(k)
        if boundary == "obf":
            b = float(z_final) * math.sqrt(K / (k + 1))
        else:
            b = _POCOCK[K]
        n0 = F.col("n0_" + tag).cast("double")
        n1 = F.col("n1_" + tag).cast("double")
        m0 = F.try_divide(F.col("s0_" + tag), n0)
        m1 = F.try_divide(F.col("s1_" + tag), n1)
        v0 = F.try_divide(F.col("q0_" + tag) - n0 * m0 * m0,
                          n0 - F.lit(1.0))
        v1 = F.try_divide(F.col("q1_" + tag) - n1 * m1 * m1,
                          n1 - F.lit(1.0))
        se = F.sqrt(F.try_divide(v0, n0) + F.try_divide(v1, n1))
        z = F.when(se > 0, (m1 - m0) / se)
        zr = dround(z, round_dp) + F.lit(0.0)
        rows.append(F.struct(
            F.lit(k + 1).alias("look"),
            F.lit(d).alias("look_date"),
            F.col("n0_" + tag).cast("long").alias("n_control"),
            F.col("n1_" + tag).cast("long").alias("n_treatment"),
            (dround(m1 - m0, round_dp) + F.lit(0.0)).alias("diff"),
            zr.alias("z"),
            F.lit(round(b, round_dp)).alias("z_boundary"),
            F.coalesce(F.abs(zr) >= F.lit(round(b, round_dp)),
                       F.lit(False)).alias("significant")))
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.*"))


def ab_group_sequential_sql(
    table: str,
    variant_col: str,
    value_col: str,
    ts_col: str,
    control: str,
    treatment: str,
    looks: "list[str]",
    z_final: float = 1.959963984540054,
    boundary: str = "obf",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_group_sequential (same one-scan conditional
    sums, same repr-embedded boundaries, UNION ALL per look)."""
    import math
    if not looks:
        raise ValueError("looks must be non-empty")
    if boundary not in ("obf", "pocock"):
        raise ValueError("boundary must be 'obf' or 'pocock'")
    K = len(looks)
    _POCOCK = {1: 1.960, 2: 2.178, 3: 2.289, 4: 2.361, 5: 2.413,
               6: 2.453, 7: 2.485, 8: 2.512, 9: 2.535, 10: 2.555}
    if boundary == "pocock" and K > 10:
        raise ValueError("pocock table covers K <= 10")
    # The Pocock table is hard-wired to overall two-sided alpha=0.05;
    # z_final only parameterizes the obf boundary. Combining them
    # would silently ignore the caller's alpha intent (ADVICE r12) —
    # refuse instead of guessing.
    if boundary == "pocock" and abs(float(z_final)
                                    - 1.959963984540054) > 1e-9:
        raise ValueError(
            "boundary='pocock' uses the fixed alpha=0.05 table; "
            "z_final only affects boundary='obf' — pass the default "
            "z_final or use the obf boundary")
    y = f"CAST({value_col} AS DOUBLE)"
    t = f"CAST({variant_col} = {sql_lit(treatment)} AS INT)"
    aggs = []
    for k, d in enumerate(looks):
        m = (f"CAST({ts_col} < CAST({sql_lit(d)} AS TIMESTAMP) "
             f"AS INT)")
        aggs += [
            f"sum({m} * (1 - {t})) AS n0_{k}",
            f"sum({m} * {t}) AS n1_{k}",
            f"sum({m} * (1 - {t}) * {y}) AS s0_{k}",
            f"sum({m} * {t} * {y}) AS s1_{k}",
            f"sum({m} * (1 - {t}) * {y} * {y}) AS q0_{k}",
            f"sum({m} * {t} * {y} * {y}) AS q1_{k}",
        ]
    arms = []
    for k, d in enumerate(looks):
        if boundary == "obf":
            b = round(float(z_final) * math.sqrt(K / (k + 1)),
                      round_dp)
        else:
            b = round(_POCOCK[K], round_dp)
        n0 = f"CAST(n0_{k} AS DOUBLE)"
        n1 = f"CAST(n1_{k} AS DOUBLE)"
        m0 = f"(s0_{k} / nullif({n0}, 0))"
        m1 = f"(s1_{k} / nullif({n1}, 0))"
        v0 = (f"((q0_{k} - {n0} * {m0} * {m0})"
              f" / nullif({n0} - 1.0, 0))")
        v1 = (f"((q1_{k} - {n1} * {m1} * {m1})"
              f" / nullif({n1} - 1.0, 0))")
        se = (f"sqrt({v0} / nullif({n0}, 0)"
              f" + {v1} / nullif({n1}, 0))")
        z = f"CASE WHEN {se} > 0 THEN ({m1} - {m0}) / {se} END"
        arms.append(f"""
  SELECT {k + 1} AS look, {sql_lit(d)} AS look_date,
         CAST(n0_{k} AS BIGINT) AS n_control,
         CAST(n1_{k} AS BIGINT) AS n_treatment,
         round({m1} - {m0}, {round_dp}) + 0.0 AS diff,
         round({z}, {round_dp}) + 0.0 AS z,
         CAST({b!r} AS DOUBLE) AS z_boundary,
         coalesce(abs(round({z}, {round_dp}))
                  >= CAST({b!r} AS DOUBLE), FALSE) AS significant
  FROM one""")
    return (f"WITH one AS (SELECT {', '.join(aggs)} FROM {table} "
            f"WHERE {variant_col} IN ({sql_lit(control)}, "
            f"{sql_lit(treatment)}) AND {value_col} IS NOT NULL) "
            + " UNION ALL ".join(arms))


def ab_odds_ratio(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., s_control, f_control, s_treatment, f_treatment,
    odds_ratio, log_or, ci_low, ci_high, relative_risk,
    significant) — the epidemiology-style 2×2 readout beside
    ab_proportion_test's z: odds ratio with the Woolf log-scale CI
    (SE = √(1/a + 1/b + 1/c + 1/d)) and relative risk. OR is the
    effect measure that stays interpretable at very small rates
    (where lift percentages mislead) and composes across strata.
    Haldane–Anscombe 0.5 correction applied to EVERY cell whenever
    ANY cell is zero (the standard convention — keeps OR finite and
    the CI defined); `significant` = CI excludes 1. One
    conditional-sum scan."""
    gb = list(group_by or [])
    s = F.col(success_col).cast("int")
    t = (F.col(variant_col) == treatment).cast("int")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & s.isNotNull())
            .select(*gb, s.alias("__s"), t.alias("__t")))
    agg = base.groupBy(*gb).agg(
        F.sum(F.col("__s") * F.col("__t")).alias("a"),
        F.sum((1 - F.col("__s")) * F.col("__t")).alias("b"),
        F.sum(F.col("__s") * (1 - F.col("__t"))).alias("c"),
        F.sum((1 - F.col("__s")) * (1 - F.col("__t"))).alias("d"))
    any_zero = ((F.col("a") == 0) | (F.col("b") == 0)
                | (F.col("c") == 0) | (F.col("d") == 0))
    corr = F.when(any_zero, F.lit(0.5)).otherwise(F.lit(0.0))
    a = F.col("a").cast("double") + corr
    b = F.col("b").cast("double") + corr
    c = F.col("c").cast("double") + corr
    d = F.col("d").cast("double") + corr
    orr = (a * d) / (b * c)
    lor = F.log(orr)
    se = F.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    za = F.lit(float(z_alpha))
    lo = F.exp(lor - za * se)
    hi = F.exp(lor + za * se)
    rr = F.try_divide(a / (a + b), c / (c + d))
    lor_r = dround(lor, round_dp)
    lo_r = dround(lo, round_dp)
    hi_r = dround(hi, round_dp)
    return agg.select(
        *gb,
        c.alias("s_control"),
        d.alias("f_control"),
        a.alias("s_treatment"),
        b.alias("f_treatment"),
        dround(orr, round_dp).alias("odds_ratio"),
        lor_r.alias("log_or"),
        lo_r.alias("ci_low"),
        hi_r.alias("ci_high"),
        dround(rr, round_dp).alias("relative_risk"),
        F.coalesce((lo_r > 1.0) | (hi_r < 1.0), F.lit(False))
        .alias("significant"))


def ab_odds_ratio_sql(
    table: str,
    variant_col: str,
    success_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_odds_ratio (same 2×2 cells, same
    correction, same Woolf CI expression order)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    s = f"CAST({success_col} AS INT)"
    t = f"CAST({variant_col} = {sql_lit(treatment)} AS INT)"
    za = repr(float(z_alpha))
    return f"""
WITH agg AS (
  SELECT {gsel}
         sum({s} * {t}) AS a, sum((1 - {s}) * {t}) AS b,
         sum({s} * (1 - {t})) AS c, sum((1 - {s}) * (1 - {t})) AS d
  FROM {table}
  WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
    AND {success_col} IS NOT NULL
  {gkey}
),
calc AS (
  SELECT *,
         CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
              THEN 0.5 ELSE 0.0 END AS corr
  FROM agg
),
vals AS (
  SELECT *,
         CAST(a AS DOUBLE) + corr AS ax,
         CAST(b AS DOUBLE) + corr AS bx,
         CAST(c AS DOUBLE) + corr AS cx,
         CAST(d AS DOUBLE) + corr AS dx
  FROM calc
),
orx AS (
  SELECT *,
         (ax * dx) / (bx * cx) AS orr,
         ln((ax * dx) / (bx * cx)) AS lor,
         sqrt(1 / ax + 1 / bx + 1 / cx + 1 / dx) AS se
  FROM vals
)
SELECT {gsel}
       cx AS s_control, dx AS f_control,
       ax AS s_treatment, bx AS f_treatment,
       round(orr, {round_dp}) AS odds_ratio,
       round(lor, {round_dp}) AS log_or,
       round(exp(lor - {za} * se), {round_dp}) AS ci_low,
       round(exp(lor + {za} * se), {round_dp}) AS ci_high,
       round((ax / (ax + bx)) / nullif(cx / (cx + dx), 0),
             {round_dp}) AS relative_risk,
       coalesce(round(exp(lor - {za} * se), {round_dp}) > 1.0
                OR round(exp(lor + {za} * se), {round_dp}) < 1.0,
                FALSE) AS significant
FROM orx
"""


def eb_shrunk_rates(
    df: DataFrame,
    segment_col: str,
    success_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """(segment, n, successes, raw_rate, shrunk_rate, alpha0,
    beta0) — empirical-Bayes shrinkage of per-segment success rates
    under a beta-binomial prior fit by method of moments on the
    segment rates (Robinson's batting-average construction): the
    leaderboard fix for "a segment with 2/2 conversions outranks one
    with 180/200". shrunk = (s + α₀)/(n + α₀ + β₀): thin segments
    pull hard toward the pooled mean, thick segments barely move.

    Moment fit: m = mean of raw rates, v = their sample variance
    (both as segment-ordered left folds over the bounded segment
    list — the cross-strata discipline); α₀ = m·(m(1−m)/v − 1),
    β₀ = (1−m)·(m(1−m)/v − 1). Degenerate fits (fewer than 2
    segments, v = 0, or v ≥ m(1−m) — overdispersion the beta prior
    can't express) emit NULL α₀/β₀ and shrunk = raw (no shrinkage
    is the honest fallback). One map-side aggregate + one broadcast
    of the 1-row prior."""
    seg = F.coalesce(F.col(segment_col).cast("string"), F.lit("∅"))
    s = F.col(success_col).cast("int")
    per = (df.filter(s.isNotNull())
           .groupBy(seg.alias("segment"))
           .agg(F.count("*").alias("n"),
                F.sum(s).alias("successes")))
    per = per.withColumn(
        "raw_rate",
        F.col("successes").cast("double") / F.col("n").cast("double"))
    term = F.struct("segment", "raw_rate")
    one = (per.withColumn("__t", term)
           .agg(F.count("*").alias("k"),
                F.expr("aggregate(array_sort(collect_list(__t)),"
                       " CAST(0.0 AS DOUBLE),"
                       " (acc, x) -> acc + x.raw_rate)").alias("sr"),
                F.expr("aggregate(array_sort(collect_list(__t)),"
                       " CAST(0.0 AS DOUBLE), (acc, x) -> acc"
                       " + x.raw_rate * x.raw_rate)").alias("srr")))
    kd = F.col("k").cast("double")
    m = F.col("sr") / kd
    v = F.when(F.col("k") >= 2,
               (F.col("srr") - kd * m * m) / (kd - F.lit(1.0)))
    scale = F.when((v > 0) & (v < m * (1 - m)),
                   m * (1 - m) / v - F.lit(1.0))
    prior = one.select(
        (m * scale).alias("alpha0"),
        ((F.lit(1.0) - m) * scale).alias("beta0"))
    j = per.crossJoin(prior)
    shrunk = F.when(
        F.col("alpha0").isNotNull(),
        (F.col("successes").cast("double") + F.col("alpha0"))
        / (F.col("n").cast("double") + F.col("alpha0")
           + F.col("beta0"))).otherwise(F.col("raw_rate"))
    return j.select(
        "segment", "n", "successes",
        dround(F.col("raw_rate"), round_dp).alias("raw_rate"),
        dround(shrunk, round_dp).alias("shrunk_rate"),
        dround(F.col("alpha0"), round_dp).alias("alpha0"),
        dround(F.col("beta0"), round_dp).alias("beta0"))


def eb_shrunk_rates_sql(
    table: str,
    segment_col: str,
    success_col: str,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of eb_shrunk_rates (same segment-ordered moment
    folds via single-field list_reduce, same degenerate fallbacks)."""
    s = f"CAST({success_col} AS INT)"
    return f"""
WITH per AS (
  SELECT coalesce(CAST({segment_col} AS VARCHAR), '∅') AS segment,
         count(*) AS n, sum({s}) AS successes
  FROM {table} WHERE {success_col} IS NOT NULL
  GROUP BY 1
),
rates AS (
  SELECT *, CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
    AS raw_rate FROM per
),
one AS (
  SELECT count(*) AS k,
         list_reduce(list(raw_rate ORDER BY segment),
                     (a, b) -> a + b) AS sr,
         list_reduce(list(raw_rate * raw_rate ORDER BY segment),
                     (a, b) -> a + b) AS srr
  FROM rates
),
prior AS (
  SELECT CASE WHEN v IS NOT NULL AND v > 0 AND v < m * (1 - m)
              THEN m * (m * (1 - m) / v - 1.0) END AS alpha0,
         CASE WHEN v IS NOT NULL AND v > 0 AND v < m * (1 - m)
              THEN (1.0 - m) * (m * (1 - m) / v - 1.0) END AS beta0
  FROM (
    SELECT sr / CAST(k AS DOUBLE) AS m,
           CASE WHEN k >= 2
                THEN (srr - CAST(k AS DOUBLE)
                            * (sr / CAST(k AS DOUBLE))
                            * (sr / CAST(k AS DOUBLE)))
                     / (CAST(k AS DOUBLE) - 1.0) END AS v
    FROM one
  )
)
SELECT segment, n, CAST(successes AS BIGINT) AS successes,
       round(raw_rate, {round_dp}) AS raw_rate,
       round(CASE WHEN alpha0 IS NOT NULL
                  THEN (CAST(successes AS DOUBLE) + alpha0)
                       / (CAST(n AS DOUBLE) + alpha0 + beta0)
                  ELSE raw_rate END, {round_dp}) AS shrunk_rate,
       round(alpha0, {round_dp}) AS alpha0,
       round(beta0, {round_dp}) AS beta0
FROM rates CROSS JOIN prior
"""


def ab_paired_t(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    ts_col: str,
    split: str,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_units, mean_pre, mean_post, mean_diff, t,
    significant) — paired (one-sample) t-test on per-unit pre→post
    changes across `split`: each unit's own pre mean is its control,
    which removes between-unit variance entirely — the
    launch-readout for rollouts WITHOUT a concurrent control arm
    (where DID is impossible and a raw pre/post comparison conflates
    unit mix). Only units observed on BOTH sides enter; t = mean(d)
    / (sd(d)/√n) on the per-unit differences d_i = post̄_i − prē_i.

    Two-level aggregate: unit-level conditional sums first (one
    map-side scan), then the unit-collapsed table (one row per unit)
    feeds the global moments — the shuffle carries units, never
    events. Fewer than 2 paired units or zero variance emit NULL t."""
    gb = list(group_by or [])
    y = F.col(value_col).cast("double")
    post = (F.col(ts_col) >= F.to_timestamp(F.lit(split))) \
        .cast("int")
    base = (df.filter(y.isNotNull())
            .select(*gb, F.col(unit_col).alias("__u"),
                    y.alias("__y"), post.alias("__p")))
    per_u = (base.groupBy(*gb, "__u")
             .agg(F.sum(1 - F.col("__p")).alias("npre"),
                  F.sum("__p").alias("npost"),
                  F.sum(F.col("__y") * (1 - F.col("__p")))
                  .alias("spre"),
                  F.sum(F.col("__y") * F.col("__p")).alias("spost"))
             .filter((F.col("npre") > 0) & (F.col("npost") > 0)))
    mpre = F.col("spre") / F.col("npre").cast("double")
    mpost = F.col("spost") / F.col("npost").cast("double")
    d = mpost - mpre
    agg = (per_u.select(*gb, mpre.alias("__mp"),
                        mpost.alias("__mq"), d.alias("__d"))
           .groupBy(*gb)
           .agg(F.count("*").alias("n_units"),
                F.sum("__mp").alias("smp"),
                F.sum("__mq").alias("smq"),
                F.sum("__d").alias("sd_"),
                F.sum(F.col("__d") * F.col("__d")).alias("sdd")))
    n = F.col("n_units").cast("double")
    md = F.col("sd_") / n
    var = F.when(F.col("n_units") >= 2,
                 (F.col("sdd") - n * md * md) / (n - F.lit(1.0)))
    se = F.sqrt(F.try_divide(var, n))
    t = F.when(se > 0, md / se)
    tr = dround(t, round_dp) + F.lit(0.0)
    return agg.select(
        *gb, "n_units",
        dround(F.col("smp") / n, round_dp).alias("mean_pre"),
        dround(F.col("smq") / n, round_dp).alias("mean_post"),
        (dround(md, round_dp) + F.lit(0.0)).alias("mean_diff"),
        tr.alias("t"),
        F.coalesce(F.abs(tr) >= F.lit(float(t_alpha)), F.lit(False))
        .alias("significant"))


def ab_paired_t_sql(
    table: str,
    unit_col: str,
    value_col: str,
    ts_col: str,
    split: str,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_paired_t (same two-level aggregate, same
    expression order)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    y = f"CAST({value_col} AS DOUBLE)"
    p = (f"CAST({ts_col} >= CAST({sql_lit(split)} AS TIMESTAMP) "
         f"AS INT)")
    return f"""
WITH per_u AS (
  SELECT {gsel}{unit_col} AS u,
         sum(1 - {p}) AS npre, sum({p}) AS npost,
         sum({y} * (1 - {p})) AS spre, sum({y} * {p}) AS spost
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY {gsel.rstrip(', ') + (',' if gb else '')} {unit_col}
),
paired AS (
  SELECT {gsel}
         spre / CAST(npre AS DOUBLE) AS mp,
         spost / CAST(npost AS DOUBLE) AS mq,
         spost / CAST(npost AS DOUBLE)
           - spre / CAST(npre AS DOUBLE) AS d
  FROM per_u WHERE npre > 0 AND npost > 0
),
agg AS (
  SELECT {gsel}count(*) AS n_units, sum(mp) AS smp, sum(mq) AS smq,
         sum(d) AS sd_, sum(d * d) AS sdd
  FROM paired
  {gkey}
),
calc AS (
  SELECT *,
         CAST(n_units AS DOUBLE) AS nd,
         sd_ / CAST(n_units AS DOUBLE) AS md
  FROM agg
),
tc AS (
  SELECT *,
         CASE WHEN n_units >= 2 THEN
           sqrt(((sdd - nd * md * md) / (nd - 1.0)) / nd) END AS se
  FROM calc
)
SELECT {gsel}n_units,
       round(smp / nd, {round_dp}) AS mean_pre,
       round(smq / nd, {round_dp}) AS mean_post,
       round(md, {round_dp}) + 0.0 AS mean_diff,
       round(CASE WHEN se > 0 THEN md / se END, {round_dp}) + 0.0 AS t,
       coalesce(abs(round(CASE WHEN se > 0 THEN md / se END,
                          {round_dp})) >= {float(t_alpha)!r}, FALSE)
         AS significant
FROM tc
"""


def ab_mh_odds_ratio(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    strata_cols: "list[str]",
    control: str,
    treatment: str,
    round_dp: int = 4,
) -> DataFrame:
    """(n_strata, n_rows, or_crude, or_mh) — Mantel–Haenszel pooled
    odds ratio across strata (Mantel & Haenszel 1959):
    OR_MH = Σ_s (a_s·d_s/n_s) / Σ_s (b_s·c_s/n_s) — the
    confounding-aware pooling whose divergence from the crude
    (collapsed-table) OR is the classic Simpson's-paradox tell.
    Strata where n_s = 0 cannot occur; strata with zero b·c AND
    zero a·d contribute nothing (standard). Cross-strata sums are
    strata-ordered left folds (the house discipline); cells are
    exact integers so each stratum term is one exact-rational
    division."""
    if not strata_cols:
        raise ValueError("strata_cols must be non-empty")
    s = F.col(success_col).cast("int")
    t = (F.col(variant_col) == treatment).cast("int")
    base = (df.filter(F.col(variant_col).isin(control, treatment)
                      & s.isNotNull())
            .select(*strata_cols, s.alias("__s"), t.alias("__t")))
    per = base.groupBy(*strata_cols).agg(
        F.sum(F.col("__s") * F.col("__t")).alias("a"),
        F.sum((1 - F.col("__s")) * F.col("__t")).alias("b"),
        F.sum(F.col("__s") * (1 - F.col("__t"))).alias("c"),
        F.sum((1 - F.col("__s")) * (1 - F.col("__t"))).alias("d"))
    nt = (F.col("a") + F.col("b") + F.col("c") + F.col("d")) \
        .cast("double")
    term = F.struct(
        *[F.col(c).cast("string").alias(f"k{i}")
          for i, c in enumerate(strata_cols)],
        (F.col("a").cast("double") * F.col("d").cast("double") / nt)
        .alias("num"),
        (F.col("b").cast("double") * F.col("c").cast("double") / nt)
        .alias("den"),
        F.col("a").alias("ra"), F.col("b").alias("rb"),
        F.col("c").alias("rc"), F.col("d").alias("rd"))
    one = (per.withColumn("__term", term)
           .agg(F.count("*").alias("n_strata"),
                F.sum(F.col("a") + F.col("b") + F.col("c")
                      + F.col("d")).alias("n_rows"),
                F.sum("a").alias("ta"), F.sum("b").alias("tb"),
                F.sum("c").alias("tc"), F.sum("d").alias("td"),
                F.expr("aggregate(array_sort(collect_list(__term)),"
                       " CAST(0.0 AS DOUBLE),"
                       " (acc, x) -> acc + x.num)").alias("mh_num"),
                F.expr("aggregate(array_sort(collect_list(__term)),"
                       " CAST(0.0 AS DOUBLE),"
                       " (acc, x) -> acc + x.den)").alias("mh_den")))
    crude = F.try_divide(
        F.col("ta").cast("double") * F.col("td").cast("double"),
        F.col("tb").cast("double") * F.col("tc").cast("double"))
    mh = F.try_divide(F.col("mh_num"), F.col("mh_den"))
    return one.select(
        "n_strata",
        F.col("n_rows").cast("long").alias("n_rows"),
        dround(crude, round_dp).alias("or_crude"),
        dround(mh, round_dp).alias("or_mh"))


def ab_mh_odds_ratio_sql(
    table: str,
    variant_col: str,
    success_col: str,
    strata_cols: "list[str]",
    control: str,
    treatment: str,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_mh_odds_ratio (same per-stratum exact
    cells, same strata-ordered single-field folds)."""
    if not strata_cols:
        raise ValueError("strata_cols must be non-empty")
    sc = ", ".join(strata_cols)
    s = f"CAST({success_col} AS INT)"
    t = f"CAST({variant_col} = {sql_lit(treatment)} AS INT)"
    okey = ", ".join(f"CAST({c} AS VARCHAR)" for c in strata_cols)
    return f"""
WITH per AS (
  SELECT {sc},
         sum({s} * {t}) AS a, sum((1 - {s}) * {t}) AS b,
         sum({s} * (1 - {t})) AS c, sum((1 - {s}) * (1 - {t})) AS d
  FROM {table}
  WHERE {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
    AND {success_col} IS NOT NULL
  GROUP BY {sc}
),
one AS (
  SELECT count(*) AS n_strata, sum(a + b + c + d) AS n_rows,
         sum(a) AS ta, sum(b) AS tb, sum(c) AS tc, sum(d) AS td,
         list_reduce(list(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                          / CAST(a + b + c + d AS DOUBLE)
                          ORDER BY {okey}),
                     (x, y) -> x + y) AS mh_num,
         list_reduce(list(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                          / CAST(a + b + c + d AS DOUBLE)
                          ORDER BY {okey}),
                     (x, y) -> x + y) AS mh_den
  FROM per
)
SELECT n_strata, CAST(n_rows AS BIGINT) AS n_rows,
       round(CAST(ta AS DOUBLE) * CAST(td AS DOUBLE)
             / nullif(CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE), 0),
             {round_dp}) AS or_crude,
       round(mh_num / nullif(mh_den, 0), {round_dp}) AS or_mh
FROM one
"""


def ca_trend_test(
    df: DataFrame,
    dose_col: str,
    success_col: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n, successes, n_doses, z, significant) — the
    Cochran-Armitage test for TREND in proportions across ordered
    exposure levels (Cochran 1954; Armitage 1955): K-arm chi-square
    asks "are the rates different anywhere"; this asks the sharper
    dose-response question "do rates rise/fall WITH the level" —
    price tiers, exposure counts, bucketed tenure. One conditional-
    sum scan, the ab_proportion_test posture.

    With integer dose scores every sufficient statistic is an exact
    integer (Σwr, Σwn, Σw², R, N), accumulated as decimal(38,0) /
    HUGEINT since r15 (the kruskal_wallis discipline — an int64 Σw²
    would silently wrap for callers using large raw scores as doses,
    where DuckDB's BIGINT sum raises instead); the closing scalar
    chain

        z = (N·Σwr − R·Σwn) / sqrt(R·(N−R)·(N·Σw² − (Σw)²) / N)

    is spelled factor-for-factor identically in the twin — each
    exact integer promotes to double at the SAME point on both
    engines, so the chain stays deterministic at 10¹²-row scale.
    `dose_col` must be numeric; it is cast to long (the ORDERED
    integer scores w_k — the standard 0..K−1 spacing is the caller's
    choice of column). NULL dose/outcome rows are excluded. z is
    NULL when the variance term is 0 (all one dose, or R ∈ {0, N});
    sign(z) > 0 means the rate RISES with the dose score."""
    gb = list(group_by or [])
    w = F.col(dose_col).cast("long")
    s = F.col(success_col).cast("int")
    base = (df.filter(w.isNotNull() & s.isNotNull())
            .select(*gb, w.alias("__w"), s.alias("__s")))
    agg = (base.groupBy(*gb)
           .agg(F.count("*").alias("n"),
                F.sum("__s").alias("successes"),
                F.countDistinct("__w").alias("n_doses"),
                # widen EACH operand before the multiply (the __ww
                # discipline; the twin computes CAST(w AS HUGEINT)*s
                # exactly — an int64 w*s product would wrap per-row
                # for large raw dose scores before the cast applies)
                F.sum(F.col("__w").cast("decimal(38,0)")
                      * F.col("__s").cast("decimal(38,0)"))
                .alias("__wr"),
                F.sum(F.col("__w").cast("decimal(38,0)"))
                .alias("__wn"),
                F.sum(F.col("__w").cast("decimal(38,0)")
                      * F.col("__w").cast("decimal(38,0)"))
                .alias("__ww")))
    nd = F.col("n").cast("double")
    rd = F.col("successes").cast("double")
    num = nd * F.col("__wr").cast("double") \
        - rd * F.col("__wn").cast("double")
    var = (rd * (nd - rd)
           * (nd * F.col("__ww").cast("double")
              - F.col("__wn").cast("double")
              * F.col("__wn").cast("double"))
           / nd)
    # + 0.0: signed-zero normalization (see kruskal_wallis note) —
    # a tiny-negative trend rounds to -0.0 on one engine, 0.0 on the
    # other; same IEEE value, different serialized bytes.
    z = F.when(var > 0,
               dround(num / F.sqrt(var), round_dp) + F.lit(0.0))
    return agg.select(
        *gb, "n",
        F.col("successes").cast("long").alias("successes"),
        F.col("n_doses").cast("long").alias("n_doses"),
        z.alias("z"),
        F.coalesce(F.abs(z) >= F.lit(float(z_alpha)), F.lit(False))
        .alias("significant"))


def ca_trend_test_sql(
    table: str,
    dose_col: str,
    success_col: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ca_trend_test (same exact-integer sufficient
    statistics, same factor-for-factor closing chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({dose_col} AS BIGINT) AS w,
         CAST({success_col} AS INT) AS s
  FROM {table}
  WHERE {dose_col} IS NOT NULL AND {success_col} IS NOT NULL
),
agg AS (
  SELECT {gsel}count(*) AS n,
         CAST(sum(s) AS BIGINT) AS successes,
         count(DISTINCT w) AS n_doses,
         CAST(sum(CAST(w AS HUGEINT) * s) AS HUGEINT) AS wr,
         CAST(sum(CAST(w AS HUGEINT)) AS HUGEINT) AS wn,
         CAST(sum(CAST(w AS HUGEINT) * CAST(w AS HUGEINT))
              AS HUGEINT) AS ww
  FROM base {gkey}
)
SELECT {gsel}n, successes, n_doses,
       CASE WHEN successes::DOUBLE * (n::DOUBLE - successes::DOUBLE)
                 * (n::DOUBLE * ww::DOUBLE
                    - wn::DOUBLE * wn::DOUBLE) / n::DOUBLE > 0
            THEN round((n::DOUBLE * wr::DOUBLE
                        - successes::DOUBLE * wn::DOUBLE)
                       / sqrt(successes::DOUBLE
                              * (n::DOUBLE - successes::DOUBLE)
                              * (n::DOUBLE * ww::DOUBLE
                                 - wn::DOUBLE * wn::DOUBLE)
                              / n::DOUBLE), {round_dp})
       END + 0.0 AS z,
       coalesce(abs(CASE WHEN successes::DOUBLE
                              * (n::DOUBLE - successes::DOUBLE)
                              * (n::DOUBLE * ww::DOUBLE
                                 - wn::DOUBLE * wn::DOUBLE)
                              / n::DOUBLE > 0
                         THEN round((n::DOUBLE * wr::DOUBLE
                                     - successes::DOUBLE * wn::DOUBLE)
                                    / sqrt(successes::DOUBLE
                                           * (n::DOUBLE
                                              - successes::DOUBLE)
                                           * (n::DOUBLE * ww::DOUBLE
                                              - wn::DOUBLE
                                                * wn::DOUBLE)
                                           / n::DOUBLE), {round_dp})
                    END) >= {float(z_alpha)!r}, FALSE) AS significant
FROM agg
"""


def ab_brown_forsythe(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """(group..., n_control, n_treatment, med_control, med_treatment,
    t, significant) — the Brown-Forsythe scale test (Brown &
    Forsythe 1974): did the treatment change the SPREAD, not the
    mean — tail-risk regressions (latency p99 blowups, revenue
    volatility) that every mean-based readout in this module is
    blind to. Levene's classic with MEDIAN centers (the robust
    variant): z = |x − median(variant)|, then the Welch t on z.

    Exactness: values quantize to the 1e-6 integer grid; each
    variant's median is the LOWER median (smallest value whose
    cumulative count reaches ⌈n/2⌉ — a pure integer rule both
    engines spell identically, no interpolation), so every z is an
    exact integer and the Welch moments are exact decimal sums with
    the division/sqrt chain spelled once. Shuffle carries distinct
    (variant, value) pairs for the median, then one conditional-sum
    scan for the moments — never a sort of the raw data.

    METRIC CONTRACT: the 1e-6 quantized per-variant distinct-value
    collapse feeds an ordered cumulative window; `max_distinct`
    gates that collapse through guards.guard_max_distinct (the
    kruskal_wallis discipline) so an unbounded raw-float domain
    fails loud before the single-task sort materializes.
    `max_distinct=None` opts out."""
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    base = (df.filter(
        v.isNotNull()
        & F.col(variant_col).isin(control, treatment))
        .select(*gb,
                (F.col(variant_col) == treatment).cast("int")
                .alias("__g1"),
                F.round(v * 1e6).cast("long").alias("__xq")))
    per_v = (base.groupBy(*gb, "__g1", "__xq")
             .agg(F.count("*").alias("cnt")))
    per_v = guard_max_distinct(per_v, [*gb, "__g1"], max_distinct,
                               "ab_brown_forsythe")
    wv = Window.partitionBy(*gb, "__g1")
    cum = F.sum("cnt").over(
        wv.orderBy("__xq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    nv = F.sum("cnt").over(wv)
    med = (per_v
           .withColumn("__cum", cum)
           .withColumn("__nv", nv)
           .filter(F.col("__cum") * 2 >= F.col("__nv")
                   + F.pmod(F.col("__nv"), 2))
           .groupBy(*gb, "__g1")
           .agg(F.min("__xq").alias("__med")))
    z = F.abs(F.col("__xq") - F.col("__med"))
    scored = (per_v.join(med, [*gb, "__g1"])
              .select(*gb, "__g1", "cnt", "__med",
                      z.alias("__z")))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = (scored.groupBy(*gb)
           .agg(
        F.sum(F.when(F.col("__g1") == 0, F.col("cnt"))
              .otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("__g1") == 1, F.col("cnt"))
              .otherwise(0)).alias("n1"),
        F.max(F.when(F.col("__g1") == 0, F.col("__med")))
        .alias("med0"),
        F.max(F.when(F.col("__g1") == 1, F.col("__med")))
        .alias("med1"),
        F.sum(F.when(F.col("__g1") == 0,
                     dec(F.col("cnt")) * dec(F.col("__z")))
              .otherwise(F.lit(0).cast("decimal(38,0)")))
        .alias("s0"),
        F.sum(F.when(F.col("__g1") == 1,
                     dec(F.col("cnt")) * dec(F.col("__z")))
              .otherwise(F.lit(0).cast("decimal(38,0)")))
        .alias("s1"),
        F.sum(F.when(F.col("__g1") == 0,
                     dec(F.col("cnt")) * dec(F.col("__z"))
                     * dec(F.col("__z")))
              .otherwise(F.lit(0).cast("decimal(38,0)")))
        .alias("ss0"),
        F.sum(F.when(F.col("__g1") == 1,
                     dec(F.col("cnt")) * dec(F.col("__z"))
                     * dec(F.col("__z")))
              .otherwise(F.lit(0).cast("decimal(38,0)")))
        .alias("ss1")))
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    m0 = F.col("s0").cast("double") / 1e6 / n0
    m1 = F.col("s1").cast("double") / 1e6 / n1
    v0 = F.when(F.col("n0") >= 2,
                (F.col("ss0").cast("double") / 1e12
                 - n0 * m0 * m0) / (n0 - F.lit(1.0)))
    v1 = F.when(F.col("n1") >= 2,
                (F.col("ss1").cast("double") / 1e12
                 - n1 * m1 * m1) / (n1 - F.lit(1.0)))
    se = F.sqrt(v0 / n0 + v1 / n1)
    t = F.when(se > 0,
               dround((m1 - m0) / se, round_dp) + F.lit(0.0))
    return agg.select(
        *gb,
        F.col("n0").cast("long").alias("n_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        dround(F.col("med0").cast("double") / 1e6, 6)
        .alias("med_control"),
        dround(F.col("med1").cast("double") / 1e6, 6)
        .alias("med_treatment"),
        t.alias("t"),
        F.coalesce(F.abs(t) >= F.lit(float(t_alpha)), F.lit(False))
        .alias("significant"))


def ab_brown_forsythe_sql(
    table: str,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    t_alpha: float = 1.96,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_brown_forsythe (same 1e-6 grid, same lower-
    median integer rule, same exact decimal moments and spelled
    closing chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    jgb = [*gb, "g1"]
    jon = " AND ".join(f"p.{c} = m.{c}" for c in jgb)
    psel = "".join(f"p.{g}, " for g in gb)
    pgkey = ("GROUP BY " + ", ".join(f"p.{g}" for g in gb)) if gb \
        else ""
    m0 = "(s0::DOUBLE / 1e6 / n0::DOUBLE)"
    m1 = "(s1::DOUBLE / 1e6 / n1::DOUBLE)"
    v0 = (f"(CASE WHEN n0 >= 2 THEN (ss0::DOUBLE / 1e12 - n0::DOUBLE"
          f" * {m0} * {m0}) / (n0::DOUBLE - 1.0) END)")
    v1 = (f"(CASE WHEN n1 >= 2 THEN (ss1::DOUBLE / 1e12 - n1::DOUBLE"
          f" * {m1} * {m1}) / (n1::DOUBLE - 1.0) END)")
    se = f"sqrt({v0} / n0::DOUBLE + {v1} / n1::DOUBLE)"
    texpr = (f"CASE WHEN {se} > 0 THEN round(({m1} - {m0}) / {se},"
             f" {round_dp}) END")
    return f"""
WITH base AS (
  SELECT {gsel}CAST({variant_col} = {sql_lit(treatment)} AS INT)
           AS g1,
         CAST(round(CAST({value_col} AS DOUBLE) * 1e6) AS BIGINT)
           AS xq
  FROM {table}
  WHERE {value_col} IS NOT NULL
    AND {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
),
per_v AS (
  SELECT {gsel}g1, xq, count(*) AS cnt
  FROM base GROUP BY {gsel}g1, xq
),
cums AS (
  SELECT {gsel}g1, xq, cnt,
         sum(cnt) OVER (PARTITION BY {gsel}g1 ORDER BY xq
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(cnt) OVER (PARTITION BY {gsel}g1) AS nv
  FROM per_v
),
med AS (
  SELECT {gsel}g1, min(xq) AS medq
  FROM cums WHERE cum * 2 >= nv + nv % 2
  GROUP BY {gsel}g1
),
scored AS (
  SELECT {psel}p.g1, p.cnt, m.medq,
         abs(p.xq - m.medq) AS z
  FROM per_v p JOIN med m ON {jon}
),
agg AS (
  SELECT {gsel}
         CAST(sum(CASE WHEN g1 = 0 THEN cnt ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(sum(CASE WHEN g1 = 1 THEN cnt ELSE 0 END) AS BIGINT)
           AS n1,
         max(CASE WHEN g1 = 0 THEN medq END) AS med0,
         max(CASE WHEN g1 = 1 THEN medq END) AS med1,
         sum(CASE WHEN g1 = 0 THEN CAST(cnt AS HUGEINT) * z
                  ELSE 0 END) AS s0,
         sum(CASE WHEN g1 = 1 THEN CAST(cnt AS HUGEINT) * z
                  ELSE 0 END) AS s1,
         sum(CASE WHEN g1 = 0 THEN CAST(cnt AS HUGEINT) * z * z
                  ELSE 0 END) AS ss0,
         sum(CASE WHEN g1 = 1 THEN CAST(cnt AS HUGEINT) * z * z
                  ELSE 0 END) AS ss1
  FROM scored {gkey}
)
SELECT {gsel}n0 AS n_control, n1 AS n_treatment,
       round(med0::DOUBLE / 1e6, 6) AS med_control,
       round(med1::DOUBLE / 1e6, 6) AS med_treatment,
       {texpr} + 0.0 AS t,
       coalesce(abs({texpr}) >= {float(t_alpha)!r}, FALSE)
         AS significant
FROM agg
"""


def ab_mood_median(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """(group..., k_groups, n_total, n_above, median, chi2, df) —
    Mood's median test (Mood 1950): the k-sample GROSS-location
    readout — did any arm's share above the pooled median move —
    completing the robust triangle with kruskal_wallis (full rank
    information, more power) and ab_brown_forsythe (spread): Mood's
    is the right tool when the metric is heavily censored/clumped so
    even ranks are dubious, and it degrades gracefully under extreme
    ties. Each arm's (above, not-above) counts vs the POOLED lower
    median form a k×2 table; chi2 = Σ (O−E)²/E with margin-derived
    expectations, df = k−1 (compare against the caller's χ²
    critical value — the ab_anova convention, no p-value emitted).

    Exactness: values quantize to the 1e-6 integer grid; the pooled
    median is the LOWER median (the brown_forsythe integer rule —
    smallest value whose cumulative count reaches ⌈N/2⌉, no
    interpolation); every observed cell and margin is an exact
    integer; "above" means strictly > median (values equal to the
    median count below — the classic convention). The one
    cross-variant float reduction (Σ (O−E)²/E) folds in VARIANT
    order with int→double promotion at the same spelled points.
    Shuffle carries distinct values then k variant cells, never
    rows. NULL chi2 when k < 2 or either margin (above / not-above)
    is empty — i.e. every value ties at the median.

    METRIC CONTRACT: the pooled 1e-6 quantized distinct-value
    collapse feeds an ordered cumulative window; `max_distinct`
    gates that collapse through guards.guard_max_distinct (the
    kruskal_wallis discipline) so an unbounded raw-float domain
    fails loud before the single-task sort materializes.
    `max_distinct=None` opts out."""
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    base = (df.filter(v.isNotNull() & F.col(variant_col).isNotNull())
            .select(*gb,
                    F.col(variant_col).cast("string").alias("__g"),
                    F.round(v * 1e6).cast("long").alias("__xq")))
    pooled = (base.groupBy(*gb, "__xq")
              .agg(F.count("*").alias("cnt")))
    pooled = guard_max_distinct(pooled, gb, max_distinct,
                                "ab_mood_median")
    wg = Window.partitionBy(*gb) if gb else Window.partitionBy()
    cum = F.sum("cnt").over(
        wg.orderBy("__xq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    nn = F.sum("cnt").over(wg)
    med = (pooled
           .withColumn("__cum", cum)
           .withColumn("__nn", nn)
           .filter(F.col("__cum") * 2 >= F.col("__nn")
                   + F.pmod(F.col("__nn"), 2))
           .groupBy(*gb)
           .agg(F.min("__xq").alias("__med")))
    per_gv = (base.groupBy(*gb, "__g", "__xq")
              .agg(F.count("*").alias("c")))
    j = per_gv.join(med, gb) if gb \
        else per_gv.join(F.broadcast(med), F.lit(True))
    per_g = (j.groupBy(*gb, "__g")
             .agg(F.sum(F.when(F.col("__xq") > F.col("__med"),
                               F.col("c")).otherwise(0)).alias("a"),
                  F.sum("c").alias("ng"),
                  F.max("__med").alias("__med")))
    cell = F.struct(F.col("__g").alias("g"),
                    F.col("a").cast("long").alias("a"),
                    F.col("ng").cast("long").alias("n"))
    agg = (per_g.withColumn("__c", cell)
           .groupBy(*gb)
           .agg(F.count("*").alias("k_groups"),
                F.sum("ng").alias("__n"),
                F.sum("a").alias("__a"),
                F.max("__med").alias("__med"),
                F.collect_list("__c").alias("__cells")))
    chi2 = F.expr(
        "aggregate(array_sort(__cells), CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc"
        "  + (CAST(x.a AS DOUBLE)"
        "     - CAST(x.n AS DOUBLE) * CAST(__a AS DOUBLE)"
        "       / CAST(__n AS DOUBLE))"
        "    * (CAST(x.a AS DOUBLE)"
        "       - CAST(x.n AS DOUBLE) * CAST(__a AS DOUBLE)"
        "         / CAST(__n AS DOUBLE))"
        "    / (CAST(x.n AS DOUBLE) * CAST(__a AS DOUBLE)"
        "       / CAST(__n AS DOUBLE))"
        "  + (CAST(x.n - x.a AS DOUBLE)"
        "     - CAST(x.n AS DOUBLE) * CAST(__n - __a AS DOUBLE)"
        "       / CAST(__n AS DOUBLE))"
        "    * (CAST(x.n - x.a AS DOUBLE)"
        "       - CAST(x.n AS DOUBLE) * CAST(__n - __a AS DOUBLE)"
        "         / CAST(__n AS DOUBLE))"
        "    / (CAST(x.n AS DOUBLE) * CAST(__n - __a AS DOUBLE)"
        "       / CAST(__n AS DOUBLE)))")
    ok = (F.col("k_groups") >= 2) & (F.col("__a") > 0) \
        & (F.col("__a") < F.col("__n"))
    return agg.select(
        *gb,
        F.col("k_groups").cast("long").alias("k_groups"),
        F.col("__n").cast("long").alias("n_total"),
        F.col("__a").cast("long").alias("n_above"),
        dround(F.col("__med").cast("double") / 1e6, 6)
        .alias("median"),
        F.when(ok, dround(chi2, round_dp)).alias("chi2"),
        (F.col("k_groups") - F.lit(1)).cast("long").alias("df"))


def ab_mood_median_sql(
    table: str,
    variant_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ab_mood_median (same pooled lower-median
    integer rule, same exact integer cells, same variant-ordered
    (O−E)²/E fold with identical promotion points)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    jkeys = " AND ".join(f"p.{k} = m.{k}" for k in gb) if gb \
        else "TRUE"
    psel = (", ".join(f"p.{k}" for k in gb) + ", ") if gb else ""
    j2 = " AND ".join(f"p.{k} = t.{k}" for k in gb) if gb else "TRUE"
    return f"""
WITH base AS (
  SELECT {gsel}CAST({variant_col} AS VARCHAR) AS g,
         CAST(round(CAST({value_col} AS DOUBLE) * 1e6) AS BIGINT)
           AS xq
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {variant_col} IS NOT NULL
),
pooled AS (
  SELECT {gsel}xq, count(*) AS cnt FROM base GROUP BY {gsel}xq
),
med AS (
  SELECT {gsel}min(xq) AS med FROM (
    SELECT {gsel}xq,
           sum(cnt) OVER ({part} ORDER BY xq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum,
           sum(cnt) OVER ({part}) AS nn
    FROM pooled)
  WHERE cum * 2 >= nn + nn % 2 {gkey}
),
per_g AS (
  SELECT {psel}p.g,
         CAST(sum(CASE WHEN p.xq > m.med THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(count(*) AS BIGINT) AS ng,
         max(m.med) AS med
  FROM base p JOIN med m ON {jkeys}
  GROUP BY {psel}p.g
),
tot AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS k_groups,
         CAST(sum(ng) AS BIGINT) AS n_total,
         CAST(sum(a) AS BIGINT) AS n_above,
         max(med) AS med
  FROM per_g {gkey}
),
folded AS (
  SELECT {psel.replace('p.', 't.') if gb else ''}max(t.k_groups)
           AS k_groups,
         max(t.n_total) AS n_total, max(t.n_above) AS n_above,
         max(t.med) AS med,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list((CAST(p.a AS DOUBLE)
                 - CAST(p.ng AS DOUBLE) * CAST(t.n_above AS DOUBLE)
                   / CAST(t.n_total AS DOUBLE))
                * (CAST(p.a AS DOUBLE)
                   - CAST(p.ng AS DOUBLE) * CAST(t.n_above AS DOUBLE)
                     / CAST(t.n_total AS DOUBLE))
                / (CAST(p.ng AS DOUBLE) * CAST(t.n_above AS DOUBLE)
                   / CAST(t.n_total AS DOUBLE))
                + (CAST(p.ng - p.a AS DOUBLE)
                   - CAST(p.ng AS DOUBLE)
                     * CAST(t.n_total - t.n_above AS DOUBLE)
                     / CAST(t.n_total AS DOUBLE))
                  * (CAST(p.ng - p.a AS DOUBLE)
                     - CAST(p.ng AS DOUBLE)
                       * CAST(t.n_total - t.n_above AS DOUBLE)
                       / CAST(t.n_total AS DOUBLE))
                  / (CAST(p.ng AS DOUBLE)
                     * CAST(t.n_total - t.n_above AS DOUBLE)
                     / CAST(t.n_total AS DOUBLE))
                ORDER BY p.g)),
           (acc, x) -> acc + x) AS chi2raw
  FROM per_g p JOIN tot t ON {j2}
  {("GROUP BY " + ", ".join("t." + k for k in gb)) if gb else ""}
)
SELECT {gsel}k_groups, n_total, n_above,
       round(med::DOUBLE / 1e6, 6) AS median,
       CASE WHEN k_groups >= 2 AND n_above > 0
                 AND n_above < n_total
            THEN round(chi2raw, {round_dp}) END AS chi2,
       k_groups - 1 AS df
FROM folded
"""
