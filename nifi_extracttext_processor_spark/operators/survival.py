"""Kaplan-Meier survival estimation — time-to-event readouts over
user/entity durations (Kaplan & Meier 1958): retention expressed as
"probability a user is still active after t days", churn-model
baselines, content half-life. The censoring-aware complement to
sessions.cohort_retention (which counts returns per period but cannot
use still-active users' partial information) and to the A/B family
(abtest.py) whose metrics are per-exposure scalars, not durations.

    S(t) = Π_{t_i <= t} (1 − d_i / n_i)

with d_i events at distinct time t_i and n_i the at-risk count
(subjects whose duration >= t_i). Right-censored rows (event=0 —
still active at the horizon) leave the risk set without counting as
events; ignoring censoring (dropping those rows, or calling them
churned) biases survival down — the reason KM exists.

Cross-engine exactness (the decayed_agg discipline): at-risk counts
come from an INTEGER prefix sum over the per-time aggregate (order
never matters for int sums); each hazard factor is ONE IEEE double
division (exactly specified); the survival product is a LEFT-
ASSOCIATED fold over the ordered factor prefix — Spark's
``aggregate()`` higher-order function and DuckDB's ``list_reduce``
both fold left, and IEEE multiplication is exactly specified, so the
engines agree bit-for-bit before the final round.

Scale shape: one map-side-combinable groupBy collapses rows to one
tuple per (group, duration) BEFORE any window — the shuffle carries
distinct durations, never subjects. DURATION CONTRACT: callers bucket
durations to a coarse grain (days — the `user_durations` helper does
this) so distinct times per group stay bounded (~10^3); the keyed
window and the per-row prefix fold run over that bounded table. With
group_by=None the single window partition holds only the bounded
distinct-duration rows — not a data-sized Exchange SinglePartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


from ..sqlutil import sql_lit


def km_survival(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., t, n_risk, n_events, n_censored, survival) — one row
    per distinct duration, survival = the KM estimate S(t) AT that
    time (events at t already applied; censorings at t leave the risk
    set after t, the standard convention). `event_col` is 1/true for
    an observed event (churned/converted/died), 0/false for
    right-censored; NULL duration/event rows are excluded. Negative
    durations raise downstream analysis questions, not exceptions —
    they participate as the earliest risk set (documented)."""
    per_t = km_counts(df, duration_col, event_col, group_by)
    return km_from_counts(per_t, group_by, round_dp)


def km_counts(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_by: "list[str] | None" = None,
) -> DataFrame:
    """The MERGEABLE half of km_survival: per-(group, distinct
    duration) integer (n_events, n_censored) counts — one map-side-
    combinable agg, the portable-catalog posture of the sketch
    family. km_merge is plain addition, so day-partitioned or
    streaming-batch counts combine into the exact whole-history
    curve via km_from_counts."""
    gb = list(group_by or [])
    ev = F.col(event_col).cast("int")
    base = (df.filter(F.col(duration_col).isNotNull()
                      & ev.isNotNull())
            .select(*gb,
                    F.col(duration_col).cast("long").alias("t"),
                    ev.alias("__e")))
    return (base.groupBy(*gb, "t")
            .agg(F.sum("__e").alias("n_events"),
                 F.sum(1 - F.col("__e")).alias("n_censored")))


def km_merge(a: DataFrame, b: DataFrame,
             group_by: "list[str] | None" = None) -> DataFrame:
    """Additive merge of two km_counts tables (union + re-agg)."""
    gb = list(group_by or [])
    return (a.unionByName(b)
            .groupBy(*gb, "t")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("n_censored").alias("n_censored")))


def km_from_counts(
    per_t: DataFrame,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """km_survival's curve computation over an (already mergeable)
    km_counts table — the read side for partitioned/streaming
    count state."""
    gb = list(group_by or [])
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wprev = (wtot.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, -1))
    wpref = (wtot.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    left = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(wprev),
        F.lit(0))
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(wtot)
    out = per_t.withColumn("n_risk", total - left)
    factor = (F.lit(1.0)
              - F.col("n_events").cast("double")
              / F.col("n_risk").cast("double"))
    out = out.withColumn("__pf", F.collect_list(factor).over(wpref))
    surv = F.expr(
        "aggregate(__pf, CAST(1.0 AS DOUBLE), (a, x) -> a * x)")
    return (out.select(*gb, "t", "n_risk", "n_events", "n_censored",
                       dround(surv, round_dp).alias("survival"))
            .orderBy(*gb, "t"))


def km_survival_sql(
    table: str,
    duration_expr: str = "duration",
    event_expr: str = "event",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of km_survival: same integer prefix sums, same
    per-factor IEEE division, same left-associated product
    (list_reduce over the ordered prefix list with a prepended 1.0
    unit — list_reduce seeds from the first element)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({duration_expr} AS BIGINT) AS t,
         CAST({event_expr} AS INT) AS e
  FROM {table}
  WHERE {duration_expr} IS NOT NULL AND {event_expr} IS NOT NULL
),
per_t AS (
  SELECT {gsel}t, CAST(sum(e) AS BIGINT) AS n_events,
         CAST(sum(1 - e) AS BIGINT) AS n_censored
  FROM base GROUP BY {gsel}t
),
risked AS (
  SELECT {gsel}t, n_events, n_censored,
         CAST(sum(n_events + n_censored) OVER ({part})
         - coalesce(sum(n_events + n_censored) OVER (
               {part} ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM per_t
),
folded AS (
  SELECT {gsel}t, n_risk, n_events, n_censored,
         list(1.0 - n_events::DOUBLE / n_risk::DOUBLE) OVER (
             {part} ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
  FROM risked
)
SELECT {gsel}t, n_risk, n_events, n_censored,
       round(list_reduce(list_prepend(CAST(1.0 AS DOUBLE), pf),
                         (a, x) -> a * x), {round_dp}) AS survival
FROM folded
ORDER BY {gsel}t
"""


def user_durations(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    inactive_days: int = 30,
    group_by: "list[str] | None" = None,
) -> DataFrame:
    """events → one (group..., user, duration, event) row per user:
    duration = whole days between the user's first and last event,
    event = 1 if the user's last activity is more than `inactive_days`
    before the CORPUS max timestamp (churned), 0 otherwise (still
    active at the horizon = right-censored). The standard
    activity-log → KM input derivation; the corpus max is a 1-row
    broadcast, never a wall clock (reruns agree)."""
    gb = list(group_by or [])
    per_user = (events.filter(F.col(ts_col).isNotNull())
                .groupBy(*gb, F.col(user_col).alias("user"))
                .agg(F.min(ts_col).alias("__first"),
                     F.max(ts_col).alias("__last")))
    horizon = events.agg(F.max(ts_col).alias("__hmax"))
    j = per_user.crossJoin(F.broadcast(horizon))
    return j.select(
        *gb, "user",
        F.datediff(F.to_date("__last"), F.to_date("__first"))
        .cast("long").alias("duration"),
        (F.datediff(F.to_date("__hmax"), F.to_date("__last"))
         > inactive_days).cast("int").alias("event"))


def km_logrank(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    variant_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    chi2_alpha: float = 3.841,
    round_dp: int = 4,
) -> DataFrame:
    """Log-rank test (Mantel 1966) — "did the treatment arm's survival
    curve differ?": the censoring-aware A/B readout for time-to-event
    metrics (churn, time-to-first-purchase) where ab_welch_test on raw
    durations is WRONG (censored rows are not observations of the
    duration). Per distinct event time t:

        O_t = d_1t                 (observed treatment events)
        E_t = n_1t · d_t / n_t     (expected under H0)
        V_t = d_t (n_1t/n_t)(1 − n_1t/n_t)(n_t − d_t)/(n_t − 1)

    chi2 = (Σ(O−E))² / ΣV, 1 df; `significant` = chi2 ≥ caller's
    critical value (default 3.841 = χ²₁ at p=0.05) — the
    transcendental-free parity surface, like the abtest family.

    Determinism: at-risk counts are integer prefix sums over the
    bounded per-(group, t) table; each per-t term is a fixed IEEE
    scalar chain; the two cross-time sums fold LEFT-ASSOCIATED over
    the t-ordered term list (IEEE addition exactly specified ⇒ both
    engines agree bit-for-bit), never a partition-order float agg.
    Output: (group..., n_control, n_treatment, chi2, significant);
    NULL chi2 when no variance accumulates (no events, or a
    degenerate single-subject risk set throughout)."""
    gb = list(group_by or [])
    ev = F.col(event_col).cast("int")
    is_t = (F.col(variant_col) == treatment).cast("int")
    base = (df.filter(F.col(duration_col).isNotNull()
                      & ev.isNotNull()
                      & F.col(variant_col).isin(control, treatment))
            .select(*gb,
                    F.col(duration_col).cast("long").alias("t"),
                    ev.alias("__e"), is_t.alias("__g1")))
    per_t = (base.groupBy(*gb, "t")
             .agg(F.sum("__e").alias("__d"),
                  F.sum(F.col("__e") * F.col("__g1")).alias("__d1"),
                  F.count("*").alias("__a"),
                  F.sum("__g1").alias("__a1")))
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wprev = (wtot.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, -1))
    left = F.coalesce(F.sum("__a").over(wprev), F.lit(0))
    left1 = F.coalesce(F.sum("__a1").over(wprev), F.lit(0))
    nt = (F.sum("__a").over(wtot) - left).cast("double")
    n1t = (F.sum("__a1").over(wtot) - left1).cast("double")
    d = F.col("__d").cast("double")
    d1 = F.col("__d1").cast("double")
    oe = d1 - n1t * d / nt
    v = F.when(
        nt > 1,
        d * (n1t / nt) * (F.lit(1.0) - n1t / nt)
        * (nt - d) / (nt - F.lit(1.0))).otherwise(F.lit(0.0))
    terms = per_t.select(
        *gb, "t",
        F.struct(F.col("t"), oe.alias("oe"), v.alias("v"))
        .alias("__tv"))
    folded = (terms.groupBy(*gb)
              .agg(F.expr(
                  "aggregate(array_sort(collect_list(__tv)),"
                  " named_struct('oe', CAST(0.0 AS DOUBLE),"
                  "              'v', CAST(0.0 AS DOUBLE)),"
                  " (acc, x) -> named_struct('oe', acc.oe + x.oe,"
                  "                          'v', acc.v + x.v))")
                  .alias("__s")))
    counts = (base.groupBy(*gb)
              .agg(F.sum(1 - F.col("__g1")).alias("n_control"),
                   F.sum("__g1").alias("n_treatment")))
    chi2 = F.when(
        F.col("__s.v") > 0,
        dround(F.col("__s.oe") * F.col("__s.oe") / F.col("__s.v"),
                round_dp))
    j = counts.join(folded, gb) if gb else counts.crossJoin(folded)
    return j.select(
        *gb, "n_control", "n_treatment",
        chi2.alias("chi2"),
        F.coalesce(chi2 >= F.lit(float(chi2_alpha)),
                   F.lit(False)).alias("significant"))


def km_logrank_sql(
    table: str,
    duration_expr: str,
    event_expr: str,
    variant_col: str,
    control: str,
    treatment: str,
    group_by: "list[str] | None" = None,
    chi2_alpha: float = 3.841,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of km_logrank (same prefix sums, per-t scalar
    chains, and t-ordered left fold via list_reduce over the ordered
    struct list)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({duration_expr} AS BIGINT) AS t,
         CAST({event_expr} AS INT) AS e,
         CAST({variant_col} = {sql_lit(treatment)} AS INT) AS g1
  FROM {table}
  WHERE {duration_expr} IS NOT NULL AND {event_expr} IS NOT NULL
    AND {variant_col} IN ({sql_lit(control)}, {sql_lit(treatment)})
),
per_t AS (
  SELECT {gsel}t, sum(e) AS d, sum(e * g1) AS d1,
         count(*) AS a, sum(g1) AS a1
  FROM base GROUP BY {gsel}t
),
risked AS (
  SELECT {gsel}t, d, d1,
         (sum(a) OVER ({part})
          - coalesce(sum(a) OVER ({part} ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         )::DOUBLE AS nt,
         (sum(a1) OVER ({part})
          - coalesce(sum(a1) OVER ({part} ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         )::DOUBLE AS n1t
  FROM per_t
),
terms AS (
  SELECT {gsel}t,
         d1::DOUBLE - n1t * d::DOUBLE / nt AS oe,
         CASE WHEN nt > 1
              THEN d::DOUBLE * (n1t / nt) * (1.0 - n1t / nt)
                   * (nt - d::DOUBLE) / (nt - 1.0)
              ELSE 0.0 END AS v
  FROM risked
),
folded AS (
  SELECT {gsel}
         list_reduce(
           list_prepend({{'oe': CAST(0.0 AS DOUBLE),
                          'v': CAST(0.0 AS DOUBLE)}},
                        list({{'oe': oe, 'v': v}} ORDER BY t)),
           (acc, x) -> {{'oe': acc.oe + x.oe, 'v': acc.v + x.v}}) AS s
  FROM terms {gkey}
),
counts AS (
  SELECT {gsel}CAST(sum(1 - g1) AS BIGINT) AS n_control,
         CAST(sum(g1) AS BIGINT) AS n_treatment
  FROM base {gkey}
)
SELECT {gsel}n_control, n_treatment,
       CASE WHEN s.v > 0
            THEN round(s.oe * s.oe / s.v, {round_dp}) END AS chi2,
       coalesce(CASE WHEN s.v > 0
                     THEN round(s.oe * s.oe / s.v, {round_dp}) END
                >= {float(chi2_alpha)!r}, FALSE) AS significant
FROM counts {"JOIN folded USING (" + ", ".join(gb) + ")" if gb
             else "CROSS JOIN folded"}
"""


def nelson_aalen(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., t, n_risk, n_events, n_censored, cum_hazard) — the
    Nelson-Aalen cumulative-hazard estimator (Nelson 1972; Aalen
    1978), the additive sibling of km_survival:

        H(t) = Σ_{t_i <= t} d_i / n_i

    Reads directly as "expected events per subject by time t"; it is
    the estimator of choice when hazards are the modelling target
    (churn intensity, failure rates) where KM's product form answers
    "probability still alive". exp(-H) is the Breslow survival
    estimate — left to callers because libm exp() is NOT exactly
    specified across engines, while everything emitted here is
    (integer prefix-sum risk sets, one IEEE division per t, a
    LEFT-ASSOCIATED t-ordered sum fold — the km_from_counts
    discipline with + in place of ×). Same scale shape as
    km_survival: shuffle carries one row per (group, distinct
    duration), never subjects."""
    per_t = km_counts(df, duration_col, event_col, group_by)
    return nelson_aalen_from_counts(per_t, group_by, round_dp)


def nelson_aalen_from_counts(
    per_t: DataFrame,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """nelson_aalen's curve computation over an (already mergeable)
    km_counts table — the SAME state the KM family checkpoints
    (km_counts / km_merge / the streaming-KM foreachBatch store), so
    one persisted count table serves both the survival curve and the
    hazard curve without re-scanning subjects."""
    gb = list(group_by or [])
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wprev = (wtot.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, -1))
    wpref = (wtot.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    left = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(wprev),
        F.lit(0))
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(wtot)
    out = per_t.withColumn("n_risk", total - left)
    h = (F.col("n_events").cast("double")
         / F.col("n_risk").cast("double"))
    out = out.withColumn("__ph", F.collect_list(h).over(wpref))
    cum = F.expr(
        "aggregate(__ph, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    return (out.select(*gb, "t", "n_risk", "n_events", "n_censored",
                       dround(cum, round_dp).alias("cum_hazard"))
            .orderBy(*gb, "t"))


def nelson_aalen_sql(
    table: str,
    duration_expr: str = "duration",
    event_expr: str = "event",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of nelson_aalen (same integer prefix sums, same
    per-t IEEE division, same left-associated sum fold)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({duration_expr} AS BIGINT) AS t,
         CAST({event_expr} AS INT) AS e
  FROM {table}
  WHERE {duration_expr} IS NOT NULL AND {event_expr} IS NOT NULL
),
per_t AS (
  SELECT {gsel}t, CAST(sum(e) AS BIGINT) AS n_events,
         CAST(sum(1 - e) AS BIGINT) AS n_censored
  FROM base GROUP BY {gsel}t
),
risked AS (
  SELECT {gsel}t, n_events, n_censored,
         CAST(sum(n_events + n_censored) OVER ({part})
         - coalesce(sum(n_events + n_censored) OVER (
               {part} ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM per_t
),
folded AS (
  SELECT {gsel}t, n_risk, n_events, n_censored,
         list(n_events::DOUBLE / n_risk::DOUBLE) OVER (
             {part} ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
  FROM risked
)
SELECT {gsel}t, n_risk, n_events, n_censored,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ph),
                         (a, x) -> a + x), {round_dp}) AS cum_hazard
FROM folded
ORDER BY {gsel}t
"""


def km_greenwood(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_by: "list[str] | None" = None,
    z: float = 1.959963984540054,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., t, n_risk, n_events, n_censored, survival, se,
    ci_lo, ci_hi) — the Kaplan-Meier curve WITH its Greenwood (1926)
    pointwise standard error and plain ±z·SE confidence band (clamped
    to [0,1]):

        Var(S(t)) = S(t)² · Σ_{t_i <= t} d_i / (n_i (n_i − d_i))

    — the band a retention plot needs before anyone reads meaning
    into a 2-point gap between cohort curves. The same km_counts
    collapse and prefix-product fold as km_survival, plus ONE more
    prefix fold for the variance sum; both are t-ordered left folds
    over collect_list prefixes (never a windowed double running sum —
    DuckDB computes those with segment trees, which re-associates the
    additions), so the twin replays bit-for-bit.

    Where a risk set is exhausted by events (n_i == d_i) the Greenwood
    term is undefined; SE and the band are NULL from that t on (the
    curve itself is 0 there), flagged by an integer prefix max — the
    standard convention, mirrored exactly in the twin."""
    per_t = km_counts(df, duration_col, event_col, group_by)
    return km_greenwood_from_counts(per_t, group_by, z, round_dp)


def km_greenwood_from_counts(
    per_t: DataFrame,
    group_by: "list[str] | None" = None,
    z: float = 1.959963984540054,
    round_dp: int = 4,
) -> DataFrame:
    """km_greenwood's curve computation over an (already mergeable)
    km_counts table — the read side for partitioned/streaming count
    state, completing the from-counts trio with km_from_counts and
    nelson_aalen_from_counts: ONE persisted count table serves the
    survival curve, the hazard curve, and the confidence band."""
    gb = list(group_by or [])
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wprev = (wtot.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, -1))
    wpref = (wtot.orderBy("t")
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
    left = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(wprev),
        F.lit(0))
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(wtot)
    out = per_t.withColumn("n_risk", total - left)
    factor = (F.lit(1.0)
              - F.col("n_events").cast("double")
              / F.col("n_risk").cast("double"))
    # Greenwood term as ONE spelled double chain; exhausted risk sets
    # poison the prefix via the integer flag, not via Inf arithmetic
    term = F.when(
        F.col("n_risk") > F.col("n_events"),
        F.col("n_events").cast("double")
        / (F.col("n_risk").cast("double")
           * (F.col("n_risk") - F.col("n_events")).cast("double"))) \
        .otherwise(F.lit(0.0))
    bad = (F.col("n_risk") == F.col("n_events")).cast("int")
    out = (out.withColumn("__pf", F.collect_list(factor).over(wpref))
           .withColumn("__pv", F.collect_list(term).over(wpref))
           .withColumn("__bad", F.max(bad).over(wpref)))
    surv = F.expr(
        "aggregate(__pf, CAST(1.0 AS DOUBLE), (a, x) -> a * x)")
    cumv = F.expr(
        "aggregate(__pv, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    out = out.withColumn("__s", surv).withColumn("__v", cumv)
    se = F.when(F.col("__bad") == 0,
                F.sqrt(F.col("__s") * F.col("__s") * F.col("__v")))
    zl = F.lit(float(z))
    # gate on the flag, not on se IS NULL: Spark's greatest() skips
    # NULL operands, which would turn a poisoned row into ci_lo=0.0
    lo = F.when(F.col("__bad") == 0,
                F.greatest(F.col("__s") - zl * se, F.lit(0.0)))
    hi = F.when(F.col("__bad") == 0,
                F.least(F.col("__s") + zl * se, F.lit(1.0)))
    return (out.select(*gb, "t", "n_risk", "n_events", "n_censored",
                       dround("__s", round_dp).alias("survival"),
                       dround(se, round_dp).alias("se"),
                       dround(lo, round_dp).alias("ci_lo"),
                       dround(hi, round_dp).alias("ci_hi"))
            .orderBy(*gb, "t"))


def km_greenwood_sql(
    table: str,
    duration_expr: str = "duration",
    event_expr: str = "event",
    group_by: "list[str] | None" = None,
    z: float = 1.959963984540054,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of km_greenwood (same integer prefix sums, same
    two t-ordered list folds — identity seeds, so the list_reduce
    seed discipline is safe — same poison flag, same closing
    sqrt/clamp chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    zl = float(z)
    return f"""
WITH base AS (
  SELECT {gsel}CAST({duration_expr} AS BIGINT) AS t,
         CAST({event_expr} AS INT) AS e
  FROM {table}
  WHERE {duration_expr} IS NOT NULL AND {event_expr} IS NOT NULL
),
per_t AS (
  SELECT {gsel}t, CAST(sum(e) AS BIGINT) AS n_events,
         CAST(sum(1 - e) AS BIGINT) AS n_censored
  FROM base GROUP BY {gsel}t
),
risked AS (
  SELECT {gsel}t, n_events, n_censored,
         CAST(sum(n_events + n_censored) OVER ({part})
         - coalesce(sum(n_events + n_censored) OVER (
               {part} ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM per_t
),
folded AS (
  SELECT {gsel}t, n_risk, n_events, n_censored,
         list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
             list(1.0 - n_events::DOUBLE / n_risk::DOUBLE) OVER (
                 {part} ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             (a, x) -> a * x) AS s,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CASE WHEN n_risk > n_events
                  THEN n_events::DOUBLE /
                       (n_risk::DOUBLE * (n_risk - n_events)::DOUBLE)
                  ELSE 0.0 END) OVER (
                 {part} ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             (a, x) -> a + x) AS v,
         max(CASE WHEN n_risk = n_events THEN 1 ELSE 0 END) OVER (
             {part} ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bad
  FROM risked
)
SELECT {gsel}t, n_risk, n_events, n_censored,
       round(s, {round_dp}) AS survival,
       round(CASE WHEN bad = 0 THEN sqrt(s * s * v) END,
             {round_dp}) AS se,
       round(CASE WHEN bad = 0
             THEN greatest(s - {zl!r} * sqrt(s * s * v), 0.0) END,
             {round_dp}) AS ci_lo,
       round(CASE WHEN bad = 0
             THEN least(s + {zl!r} * sqrt(s * s * v), 1.0) END,
             {round_dp}) AS ci_hi
FROM folded
ORDER BY {gsel}t
"""


def aalen_johansen(
    df: DataFrame,
    duration_col: str = "duration",
    cause_col: str = "cause",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., t, cause, n_risk, n_events, cif) — Aalen-Johansen
    cumulative incidence under COMPETING RISKS (Aalen & Johansen
    1978): when a subject can leave by more than one cause (churned
    vs converted vs still active), 1−KM per cause overstates every
    cause's incidence because it treats the other causes as censoring;
    the AJ estimator attributes each event its share of the overall
    surviving mass:

        CIF_k(t) = Σ_{s <= t} S(s⁻) · d_k(s) / n(s)

    with S the ALL-CAUSE Kaplan-Meier curve and d_k the cause-k event
    count. Σ_k CIF_k(t) + S(t) = 1 at every event time (pinned in
    pytest). Input contract: one row per subject; `cause_col` = 0 for
    right-censored, 1..K for event causes.

    Scale shape: two map-side collapses — per (group, t) for the
    all-cause risk/factor table, per (group, t, cause) for the
    attributions — then t-ordered left folds over collect_list
    prefixes (the km discipline; never a windowed double running
    sum). Shuffle carries distinct (t, cause) tuples, never subjects;
    the twin replays every fold bit-for-bit."""
    gb = list(group_by or [])
    cz = F.col(cause_col).cast("int")
    base = (df.filter(F.col(duration_col).isNotNull()
                      & cz.isNotNull())
            .select(*gb,
                    F.col(duration_col).cast("long").alias("t"),
                    cz.alias("__c")))
    per_t = (base.groupBy(*gb, "t")
             .agg(F.sum((F.col("__c") > 0).cast("long"))
                  .alias("__d"),
                  F.count("*").alias("__a")))
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wprev = (wtot.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, -1))
    left = F.coalesce(F.sum("__a").over(wprev), F.lit(0))
    total = F.sum("__a").over(wtot)
    per_t = per_t.withColumn("n_risk", total - left)
    factor = (F.lit(1.0)
              - F.col("__d").cast("double")
              / F.col("n_risk").cast("double"))
    # S(s-) = product over the STRICT prefix (seed 1.0 at the first t)
    per_t = (per_t
             .withColumn("__pfp", F.collect_list(factor).over(wprev))
             .withColumn(
                 "__sprev",
                 F.expr("aggregate(__pfp, CAST(1.0 AS DOUBLE),"
                        " (a, x) -> a * x)")))
    per_tc = (base.filter(F.col("__c") > 0)
              .groupBy(*gb, "t", F.col("__c").alias("cause"))
              .agg(F.count("*").alias("n_events")))
    j = per_tc.join(
        per_t.select(*gb, "t", "n_risk", "__sprev"), [*gb, "t"])
    term = (F.col("__sprev") * F.col("n_events").cast("double")
            / F.col("n_risk").cast("double"))
    wck = (Window.partitionBy(*gb, "cause") if gb
           else Window.partitionBy("cause"))
    wcpref = (wck.orderBy("t")
              .rowsBetween(Window.unboundedPreceding,
                           Window.currentRow))
    j = j.withColumn("__pt", F.collect_list(term).over(wcpref))
    cif = F.expr(
        "aggregate(__pt, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    return (j.select(*gb, "t", "cause",
                     F.col("n_risk").cast("long").alias("n_risk"),
                     F.col("n_events").cast("long").alias("n_events"),
                     dround(cif, round_dp).alias("cif"))
            .orderBy(*gb, "cause", "t"))


def aalen_johansen_sql(
    table: str,
    duration_expr: str = "duration",
    cause_expr: str = "cause",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of aalen_johansen (same two collapses, same
    strict-prefix product for S(s⁻), same per-cause t-ordered sum
    fold — identity seeds throughout)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    cpart = ("PARTITION BY " + ", ".join([*gb, "cause"])) if gb \
        else "PARTITION BY cause"
    jkeys = " AND ".join(f"c.{k} = p.{k}" for k in [*gb, "t"]) \
        if gb else "c.t = p.t"
    csel = (", ".join(f"c.{k}" for k in gb) + ", ") if gb else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({duration_expr} AS BIGINT) AS t,
         CAST({cause_expr} AS INT) AS c
  FROM {table}
  WHERE {duration_expr} IS NOT NULL AND {cause_expr} IS NOT NULL
),
per_t AS (
  SELECT {gsel}t,
         CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         count(*) AS a
  FROM base GROUP BY {gsel}t
),
risked AS (
  SELECT {gsel}t, d,
         CAST(sum(a) OVER ({part})
         - coalesce(sum(a) OVER ({part} ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM per_t
),
sprev AS (
  SELECT {gsel}t, n_risk,
         list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
             coalesce(list(1.0 - d::DOUBLE / n_risk::DOUBLE) OVER (
                 {part} ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 [])),
             (a, x) -> a * x) AS s_prev
  FROM risked
),
per_tc AS (
  SELECT {gsel}t, c AS cause, count(*) AS n_events
  FROM base WHERE c > 0 GROUP BY {gsel}t, c
),
terms AS (
  SELECT {csel}c.t, c.cause, p.n_risk, c.n_events,
         p.s_prev * c.n_events::DOUBLE / p.n_risk::DOUBLE AS term
  FROM per_tc c JOIN sprev p ON {jkeys}
)
SELECT {gsel}t, cause, n_risk, CAST(n_events AS BIGINT) AS n_events,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(term) OVER ({cpart} ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)),
             (a, x) -> a + x), {round_dp}) AS cif
FROM terms
ORDER BY {gsel}cause, t
"""


def km_rmst(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    tau: float = 30.0,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., tau, rmst) — restricted mean survival time: the
    area under the Kaplan-Meier step curve up to the horizon τ,

        RMST(τ) = ∫₀^τ S(t) dt,

    the censoring-robust effect scalar survival analysts report when
    median survival is undefined (curve never crosses 0.5) — "mean
    active days in the first τ" needs no distributional assumption.

    One fold does everything: per-(group, t) integer counts → risk
    sets (integer prefix sums) → per-t hazard factors → ONE
    t-ordered left fold carrying (prev_t, S, integral), adding
    S·(min(t,τ) − min(prev_t,τ)) per step and closing with the
    S_last·(τ − t_last) tail when the curve ends before τ. Every
    arithmetic step is an exactly-specified IEEE op in both engines
    (the logrank named-struct fold pattern), so km_rmst_sql replays
    bit-for-bit. Durations are expected non-negative (negative t
    would integrate a negative first interval — mirrored, not
    masked, in both engines)."""
    if not tau > 0:
        raise ValueError("tau must be > 0")
    gb = list(group_by or [])
    per_t = km_counts(df, duration_col, event_col, group_by)
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wprev = (wtot.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, -1))
    left = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(wprev),
        F.lit(0))
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(wtot)
    n_risk = (total - left).cast("double")
    f = F.lit(1.0) - F.col("n_events").cast("double") / n_risk
    terms = per_t.select(
        *gb,
        F.struct(F.col("t").cast("double").alias("t"),
                 f.alias("f")).alias("__tf"))
    tau_lit = float(tau)
    folded = (terms.groupBy(*gb)
              .agg(F.expr(
                  f"aggregate(array_sort(collect_list(__tf)),"
                  f" named_struct('p', CAST(0.0 AS DOUBLE),"
                  f"              's', CAST(1.0 AS DOUBLE),"
                  f"              'i', CAST(0.0 AS DOUBLE)),"
                  f" (a, x) -> named_struct("
                  f"   'p', x.t,"
                  f"   's', a.s * x.f,"
                  f"   'i', a.i + a.s * (least(x.t, {tau_lit!r})"
                  f"                     - least(a.p, {tau_lit!r}))))")
                  .alias("__r")))
    rmst = (F.col("__r.i")
            + F.col("__r.s")
            * F.greatest(F.lit(tau_lit)
                         - F.least(F.col("__r.p"), F.lit(tau_lit)),
                         F.lit(0.0)))
    return folded.select(
        *gb,
        F.lit(tau_lit).alias("tau"),
        dround(rmst, round_dp).alias("rmst"))


def km_rmst_sql(
    table: str,
    duration_expr: str = "duration",
    event_expr: str = "event",
    tau: float = 30.0,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of km_rmst (same integer prefix sums, same
    t-ordered 3-field struct fold — every field CAST to DOUBLE so
    the fold never drifts into decimal arithmetic).

    SEED DISCIPLINE (discovered r13): DuckDB 1.0.0's list_reduce
    seeds from the list's FIRST ELEMENT, and under some scan types
    (pandas-registered frames) a list_prepend'ed synthetic seed is
    silently dropped inside list_reduce — harmless for the repo's
    identity-seeded folds (0.0 for sums, 1.0 unit for products:
    identity+x1 == x1), WRONG for any non-identity seed. This fold's
    state is non-identity (p=0, s=1, i=0 matters), so the twin
    avoids prepending entirely: each element is constructed so that
    element 1 IS the correct post-first-step state ('i' =
    least(t, τ), the S=1 first interval), and the lambda only ever
    runs from element 2 on. The Spark side keeps its explicit seed —
    after its first lambda step the states are bit-identical
    (least(0, τ) is exactly 0.0)."""
    if not tau > 0:
        raise ValueError("tau must be > 0")
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    t = float(tau)
    return f"""
WITH base AS (
  SELECT {gsel}CAST({duration_expr} AS BIGINT) AS t,
         CAST({event_expr} AS INT) AS e
  FROM {table}
  WHERE {duration_expr} IS NOT NULL AND {event_expr} IS NOT NULL
),
per_t AS (
  SELECT {gsel}t, sum(e) AS n_events, sum(1 - e) AS n_censored
  FROM base GROUP BY {gsel}t
),
risked AS (
  SELECT {gsel}t,
         1.0 - n_events::DOUBLE /
         (sum(n_events + n_censored) OVER ({part})
          - coalesce(sum(n_events + n_censored) OVER (
                {part} ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0))::DOUBLE AS f
  FROM per_t
),
folded AS (
  SELECT {gsel}
         list_reduce(
           list({{'p': CAST(t AS DOUBLE), 's': f,
                  'i': least(CAST(t AS DOUBLE), {t!r})}}
                ORDER BY t),
           (a, x) -> {{'p': x.p,
                       's': a.s * x.s,
                       'i': a.i + a.s * (least(x.p, {t!r})
                                         - least(a.p, {t!r}))}}) AS r
  FROM risked {gkey}
)
SELECT {gsel}CAST({t!r} AS DOUBLE) AS tau,
       round(r.i + r.s * greatest({t!r} - least(r.p, {t!r}), 0.0),
             {round_dp}) AS rmst
FROM folded
"""
