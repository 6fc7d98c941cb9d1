"""Batch sessionization over the events table.

The streaming sessionizer (streaming/pipeline.py, applyInPandasWithState)
handles the unbounded case; this is the batch/backfill twin expressed as
keyed window functions — the classic gaps-and-islands shape.

Scale: both windows and the final aggregate are partitioned by the user
key, so the only shuffle is one hash-exchange on user_id that all three
steps reuse (Catalyst collapses the window sorts into a single sort per
partition). No global sort, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround

from pyspark.sql.types import TimestampNTZType


def epoch_seconds(df: DataFrame, ts_col: str) -> Column:
    """Whole-second epoch value of a timestamp column, tolerant of both
    TIMESTAMP (LTZ) and TIMESTAMP_NTZ inputs.

    Parquet timestamps without isAdjustedToUTC load as TIMESTAMP_NTZ,
    which Spark refuses to CAST to BIGINT; diff the second-truncated
    value against the NTZ epoch instead (timezone never enters, so the
    result equals DuckDB's floor(epoch(ts)) on the same naive data).
    Truncation happens BEFORE the diff so gap tests agree with oracles
    that compare per-row floor(epoch(..)) values.
    """
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            f"date_trunc('second', `{ts_col}`))")
    return F.col(ts_col).cast("long")  # truncates to whole seconds

DEFAULT_GAP_SECONDS = 1800  # 30 min, the industry-default session gap


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """One row per (user, session): session_no is 0-based per user, a new
    session starts when the gap to the previous event exceeds
    gap_seconds. Timestamps are compared at whole-second resolution
    (truncate-then-diff) so any engine agrees on boundary cases.

    order_col breaks ordering ties (same-user same-timestamp events)
    deterministically.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    secs = epoch_seconds(df, ts_col)
    new_sess = F.when(
        secs - F.lag(secs).over(w) > gap_seconds, 1).otherwise(0)
    sessioned = (df
                 .withColumn("__new", new_sess)
                 .withColumn("session_no",
                             F.sum("__new").over(w).cast("long")))
    return (sessioned
            .groupBy(user_col, "session_no")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 dround(F.sum(value_col), 2).alias("total_value")))


def sessionize_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> str:
    """DuckDB twin of sessionize (same truncate-then-diff gap test; the
    tie-broken ORDER BY makes RANGE/ROWS frames equivalent)."""
    secs = f"CAST(floor(epoch({ts_col})) AS BIGINT)"
    return f"""
WITH flagged AS (
  SELECT {user_col}, {ts_col}, {order_col}, {value_col},
         CASE WHEN {secs} - lag({secs}) OVER w > {gap_seconds}
              THEN 1 ELSE 0 END AS new_sess
  FROM {table}
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {order_col})
), sessioned AS (
  SELECT *, CAST(sum(new_sess) OVER
         (PARTITION BY {user_col} ORDER BY {ts_col}, {order_col})
         AS BIGINT) AS session_no
  FROM flagged
)
SELECT {user_col}, session_no,
       min({ts_col}) AS session_start,
       max({ts_col}) AS session_end,
       count(*) AS n_events,
       round(sum({value_col}), 2) AS total_value
FROM sessioned GROUP BY 1, 2
"""


def sessionize_bucketed(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Hot-key-safe sessionize: same output as ``sessionize`` (one
    float caveat below), but the per-event windows are per-(user,
    TIME-BUCKET), so a bot/service account with 10^8 events splits
    across as many tasks as it spans buckets instead of serializing
    into one window task — the same two-pass shape as
    ``temporal.asof_join_bucketed``.

    Two passes:
      1. local gaps-and-islands within each (user, bucket) window —
         partition size bounded by the key's events per
         ``bucket_seconds``, not its total events;
      2. boundary merge over ISLAND SUMMARIES: consecutive islands of
         a user merge when the truncated-second gap between them is
         <= gap_seconds — the identical per-event split condition,
         since cross-bucket-adjacent events are exactly (last event of
         island i, first event of island i+1). The per-user summary
         partition is bounded by span/bucket_seconds +
         span/gap_seconds rows (each extra island needs a > gap gap),
         INDEPENDENT of event count — a year of data at the default
         parameters is <= ~18k summary rows per user.

    Equivalence is exact for session boundaries, numbering, counts and
    timestamps. total_value sums per-island partials before rounding,
    so the pre-round float can differ from sessionize's by ~1 ulp
    (same caveat as any two-level float aggregation; Spark's own
    partial aggregation already makes event-level sums
    order-dependent).
    """
    ev = df.withColumn("__secs", epoch_seconds(df, ts_col)).withColumn(
        "__bucket", F.floor(F.col("__secs") / F.lit(bucket_seconds)))
    w = (Window.partitionBy(user_col, "__bucket")
         .orderBy(ts_col, order_col))
    new_isl = F.when(
        F.col("__secs") - F.lag("__secs").over(w) > gap_seconds,
        1).otherwise(0)
    islands = (ev
               .withColumn("__new", new_isl)
               .withColumn("__isl", F.sum("__new").over(w)))
    summaries = (islands
                 .groupBy(user_col, "__bucket", "__isl")
                 .agg(F.min(ts_col).alias("__start_ts"),
                      F.max(ts_col).alias("__end_ts"),
                      F.min(F.struct(ts_col, order_col)).alias("__first"),
                      F.min("__secs").alias("__start_secs"),
                      F.max("__secs").alias("__end_secs"),
                      F.count("*").alias("__n"),
                      F.sum(value_col).alias("__sum_value")))
    # islands never interleave across buckets (bucket is monotone in
    # event time), so per-user (first event ts, order) ordering is the
    # global event ordering restricted to island boundaries
    w2 = Window.partitionBy(user_col).orderBy("__first")
    new_sess = F.when(
        F.col("__start_secs") - F.lag("__end_secs").over(w2)
        > gap_seconds, 1).otherwise(0)
    merged = (summaries
              .withColumn("__news", new_sess)
              .withColumn("session_no",
                          F.sum("__news").over(w2).cast("long")))
    return (merged
            .groupBy(user_col, "session_no")
            .agg(F.min("__start_ts").alias("session_start"),
                 F.max("__end_ts").alias("session_end"),
                 F.sum("__n").alias("n_events"),
                 dround(F.sum("__sum_value"), 2).alias("total_value")))


# ---------------------------------------------------------------------------
# ordered funnels + cohort retention — the classic event-analytics pair
# ---------------------------------------------------------------------------

def funnel(
    df: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_days: "int | None" = None,
) -> DataFrame:
    """Ordered funnel: for each user, the earliest time each step was
    reached, where step k must occur AT OR AFTER the user's step-(k-1)
    time (the standard strictly-ordered funnel; simultaneous events
    count). Returns (user_col, step_1_ts..step_N_ts, n_steps) with
    NULL timestamps past the user's drop-off point.

    `max_gap_days` adds the CONVERSION-WINDOW variant (r12): step k
    must also land within max_gap_days of the user's step-(k-1) time
    — the "signed up within a week of the first visit" funnel, where
    the unbounded variant over-credits year-later coincidences. The
    earliest in-window step-k event anchors step k+1 (standard
    first-touch chaining; a later in-window event is never chosen
    over an earlier one).

    Plan shape: one per-(user, step-k) min-aggregate per step — each
    stage's table only SHRINKS (users who reached step k), the joins
    are keyed on user (AQE-skew-safe hash joins), and no per-user
    event array is ever collected — the skew posture sessionize's
    collect_list formulation can't offer. n_steps is typically 3-7,
    so the plan stays shallow.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = None
    outs = []
    for k, step in enumerate(steps, start=1):
        ev = (df.filter(F.col(type_col) == step)
              .select(F.col(user_col), F.col(ts_col).alias("__t")))
        if reached is None:
            cur = ev
        else:
            cond = F.col("__t") >= F.col("__prev")
            if max_gap_days is not None:
                cond = cond & (
                    F.col("__t") <= F.col("__prev")
                    + F.expr(f"INTERVAL {int(max_gap_days)} DAYS"))
            cur = (ev.join(reached.select(user_col, "__prev"), user_col)
                   .filter(cond)
                   .select(user_col, "__t"))
        stepped = (cur.groupBy(user_col)
                   .agg(F.min("__t").alias(f"step_{k}_ts")))
        outs.append(stepped)
        reached = stepped.select(
            user_col, F.col(f"step_{k}_ts").alias("__prev"))
    out = outs[0]
    for nxt in outs[1:]:
        out = out.join(nxt, user_col, "left")
    n_steps = None
    for k in range(1, len(steps) + 1):
        c = F.when(F.col(f"step_{k}_ts").isNotNull(), 1).otherwise(0)
        n_steps = c if n_steps is None else n_steps + c
    return out.withColumn("n_steps", n_steps.cast("long"))


def funnel_sql(
    steps: "list[str]",
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_days: "int | None" = None,
) -> str:
    """DuckDB twin of funnel — the same per-step min-aggregate chain
    (step names escaped via sql_lit, the r12 sweep's rule)."""
    from ..sqlutil import sql_lit
    if not steps:
        raise ValueError("funnel needs at least one step")
    gap = ("" if max_gap_days is None else
           f"\n    AND e.{ts_col} <= p.step_{{prev}}_ts "
           f"+ INTERVAL {int(max_gap_days)} DAY")
    ctes = [f"""
s1 AS (
  SELECT {user_col}, min({ts_col}) AS step_1_ts
  FROM {table} WHERE {type_col} = {sql_lit(steps[0])}
  GROUP BY 1
)"""]
    for k in range(2, len(steps) + 1):
        ctes.append(f"""
s{k} AS (
  SELECT e.{user_col}, min(e.{ts_col}) AS step_{k}_ts
  FROM {table} e JOIN s{k - 1} p ON e.{user_col} = p.{user_col}
  WHERE e.{type_col} = {sql_lit(steps[k - 1])}
    AND e.{ts_col} >= p.step_{k - 1}_ts{gap.format(prev=k - 1)}
  GROUP BY 1
)""")
    cols = ", ".join(
        f"s{k}.step_{k}_ts" for k in range(1, len(steps) + 1))
    joins = " ".join(
        f"LEFT JOIN s{k} ON s1.{user_col} = s{k}.{user_col}"
        for k in range(2, len(steps) + 1))
    n = " + ".join(
        f"CASE WHEN s{k}.step_{k}_ts IS NOT NULL THEN 1 ELSE 0 END"
        for k in range(1, len(steps) + 1))
    return (f"WITH {','.join(ctes)}\n"
            f"SELECT s1.{user_col}, {cols}, CAST({n} AS BIGINT) "
            f"AS n_steps FROM s1 {joins}")


def funnel_counts(funneled: DataFrame,
                  n_steps_total: int) -> DataFrame:
    """Collapse funnel() output to the step-conversion table:
    (step, n_users) where n_users = users whose n_steps >= step. One
    tiny aggregate + a sequence explode of the per-user step count."""
    return (funneled
            .select(F.explode(F.sequence(
                F.lit(1), F.col("n_steps").cast("int"))).alias("step"))
            .groupBy("step")
            .agg(F.count("*").cast("long").alias("n_users"))
            .orderBy("step"))


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention: group users by their FIRST-activity period
    (the cohort), then count, for each later period offset, how many
    of the cohort were active. Returns (cohort, period_offset,
    n_active, retention) with retention = n_active / cohort size at offset 0.

    Plan shape: one (user, period) distinct aggregate, one per-user
    min (both map-side combinable, the second derived from the first
    without a new scan), a keyed join back on user, and a final
    (cohort, offset) count — no windows, no collects. `period` is any
    date_trunc unit."""
    up = (df.select(F.col(user_col),
                    F.date_trunc(period, F.col(ts_col)).alias("__p"))
          .distinct())
    first = up.groupBy(user_col).agg(F.min("__p").alias("__cohort"))
    joined = up.join(first, user_col)
    # offset in whole periods: exact for day/week (fixed length);
    # calendar months vary, so use months_between there
    if period in ("month", "quarter", "year"):
        per_months = {"month": 1, "quarter": 3, "year": 12}[period]
        off = (F.months_between("__p", "__cohort")
               / per_months).cast("long")
    else:
        secs = {"day": 86400, "week": 604800, "hour": 3600}[period]
        # ROUND, not truncate: under a DST session timezone adjacent
        # date_trunc day/week boundaries differ by +/-3600 s, so the
        # raw ratio lands at 0.96/1.04 — truncation would collapse or
        # split adjacent periods (retention > 1). Rounding recovers
        # the integer offset for any |DST shift| < period/2.
        off = F.round((F.unix_timestamp("__p")
                       - F.unix_timestamp("__cohort"))
                      / F.lit(secs)).cast("long")
    counts = (joined.withColumn("period_offset", off)
              .groupBy("__cohort", "period_offset")
              .agg(F.count("*").cast("long").alias("n_active")))
    base = (counts.filter(F.col("period_offset") == 0)
            .select(F.col("__cohort"), F.col("n_active").alias("__n0")))
    return (counts.join(base, "__cohort")
            .select(F.col("__cohort").alias("cohort"),
                    "period_offset",
                    "n_active",
                    dround(F.col("n_active") / F.col("__n0"), 4)
                    .alias("retention"))
            .orderBy("cohort", "period_offset"))


def cohort_retention_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> str:
    """DuckDB twin of cohort_retention (same trunc, same offset
    arithmetic for fixed-length periods)."""
    if period in ("month", "quarter", "year"):
        per_months = {"month": 1, "quarter": 3, "year": 12}[period]
        off = (f"CAST(datediff('month', __cohort, __p) / {per_months} "
               f"AS BIGINT)")
    else:
        secs = {"day": 86400, "week": 604800, "hour": 3600}[period]
        off = (f"CAST(round((epoch(__p) - epoch(__cohort)) / {secs}) "
               f"AS BIGINT)")
    return f"""
WITH up AS (
  SELECT DISTINCT {user_col},
         CAST(date_trunc('{period}', {ts_col}) AS TIMESTAMP) AS __p
  FROM {table}
), first_p AS (
  SELECT {user_col}, min(__p) AS __cohort FROM up GROUP BY 1
), counts AS (
  SELECT __cohort, {off} AS period_offset, CAST(count(*) AS BIGINT)
         AS n_active
  FROM up JOIN first_p USING ({user_col})
  GROUP BY 1, 2
), base AS (
  SELECT __cohort, n_active AS __n0 FROM counts WHERE period_offset = 0
)
SELECT counts.__cohort AS cohort, period_offset, n_active,
       round(n_active / CAST(__n0 AS DOUBLE), 4) AS retention
FROM counts JOIN base USING (__cohort)
ORDER BY cohort, period_offset
"""


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
    min_count: int = 1,
    round_dp: int = 4,
) -> DataFrame:
    """Markov transition matrix over per-user event sequences:
    (from_state, to_state, n, p) where p = P(next = to | current =
    from), normalized over each from-state's observed transitions —
    the behavioral fingerprint behind funnels (funnel = one chosen
    path; this is ALL paths at once): navigation modeling, bot
    detection (bots have near-deterministic rows), next-event
    prediction baselines.

    Adjacency = each user's events in (ts, tiebreak) order; the pair
    generation is ONE keyed lag window (shuffle carries (user, ts,
    state) triples), the matrix two map-side-combinable aggs over
    state pairs (≤ |states|² rows). Deterministic: the tiebreak
    column totalizes the order, p rounds at the end."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col))
    pairs = (df.filter(F.col(ts_col).isNotNull()
                       & F.col(state_col).isNotNull())
             .withColumn("__next", F.lead(state_col).over(w))
             .filter(F.col("__next").isNotNull())
             .select(F.col(state_col).alias("from_state"),
                     F.col("__next").alias("to_state")))
    counts = (pairs.groupBy("from_state", "to_state")
              .agg(F.count("*").alias("n"))
              .filter(F.col("n") >= int(min_count)))
    wf = Window.partitionBy("from_state")
    return (counts
            .withColumn("p", dround(
                F.col("n") / F.sum("n").over(wf), round_dp))
            .orderBy("from_state", "to_state"))


def transition_matrix_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
    min_count: int = 1,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of transition_matrix (same order, same lag, same
    normalization over the min_count-SURVIVING rows)."""
    return f"""
WITH pairs AS (
  SELECT {state_col} AS from_state,
         lead({state_col}) OVER (
             PARTITION BY {user_col}
             ORDER BY {ts_col}, {tiebreak_col}) AS to_state
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {state_col} IS NOT NULL
),
counts AS (
  SELECT from_state, to_state, count(*) AS n
  FROM pairs WHERE to_state IS NOT NULL
  GROUP BY from_state, to_state
  HAVING count(*) >= {int(min_count)}
)
SELECT from_state, to_state, n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY from_state),
             {round_dp}) AS p
FROM counts
ORDER BY from_state, to_state
"""


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    round_dp: int = 4,
) -> DataFrame:
    """Per-day engagement rollup over sessionize output: (day,
    n_sessions, n_users, bounce_rate, avg_events, avg_duration_s,
    max_duration_s) — the product-dashboard layer on top of the
    gaps-and-islands primitive. A session belongs to the day its
    FIRST event falls on (the industry convention; no session is
    split or double-counted).

    Exactness: durations are whole-second integer diffs of the
    truncated-epoch boundaries (the sessionize contract), bounce and
    avg_events are exact integer rationals, avg_duration one division
    of integer sums. Scale: rides sessionize's shuffles + one
    day-keyed map-side agg."""
    sess = sessionize(df, user_col=user_col, ts_col=ts_col,
                      order_col=order_col, value_col=value_col,
                      gap_seconds=gap_seconds)
    # truncate-then-diff at second resolution, same as the gap test
    dur = (epoch_seconds(sess, "session_end")
           - epoch_seconds(sess, "session_start"))
    # day as an ISO string: the DuckDB pandas bridge upcasts DATE
    # to midnight timestamps, so a string is the stable spelling
    day = F.to_date("session_start").cast("string").alias("day")
    agg = (sess.groupBy(day)
           .agg(F.count("*").alias("n_sessions"),
                F.count_distinct(user_col).alias("n_users"),
                F.sum((F.col("n_events") == 1).cast("long"))
                .alias("__bounce"),
                F.sum("n_events").alias("__events"),
                F.sum(dur).alias("__dur"),
                F.max(dur).alias("max_duration_s")))
    n = F.col("n_sessions").cast("double")
    return (agg.select(
        "day", "n_sessions", "n_users",
        dround(F.col("__bounce").cast("double") / n, round_dp)
        .alias("bounce_rate"),
        dround(F.col("__events").cast("double") / n, round_dp)
        .alias("avg_events"),
        dround(F.col("__dur").cast("double") / n, round_dp)
        .alias("avg_duration_s"),
        "max_duration_s")
        .orderBy("day"))


def session_stats_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of session_stats (built on the sessionize twin)."""
    inner = sessionize_sql(table, user_col, ts_col, order_col,
                           value_col, gap_seconds)
    secs_end = "CAST(floor(epoch(session_end)) AS BIGINT)"
    secs_start = "CAST(floor(epoch(session_start)) AS BIGINT)"
    return f"""
WITH sess AS ({inner})
SELECT (session_start::DATE)::VARCHAR AS day,
       count(*) AS n_sessions,
       count(DISTINCT {user_col}) AS n_users,
       round(sum(CAST(n_events = 1 AS BIGINT))::DOUBLE
             / count(*)::DOUBLE, {round_dp}) AS bounce_rate,
       round(sum(n_events)::DOUBLE / count(*)::DOUBLE,
             {round_dp}) AS avg_events,
       round(sum({secs_end} - {secs_start})::DOUBLE
             / count(*)::DOUBLE, {round_dp}) AS avg_duration_s,
       max({secs_end} - {secs_start}) AS max_duration_s
FROM sess GROUP BY 1 ORDER BY 1
"""


def growth_accounting(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "month",
    round_dp: int = 4,
) -> DataFrame:
    """Growth accounting (the standard DAU/MAU decomposition — e.g.
    the Social Capital framework): per period, every active user is
    exactly one of

        new          first-ever active period
        retained     also active in the immediately previous period
        resurrected  active before, but not in the previous period

    and `churned` counts users active in the PREVIOUS period who are
    absent in this one (attributed to this period — the period the
    loss became visible). quick_ratio = (new + resurrected) / churned
    (NULL when churned = 0). The canonical health readout cohort
    retention curves don't give directly.

    Implementation: distinct (user, period-index) — integer index
    (months since epoch or days) so adjacency is exact integer
    arithmetic — then ONE lag per user and a period-keyed integer
    agg; churn comes from the same table via lead (a user churns at
    p+1 unless p+1 is their next active period), so the whole readout
    is two window functions over the distinct activity table (shuffle
    carries distinct (user, period) pairs, never events). The LAST
    period's churn is structurally unknowable (nobody can be absent
    from a period that hasn't ended) — churned is NULL there."""
    if period not in ("month", "day", "week"):
        raise ValueError("period must be month/day/week")
    ts = F.col(ts_col)
    if period == "month":
        idx = (F.year(ts) * 12 + F.month(ts) - 1).cast("long")
    elif period == "week":
        idx = F.floor(F.datediff(F.to_date(ts),
                                 F.lit("1970-01-05").cast("date"))
                      / 7).cast("long")  # Monday-aligned
    else:
        idx = F.datediff(F.to_date(ts),
                         F.lit("1970-01-01").cast("date")).cast("long")
    act = (df.filter(ts.isNotNull())
           .select(F.col(user_col).alias("user"), idx.alias("p"))
           .distinct())
    w = Window.partitionBy("user").orderBy("p")
    act = (act
           .withColumn("__prev", F.lag("p").over(w))
           .withColumn("__next", F.lead("p").over(w)))
    status = (F.when(F.col("__prev").isNull(), "new")
              .when(F.col("__prev") == F.col("p") - 1, "retained")
              .otherwise("resurrected"))
    per_p = (act.groupBy("p")
             .agg(F.sum((status == "new").cast("long")).alias("n_new"),
                  F.sum((status == "retained").cast("long"))
                  .alias("n_retained"),
                  F.sum((status == "resurrected").cast("long"))
                  .alias("n_resurrected")))
    # churned at p+1: active at p, next active period != p+1
    churn = (act.filter(F.col("__next").isNull()
                        | (F.col("__next") > F.col("p") + 1))
             .groupBy((F.col("p") + 1).alias("p"))
             .agg(F.count("*").alias("n_churned")))
    # FULL outer: a period where nobody was active but users churned
    # into it (total blackout) still gets its churn row, zero-filled
    out = per_p.join(churn, "p", "full")
    for c in ("n_new", "n_retained", "n_resurrected"):
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    last_p = per_p.agg(F.max("p").alias("__mx"))
    out = out.crossJoin(F.broadcast(last_p)) \
        .filter(F.col("p") <= F.col("__mx"))
    n_ch = F.coalesce(F.col("n_churned"), F.lit(0))
    qr = F.when(
        n_ch > 0,
        (F.col("n_new") + F.col("n_resurrected")).cast("double")
        / n_ch.cast("double"))
    return (out.select(
        "p", "n_new", "n_retained", "n_resurrected",
        n_ch.alias("n_churned"),
        dround(qr, round_dp).alias("quick_ratio"))
        .orderBy("p"))


def growth_accounting_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "month",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of growth_accounting (same integer period index,
    same lag/lead classification and churn attribution)."""
    if period == "month":
        idx = (f"(year({ts_col}) * 12 + month({ts_col}) - 1)::BIGINT")
    elif period == "week":
        idx = (f"(date_diff('day', DATE '1970-01-05', "
               f"{ts_col}::DATE) // 7)::BIGINT")
    elif period == "day":
        idx = (f"date_diff('day', DATE '1970-01-01', "
               f"{ts_col}::DATE)::BIGINT")
    else:
        raise ValueError("period must be month/day/week")
    return f"""
WITH act AS (
  SELECT DISTINCT {user_col} AS u, {idx} AS p
  FROM {table} WHERE {ts_col} IS NOT NULL
),
lagged AS (
  SELECT u, p,
         lag(p) OVER (PARTITION BY u ORDER BY p) AS prev,
         lead(p) OVER (PARTITION BY u ORDER BY p) AS nxt
  FROM act
),
per_p AS (
  SELECT p,
         sum(CAST(prev IS NULL AS BIGINT)) AS n_new,
         sum(CAST(prev = p - 1 AS BIGINT)) AS n_retained,
         sum(CAST(prev IS NOT NULL AND prev < p - 1 AS BIGINT))
           AS n_resurrected
  FROM lagged GROUP BY p
),
churn AS (
  SELECT p + 1 AS p, count(*) AS n_churned
  FROM lagged WHERE nxt IS NULL OR nxt > p + 1
  GROUP BY p + 1
),
mx AS (SELECT max(p) AS mxp FROM per_p),
joined AS (
  SELECT coalesce(per_p.p, churn.p) AS p,
         CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
         CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
         CAST(coalesce(n_resurrected, 0) AS BIGINT)
           AS n_resurrected,
         coalesce(n_churned, 0) AS n_churned
  FROM per_p FULL OUTER JOIN churn ON per_p.p = churn.p
)
SELECT p, n_new, n_retained, n_resurrected, n_churned,
       round(CASE WHEN n_churned > 0
                  THEN (n_new + n_resurrected)::DOUBLE
                       / n_churned::DOUBLE END,
             {round_dp}) AS quick_ratio
FROM joined CROSS JOIN mx
WHERE p <= mxp
ORDER BY p
"""


def user_rfm(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    monetary_type: str = "purchase",
    round_dp: int = 2,
) -> DataFrame:
    """(user, recency_days, frequency, monetary, n_purchases) — the
    classic RFM feature snapshot per user: recency = whole days from
    the user's LAST event to the corpus horizon (max timestamp — a
    1-row broadcast, never a wall clock, so reruns agree), frequency
    = total events, monetary = exact-grid sum of `monetary_type`
    values. The standard churn-model / segmentation feature block,
    and the feature-engineering companion to growth_accounting's
    period readout.

    One map-side agg per user + the broadcast horizon; NULL
    timestamps excluded, NULL values count as 0 monetary (an event
    happened; it just carried no value)."""
    ts = F.col(ts_col)
    base = df.filter(ts.isNotNull())
    is_m = (F.col(type_col) == monetary_type) \
        & F.col(value_col).isNotNull()
    q = F.when(is_m, F.round(F.col(value_col) * 1e6)
               .cast("decimal(38,0)")).otherwise(
        F.lit(0).cast("decimal(38,0)"))
    per_user = (base.groupBy(F.col(user_col).alias("user"))
                .agg(F.max(ts).alias("__last"),
                     F.count("*").alias("frequency"),
                     F.sum(q).alias("__m"),
                     F.sum(is_m.cast("long")).alias("n_purchases")))
    horizon = base.agg(F.max(ts).alias("__hmax"))
    j = per_user.crossJoin(F.broadcast(horizon))
    return j.select(
        "user",
        F.datediff(F.to_date("__hmax"), F.to_date("__last"))
        .cast("long").alias("recency_days"),
        "frequency",
        dround(F.col("__m").cast("double") / F.lit(1e6), round_dp)
        .alias("monetary"),
        "n_purchases")


def user_rfm_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    monetary_type: str = "purchase",
    round_dp: int = 2,
) -> str:
    """DuckDB twin of user_rfm (same horizon broadcast, same exact
    grid monetary sums)."""
    from ..sqlutil import sql_lit as _lit
    is_m = (f"({type_col} = {_lit(monetary_type)} "
            f"AND {value_col} IS NOT NULL)")
    return f"""
WITH base AS (
  SELECT * FROM {table} WHERE {ts_col} IS NOT NULL
),
per_user AS (
  SELECT {user_col} AS "user", max({ts_col}) AS last_ts,
         count(*) AS frequency,
         sum(CASE WHEN {is_m}
                  THEN CAST(round({value_col} * 1e6) AS HUGEINT)
                  ELSE 0::HUGEINT END) AS m,
         CAST(sum(CAST({is_m} AS BIGINT)) AS BIGINT)
           AS n_purchases
  FROM base GROUP BY {user_col}
),
horizon AS (SELECT max({ts_col}) AS hmax FROM base)
SELECT "user",
       date_diff('day', last_ts::DATE, hmax::DATE)::BIGINT
         AS recency_days,
       frequency,
       round(m::DOUBLE / 1e6, {round_dp}) AS monetary,
       n_purchases
FROM per_user CROSS JOIN horizon
"""


def cohort_ltv(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    period: str = "month",
    round_dp: int = 4,
) -> DataFrame:
    """Cohort LTV curve: (cohort_p, period_offset, cohort_size,
    revenue, cum_ltv_per_user) — cumulative value per user by cohort
    age, the payback readout beside cohort_retention's activity
    view ("the Jan cohort reaches $4.10/user by month 3"). Cohort =
    the user's first-activity period (integer index, the
    growth_accounting convention, so offsets are exact integer
    subtraction — no calendar arithmetic); revenue quantizes to the
    exact 1e-6 grid; the cumulative sum is an integer-decimal prefix
    over offsets (one keyed window over the bounded cohort x offset
    table), divided once by cohort size.

    NULL-value events still date the user's cohort (activity defines
    membership) but add zero revenue; NULL timestamps are excluded."""
    if period not in ("month", "day", "week"):
        raise ValueError("period must be month/day/week")
    ts = F.col(ts_col)
    if period == "month":
        idx = (F.year(ts) * 12 + F.month(ts) - 1).cast("long")
    elif period == "week":
        idx = F.floor(F.datediff(F.to_date(ts),
                                 F.lit("1970-01-05").cast("date"))
                      / 7).cast("long")
    else:
        idx = F.datediff(F.to_date(ts),
                         F.lit("1970-01-01").cast("date")).cast("long")
    q = F.coalesce(F.round(F.col(value_col) * 1e6)
                   .cast("decimal(38,0)"),
                   F.lit(0).cast("decimal(38,0)"))
    base = (df.filter(ts.isNotNull())
            .select(F.col(user_col).alias("user"), idx.alias("p"),
                    q.alias("__vq")))
    first = base.groupBy("user").agg(F.min("p").alias("cohort_p"))
    sizes = first.groupBy("cohort_p").agg(
        F.count("*").alias("cohort_size"))
    rev = (base.join(first, "user")
           .groupBy("cohort_p", (F.col("p") - F.col("cohort_p"))
                    .alias("period_offset"))
           .agg(F.sum("__vq").alias("__rq")))
    w = (Window.partitionBy("cohort_p").orderBy("period_offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (rev.join(sizes, "cohort_p")
           .withColumn("__cum", F.sum("__rq").over(w)))
    return (out.select(
        "cohort_p", "period_offset", "cohort_size",
        dround(F.col("__rq").cast("double") / F.lit(1e6), round_dp)
        .alias("revenue"),
        dround(F.col("__cum").cast("double")
                / (F.col("cohort_size").cast("double") * F.lit(1e6)),
                round_dp).alias("cum_ltv_per_user"))
        .orderBy("cohort_p", "period_offset"))


def cohort_ltv_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    period: str = "month",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of cohort_ltv (same integer period index, same
    exact-decimal prefix, same single divisions)."""
    if period == "month":
        idx = f"(year({ts_col}) * 12 + month({ts_col}) - 1)::BIGINT"
    elif period == "week":
        idx = (f"(date_diff('day', DATE '1970-01-05', "
               f"{ts_col}::DATE) // 7)::BIGINT")
    elif period == "day":
        idx = (f"date_diff('day', DATE '1970-01-01', "
               f"{ts_col}::DATE)::BIGINT")
    else:
        raise ValueError("period must be month/day/week")
    return f"""
WITH base AS (
  SELECT {user_col} AS u, {idx} AS p,
         coalesce(CAST(round({value_col} * 1e6) AS HUGEINT),
                  0::HUGEINT) AS vq
  FROM {table} WHERE {ts_col} IS NOT NULL
),
first AS (
  SELECT u, min(p) AS cohort_p FROM base GROUP BY u
),
sizes AS (
  SELECT cohort_p, count(*) AS cohort_size FROM first GROUP BY 1
),
rev AS (
  SELECT cohort_p, base.p - cohort_p AS period_offset,
         sum(vq) AS rq
  FROM base JOIN first USING (u)
  GROUP BY cohort_p, base.p - cohort_p
)
SELECT cohort_p, period_offset, cohort_size,
       round(rq::DOUBLE / 1e6, {round_dp}) AS revenue,
       round(sum(rq) OVER (PARTITION BY cohort_p ORDER BY
                           period_offset ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW)::DOUBLE
             / (cohort_size::DOUBLE * 1e6), {round_dp})
         AS cum_ltv_per_user
FROM rev JOIN sizes USING (cohort_p)
ORDER BY cohort_p, period_offset
"""


def interarrival_stats(
    df: DataFrame,
    ts_col: str,
    key_cols: "list[str] | tuple[str, ...]",
    round_dp: int = 4,
) -> DataFrame:
    """(key..., n_events, n_gaps, mean_gap_s, std_gap_s, cv,
    burstiness) — per-key inter-event timing signature: whole-second
    gaps between consecutive events, their population mean/std, the
    coefficient of variation, and the Goh–Barabási (2008) burstiness
    B = (σ−μ)/(σ+μ) ∈ [−1, 1): a metronome scores −1, a Poisson
    process 0, human/bursty traffic > 0 — the "is this account a
    cron job" readout beside sessionize (scripted accounts show
    near-constant gaps long before content-level signals fire).

    Determinism under same-second ties: gaps are consecutive
    differences of the SORTED epoch sequence, and that multiset does
    not depend on how equal timestamps are ordered — so the
    aggregates are stable with no tiebreak column. Integer gap sums
    are exact; one sqrt at the end. Skew note: a key's whole window
    sorts in one task (the sessionize contract — pre-split
    pathological bot keys with cap_touches_per_day or the bucketed
    sessionizer)."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("interarrival_stats needs key columns")
    e = epoch_seconds(df, ts_col)
    w = Window.partitionBy(*keys).orderBy("__e")
    gaps = (df.select(*keys, e.alias("__e"))
            .withColumn("__gap", F.col("__e")
                        - F.lag("__e").over(w)))
    agg = (gaps.groupBy(*keys)
           .agg(F.count("*").alias("n_events"),
                F.count("__gap").alias("n_gaps"),
                F.sum("__gap").alias("sg"),
                F.sum(F.col("__gap") * F.col("__gap")).alias("sgg")))
    n = F.col("n_gaps").cast("double")
    mean = F.try_divide(F.col("sg").cast("double"), n)
    var = F.greatest(
        F.lit(0.0),
        F.try_divide(F.col("sgg").cast("double"), n) - mean * mean)
    sd = F.sqrt(var)
    cv = F.when(mean > 0, sd / mean)
    bst = F.when(sd + mean > 0, (sd - mean) / (sd + mean))
    return agg.select(
        *keys, "n_events", "n_gaps",
        dround(mean, round_dp).alias("mean_gap_s"),
        dround(sd, round_dp).alias("std_gap_s"),
        dround(cv, round_dp).alias("cv"),
        dround(bst, round_dp).alias("burstiness"))


def interarrival_stats_sql(
    table: str,
    ts_col: str,
    key_cols: "list[str] | tuple[str, ...]",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of interarrival_stats (same epoch-second gaps,
    same population-moment expression order)."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("interarrival_stats needs key columns")
    kc = ", ".join(keys)
    return f"""
WITH g AS (
  SELECT {kc},
         (epoch(date_trunc('second', {ts_col})))::BIGINT
           - lag((epoch(date_trunc('second', {ts_col})))::BIGINT)
             OVER (PARTITION BY {kc}
                   ORDER BY (epoch(date_trunc('second',
                                              {ts_col})))::BIGINT)
           AS gap
  FROM {table}
),
agg AS (
  SELECT {kc}, count(*) AS n_events, count(gap) AS n_gaps,
         sum(gap) AS sg, sum(gap * gap) AS sgg
  FROM g GROUP BY {kc}
),
calc AS (
  SELECT *,
         CAST(sg AS DOUBLE) / nullif(CAST(n_gaps AS DOUBLE), 0)
           AS mean,
         sqrt(greatest(0.0,
              CAST(sgg AS DOUBLE) / nullif(CAST(n_gaps AS DOUBLE), 0)
              - (CAST(sg AS DOUBLE)
                 / nullif(CAST(n_gaps AS DOUBLE), 0))
                * (CAST(sg AS DOUBLE)
                   / nullif(CAST(n_gaps AS DOUBLE), 0)))) AS sd
  FROM agg
)
SELECT {kc}, n_events, n_gaps,
       round(mean, {round_dp}) AS mean_gap_s,
       round(sd, {round_dp}) AS std_gap_s,
       round(CASE WHEN mean > 0 THEN sd / mean END, {round_dp})
         AS cv,
       round(CASE WHEN sd + mean > 0
                  THEN (sd - mean) / (sd + mean) END, {round_dp})
         AS burstiness
FROM calc
"""
