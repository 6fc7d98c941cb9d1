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
                 F.round(F.sum(value_col), 2).alias("total_value")))


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
                 F.round(F.sum("__sum_value"), 2).alias("total_value")))


# ---------------------------------------------------------------------------
# ordered funnels + cohort retention — the classic event-analytics pair
# ---------------------------------------------------------------------------

def funnel(
    df: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: for each user, the earliest time each step was
    reached, where step k must occur AT OR AFTER the user's step-(k-1)
    time (the standard strictly-ordered funnel; simultaneous events
    count). Returns (user_col, step_1_ts..step_N_ts, n_steps) with
    NULL timestamps past the user's drop-off point.

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
            cur = (ev.join(reached.select(user_col, "__prev"), user_col)
                   .filter(F.col("__t") >= F.col("__prev"))
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
) -> str:
    """DuckDB twin of funnel — the same per-step min-aggregate chain."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ctes = [f"""
s1 AS (
  SELECT {user_col}, min({ts_col}) AS step_1_ts
  FROM {table} WHERE {type_col} = '{steps[0]}'
  GROUP BY 1
)"""]
    for k in range(2, len(steps) + 1):
        ctes.append(f"""
s{k} AS (
  SELECT e.{user_col}, min(e.{ts_col}) AS step_{k}_ts
  FROM {table} e JOIN s{k - 1} p ON e.{user_col} = p.{user_col}
  WHERE e.{type_col} = '{steps[k - 1]}'
    AND e.{ts_col} >= p.step_{k - 1}_ts
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
                    F.round(F.col("n_active") / F.col("__n0"), 4)
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
            .withColumn("p", F.round(
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
