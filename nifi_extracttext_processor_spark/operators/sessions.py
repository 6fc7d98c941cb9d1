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
