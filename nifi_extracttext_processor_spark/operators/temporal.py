"""Temporal joins over event streams: as-of join (point-in-time
lookup) — the classic operator relational engines bolt on for
time-series work (DuckDB ASOF JOIN, kdb aj, pandas merge_asof).

Spark has no native as-of join; the naive formulations are
scale-killers (a range theta-join explodes to O(|L|·|R|) candidates, a
per-row subquery is O(n) scans). The implementation here is the
union + keyed forward-fill shape:

  1. tag both sides and union them on an aligned schema      (narrow)
  2. ONE shuffle: window partitioned by the join key,
     ordered by (ts, side-tag) — right rows sort before left
     rows at equal timestamps                               (keyed)
  3. last(right-payload STRUCT, ignorenulls) carries the most
     recent whole right row forward onto every subsequent
     left row                                               (no extra
                                                             shuffle)
  4. keep left rows; optional tolerance filter drops stale matches

The fill carries ONE struct of the entire right payload, not
per-column fills — so a left row's match is always a single right
row, even when right payload columns contain NULLs (pandas
merge_asof / DuckDB ASOF row-level semantics).

Cost: one hash-partition shuffle of (key, ts, payload) — the same
price as a plain keyed join, independent of time-density, with no
candidate blow-up.

SKEW: the forward-fill window needs every row of a key in one task,
and AQE's skew mitigation splits *join* partitions, NOT *window*
partitions — so one hot key (a bot user_id with 10^8 events at
100 TB) serializes into a single straggler task under ``asof_join``.
For skewed keys use ``asof_join_bucketed``: it range-buckets the
time axis so the big windows are per-(key, time-bucket) — bounded by
the bucket's row count — and carries each bucket's last right row
forward through a second, tiny per-key window over bucket summaries
(one row per (key, bucket), not per event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _asof_prepare(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by_cols: list[str],
    right_cols: list[str],
    out_names: dict[str, str],
) -> DataFrame:
    """Tag + union both sides on an aligned schema. The right payload
    travels as ONE struct column ``__pay`` (match ts + payload cols) so
    the downstream forward-fill is whole-row, never column-mixed."""
    left_cols = [c for c in left.columns if c not in by_cols and c != on]
    pay_type = T.StructType(
        [T.StructField("__ts", left.schema[on].dataType)]
        + [T.StructField(out_names[c], right.schema[c].dataType)
           for c in right_cols])
    l_tagged = left.select(
        *by_cols, F.col(on), F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(pay_type).alias("__pay"))
    r_tagged = right.select(
        *by_cols, F.col(on), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
        F.struct(F.col(on).alias("__ts"),
                 *[F.col(c).alias(out_names[c]) for c in right_cols])
        .alias("__pay"))
    return l_tagged.unionByName(r_tagged)


def _asof_finish(
    filled: DataFrame,
    on: str,
    by_cols: list[str],
    left_cols: list[str],
    right_cols: list[str],
    out_names: dict[str, str],
    tolerance: str | None,
) -> DataFrame:
    """Keep left rows, unpack the matched right-row struct, apply the
    tolerance filter (match older than left.on - tolerance → NULLs)."""
    out = filled.filter(F.col("__side") == 1)
    match = F.col("__match")
    if tolerance is not None:
        fresh = (match["__ts"]
                 >= F.col(on) - F.expr(f"INTERVAL {tolerance}"))
        match = F.when(fresh, match)
    return out.select(
        *by_cols, F.col(on), *[F.col(c) for c in left_cols],
        *[match[out_names[c]].alias(out_names[c]) for c in right_cols])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the payload of the most recent right
    row with ``right.on <= left.on`` within the same ``by`` key(s)
    (ties: the right row at the exact timestamp wins). The whole
    matched payload comes from ONE right row — a NULL in the most
    recent right row stays NULL, it is not filled from an older row.

    right_cols: right payload columns to carry (default: everything
    except the key/time columns). tolerance: an INTERVAL string (e.g.
    '10 minutes') — matches older than ``left.on - tolerance`` become
    NULL, pandas merge_asof semantics.

    Tie caveat: if MULTIPLE right rows share the exact same (key, on)
    pair, which one wins is not defined (same as DuckDB ASOF JOIN /
    pandas merge_asof) — deduplicate the right side first when that
    matters.

    Skew caveat: one window task per key — a single hot key
    serializes. Use ``asof_join_bucketed`` for skewed key
    distributions (see module docstring).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in by_cols and c != on]
    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in right_cols}
    left_cols = [c for c in left.columns if c not in by_cols and c != on]

    unioned = _asof_prepare(left, right, on, by_cols, right_cols,
                            out_names)
    w = (Window.partitionBy(*by_cols)
         .orderBy(F.col(on).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.withColumn(
        "__match", F.last("__pay", ignorenulls=True).over(w))
    return _asof_finish(filled, on, by_cols, left_cols, right_cols,
                        out_names, tolerance)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
    bucket: str = "1 hour",
) -> DataFrame:
    """Hot-key-safe as-of join: same semantics as ``asof_join`` (one
    caveat below), but the big windows are per-(key, TIME-BUCKET), so
    a skewed key's work splits across as many tasks as it has buckets
    instead of serializing into one.

    Two passes:
      1. aggregate the last right row per (key, bucket) — map-side
         combinable — then a per-key window over those BUCKET
         SUMMARIES (one row per (key, bucket), thousands of rows for
         a year of hourly buckets, never per-event) computes each
         bucket's carry-in: the last right row of any earlier bucket.
      2. forward-fill within each (key, bucket) window — bounded by
         the bucket's row count — seeding from the carry-in.

    Cost: the union shuffles once on (key, bucket); the bucket-summary
    aggregation reuses that partitioning (no extra full-data
    exchange); the carry-in join back is a shuffle of the summaries
    (tiny). ~the same data volume moved as ``asof_join``, skew-robust.

    ``bucket`` is an INTERVAL string for timestamp ``on`` columns
    (e.g. '1 hour'); for numeric ``on`` columns pass a numeric width
    in the column's units (e.g. 3600.0).

    Tie caveat (stronger than asof_join): within a bucket, ties on
    (key, on) between multiple right rows resolve by struct
    comparison of the payload (deterministic but arbitrary), which
    may pick a different winner than asof_join — identical behavior
    when (key, on) is unique on the right side.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in by_cols and c != on]
    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in right_cols}
    left_cols = [c for c in left.columns if c not in by_cols and c != on]

    unioned = _asof_prepare(left, right, on, by_cols, right_cols,
                            out_names)
    if isinstance(bucket, str):
        # timestamp axis: tumbling-window start as the bucket label —
        # F.window handles arbitrary '<n> <unit>' duration strings
        bucket_col = F.window(F.col(on), bucket)["start"]
    else:
        # numeric axis: floor division by a width in the column's units
        bucket_col = F.floor(F.col(on).cast("double")
                             / F.lit(float(bucket)))
    unioned = unioned.withColumn("__bucket", bucket_col)

    # pass 1: last right row per (key, bucket). max() over the payload
    # struct orders by its first field __ts — i.e. picks the
    # latest-timestamp right row (ties: struct comparison).
    per_bucket = (unioned
                  .groupBy(*by_cols, "__bucket")
                  .agg(F.max(F.when(F.col("__side") == 0,
                                    F.col("__pay"))).alias("__last")))
    w_prev = (Window.partitionBy(*by_cols).orderBy("__bucket")
              .rowsBetween(Window.unboundedPreceding, -1))
    carry = per_bucket.select(
        *by_cols, "__bucket",
        F.last("__last", ignorenulls=True).over(w_prev).alias("__carry"))

    # pass 2: per-(key, bucket) windows — bounded task size — seeded
    # with the carry-in from earlier buckets.
    joined = unioned.join(carry, on=[*by_cols, "__bucket"], how="left")
    w_in = (Window.partitionBy(*by_cols, "__bucket")
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = joined.withColumn(
        "__match",
        F.coalesce(F.last("__pay", ignorenulls=True).over(w_in),
                   F.col("__carry")))
    return _asof_finish(filled, on, by_cols, left_cols, right_cols,
                        out_names, tolerance)


def asof_join_sql(
    left_table: str,
    right_table: str,
    on: str = "ts",
    by: str = "user_id",
    right_cols: tuple[str, ...] = ("value",),
    suffix: str = "_right",
) -> str:
    """DuckDB twin using its native ASOF JOIN (backward, >= semantics
    match asof_join without tolerance)."""
    cols = ", ".join(
        f"r.{c} AS {c + suffix}" for c in right_cols)
    return f"""
SELECT l.*, {cols}
FROM {left_table} l
ASOF LEFT JOIN {right_table} r
  ON l.{by} = r.{by} AND l.{on} >= r.{on}
"""


# ---------------------------------------------------------------------------
# interval (range) join — the bin-based range-join strategy
# ---------------------------------------------------------------------------

def interval_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | None = None,
    bucket_seconds: float = 3600.0,
    how: str = "inner",
    right_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Join every left row to the right intervals containing it:
    right.start <= left.ts <= right.end (and left.by == right.by when
    `by` is given). Inclusive on both ends — DuckDB BETWEEN semantics,
    so the oracle twin is a plain theta join.

    Spark's optimizer turns `ts BETWEEN s AND e` into a
    BroadcastNestedLoopJoin (fine only when one side broadcasts) or an
    O(|L|*|R|) cartesian — the classic range-join scale-killer. This
    is the BIN strategy instead (the same one behind Databricks' range
    join hints): quantize time into `bucket_seconds` bins, explode
    each interval onto the bins it covers, equi-join on
    (by?, bin) — ONE hash shuffle — then apply the exact BETWEEN
    filter. Each left row lives in exactly one bin, so a (left, right)
    pair can meet only once: no dedup pass needed.

    Pick `bucket_seconds` near the typical interval length: the
    interval fan-out is ceil(len/bucket)+1 rows, and a bin's join
    fan-in is the number of intervals overlapping it. Hot bins are
    ordinary join skew — AQE's skew-join splitting applies (it can't
    help the nested-loop formulations).

    `how`: "inner" or "left" (unmatched left rows kept with NULL right
    payload). Intervals with end < start are dropped (not an error —
    dirty data posture). `right_cols` projects the right payload
    (default: every right column except the join metadata).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be > 0")
    if right_cols is None:
        drop = {start_col, end_col} | ({by} if by else set())
        right_cols = tuple(c for c in right.columns if c not in drop)
    clash = [c for c in right_cols if c in left.columns]
    if clash:
        raise ValueError(
            f"right_cols {clash} collide with left columns — alias "
            "the right payload before joining")
    if "_bin" in left.columns or "_bin" in right.columns:
        raise ValueError("'_bin' is reserved by interval_join")

    def _secs(df_: DataFrame, c: str):
        # numeric -> double; timestamp/timestamp_ntz/date -> epoch
        # seconds. Only the BIN mapping uses this (any monotonic,
        # side-consistent map works); the exact BETWEEN filter below
        # compares the native types.
        t = df_.schema[c].dataType.typeName()
        if t in ("timestamp", "timestamp_ntz", "date"):
            return (F.unix_micros(F.col(c).cast("timestamp"))
                    .cast("double") / F.lit(1e6))
        return F.col(c).cast("double")

    w = float(bucket_seconds)
    rs = _secs(right, start_col)
    re_ = _secs(right, end_col)

    l2 = left.withColumn(
        "_bin", F.floor(_secs(left, ts_col) / F.lit(w)))

    r2 = (right
          .filter(F.col(end_col) >= F.col(start_col))
          .withColumn("_bin", F.explode(F.sequence(
              F.floor(rs / F.lit(w)).cast("long"),
              F.floor(re_ / F.lit(w)).cast("long")))))

    on = [l2["_bin"] == r2["_bin"]]
    if by:
        on.insert(0, l2[by] == r2[by])
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    exact = ((l2[ts_col] >= r2[start_col])
             & (l2[ts_col] <= r2[end_col]))

    # every left row lives in exactly ONE bin, so left-outer keeps
    # unmatched rows (with NULL payload) at their original
    # multiplicity — no dedup or row-handle pass needed either way
    return (l2.join(r2, cond & exact, how)
            .select(*[l2[c] for c in left.columns],
                    *[r2[c] for c in right_cols]))


def interval_join_sql(
    left_table: str,
    right_table: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | None = None,
    how: str = "inner",
    left_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin: the plain theta join the bin strategy is
    semantically equal to."""
    lc = ", ".join(f"l.{c}" for c in left_cols) or "l.*"
    rc = ", ".join(f"r.{c}" for c in right_cols)
    j = "JOIN" if how == "inner" else "LEFT JOIN"
    key = f"l.{by} = r.{by} AND " if by else ""
    return f"""
SELECT {lc}, {rc}
FROM {left_table} l
{j} {right_table} r
  ON {key}l.{ts_col} >= r.{start_col} AND l.{ts_col} <= r.{end_col}
     AND r.{end_col} >= r.{start_col}
"""
