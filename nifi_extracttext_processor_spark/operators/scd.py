"""Slowly-changing-dimension type 2 (Kimball) — versioned dimension
history from a change feed, the warehouse counterpart to the engine's
append-only dedup catalogs: `scd2_build` turns a feed of keyed,
timestamped attribute observations into (valid_from, valid_to,
is_current) version rows; `scd2_merge` applies a new batch to an
existing history incrementally; `scd2_as_of` is the point-in-time
lookup that makes the history queryable.

Semantics (all deterministic, all DuckDB-replayable):
- Within one (key, ts) the struct-LARGEST tracked tuple wins (exact
  duplicate observations collapse for free; conflicting same-instant
  feeds resolve without an arbitrary-row nondeterminism).
- Consecutive observations with IDENTICAL tracked values (null-safe
  compare) collapse into one version — re-observing an unchanged row
  never splits history.
- valid_to = the next version's valid_from (half-open intervals,
  NULL = current), so `as_of` is a simple range predicate.

Scale design: everything is ONE keyed window sort (lag for the
change flag, lead for valid_to) over (key, ts) — the sessionize
shuffle shape; no self-joins, no collect. `scd2_merge` touches ONLY
each key's current version plus the batch (closed history passes
through untouched), so incremental cost scales with the delta — the
same delta-not-corpus posture as dedup_exact_incremental. Late
events older than a key's current version would silently rewrite
closed history; they are dropped by default and a fail-closed
`on_stale="error"` folds a raise_error into the plan (the gap_fill
guard pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tracked_struct(tracked_cols):
    return F.struct(*[F.col(c) for c in tracked_cols])


def scd2_build(
    changes: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    tracked_cols: list[str] | tuple[str, ...],
    ts_col: str = "ts",
) -> DataFrame:
    """(*key_cols, *tracked_cols, valid_from, valid_to, is_current)
    from a full change feed. See module docstring for the dedupe /
    collapse / interval semantics."""
    keys = list(key_cols)
    tracked = list(tracked_cols)
    if not keys or not tracked:
        raise ValueError("scd2_build needs key and tracked columns")
    overlap = set(keys) & set(tracked)
    if overlap:
        raise ValueError(f"columns both key and tracked: {overlap}")
    # one winner per (key, ts): struct-max tracked tuple
    per_ts = (changes
              .groupBy(*keys, ts_col)
              .agg(F.max(_tracked_struct(tracked)).alias("__tv")))
    w = Window.partitionBy(*keys).orderBy(ts_col)
    flagged = per_ts.withColumn(
        "__prev", F.lag("__tv").over(w))
    starts = flagged.filter(
        F.col("__prev").isNull()
        | ~F.col("__tv").eqNullSafe(F.col("__prev")))
    return (starts
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead("valid_from").over(
                Window.partitionBy(*keys).orderBy("valid_from")))
            .select(*keys,
                    *[F.col(f"__tv.{c}").alias(c) for c in tracked],
                    "valid_from", "valid_to",
                    F.col("valid_to").isNull().alias("is_current")))


def scd2_merge(
    dim: DataFrame,
    batch: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    tracked_cols: list[str] | tuple[str, ...],
    ts_col: str = "ts",
    on_stale: str = "drop",
) -> DataFrame:
    """Apply a batch of new observations to an existing SCD2 history
    (a `scd2_build` output): closed versions pass through untouched;
    each key's CURRENT version is re-derived together with the
    batch's fresh rows, closing it out when values changed and
    extending nothing when they did not. Keys new to the dimension
    insert normally. Batch rows at or before a key's current
    valid_from are STALE (they would rewrite closed history):
    on_stale="drop" ignores them, "error" fails the job fail-closed.
    """
    if on_stale not in ("drop", "error"):
        raise ValueError(f"unknown on_stale {on_stale!r}")
    keys = list(key_cols)
    tracked = list(tracked_cols)
    current = dim.filter(F.col("is_current"))
    closed = dim.filter(~F.col("is_current"))
    cur_marks = current.select(
        *keys, F.col("valid_from").alias("__cur_from"))
    fresh = batch.join(cur_marks, keys, "left")
    stale = F.col("__cur_from").isNotNull() & \
        (F.col(ts_col) <= F.col("__cur_from"))
    if on_stale == "error":
        # fold the guard into a projected column so it cannot be
        # optimized away (the gap_fill raise_error pattern)
        fresh = fresh.withColumn(
            "__guard",
            F.when(stale, F.raise_error(F.concat(
                F.lit("scd2_merge: stale batch row at or before the "
                      "current version's valid_from for key "),
                F.concat_ws("|", *[F.col(k).cast("string")
                                   for k in keys]))))
            .otherwise(F.lit(None).cast("string")))
        fresh = fresh.filter(F.col("__guard").isNull() | stale)
        fresh = fresh.drop("__guard", "__cur_from")
    else:
        fresh = fresh.filter(~stale).drop("__cur_from")
    cur_as_changes = current.select(
        *keys, *tracked, F.col("valid_from").alias(ts_col))
    rebuilt = scd2_build(
        cur_as_changes.unionByName(
            fresh.select(*keys, *tracked, ts_col)),
        keys, tracked, ts_col)
    return closed.unionByName(rebuilt)


def scd2_as_of(
    dim: DataFrame,
    ts,
    ts_type: str = "timestamp",
) -> DataFrame:
    """The dimension as it stood at instant `ts` (half-open
    intervals: valid_from <= ts < valid_to)."""
    t = F.lit(ts).cast(ts_type)
    return (dim.filter((F.col("valid_from") <= t)
                       & (F.col("valid_to").isNull()
                          | (t < F.col("valid_to"))))
            .drop("is_current"))


def scd2_build_sql(
    table: str,
    key_cols: list[str] | tuple[str, ...],
    tracked_cols: list[str] | tuple[str, ...],
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of scd2_build: same struct-max winner, null-safe
    change flag, and lead() interval construction."""
    keys = ", ".join(key_cols)
    tracked = list(tracked_cols)
    tv = ", ".join(f"'{c}': {c}" for c in tracked)
    tv_out = ", ".join(f"__tv['{c}'] AS {c}" for c in tracked)
    return f"""
WITH per_ts AS (
  SELECT {keys}, {ts_col},
         max({{{tv}}}) AS __tv
  FROM {table} GROUP BY ALL
), flagged AS (
  SELECT *, lag(__tv) OVER (PARTITION BY {keys}
                            ORDER BY {ts_col}) AS __prev
  FROM per_ts
), starts AS (
  SELECT * FROM flagged
  WHERE __prev IS NULL OR __tv IS DISTINCT FROM __prev
)
SELECT {keys}, {tv_out},
       {ts_col} AS valid_from,
       lead({ts_col}) OVER (PARTITION BY {keys}
                            ORDER BY {ts_col}) AS valid_to,
       lead({ts_col}) OVER (PARTITION BY {keys}
                            ORDER BY {ts_col}) IS NULL AS is_current
FROM starts
"""
