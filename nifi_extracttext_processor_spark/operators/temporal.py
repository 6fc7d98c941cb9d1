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
  3. last(value, ignorenulls) carries each right payload
     forward onto every subsequent left row                 (no extra
                                                             shuffle)
  4. keep left rows; optional tolerance filter drops stale matches

Cost: one hash-partition shuffle of (key, ts, payload) — the same
price as a plain keyed join, independent of time-density, with no
candidate blow-up. Skewed keys fall to AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    (ties: the right row at the exact timestamp wins).

    right_cols: right payload columns to carry (default: everything
    except the key/time columns). tolerance: an INTERVAL string (e.g.
    '10 minutes') — matches older than ``left.on - tolerance`` become
    NULL, pandas merge_asof semantics.

    Tie caveat: if MULTIPLE right rows share the exact same (key, on)
    pair, which one wins is not defined (same as DuckDB ASOF JOIN /
    pandas merge_asof) — deduplicate the right side first when that
    matters.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in by_cols and c != on]
    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in right_cols}

    left_cols = [c for c in left.columns if c not in by_cols and c != on]
    l_tagged = left.select(
        *by_cols, F.col(on), F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
          for c in right_cols])
    r_tagged = right.select(
        *by_cols, F.col(on), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
        *[F.col(c).alias(out_names[c]) for c in right_cols])

    unioned = l_tagged.unionByName(r_tagged)
    w = (Window.partitionBy(*by_cols)
         .orderBy(F.col(on).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.select(
        *by_cols, F.col(on), F.col("__side"),
        *[F.col(c) for c in left_cols],
        *[F.last(out_names[c], ignorenulls=True).over(w)
          .alias(out_names[c]) for c in right_cols],
        F.last(F.when(F.col("__side") == 0, F.col(on)), ignorenulls=True)
        .over(w).alias("__match_ts"))
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        fresh = (F.col("__match_ts")
                 >= F.col(on) - F.expr(f"INTERVAL {tolerance}"))
        out = out.select(
            *by_cols, F.col(on), *[F.col(c) for c in left_cols],
            *[F.when(fresh, F.col(out_names[c])).alias(out_names[c])
              for c in right_cols])
    else:
        out = out.select(*by_cols, F.col(on),
                         *[F.col(c) for c in left_cols],
                         *[F.col(out_names[c]) for c in right_cols])
    return out


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
