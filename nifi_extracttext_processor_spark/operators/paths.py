"""User-journey path analytics over event streams: the Markov
transition matrix (which step follows which, with probabilities) and
top event paths (the most common first-k journeys) — the product
analytics pair next to funnel/retention (operators/sessions.py).

Both are pure keyed windows + aggregates:

event_transitions — ONE window shuffle on the entity key (lag), then
a (from, to) count agg and a broadcast-free probability normalization
via a second partial agg joined back on `from_event` (a tiny
n_event_types² table at any corpus size). Ties in the time order are
broken by a caller-supplied tiebreaker column (event ids), making the
result deterministic and oracle-replayable.

top_paths — per entity, the first `depth` events in time order become
one path string; paths are counted and the global top-k taken via
TakeOrdered (rank() in the twin). The per-entity sort is the same
window shuffle sessionize pays; no collect_list of unbounded arrays —
the path is bounded by `depth` (a slice after sort, so one hot entity
with 10^8 events still only contributes `depth` elements; the
sort-window itself is the documented sessionize skew surface —
pre-split with sessionize_bucketed's time axis for that regime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround



def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(from_event, to_event, n, p) — consecutive-event transition
    counts per entity and row-normalized probabilities (round-6).
    Deterministic: the per-entity order is (ts, tiebreak)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (df.select(key_col, ts_col, tiebreak_col,
                       F.col(event_col).alias("to_event"))
             .withColumn("from_event",
                         F.lag("to_event").over(w))
             .filter(F.col("from_event").isNotNull()))
    counts = (pairs.groupBy("from_event", "to_event")
              .agg(F.count("*").alias("n")))
    totals = counts.groupBy("from_event").agg(F.sum("n").alias("__t"))
    return (counts.join(totals, "from_event")
            .select("from_event", "to_event", "n",
                    dround(F.col("n") / F.col("__t"), 6).alias("p")))


def event_transitions_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin of event_transitions."""
    return f"""
WITH seq AS (
  SELECT {key_col},
         lag({event_col}) OVER (PARTITION BY {key_col}
                                ORDER BY {ts_col}, {tiebreak_col})
           AS from_event,
         {event_col} AS to_event
  FROM {table}
),
c AS (
  SELECT from_event, to_event, count(*) AS n FROM seq
  WHERE from_event IS NOT NULL GROUP BY 1, 2
)
SELECT from_event, to_event, n,
       round(n / (sum(n) OVER (PARTITION BY from_event)), 6) AS p
FROM c
"""


_PATH_SEP = " > "


def top_paths(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
    depth: int = 3,
    k: int = 20,
) -> DataFrame:
    """(path, n_users) — the k most common length-`depth` opening
    journeys ('signup > click > purchase'), ties broken by path text
    ascending. Entities with fewer than `depth` events contribute
    their full (shorter) path — dropping them would bias toward
    power users."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    firstk = (df.select(key_col, ts_col, tiebreak_col,
                        F.col(event_col).alias("ev"))
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= depth))
    paths = (firstk.groupBy(key_col)
             .agg(F.array_sort(F.collect_list(
                 F.struct("__rn", "ev"))).alias("__s"))
             .select(F.array_join(
                 F.transform("__s", lambda s: s["ev"]),
                 _PATH_SEP).alias("path")))
    return (paths.groupBy("path").agg(F.count("*").alias("n_users"))
            .orderBy(F.desc("n_users"), F.asc("path"))
            .limit(k))


def top_paths_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
    depth: int = 3,
    k: int = 20,
) -> str:
    """DuckDB twin of top_paths (same order, same tiebreak, same
    separator)."""
    return f"""
WITH ranked AS (
  SELECT {key_col} AS uk, {event_col} AS ev,
         row_number() OVER (PARTITION BY {key_col}
                            ORDER BY {ts_col}, {tiebreak_col}) AS rn
  FROM {table}
),
paths AS (
  SELECT uk, string_agg(ev, '{_PATH_SEP}' ORDER BY rn) AS path
  FROM ranked WHERE rn <= {depth} GROUP BY uk
)
SELECT path, count(*) AS n_users
FROM paths GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT {k}
"""
