"""Slowly-changing-dimension (SCD Type 2) history operators — the
warehouse-side bookkeeping every entity table at scale needs
(Kimball's type-2 dimension: each attribute change closes the old
row and opens a new one, so any fact can be joined to the attribute
values that were true AT ITS TIME). Two operators:

  * `scd2_from_changelog`: a change log / snapshot stream
    (key, attrs, ts) → the full validity-interval history
    (key, attrs, valid_from, valid_to, is_current), with consecutive
    no-op changes compacted away. This is "rebuild the dimension
    from events" — the batch bootstrap.
  * `scd2_merge`: apply ONE new snapshot batch to an existing
    history — close changed keys' open rows, insert their new
    versions, leave unchanged keys untouched. This is the
    incremental nightly merge (the MERGE INTO pattern, expressed as
    pure DataFrame ops so it lands anywhere, not just on Delta/
    Iceberg tables).

Scale shape:
  * changelog build = ONE keyed shuffle (window by key, ordered by
    ts + a tiebreak): lag() drops no-op changes, lead() closes
    intervals — no self-join, no correlated subquery. Skew contract:
    one key's whole history sorts in one task (entity histories are
    shallow; a million-change key is a data bug the caller should
    pre-split).
  * merge = one keyed join current-open-rows × updates (hash join on
    the key, attrs compared null-safely) + a unionByName. Updates
    batches are typically << history: broadcast the updates side.
  * both emit columns in a stable order and use null-safe equality
    (`eqNullSafe`) so NULL attribute values neither match nor churn
    spuriously — a NULL→NULL "change" must not open a new version.

Determinism / oracle: orderings carry an explicit tiebreak column
option; the DuckDB twins replay both operators exactly (timestamps,
interval bounds, is_current flags)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_cols: "list[str] | tuple[str, ...]",
    attr_cols: "list[str] | tuple[str, ...]",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(key..., attrs..., valid_from, valid_to, is_current) — one row
    per maximal interval during which the key's attributes were
    constant. Consecutive records with identical attributes compact
    into one interval; `valid_to` is NULL on each key's current row.
    Pass `tiebreak_col` when one key can log two records at the same
    timestamp (the window order must be total for the twin to
    agree)."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    if not keys or not attrs:
        raise ValueError("scd2_from_changelog needs key and attr "
                         "columns")
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    # drop records whose attributes equal the previous record's
    # (null-safe) — the remaining rows are the version starts
    same_prev = None
    for a in attrs:
        eq = F.col(a).eqNullSafe(F.lag(a).over(w))
        same_prev = eq if same_prev is None else (same_prev & eq)
    first = F.row_number().over(w) == 1
    starts = (df.withColumn("__keep", first | ~same_prev)
              .filter(F.col("__keep")).drop("__keep"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (starts.select(
        *keys, *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"))
        .withColumn("is_current", F.col("valid_to").isNull()))


def scd2_from_changelog_sql(
    table: str,
    key_cols: "list[str] | tuple[str, ...]",
    attr_cols: "list[str] | tuple[str, ...]",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> str:
    """DuckDB twin of scd2_from_changelog (same null-safe compaction,
    same interval bounds)."""
    keys = ", ".join(key_cols)
    attrs = ", ".join(attr_cols)
    order = ts_col + (f", {tiebreak_col}" if tiebreak_col else "")
    same = " AND ".join(
        f"{a} IS NOT DISTINCT FROM lag({a}) OVER w" for a in attr_cols)
    return f"""
WITH marked AS (
  SELECT *, row_number() OVER w AS __rn,
         ({same}) AS __same
  FROM {table}
  WINDOW w AS (PARTITION BY {keys} ORDER BY {order})
),
starts AS (
  SELECT * FROM marked WHERE __rn = 1 OR NOT coalesce(__same, FALSE)
)
SELECT {keys}, {attrs},
       {ts_col} AS valid_from,
       lead({ts_col}) OVER w2 AS valid_to,
       lead({ts_col}) OVER w2 IS NULL AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY {keys} ORDER BY {order})
"""


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: "list[str] | tuple[str, ...]",
    attr_cols: "list[str] | tuple[str, ...]",
    ts_col: str = "ts",
    on_stale: str = "drop",
) -> DataFrame:
    """Apply one snapshot batch to an existing SCD2 history (the
    columns scd2_from_changelog emits). `updates` carries one row per
    key (key..., attrs..., ts_col). Returns the merged history:

      * keys whose open row's attributes differ → open row closed at
        the update's ts, new open row appended;
      * brand-new keys → new open row;
      * unchanged keys (and all already-closed rows) → untouched.

    An update at or before a key's open-row `valid_from` is STALE —
    applying it would rewrite closed history or produce an inverted
    interval. `on_stale="drop"` (default) ignores such rows;
    "error" folds a raise_error into the plan so the job fails
    loudly (the gap_fill fail-closed pattern).

    The updates side is BROADCAST (a nightly batch is tiny next to
    the accumulated history); history never shuffles."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    if not keys or not attrs:
        raise ValueError("scd2_merge needs key and attr columns")
    if on_stale not in ("drop", "error"):
        raise ValueError(f"unknown on_stale {on_stale!r}")
    hist_cols = [*keys, *attrs, "valid_from", "valid_to",
                 "is_current"]
    for c in hist_cols:
        if c not in history.columns:
            raise ValueError(f"history is missing column {c!r}")
    # the open rows, attrs aliased + an explicit join-hit marker (a
    # legitimately-NULL history attribute must not look like "no open
    # row exists")
    open_rows = (history.filter(F.col("is_current"))
                 .select(*keys,
                         *[F.col(a).alias(f"__h_{a}") for a in attrs],
                         F.col("valid_from").alias("__h_from"),
                         F.lit(True).alias("__has_open")))
    joined = updates.join(F.broadcast(open_rows), keys, "left")
    stale = (F.col("__has_open").isNotNull()
             & (F.col(ts_col) <= F.col("__h_from")))
    if on_stale == "error":
        joined = joined.withColumn(
            ts_col,
            F.when(stale, F.raise_error(F.concat(
                F.lit("scd2_merge: stale update at or before the "
                      "open row's valid_from for key "),
                F.concat_ws("|", *[F.col(k).cast("string")
                                   for k in keys]))).cast(
                dict(joined.dtypes)[ts_col]))
            .otherwise(F.col(ts_col)))
    else:
        joined = joined.filter(~stale)
    is_new = F.col("__has_open").isNull()
    changed = None
    for a in attrs:
        ne = ~F.col(a).eqNullSafe(F.col(f"__h_{a}"))
        changed = ne if changed is None else (changed | ne)
    # 2. insert rows: brand-new keys + changed keys' new versions
    inserts = (joined.filter(is_new | changed)
               .select(*keys, *attrs,
                       F.col(ts_col).alias("valid_from"),
                       F.lit(None).cast(
                           dict(history.dtypes)["valid_to"])
                       .alias("valid_to"),
                       F.lit(True).alias("is_current")))
    # 1. close: changed (not new) keys' open rows end at the update ts
    changed_keys = (joined.filter(~is_new & changed)
                    .select(*keys,
                            F.col(ts_col).alias("__close_ts")))
    closed = (history.join(F.broadcast(changed_keys), keys, "left")
              .withColumn(
                  "valid_to",
                  F.when(F.col("is_current")
                         & F.col("__close_ts").isNotNull(),
                         F.col("__close_ts"))
                  .otherwise(F.col("valid_to")))
              .withColumn("is_current", F.col("valid_to").isNull())
              .drop("__close_ts"))
    return closed.select(*hist_cols).unionByName(inserts)


def scd2_merge_sql(
    history_table: str,
    updates_table: str,
    key_cols: "list[str] | tuple[str, ...]",
    attr_cols: "list[str] | tuple[str, ...]",
    ts_col: str = "ts",
    ts_type: str = "TIMESTAMP",
) -> str:
    """DuckDB twin of scd2_merge. `ts_type` must name the history's
    valid_to SQL type (TIMESTAMP/DATE/BIGINT...) so the inserts' NULL
    leg unions cleanly — mirroring the Spark side's cast to
    dict(history.dtypes)['valid_to']."""
    keys = ", ".join(key_cols)
    attrs = ", ".join(attr_cols)
    kj = " AND ".join(f"h.{k} = u.{k}" for k in key_cols)
    diff = " OR ".join(
        f"h.{a} IS DISTINCT FROM u.{a}" for a in attr_cols)
    return f"""
WITH changed AS (
  SELECT {', '.join(f'h.{k}' for k in key_cols)},
         u.{ts_col} AS close_ts
  FROM {history_table} h JOIN {updates_table} u ON {kj}
  WHERE h.is_current AND ({diff}) AND u.{ts_col} > h.valid_from
),
closed AS (
  SELECT {', '.join(f'h.{k}' for k in key_cols)},
         {', '.join(f'h.{a}' for a in attr_cols)},
         h.valid_from,
         CASE WHEN h.is_current AND c.close_ts IS NOT NULL
              THEN c.close_ts ELSE h.valid_to END AS valid_to
  FROM {history_table} h
  LEFT JOIN changed c ON {' AND '.join(
      f'h.{k} = c.{k}' for k in key_cols)}
),
inserts AS (
  SELECT {', '.join(f'u.{k}' for k in key_cols)},
         {', '.join(f'u.{a}' for a in attr_cols)},
         u.{ts_col} AS valid_from,
         NULL::{ts_type} AS valid_to
  FROM {updates_table} u
  LEFT JOIN (SELECT * FROM {history_table} WHERE is_current) h
    ON {kj}
  WHERE ({' AND '.join(f'h.{k} IS NULL' for k in key_cols)}
         OR (({diff}) AND u.{ts_col} > h.valid_from))
)
SELECT {keys}, {attrs}, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM (SELECT * FROM closed UNION ALL SELECT * FROM inserts)
"""


def scd2_as_of(dim: DataFrame, ts, ts_type: str = "timestamp"
               ) -> DataFrame:
    """The dimension as it stood at instant `ts` — the point-in-time
    lookup SCD2 exists for (half-open intervals:
    valid_from <= ts < valid_to; the open row covers everything past
    its valid_from). Drops the bookkeeping is_current column."""
    t = F.lit(ts).cast(ts_type)
    return (dim.filter((F.col("valid_from") <= t)
                       & (F.col("valid_to").isNull()
                          | (t < F.col("valid_to"))))
            .drop("is_current"))
