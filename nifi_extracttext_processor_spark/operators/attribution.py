"""Multi-touch conversion attribution — "which channel gets credit
for this purchase": the standard marketing-analytics readout over an
activity log (the events table shape: user, timestamp, event type,
value). For each conversion event, credit the user's touch events
inside a lookback window under one of the standard models:

    first      100% to the earliest touch
    last       100% to the latest touch before conversion
    linear     1/k to each of the k touches
    position   40% first, 40% last, 20% split over the middles
               (the "U-shaped" model; k=1 -> 100%, k=2 -> 50/50)

All weights are exact rationals of small integers (one IEEE division
each, identical both engines) — no decay exponentials, so the whole
surface is oracle-replayable (a half-life model would put a
transcendental per row between the engines; position-based is what
practitioners use when they want the U-shape without that).

Scale shape: ONE shuffle by user co-locates touches with
conversions; the per-conversion window then runs inside each user's
slice. The touch-x-conversion fan-out is bounded per user by
(touches in lookback) x (conversions) — activity logs are bounded
per user per window in practice; for adversarial hot users compose
with skew.salted_join or pre-cap touches per (user, day). Weighting
needs each conversion's touch count and endpoints: rather than a
second shuffle, rn/cnt come from ONE window over the pair table
(partitioned by conversion id, already co-located by the join).

Determinism: touch order inside a conversion is (ts, touch event id)
— a total order, so first/last/position credits never depend on
partitioning. Ties between a touch and the conversion timestamp
count as touches (<=, the industry convention for same-instant
click-through)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


from ..sqlutil import sql_lit

MODELS = ("first", "last", "linear", "position")


def attribute_conversions(
    events: DataFrame,
    touch_types: "list[str]",
    conversion_type: str = "purchase",
    model: str = "last",
    lookback_days: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-touch credit table: (conv_id, touch_id, touch_type,
    user, n_touches, weight, attributed_value). Conversions with NO
    touch in the lookback are absent (unattributable — callers who
    need them reconcile against the conversion count; see
    attribution_report's `unattributed` row). NULL timestamps/values
    are excluded on both sides."""
    if model not in MODELS:
        raise ValueError(f"model must be one of {MODELS}")
    if lookback_days <= 0:
        raise ValueError("lookback_days must be positive")
    base = events.filter(F.col(ts_col).isNotNull())
    touches = (base.filter(F.col(type_col).isin(list(touch_types)))
               .select(F.col(user_col).alias("user"),
                       F.col(id_col).alias("touch_id"),
                       F.col(type_col).alias("touch_type"),
                       F.col(ts_col).alias("touch_ts")))
    convs = (base.filter(F.col(type_col) == conversion_type)
             .filter(F.col(value_col).isNotNull())
             .select(F.col(user_col).alias("user"),
                     F.col(id_col).alias("conv_id"),
                     F.col(ts_col).alias("conv_ts"),
                     F.col(value_col).alias("conv_value")))
    pairs = touches.join(convs, "user").filter(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts")
           >= F.col("conv_ts") - F.expr(f"INTERVAL {int(lookback_days)} DAYS")))
    w = Window.partitionBy("conv_id")
    wo = w.orderBy("touch_ts", "touch_id")
    pairs = (pairs
             .withColumn("__rn", F.row_number().over(wo))
             .withColumn("__k", F.count("*").over(w)))
    k = F.col("__k").cast("double")
    rn = F.col("__rn")
    if model == "first":
        weight = F.when(rn == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "last":
        weight = F.when(rn == F.col("__k"), F.lit(1.0)) \
            .otherwise(F.lit(0.0))
    elif model == "linear":
        weight = F.lit(1.0) / k
    else:  # position (U-shaped 40/20/40)
        weight = (
            F.when(F.col("__k") == 1, F.lit(1.0))
            .when(F.col("__k") == 2, F.lit(0.5))
            .when(rn == 1, F.lit(0.4))
            .when(rn == F.col("__k"), F.lit(0.4))
            .otherwise(F.lit(0.2) / (k - F.lit(2.0))))
    out = pairs.select(
        "conv_id", "touch_id", "touch_type", "user",
        F.col("__k").alias("n_touches"),
        weight.alias("weight"),
        (weight * F.col("conv_value")).alias("attributed_value"))
    return out.filter(F.col("weight") > 0)


def attribution_report(
    events: DataFrame,
    touch_types: "list[str]",
    conversion_type: str = "purchase",
    model: str = "last",
    lookback_days: int = 30,
    round_dp: int = 4,
    **kw,
) -> DataFrame:
    """Per-channel rollup: (touch_type, n_conversions, n_credits,
    attributed_value) + an 'unattributed' row (present only when
    nonempty) carrying the conversions (and value) no lookback touch
    could claim — so the report always reconciles to the total
    conversion value. attributed_value sums per-credit products in a
    deterministic order-independent way: each credit's weight*value
    is quantized to the 1e-6 grid and summed in decimal (exact),
    then divided once."""
    if model not in MODELS:
        raise ValueError(f"model must be one of {MODELS}")
    if lookback_days <= 0:
        raise ValueError("lookback_days must be positive")
    user_col = kw.get("user_col", "user_id")
    ts_col = kw.get("ts_col", "ts")
    type_col = kw.get("type_col", "event_type")
    id_col = kw.get("id_col", "event_id")
    value_col = kw.get("value_col", "value")
    # ONE pass (r12 plan audit: the credits->anti-join shape ran the
    # pair join + windows twice): conversions LEFT JOIN touches, so a
    # conversion with no lookback touch survives as a single
    # null-touch row and becomes the 'unattributed' bucket directly —
    # no second scan, no anti-join, no union.
    base = events.filter(F.col(ts_col).isNotNull())
    touches = (base.filter(F.col(type_col).isin(list(touch_types)))
               .select(F.col(user_col).alias("user"),
                       F.col(id_col).alias("touch_id"),
                       F.col(type_col).alias("__tt"),
                       F.col(ts_col).alias("touch_ts")))
    convs = (base.filter(F.col(type_col) == conversion_type)
             .filter(F.col(value_col).isNotNull())
             .select(F.col(user_col).alias("user"),
                     F.col(id_col).alias("conv_id"),
                     F.col(ts_col).alias("conv_ts"),
                     F.col(value_col).alias("conv_value")))
    pairs = convs.join(
        touches,
        (convs["user"] == touches["user"])
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts")
           - F.expr(f"INTERVAL {int(lookback_days)} DAYS")),
        "left").drop(touches["user"])
    w = Window.partitionBy("conv_id")
    wo = w.orderBy("touch_ts", "touch_id")
    pairs = (pairs
             .withColumn("__rn", F.row_number().over(wo))
             .withColumn("__k", F.count("touch_id").over(w)))
    k = F.col("__k").cast("double")
    rn = F.col("__rn")
    if model == "first":
        weight = F.when(rn == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "last":
        weight = F.when(rn == F.col("__k"), F.lit(1.0)) \
            .otherwise(F.lit(0.0))
    elif model == "linear":
        weight = F.lit(1.0) / k
    else:  # position (U-shaped 40/20/40)
        weight = (
            F.when(F.col("__k") == 1, F.lit(1.0))
            .when(F.col("__k") == 2, F.lit(0.5))
            .when(rn == 1, F.lit(0.4))
            .when(rn == F.col("__k"), F.lit(0.4))
            .otherwise(F.lit(0.2) / (k - F.lit(2.0))))
    weight = F.when(F.col("touch_id").isNull(), F.lit(1.0)) \
        .otherwise(weight)
    credited = (pairs
                .withColumn("__w", weight)
                .filter(F.col("__w") > 0)
                .select(
                    F.coalesce(F.col("__tt"), F.lit("unattributed"))
                    .alias("touch_type"),
                    "conv_id",
                    F.col("touch_id").isNotNull().cast("long")
                    .alias("__is_credit"),
                    (F.col("__w") * F.col("conv_value"))
                    .alias("attributed_value")))
    q = F.round(F.col("attributed_value") * 1e6).cast("decimal(38,0)")
    return (credited
            .groupBy("touch_type")
            .agg(F.count_distinct("conv_id").alias("n_conversions"),
                 F.sum("__is_credit").alias("n_credits"),
                 F.sum(q).alias("__sv"))
            .select("touch_type", "n_conversions", "n_credits",
                    dround(F.col("__sv").cast("double") / F.lit(1e6),
                            round_dp).alias("attributed_value"))
            .orderBy("touch_type"))


def attribution_report_sql(
    table: str,
    touch_types: "list[str]",
    conversion_type: str = "purchase",
    model: str = "last",
    lookback_days: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of attribution_report (same one-pass LEFT join,
    same (ts, id) total order, same exact-grid value sums)."""
    if model not in MODELS:
        raise ValueError(f"model must be one of {MODELS}")
    tt = ", ".join(sql_lit(t) for t in touch_types)
    if model == "first":
        weight = "CASE WHEN rn = 1 THEN 1.0 ELSE 0.0 END"
    elif model == "last":
        weight = "CASE WHEN rn = k THEN 1.0 ELSE 0.0 END"
    elif model == "linear":
        weight = "1.0 / k::DOUBLE"
    else:
        weight = ("CASE WHEN k = 1 THEN 1.0 WHEN k = 2 THEN 0.5 "
                  "WHEN rn = 1 THEN 0.4 WHEN rn = k THEN 0.4 "
                  "ELSE 0.2 / (k::DOUBLE - 2.0) END")
    return f"""
WITH touches AS (
  SELECT {user_col} AS u, {id_col} AS touch_id,
         {type_col} AS tt, {ts_col} AS touch_ts
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {type_col} IN ({tt})
),
convs AS (
  SELECT {user_col} AS u, {id_col} AS conv_id, {ts_col} AS conv_ts,
         {value_col} AS conv_value
  FROM {table}
  WHERE {ts_col} IS NOT NULL
    AND {type_col} = {sql_lit(conversion_type)}
    AND {value_col} IS NOT NULL
),
pairs AS (
  SELECT t.touch_id, t.tt, c.conv_id, c.conv_value,
         row_number() OVER (PARTITION BY c.conv_id
                            ORDER BY t.touch_ts, t.touch_id) AS rn,
         count(t.touch_id) OVER (PARTITION BY c.conv_id) AS k
  FROM convs c LEFT JOIN touches t
    ON t.u = c.u
   AND t.touch_ts <= c.conv_ts
   AND t.touch_ts >= c.conv_ts - INTERVAL {int(lookback_days)} DAY
),
credited AS (
  SELECT coalesce(tt, 'unattributed') AS touch_type, conv_id,
         CAST(touch_id IS NOT NULL AS BIGINT) AS is_credit,
         (CASE WHEN touch_id IS NULL THEN 1.0 ELSE {weight} END)
           AS w,
         (CASE WHEN touch_id IS NULL THEN 1.0 ELSE {weight} END)
           * conv_value AS av
  FROM pairs
)
SELECT touch_type,
       count(DISTINCT conv_id) AS n_conversions,
       CAST(sum(is_credit) AS BIGINT) AS n_credits,
       round(sum(CAST(round(av * 1e6) AS HUGEINT))::DOUBLE / 1e6,
             {round_dp}) AS attributed_value
FROM credited WHERE w > 0 GROUP BY touch_type
ORDER BY touch_type
"""


def time_to_convert(
    events: DataFrame,
    touch_types: "list[str]",
    conversion_type: str = "purchase",
    lookback_days: int = 30,
    from_touch: str = "first",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(days_to_convert, n_conversions, total_value) — the latency
    distribution between a user's first (or last) lookback touch and
    the conversion, in whole days: the input a lookback-window choice
    or a remarketing schedule should be read from (a 30-day window is
    wrong in both directions if 95% of conversions close in 2 days).

    Same pair join + (ts, id)-ordered window as
    attribute_conversions; days = datediff (integer, exact both
    engines); value sums on the exact 1e-6 grid. Conversions with no
    lookback touch appear as days_to_convert = NULL (the
    unattributed bucket, so the histogram reconciles too)."""
    if from_touch not in ("first", "last"):
        raise ValueError("from_touch must be 'first' or 'last'")
    if lookback_days <= 0:
        raise ValueError("lookback_days must be positive")
    base = events.filter(F.col(ts_col).isNotNull())
    touches = (base.filter(F.col(type_col).isin(list(touch_types)))
               .select(F.col(user_col).alias("user"),
                       F.col(id_col).alias("touch_id"),
                       F.col(ts_col).alias("touch_ts")))
    convs = (base.filter(F.col(type_col) == conversion_type)
             .filter(F.col(value_col).isNotNull())
             .select(F.col(user_col).alias("user"),
                     F.col(id_col).alias("conv_id"),
                     F.col(ts_col).alias("conv_ts"),
                     F.col(value_col).alias("conv_value")))
    # one-pass LEFT join (same r12 plan-audit fix as
    # attribution_report): touchless conversions keep a single
    # null-touch row and land in the NULL bucket without a second
    # scan or anti-join
    pairs = convs.join(
        touches,
        (convs["user"] == touches["user"])
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts")
           - F.expr(f"INTERVAL {int(lookback_days)} DAYS")),
        "left").drop(touches["user"])
    anchor = F.when(F.col("touch_id").isNotNull(),
                    F.struct("touch_ts", "touch_id"))
    pick = F.min(anchor) if from_touch == "first" else F.max(anchor)
    anchored = (pairs.groupBy("conv_id", "conv_ts", "conv_value")
                .agg(pick.alias("__a")))
    with_days = anchored.select(
        "conv_id", "conv_value",
        F.datediff(F.to_date("conv_ts"),
                   F.to_date("__a.touch_ts")).cast("long")
        .alias("days_to_convert"))
    q = F.round(F.col("conv_value") * 1e6).cast("decimal(38,0)")
    return (with_days
            .groupBy("days_to_convert")
            .agg(F.count("*").alias("n_conversions"),
                 F.sum(q).alias("__sv"))
            .select("days_to_convert", "n_conversions",
                    dround(F.col("__sv").cast("double") / F.lit(1e6),
                            4).alias("total_value"))
            .orderBy(F.col("days_to_convert").asc_nulls_last()))


def time_to_convert_sql(
    table: str,
    touch_types: "list[str]",
    conversion_type: str = "purchase",
    lookback_days: int = 30,
    from_touch: str = "first",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> str:
    """DuckDB twin of time_to_convert (same pair join, same
    (ts, id) struct min/max anchor, same NULL bucket)."""
    if from_touch not in ("first", "last"):
        raise ValueError("from_touch must be 'first' or 'last'")
    tt = ", ".join(sql_lit(t) for t in touch_types)
    agg = "min" if from_touch == "first" else "max"
    return f"""
WITH touches AS (
  SELECT {user_col} AS u, {id_col} AS touch_id, {ts_col} AS touch_ts
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {type_col} IN ({tt})
),
convs AS (
  SELECT {user_col} AS u, {id_col} AS conv_id, {ts_col} AS conv_ts,
         {value_col} AS conv_value
  FROM {table}
  WHERE {ts_col} IS NOT NULL
    AND {type_col} = {sql_lit(conversion_type)}
    AND {value_col} IS NOT NULL
),
pairs AS (
  SELECT c.conv_id, c.conv_ts, c.conv_value,
         t.touch_ts, t.touch_id
  FROM convs c LEFT JOIN touches t
    ON t.u = c.u
   AND t.touch_ts <= c.conv_ts
   AND t.touch_ts >= c.conv_ts - INTERVAL {int(lookback_days)} DAY
),
anchored AS (
  SELECT conv_id, conv_value,
         date_diff('day',
                   ({agg}(CASE WHEN touch_id IS NOT NULL THEN
                            struct_pack(touch_ts := touch_ts,
                                        touch_id := touch_id) END)
                   ).touch_ts::DATE,
                   conv_ts::DATE)::BIGINT AS days_to_convert
  FROM pairs GROUP BY conv_id, conv_ts, conv_value
)
SELECT days_to_convert, count(*) AS n_conversions,
       round(sum(CAST(round(conv_value * 1e6) AS HUGEINT))::DOUBLE
             / 1e6, 4) AS total_value
FROM anchored GROUP BY days_to_convert
ORDER BY days_to_convert ASC NULLS LAST
"""


def cap_touches_per_day(
    events: DataFrame,
    touch_types: "list[str]",
    max_per_day: int = 100,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Hot-user insurance for the attribution family (the safeguard
    the pair-join docstrings point at): keep at most `max_per_day`
    touch events per (user, day) — the FIRST by the (ts, id) total
    order, deterministic — and pass every non-touch event through
    untouched. Bounds the touch x conversion fan-out per user at
    max_per_day x lookback_days x conversions: a bot with 10^7
    clicks/day contributes max_per_day rows to every pair window
    instead of serializing one task.

    The per-(user, day) window is itself bounded the same way the
    bucketed sessionizer's is — a key's partition holds one day of
    one user, never their history. Run BEFORE attribution_report /
    time_to_convert / stream_touch_conversion_pairs; results on
    capped data are the documented approximation (position/linear
    weights then credit the kept representatives)."""
    if max_per_day < 1:
        raise ValueError("max_per_day must be >= 1")
    is_touch = (F.col(type_col).isin(list(touch_types))
                & F.col(ts_col).isNotNull())
    touches = events.filter(is_touch)
    others = events.filter(~F.coalesce(is_touch, F.lit(False)))
    w = Window.partitionBy(user_col, F.to_date(ts_col)) \
        .orderBy(ts_col, id_col)
    kept = (touches.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= int(max_per_day))
            .drop("__rn"))
    return kept.unionByName(others)
