"""Time-bucketed rollup maintenance — the hypertable/continuous-
aggregate pattern (TimescaleDB continuous aggregates, Druid rollup
segments): keep a small ADDITIVE state table at fine grain (day), and
answer any coarser-grain query (month, year, all-time) by re-
aggregating the state — never rescanning the events. At 100 TB this
is the difference between "dashboard query = 3-second state-table
agg" and "dashboard query = full corpus scan": the state is
events-agnostic after build, merges across days/backfills/engines,
and every supported metric is exactly reconstructible because only
ALGEBRAIC aggregates are stored (count/sum/min/max; avg derives as
sum/count at query time; distinct counts ride the portable HLL
register tables from operators/sketch.py, whose bucket-max merge is
associative — day registers merged to month EQUAL month registers
built directly).

Invariant (the oracle): rollup-of-rollup == direct aggregation at the
target grain, value-exact. The DuckDB twins aggregate the raw events
directly at the coarse grain; the Spark side answers from the day
state. Grains: hour/day/month/year (week is excluded — date_trunc
week boundaries are locale/tz-sensitive, the sessions.py finding).

Scale shape: build = ONE map-side-combinable groupBy (rows collapse
to (bucket, dims) cells before the shuffle; payloads never move);
merge/re-grain/query = the same agg over the already-tiny state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


_GRAINS = ("hour", "day", "month", "year")
_FINER = {g: i for i, g in enumerate(_GRAINS)}


def _check_grain(grain: str) -> str:
    if grain not in _GRAINS:
        raise ValueError(f"grain must be one of {_GRAINS}")
    return grain


def rollup_build(
    df: DataFrame,
    ts_col: str = "ts",
    grain: str = "day",
    dims: "list[str] | None" = None,
    value_col: str | None = None,
) -> DataFrame:
    """(bucket, dims..., n_rows[, n_vals, sum_v, min_v, max_v]) —
    the additive state at `grain`. NULL values count in n_rows but
    not in the value metrics (SQL aggregate semantics)."""
    _check_grain(grain)
    dims = list(dims or [])
    aggs = [F.count("*").alias("n_rows")]
    if value_col is not None:
        v = F.col(value_col).cast("double")
        aggs += [F.count(v).alias("n_vals"),
                 F.sum(v).alias("sum_v"),
                 F.min(v).alias("min_v"),
                 F.max(v).alias("max_v")]
    return (df.select(F.date_trunc(grain, F.col(ts_col))
                      .alias("bucket"), *dims,
                      *([value_col] if value_col else []))
            .groupBy("bucket", *dims)
            .agg(*aggs))


def rollup_merge(*states: DataFrame,
                 dims: "list[str] | None" = None) -> DataFrame:
    """Union state tables (same grain/dims/metrics) and re-add —
    daily increments, backfills, other engines' states. `dims`
    defaults to every non-bucket, non-metric column (pass explicitly
    if a dim name starts with a metric prefix)."""
    if not states:
        raise ValueError("nothing to merge")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    if dims is None:
        dims = [c for c in out.columns if c != "bucket"
                and not c.startswith(("n_", "sum_", "min_", "max_"))]
    return _readd(out, dims)


def _readd(state: DataFrame, dims: "list[str]") -> DataFrame:
    aggs = [F.sum("n_rows").alias("n_rows")]
    if "sum_v" in state.columns:
        aggs += [F.sum("n_vals").alias("n_vals"),
                 F.sum("sum_v").alias("sum_v"),
                 F.min("min_v").alias("min_v"),
                 F.max("max_v").alias("max_v")]
    return state.groupBy("bucket", *dims).agg(*aggs)


def rollup_to_grain(
    state: DataFrame,
    grain: str,
    dims: "list[str] | None" = None,
) -> DataFrame:
    """Re-aggregate a finer-grain state to `grain` (and optionally a
    dims SUBSET — dims can only be dropped, never added). Exact by
    algebra: sums add, min/min, max/max."""
    _check_grain(grain)
    dims = list(dims or [])
    coarse = state.withColumn("bucket",
                              F.date_trunc(grain, F.col("bucket")))
    return _readd(coarse, dims)


def rollup_query(
    state: DataFrame,
    grain: str,
    dims: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """The dashboard read: (bucket, dims..., n_rows[, n_vals, sum_v,
    min_v, max_v, avg_v]) at `grain` from ANY finer state — avg
    derived as sum/n_vals at query time (never stored: averages of
    averages are wrong), doubles rounded for cross-engine stability."""
    out = rollup_to_grain(state, grain, dims)
    if "sum_v" not in out.columns:
        return out
    return out.select(
        "bucket", *(dims or []), "n_rows", "n_vals",
        dround("sum_v", round_dp).alias("sum_v"),
        dround("min_v", round_dp).alias("min_v"),
        dround("max_v", round_dp).alias("max_v"),
        dround(F.try_divide(F.col("sum_v"), F.col("n_vals")),
                round_dp).alias("avg_v"))


def rollup_query_sql(
    table: str,
    ts_col: str = "ts",
    grain: str = "day",
    dims: "list[str] | None" = None,
    value_col: str | None = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin: DIRECT aggregation of the raw events at `grain` —
    the rollup-of-rollup == direct-agg invariant is the oracle."""
    _check_grain(grain)
    dims = list(dims or [])
    dsel = ("".join(f"{d}, " for d in dims))
    cols = [f"CAST(date_trunc('{grain}', {ts_col}) AS TIMESTAMP) "
            "AS bucket"]
    mets = ["count(*) AS n_rows"]
    if value_col is not None:
        v = f"CAST({value_col} AS DOUBLE)"
        mets += [f"count({v}) AS n_vals",
                 f"round(sum({v}), {round_dp}) AS sum_v",
                 f"round(min({v}), {round_dp}) AS min_v",
                 f"round(max({v}), {round_dp}) AS max_v",
                 f"round(sum({v}) / nullif(count({v}), 0), "
                 f"{round_dp}) AS avg_v"]
    return (f"SELECT bucket, {dsel}{', '.join(mets)} FROM "
            f"(SELECT *, {cols[0]} FROM {table}) "
            f"GROUP BY bucket{''.join(', ' + d for d in dims)}")


# ---------------------------------------------------------------------------
# Distinct counts ride the portable HLL registers (operators/
# sketch.py): build registers keyed by (fine bucket, dims), answer any
# coarser grain by re-truncating the bucket and re-maxing — register
# merge is associative, so day→month merge EQUALS direct month build.
# ---------------------------------------------------------------------------

def rollup_distinct_build(
    df: DataFrame,
    col: str,
    ts_col: str = "ts",
    grain: str = "day",
    dims: "list[str] | None" = None,
    b: int = 12,
    seed: int = 0,
) -> DataFrame:
    """(bucket, dims..., hll_bucket, rho) register state for distinct-
    `col` at `grain` (the HLL register index is renamed hll_bucket so
    it cannot collide with the time bucket)."""
    from .sketch import hll_partials

    _check_grain(grain)
    dims = list(dims or [])
    keyed = df.select(F.date_trunc(grain, F.col(ts_col))
                      .alias("__tb"), *dims, col)
    out = hll_partials(keyed, col, ["__tb"] + dims, b, seed)
    return (out.withColumnRenamed("bucket", "hll_bucket")
            .withColumnRenamed("__tb", "bucket"))


def rollup_distinct_query(
    state: DataFrame,
    grain: str,
    dims: "list[str] | None" = None,
    b: int = 12,
) -> DataFrame:
    """(bucket, dims..., est_distinct) at any grain >= the state's."""
    from .sketch import hll_estimate

    _check_grain(grain)
    dims = list(dims or [])
    coarse = (state.withColumn("bucket",
                               F.date_trunc(grain, F.col("bucket")))
              .groupBy("bucket", *dims, "hll_bucket")
              .agg(F.max("rho").alias("rho")))
    # hll_estimate expects the register index under its own name
    return hll_estimate(
        coarse.withColumnRenamed("bucket", "__tb")
        .withColumnRenamed("hll_bucket", "bucket"),
        ["__tb"] + dims, b).withColumnRenamed("__tb", "bucket")
