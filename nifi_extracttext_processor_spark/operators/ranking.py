"""Distributed exact global ranking — the shared primitive under
`assign_shards_balanced` (token-balanced LPT sharding) and
`sample_negative_pairs` (dense-rank jump sampling), and any other
operator needing a total 0-based row number over a strict order.

Why this exists: `row_number().over(Window.orderBy(...))` with no
partitionBy is executed by Spark as `Exchange SinglePartition` — every
row funnels through ONE task, a single-task sort and OOM hazard that
silently caps the operator at driver/executor-heap scale. The exact
distributed construction (the classic two-pass ranking, e.g.
Spark's own zipWithIndex shape on RDDs) is:

    1. repartitionByRange on the sort keys — a true range sort:
       partition i holds keys strictly before partition i+1's, each
       partition bounded at ~N/P rows;
    2. local row_number keyed by `spark_partition_id()` — a KEYED
       window (P groups, each bounded by the range partitioner);
    3. per-partition counts (one bounded P-row collect) prefix-summed
       on the driver and broadcast back: global = offset[pid] + local.

Determinism: with a strict total order (the caller must include a
unique tiebreak column) the resulting rank is partition-invariant —
range-boundary sampling can move rows between partitions but never
changes how many rows sort before a given row — so reruns, other
cluster layouts, and DuckDB `row_number() OVER (ORDER BY ...)` twins
all agree exactly.

Cost: two passes over the range-partitioned slim frame (persisted
between them), one P-row collect, one broadcast join. At 10^11 rows
with 10^4 partitions that is a routine range shuffle of the projected
sort keys — the floor for any exact global ranking — and nothing ever
moves through a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .lifecycle import track_persist


def distributed_row_number(
    df: DataFrame,
    order_exprs,
    out_col: str = "__rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add 0-based `out_col` = global row number of each row under
    `order_exprs` (a list of Column sort expressions forming a STRICT
    total order — include a unique tiebreaker), computed distributed:
    no stage moves more than ~N/P rows through one task. Triggers one
    bounded job (the P-row per-partition count collect)."""
    order_exprs = list(order_exprs)
    if not order_exprs:
        raise ValueError("order_exprs must be non-empty")
    spark = df.sparkSession
    p = int(num_partitions
            or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = track_persist(
        df.repartitionByRange(p, *order_exprs)
        .withColumn("__pid", F.spark_partition_id()))
    counts = ranged.groupBy("__pid").count().collect()  # ≤ P rows
    acc, rows = 0, []
    for r in sorted(counts, key=lambda r: r["__pid"]):
        rows.append((r["__pid"], acc))
        acc += r["count"]
    if not rows:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offsets = spark.createDataFrame(rows, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*order_exprs)
    return (ranged.join(F.broadcast(offsets), "__pid")
            .withColumn(out_col,
                        (F.col("__off") + F.row_number().over(w) - 1)
                        .cast("long"))
            .drop("__pid", "__off"))
