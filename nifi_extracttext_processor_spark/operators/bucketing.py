"""Bucketed tables: pre-shuffled storage for co-located joins.

The 100 TB pattern the flow template can't express but a Spark user
needs: write both sides of a recurring join `bucketBy` the join key
once, and every subsequent join is exchange-free (each task reads
matching buckets locally — no shuffle of either table at query time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    bucket_cols = ([bucket_cols] if isinstance(bucket_cols, str)
                   else list(bucket_cols))
    writer = (df.write.mode(mode).format(fmt)
              .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        sort_cols = ([sort_cols] if isinstance(sort_cols, str)
                     else list(sort_cols))
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key: with matching bucket
    counts Spark plans a shuffle-free sort-merge join (verify with
    .explain — no Exchange above either scan)."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on, how)
