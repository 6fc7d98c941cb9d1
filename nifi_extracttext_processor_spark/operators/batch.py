"""B13 MergeContent + B14 PutFile: batching and file sinks.

Reference: Bin-Packing merge, 5–15000 records/bin, Avro output
(56409-tika.xml:1325-1348), then PutFile with Conflict Resolution=ignore
(:1127-1175). In Spark, "bins" are output files: we size them by target
records-per-file, which both bounds file counts at 100 TB (the
small-files problem) and keeps bin semantics (row preservation, bounded
entries per file).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def bin_pack(
    df: DataFrame,
    min_entries: int = 5,
    max_entries: int = 15_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """Repartition so each output file holds ≤ max_entries rows.

    Uses a cheap count (or caller-provided approx_rows) — at scale
    prefer `maxRecordsPerFile`, applied by write_files below, which
    needs no count at all; this explicit variant exists for parity
    with MergeContent's bin-count behavior.
    """
    n = approx_rows if approx_rows is not None else df.count()
    bins = max(1, math.ceil(n / max_entries))
    # repartition unconditionally: coalesce can't widen, and probing
    # df.rdd.getNumPartitions() forces an RDD conversion per call
    return df.repartition(bins)


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "ignore",
    max_records_per_file: int = 15_000,
    partition_by: list[str] | None = None,
) -> None:
    """B14 PutFile. mode='ignore' mirrors Conflict Resolution=ignore.

    `maxRecordsPerFile` enforces MergeContent's max-entries bound
    without a driver-side count — the scalable path. Avro needs the
    spark-avro package; parquet is the default here (columnar, splittable
    — the right call at 100 TB) with fmt='avro' available when the
    runtime ships the connector.
    """
    if fmt == "avro":
        from ..sinks.connectors import avro_available

        if not avro_available(df.sparkSession):
            raise RuntimeError(
                "Avro format unavailable: spark-avro is not on the "
                "classpath. Launch with SPARK_GRAFT_PACKAGES="
                "org.apache.spark:spark-avro_2.13:<spark-version> "
                "(or use the parquet default)")
    writer = (df.write.mode(mode)
              .option("maxRecordsPerFile", max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
