"""Parquet table loader for the synthetic star schema (TESTDATA.md).

Normalizes physical-type quirks so queries see clean logical types:
  * events.ts is TIMESTAMP(NANOS) in parquet — Spark reads it as long
    (spark.sql.legacy.parquet.nanosAsLong) and we convert to a proper
    timestamp here (nanos → micros truncation, matching how DuckDB's
    date_trunc treats the same instants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The conf must be set on *this* session (callers may hand us a session
    # built without it — e.g. an external harness) or the TIMESTAMP(NANOS)
    # physical type in events.parquet is rejected with PARQUET_TYPE_ILLEGAL.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # pre-3.2 Sparks lack the conf; the read will surface any issue
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer `div`, not `/1000` — epoch-nanos exceed double's 53-bit
        # mantissa, so float division can be off by ±1 µs vs the exact
        # truncation DuckDB applies when it reads TIMESTAMP(NANOS)
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_catalog(spark: SparkSession, path: str,
                 cols: "tuple[str, ...] | None" = None):
    """Read an append-only parquet catalog, or return None when the
    path does not exist (first run). Existence is checked through the
    Hadoop FileSystem API — works for local paths, HDFS and object
    stores alike — so that ONLY genuine absence bootstraps: a broad
    `except AnalysisException` would also swallow a corrupt or
    mis-schemaed catalog and silently re-process the whole corpus.
    Corruption therefore propagates as an error, which is the safe
    behavior for a dedup/progress catalog."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    df = spark.read.parquet(path)
    return df.select(*cols) if cols else df
