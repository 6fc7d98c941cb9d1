"""B15 PublishKafkaRecord → Spark Kafka sink.

Reference config (56409-tika.xml:2572-2600): bootstrap localhost:9092,
record-oriented (Avro-serialized) values. Spark's Kafka connector needs
the spark-sql-kafka package on the classpath; this container ships
without it, so the sink degrades to a clear error unless a caller
injects a running broker + package. The record serialization itself
(to JSON bytes; to_avro when the avro package is present) is pure
DataFrame code and fully tested.

Environment determination (README "B15 Kafka write path"): this
container has no connector jar, no network to fetch one, and no
broker — the write path can never execute here. The degradation
contract is what's testable in-container and IS tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def serialize_records(
    df: DataFrame,
    value_cols: list[str] | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Produce the (key, value) binary shape the Kafka sink requires."""
    value_cols = value_cols or df.columns
    out = df.select(
        *( [F.col(key_col).cast("string").alias("key")] if key_col else [] ),
        F.to_json(F.struct(*[F.col(c) for c in value_cols]),
                  {"ignoreNullFields": "false"}).alias("value"))
    return out


def serialize_records_avro(
    df: DataFrame,
    value_cols: list[str] | None = None,
    key_col: str | None = None,
    record_name: str = "PDF",
) -> DataFrame:
    """B15's record shape with AVRO-serialized values (the template's
    AvroRecordSetWriter), jar-free: each value is the spec-compliant
    Avro binary encoding of the record (formats.avro_codec) produced in
    an Arrow-batched mapInPandas stage. Where spark-avro is on the
    classpath, prefer `F.to_avro` (JVM-side) — both produce
    interchangeable bytes for the supported types."""
    from ..formats.avro_codec import avro_schema_of, encode_value

    value_cols = value_cols or df.columns
    proj = df.select(*(
        ([F.col(key_col).cast("string").alias("__key")] if key_col else [])
        + [F.col(c) for c in value_cols]))
    schema = avro_schema_of(proj.select(*value_cols), record_name)
    out_ddl = ("key string, " if key_col else "") + "value binary"

    def _run(batches):
        import pandas as pd
        for pdf in batches:
            values = [
                encode_value(schema,
                             {c: (None if pd.isna(row[c]) else row[c])
                              for c in value_cols})
                for _, row in pdf.iterrows()]
            out = {"value": values}
            if key_col:
                out = {"key": list(pdf["__key"]), "value": values}
            yield pd.DataFrame(out)

    return proj.mapInPandas(_run, schema=out_ddl)


def write_kafka(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    value_cols: list[str] | None = None,
    key_col: str | None = None,
) -> None:
    """Batch Kafka write (use .writeStream in streaming pipelines).

    Runnable wherever the connector jar is present — launch with
    SPARK_GRAFT_PACKAGES including spark-sql-kafka (see
    sinks.connectors); probe with connectors.kafka_available(spark).
    """
    from .connectors import kafka_available

    if not kafka_available(df.sparkSession):
        raise RuntimeError(
            "Kafka sink unavailable: spark-sql-kafka is not on the "
            "classpath. Launch with SPARK_GRAFT_PACKAGES="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>")
    payload = serialize_records(df, value_cols, key_col)
    try:
        (payload.write.format("kafka")
         .option("kafka.bootstrap.servers", bootstrap_servers)
         .option("topic", topic)
         .save())
    except Exception as exc:  # connector or broker missing in this env
        raise RuntimeError(
            "Kafka sink unavailable (needs spark-sql-kafka package and a "
            f"reachable broker at {bootstrap_servers})") from exc
