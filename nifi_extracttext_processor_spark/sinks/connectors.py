"""Connector availability probes (B13 Avro merge format, B15 Kafka).

The reference template writes Avro files and publishes Avro records to
Kafka (56409-tika.xml:1325,1329,2583). Spark ships both connectors as
separate packages; this container has neither. These probes let callers
branch cleanly, and `session.get_spark` honors SPARK_GRAFT_PACKAGES
(comma-separated Maven coordinates → spark.jars.packages) so the same
code runs the real Avro/Kafka paths wherever the jars are available:

    SPARK_GRAFT_PACKAGES=org.apache.spark:spark-avro_2.13:4.0.0,\
org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0

Proof obligations wired to these probes (no jar → honest skip, jar →
must pass):
  * tests/test_operators.py::TestAvroCodec::
    test_jar_backed_avro_roundtrip_when_available — to_avro/from_avro
    record round-trip, runs green wherever avro_available() is true.
  * The jar-FREE Avro path needs no probe at all: formats.avro_codec
    implements the Avro spec (binary encoding + object container files)
    stdlib-only, and operators.batch.write_avro_portable /
    read_avro_portable + sinks.kafka_sink.serialize_records_avro run
    the B13/B15 Avro shapes in this container, spec-conformance
    golden-tested.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

def _source_resolves(spark: SparkSession, name: str) -> bool:
    """Ask Spark's own DataSource resolution whether `name` is usable
    (Class.forName is not enough — partial classes can be present while
    the data source module itself is absent)."""
    try:
        jss = spark._jsparkSession  # noqa: SLF001
        (spark._jvm.org.apache.spark.sql.execution  # noqa: SLF001
         .datasources.DataSource
         .lookupDataSource(name, jss.sessionState().conf()))
        return True
    except Exception:
        return False


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source is usable."""
    return _source_resolves(spark, "avro")


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is usable."""
    return _source_resolves(spark, "kafka")
