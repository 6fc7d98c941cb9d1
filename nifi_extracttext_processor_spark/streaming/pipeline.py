"""Structured Streaming parity (SURVEY §1.3): NiFi is an always-on
micro-batcher; the Spark equivalent is a file-source stream with
`maxFilesPerTrigger` (≈ queue back-pressure, B19) and
`trigger(availableNow=True)` for drain-the-directory runs.

The reference needs no watermarks (no event-time ops), but
`windowed_event_counts` shows the watermarked shape used by the
events-stream extension, and `sessionize_events` demonstrates custom
stateful logic via applyInPandasWithState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)


def read_document_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 100,
    glob: str | None = None,
) -> DataFrame:
    """Streaming binaryFile source with back-pressure (B19:
    maxFilesPerTrigger ≈ the 10k-object queue ceiling,
    56409-tika.xml:21-22)."""
    reader = (spark.readStream.format("binaryFile")
              .schema("path STRING, modificationTime TIMESTAMP, "
                      "length LONG, content BINARY")
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.withColumn(
        "filename", F.element_at(F.split(F.col("path"), "/"), -1))


def drain_directory(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    transform=None,
    fmt: str = "parquet",
) -> None:
    """availableNow drain: process everything currently in the
    directory through the extraction pipeline, then stop — the batch-
    parity mode of the always-on flow."""
    from ..operators.extract import extract_text

    stream = read_document_stream(spark, input_path)
    out = transform(stream) if transform else extract_text(stream)
    q = (out.writeStream.format(fmt)
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def foreach_batch_routes(
    routes_sql: dict[str, str],
    sinks: dict[str, object],
):
    """B12-in-streaming: per micro-batch, evaluate route predicates once
    over the cached batch and hand each route to its sink callable."""
    from ..operators.routing import query_routes

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            routed = query_routes(batch_df, routes_sql, cache=False)
            for name, df in routed.items():
                sink = sinks.get(name)
                if sink is not None:
                    sink(df, batch_id)
        finally:
            batch_df.unpersist()
    return _fn


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — the late-data-safe shape of
    the events_window_agg extension query."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("hour"), "event_type",
                    "n_events", "total_value"))


def stream_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each normalized
    fingerprint within the watermark horizon.

    100 TB posture: state holds only (fingerprint, window) keys — 32
    bytes per distinct doc inside the horizon, evicted by the watermark
    (dropDuplicatesWithinWatermark), so state size is bounded by the
    dedup window, not the corpus. The text itself never enters state.
    """
    from ..operators.dedup import _norm

    return (docs
            .withColumn("fingerprint", F.md5(_norm(text_col)))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["fingerprint"]))


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("first_ts", TimestampType()),
    StructField("last_ts", TimestampType()),
])

_SESSION_STATE = StructType([
    StructField("n", LongType()),
    StructField("first_ts", TimestampType()),
    StructField("last_ts", TimestampType()),
])


def sessionize_events(events: DataFrame,
                      gap: str = "30 minutes") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    session aggregation with a processing-time timeout — the pattern
    for operators Spark's built-ins can't express."""
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd
        n = 0
        first_ts = last_ts = None
        if state.exists:
            n, first_ts, last_ts = state.get
        for pdf in pdf_iter:
            n += len(pdf)
            lo, hi = pdf["ts"].min(), pdf["ts"].max()
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([{
                "user_id": key[0], "n_events": n,
                "first_ts": first_ts, "last_ts": last_ts}])
        else:
            state.update((n, first_ts, last_ts))
            state.setTimeoutDuration(gap)
            yield pd.DataFrame(
                [], columns=["user_id", "n_events", "first_ts", "last_ts"])

    return (events.groupBy("user_id").applyInPandasWithState(
        update, SESSION_SCHEMA, _SESSION_STATE, "update",
        GroupStateTimeout.ProcessingTimeTimeout))
