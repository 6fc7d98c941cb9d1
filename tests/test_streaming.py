"""Streaming parity tests: availableNow drain of a document directory,
back-pressure option plumbing, watermarked window shape, and the
foreachBatch route fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.extract import extract_text
from nifi_extracttext_processor_spark.streaming.pipeline import (
    drain_directory, foreach_batch_routes, read_document_stream,
    windowed_event_counts,
)
from tests.fixtures.builders import build_docx, build_pdf


@pytest.fixture()
def doc_dir(tmp_path):
    (tmp_path / "a.pdf").write_bytes(build_pdf(["fast great engine"]))
    (tmp_path / "b.docx").write_bytes(build_docx(["slow awful day"]))
    return str(tmp_path)


def test_drain_directory(spark, doc_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    drain_directory(spark, doc_dir, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 2
    texts = {r["filename"]: r["text"] for r in got.collect()}
    assert texts["a.pdf"].startswith("fast great engine")
    assert {r["error"] for r in got.collect()} == {None}


def test_stream_is_streaming_with_backpressure(spark, doc_dir):
    s = read_document_stream(spark, doc_dir, max_files_per_trigger=1)
    assert s.isStreaming
    assert "filename" in s.columns


def test_foreach_batch_routes(spark, doc_dir, tmp_path):
    """availableNow run with the 3-way sentiment fan-out writing one
    dir per route via foreachBatch (B12+B16 streaming shape)."""
    from nifi_extracttext_processor_spark.operators.nlp import sentiment

    seen: dict[str, int] = {}

    def make_sink(name):
        def _s(df, batch_id):
            seen[name] = seen.get(name, 0) + df.count()
        return _s

    stream = read_document_stream(spark, doc_dir)
    extracted = sentiment(extract_text(stream), text_col="text")
    routes = {
        "good": "SELECT * FROM FLOWFILE WHERE sentiment = 'POSITIVE'",
        "bad": "SELECT * FROM FLOWFILE WHERE sentiment = 'NEGATIVE'",
    }
    sinks = {k: make_sink(k) for k in routes}
    q = (extracted.writeStream
         .foreachBatch(foreach_batch_routes(routes, sinks))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    assert seen == {"good": 1, "bad": 1}


def test_windowed_event_counts_batch_shape(spark, sf_dir):
    """The watermarked agg runs identically on a batch frame (late-data
    semantics only differ in streaming mode)."""
    from nifi_extracttext_processor_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = windowed_event_counts(events)
    row = out.first()
    assert row["n_events"] >= 1
    assert set(out.columns) == {"hour", "event_type", "n_events",
                                "total_value"}


def test_stream_dedup_exact(spark, tmp_path):
    """Streaming exact dedup keeps first arrival per fingerprint within
    the watermark horizon (dropDuplicatesWithinWatermark state shape)."""
    import datetime as dt

    from nifi_extracttext_processor_spark.streaming.pipeline import (
        stream_dedup_exact,
    )
    src = str(tmp_path / "src")
    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    rows = [(i, ["same text", "Same   TEXT", f"unique {i}"][i % 3],
             base + dt.timedelta(minutes=i)) for i in range(9)]
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).write.mode("overwrite").parquet(src)
    stream = (spark.readStream
              .schema("doc_id long, text string, ts timestamp")
              .parquet(src))
    out = stream_dedup_exact(stream, watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("dedup_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, text FROM dedup_t").collect()
    texts = sorted(r["text"].lower().replace("   ", " ") for r in got)
    # 3 "unique i" docs survive; the 6 same-text docs collapse to 1
    assert len(got) == 4
    assert texts.count("same text") == 1


def test_streaming_scrub_and_quality(spark, tmp_path):
    """The round-2 text operators are pure narrow projections, so they
    compose with Structured Streaming unchanged: stream PDFs in, scrub
    PII + score quality, drain with availableNow."""
    from nifi_extracttext_processor_spark.operators.text_analysis import (
        quality_score, scrub_pii,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.pdf").write_bytes(build_pdf(
        ["reach me at jane.doe@corp.example or https://corp.example/x"]))
    (src / "b.pdf").write_bytes(build_pdf(["nothing sensitive here"]))

    stream = read_document_stream(spark, str(src))
    extracted = extract_text(stream)
    enriched = quality_score(scrub_pii(extracted, "text"), "text")
    out = str(tmp_path / "out")
    (enriched.writeStream.format("parquet")
     .option("path", out)
     .option("checkpointLocation", str(tmp_path / "ckpt"))
     .trigger(availableNow=True).start().awaitTermination(120))

    got = {r["filename"]: r for r in spark.read.parquet(out).collect()}
    assert got["a.pdf"]["n_email"] == 1 and got["a.pdf"]["n_url"] == 1
    assert "<EMAIL>" in got["a.pdf"]["scrubbed"]
    assert "jane.doe" not in got["a.pdf"]["scrubbed"]
    assert got["b.pdf"]["n_email"] == 0
    assert 0.0 <= got["b.pdf"]["quality"] <= 1.0
