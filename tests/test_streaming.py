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


def test_stream_dedup_near_cross_batch(spark, tmp_path):
    """MinHash-band streaming near-dedup: two micro-batches
    (maxFilesPerTrigger=1, one parquet file each), with a batch-2 doc
    that is a near-dup of a batch-1 doc — its bands are already claimed
    in state, so it is suppressed across the batch boundary."""
    import datetime as dt

    from nifi_extracttext_processor_spark.streaming.pipeline import (
        near_dup_survivors, stream_dedup_near,
    )

    base_text = ("the quick brown fox jumps over the lazy dog while "
                 "seventeen sleepy cats watch from the warm windowsill")
    near_text = ("the quick brown fox jumps over the lazy dog while "
                 "seventeen sleepy cats watch from the cold windowsill")
    other = ("completely unrelated content about spark structured "
             "streaming state stores and watermark based eviction")

    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    schema = "doc_id long, text string, ts timestamp"
    batch1 = spark.createDataFrame(
        [(1, base_text, t0), (2, other, t0)], schema)
    batch1.coalesce(1).write.parquet(str(src / "b1"))
    batch2 = spark.createDataFrame(
        [(3, near_text, t0 + dt.timedelta(minutes=5))], schema)
    batch2.coalesce(1).write.parquet(str(src / "b2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    verdicts = stream_dedup_near(stream, watermark="1 hour")
    q = (verdicts.writeStream.format("memory").queryName("near_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    all_verdicts = spark.sql("SELECT * FROM near_t")
    survivors = {r["doc_id"]
                 for r in near_dup_survivors(all_verdicts).collect()}
    # doc 3 shares ≥1 minhash band with doc 1 (one word differs) and
    # must be suppressed even though it arrived in a later micro-batch
    assert 1 in survivors and 2 in survivors
    assert 3 not in survivors

    # sanity: doc 3 produced verdicts, at least one on a claimed band
    v3 = [r["new_band"] for r in
          all_verdicts.filter("doc_id = 3").collect()]
    assert v3 and not all(v3)


def test_stream_dedup_near_state_evicts_past_horizon(spark, tmp_path):
    """Watermark-bounded state: a band claimed at t0 with a 10-minute
    horizon is evicted once event time moves far past it — the same
    text arriving hours later is treated as fresh (state is bounded by
    the dedup window, not the corpus)."""
    import datetime as dt

    from nifi_extracttext_processor_spark.streaming.pipeline import (
        near_dup_survivors, stream_dedup_near,
    )

    text = ("the quick brown fox jumps over the lazy dog while "
            "seventeen sleepy cats watch from the warm windowsill")
    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    schema = "doc_id long, text string, ts timestamp"
    spark.createDataFrame([(1, text, t0)], schema) \
        .coalesce(1).write.parquet(str(src / "b1"))
    # advance the watermark far past t0 + horizon with an unrelated doc
    spark.createDataFrame(
        [(2, "completely different filler content to push the "
             "watermark forward well beyond the horizon boundary",
          t0 + dt.timedelta(hours=3))], schema) \
        .coalesce(1).write.parquet(str(src / "b2"))
    # same text again, hours later: its bands were evicted
    spark.createDataFrame(
        [(3, text, t0 + dt.timedelta(hours=4))], schema) \
        .coalesce(1).write.parquet(str(src / "b3"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    verdicts = stream_dedup_near(stream, watermark="10 minutes")
    q = (verdicts.writeStream.format("memory").queryName("evict_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    survivors = {r["doc_id"] for r in near_dup_survivors(
        spark.sql("SELECT * FROM evict_t")).collect()}
    # doc 3 is textually identical to doc 1 but beyond the horizon:
    # state evicted, so it survives as fresh
    assert {1, 2, 3} <= survivors


def test_batch_twin_matches_duckdb_oracle(spark):
    """dedup_near_bands_batch against its DuckDB SQL twin, value for
    value — the oracle check for the band-claim contract that the
    streaming operator's state machine implements. (No __spark_entry__
    slot: the driver's 50-query correctness window is full; this test
    carries the same side-by-side comparison.)"""
    import datetime as dt

    import duckdb
    import pandas as pd

    from nifi_extracttext_processor_spark.streaming.pipeline import (
        dedup_near_bands_batch, dedup_near_bands_batch_sql,
    )

    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen sleepy cats watch from the %s windowsill")
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, base % "warm", t0),
        (2, base % "cold", t0 + dt.timedelta(minutes=5)),    # near-dup
        (3, "completely unrelated words about sailing boats "
            "across the wide open ocean water today", t0),
        (4, base % "warm", t0 + dt.timedelta(hours=5)),      # far repeat
        (5, base % "warm", t0 + dt.timedelta(hours=5, minutes=1)),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    df = spark.createDataFrame(
        pdf, "doc_id long, text string, ts timestamp")
    got = sorted(
        (r["doc_id"], r["bkey"], r["new_band"])
        for r in dedup_near_bands_batch(df, watermark="1 hour").collect())
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        (int(r["doc_id"]), r["bkey"], bool(r["new_band"]))
        for _, r in con.execute(dedup_near_bands_batch_sql(
            "docs", watermark_ms=3_600_000)).df().iterrows())
    assert got == want
    # semantic spot checks: doc 2 shares >=1 claimed band with doc 1;
    # doc 4 (5h later) is past the 1h horizon -> all bands fresh; doc 5
    # repeats doc 4 within the horizon -> all bands suppressed
    by_doc = {}
    for d, _, nb in got:
        by_doc.setdefault(d, []).append(nb)
    assert not all(by_doc[2])
    assert all(by_doc[4])
    assert not any(by_doc[5])


def test_batch_twin_agrees_with_stream(spark, tmp_path):
    """Where the stream's watermark has advanced past a claim before a
    repeat arrives (the deterministic regime), stream_dedup_near and
    dedup_near_bands_batch emit IDENTICAL verdict rows — both on a
    cross-batch suppression fixture and on an eviction fixture."""
    import datetime as dt

    from nifi_extracttext_processor_spark.streaming.pipeline import (
        dedup_near_bands_batch, stream_dedup_near,
    )

    base_text = ("the quick brown fox jumps over the lazy dog while "
                 "seventeen sleepy cats watch from the warm windowsill")
    near_text = ("the quick brown fox jumps over the lazy dog while "
                 "seventeen sleepy cats watch from the cold windowsill")
    filler = ("completely different filler content to push the "
              "watermark forward well beyond the horizon boundary")
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    schema = "doc_id long, text string, ts timestamp"

    scenarios = [
        # suppression: near-dup 5 min later, 1h horizon
        ("1 hour", [
            [(1, base_text, t0), (2, filler, t0)],
            [(3, near_text, t0 + dt.timedelta(minutes=5))],
        ]),
        # eviction: same text 4h later, 10 min horizon, watermark
        # advanced in between by an unrelated middle batch
        ("10 minutes", [
            [(1, base_text, t0)],
            [(2, filler, t0 + dt.timedelta(hours=3))],
            [(3, base_text, t0 + dt.timedelta(hours=4))],
        ]),
    ]
    for i, (wm, batches) in enumerate(scenarios):
        src = tmp_path / f"src{i}"
        src.mkdir()
        all_rows = []
        for j, batch in enumerate(batches):
            spark.createDataFrame(batch, schema) \
                .coalesce(1).write.parquet(str(src / f"b{j}"))
            all_rows += batch
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .option("recursiveFileLookup", "true")
                  .parquet(str(src)))
        q = (stream_dedup_near(stream, watermark=wm)
             .writeStream.format("memory").queryName(f"twin_eq_{i}")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        streamed = sorted(
            (r["doc_id"], r["bkey"], r["new_band"])
            for r in spark.sql(f"SELECT * FROM twin_eq_{i}").collect())
        batch_df = spark.createDataFrame(all_rows, schema)
        twin = sorted(
            (r["doc_id"], r["bkey"], r["new_band"])
            for r in dedup_near_bands_batch(
                batch_df, watermark=wm).collect())
        assert twin == streamed, f"scenario {i} diverged"


def test_stream_semantic_dedup_cross_batch(spark, tmp_path):
    """Two micro-batches through the foreachBatch semantic-dedup
    catalog: batch 1 bootstraps (empty catalog), batch 2's near-dup of
    a cataloged vector is pruned while its novel vector survives."""
    import time

    from nifi_extracttext_processor_spark.streaming.pipeline import (
        stream_semantic_dedup,
    )

    src = tmp_path / "src"
    cat = str(tmp_path / "catalog")
    src.mkdir()
    schema = "vec_id long, embedding array<double>"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(str(src / name))

    # batch 1: one direction + an exact near-dup + an orthogonal one
    write_batch("b1", [(1, [1.0, 0.0, 0.0]),
                       (2, [1.0, 0.001, 0.0]),
                       (3, [0.0, 0.0, 1.0])])
    fb = stream_semantic_dedup(None, cat, threshold=0.99, k=2, iters=1)
    b1 = spark.read.parquet(str(src / "b1"))
    fb(b1, 0)
    kept1 = {r["vec_id"] for r in spark.read.parquet(cat).collect()}
    assert kept1 == {1, 3}      # bootstrap: within-batch min-id rule

    # batch 2: near-dup of cataloged id 1 + a genuinely new direction
    write_batch("b2", [(10, [1.0, 0.002, 0.0]),
                       (11, [0.0, 1.0, 0.0])])
    b2 = spark.read.parquet(str(src / "b2"))
    fb(b2, 1)
    kept2 = {r["vec_id"] for r in spark.read.parquet(cat).collect()}
    assert 10 not in kept2      # pruned against the catalog
    assert 11 in kept2
    assert kept1 <= kept2       # catalog is append-only


def test_stream_semantic_dedup_out_of_order_and_replay(spark, tmp_path):
    """Adversarial cross-batch fixture (VERDICT r15 task 7):
    out-of-order ids across batch boundaries + at-least-once replay.

    The suppression rule is CATALOG-FIRST, not global min-id: a
    LOWER-id near-dup arriving in a LATER batch must be pruned
    against its earlier-cataloged higher-id twin (ids carry no
    arrival-order meaning across micro-batches). And replaying a
    batch must converge: the replay's rows all prune against their
    own cataloged survivors (cos = 1.0 >= threshold), so the catalog
    gains nothing."""
    from nifi_extracttext_processor_spark.streaming.pipeline import (
        stream_semantic_dedup,
    )

    cat = str(tmp_path / "catalog")
    schema = "vec_id long, embedding array<double>"
    fb = stream_semantic_dedup(None, cat, threshold=0.99, k=2, iters=1)

    # batch 0 arrives FIRST but carries the HIGH ids: a direction, its
    # within-batch near-dup (min-id rule keeps 100), an orthogonal one
    b0 = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]),
         (101, [1.0, 0.001, 0.0]),
         (102, [0.0, 0.0, 1.0])], schema)
    fb(b0, 0)
    kept0 = {r["vec_id"] for r in spark.read.parquet(cat).collect()}
    assert kept0 == {100, 102}

    # batch 1: LOWER id 5 is a near-dup of cataloged 100 — pruned even
    # though 5 < 100 (catalog-first, not min-id); 6 is genuinely new
    b1 = spark.createDataFrame(
        [(5, [1.0, 0.002, 0.0]),
         (6, [0.0, 1.0, 0.0])], schema)
    fb(b1, 1)
    kept1 = {r["vec_id"] for r in spark.read.parquet(cat).collect()}
    assert 5 not in kept1, "lower-id late arrival must NOT displace " \
        "its cataloged higher-id twin"
    assert kept1 == {100, 102, 6}

    # at-least-once replay of batch 1: survivors prune against
    # themselves (cos 1.0), catalog converges — no duplicate rows
    fb(b1, 1)
    rows = spark.read.parquet(cat).collect()
    assert len(rows) == 3
    assert {r["vec_id"] for r in rows} == {100, 102, 6}


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (bounded state via max_duration +
    watermarks) produces exactly the batch interval_join's inner-join
    result over the same data."""
    import datetime as dt

    from nifi_extracttext_processor_spark.operators.temporal import (
        interval_join,
    )
    from nifi_extracttext_processor_spark.streaming.pipeline import (
        stream_interval_join,
    )
    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def t(m):
        return base + dt.timedelta(minutes=m)

    clicks = [(i, i % 2, t(i * 3)) for i in range(20)]
    windows = [(100, 0, t(0), t(10)), (101, 1, t(9), t(30)),
               (102, 0, t(40), t(45)),
               (103, 1, t(50), t(40))]   # degenerate: dropped
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ldf = spark.createDataFrame(clicks, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        windows, "rid long, k long, start timestamp, end timestamp")
    ldf.write.mode("overwrite").parquet(lsrc)
    rdf.write.mode("overwrite").parquet(rsrc)

    ls = (spark.readStream.schema("lid long, k long, ts timestamp")
          .parquet(lsrc))
    rs = (spark.readStream
          .schema("rid long, k long, start timestamp, end timestamp")
          .parquet(rsrc))
    out = stream_interval_join(ls, rs, by="k", max_duration="30 minutes",
                               right_cols=("rid",))
    q = (out.writeStream.format("memory").queryName("sij")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["lid"], r["rid"]) for r in
                 spark.sql("SELECT lid, rid FROM sij").collect())
    want = sorted((r["lid"], r["rid"]) for r in
                  interval_join(ldf, rdf, ts_col="ts", start_col="start",
                                end_col="end", by="k",
                                bucket_seconds=600.0,
                                right_cols=("rid",)).collect())
    assert got == want and len(got) > 0


def test_stream_interval_join_guards(spark, tmp_path):
    from nifi_extracttext_processor_spark.streaming.pipeline import (
        stream_interval_join,
    )
    import datetime as dt
    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    spark.createDataFrame([(1, base)], "lid long, ts timestamp") \
        .write.parquet(str(tmp_path / "x"))
    spark.createDataFrame([(1, base, base)],
                          "lid long, start timestamp, end timestamp") \
        .write.parquet(str(tmp_path / "y"))
    ls = (spark.readStream.schema("lid long, ts timestamp")
          .parquet(str(tmp_path / "x")))
    rs = (spark.readStream
          .schema("lid long, start timestamp, end timestamp")
          .parquet(str(tmp_path / "y")))
    with pytest.raises(ValueError):
        stream_interval_join(ls, rs)  # lid payload collides with lid


def test_stream_touch_conversion_pairs_matches_batch(spark, tmp_path):
    """Streaming attribution pairs (stream-stream join with the
    lookback condition bounding state) emit exactly the batch pair
    set, and the batch attribution_report over the landed pairs
    agrees with attribution_report over the original events."""
    import datetime as dt

    from nifi_extracttext_processor_spark.operators.attribution import (
        attribution_report,
    )
    from nifi_extracttext_processor_spark.streaming.pipeline import (
        stream_touch_conversion_pairs,
    )
    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def t(d):
        return base + dt.timedelta(days=d)

    rows = [
        (1, t(0), 1, "click", None), (2, t(2), 1, "view", None),
        (3, t(3), 1, "click", None), (4, t(4), 1, "purchase", 100.0),
        (5, t(0), 2, "view", None), (6, t(1), 2, "purchase", 50.0),
        (7, t(-40), 3, "click", None), (8, t(0), 3, "purchase", 30.0),
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    events = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "events")
    events.write.mode("overwrite").parquet(src)

    es = spark.readStream.schema(schema).parquet(src)
    from pyspark.sql import functions as F
    touches = es.filter(F.col("event_type").isin("click", "view"))
    convs = es.filter(F.col("event_type") == "purchase")
    pairs = stream_touch_conversion_pairs(touches, convs,
                                          lookback_days=30)
    q = (pairs.writeStream.format("memory").queryName("attrp")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["conv_id"], r["touch_id"]) for r in
                 spark.sql("SELECT conv_id, touch_id FROM attrp")
                 .collect())
    # batch pair set: conversions 4 (touches 1,2,3) and 6 (touch 5);
    # conversion 8's only touch is outside the lookback
    assert got == [(4, 1), (4, 2), (4, 3), (6, 5)]

    # landed pairs feed the batch weighting half unchanged: rebuild
    # an events-shaped frame from the pair stream + the conversions
    landed = spark.sql("SELECT * FROM attrp")
    touch_events = landed.select(
        F.col("touch_id").alias("event_id"),
        F.col("touch_ts").alias("ts"),
        F.col("user_id"),
        F.col("touch_type").alias("event_type"),
        F.lit(None).cast("double").alias("value")).distinct()
    conv_events = events.filter(F.col("event_type") == "purchase")
    rebuilt = touch_events.unionByName(
        conv_events.select("event_id", "ts", "user_id",
                           "event_type", "value"))
    a = [tuple(r) for r in attribution_report(
        rebuilt, ["click", "view"], model="position").collect()]
    b = [tuple(r) for r in attribution_report(
        events, ["click", "view"], model="position").collect()]
    assert a == b


def test_stream_sessionize_matches_batch_partition(spark, tmp_path):
    """Native session windows close the same sessions the batch
    gaps-and-islands sessionizer finds: same (user, start, n_events,
    total_value) partition with stream gap = batch gap + 1 (the
    strict-less-than boundary contract documented on the operator)."""
    import datetime as dt

    from nifi_extracttext_processor_spark.operators.sessions import (
        sessionize,
    )
    from nifi_extracttext_processor_spark.streaming.pipeline import (
        stream_sessionize,
    )
    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def t(s):
        return base + dt.timedelta(seconds=s)

    rows = []
    eid = 0
    # u1: bursts at 0-20s (3 events), then 2000s (1), then 4000-4005 (2)
    for s in (0, 10, 20, 2000, 4000, 4005):
        rows.append((eid, t(s), 1, "x", 1.0)); eid += 1
    # u2: single event (bounce) + exact-boundary pair (gap == 30)
    rows.append((eid, t(0), 2, "x", 2.0)); eid += 1
    rows.append((eid, t(100), 2, "x", 2.0)); eid += 1
    rows.append((eid, t(130), 2, "x", 2.0)); eid += 1
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "ev")
    df.write.mode("overwrite").parquet(src)

    es = spark.readStream.schema(schema).parquet(src)
    out = stream_sessionize(es, gap_seconds=31)   # batch gap 30 (+1)
    # complete mode for the drain: append emits a session only once
    # the WATERMARK passes its end, so the final open sessions of a
    # finite drain would stay in state (correct always-on semantics;
    # the batch operator is the completeness path for landed data)
    q = (out.writeStream.format("memory").queryName("ssz")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"],
         r["total_value"])
        for r in spark.sql("SELECT * FROM ssz").collect())
    want = sorted(
        (r["user_id"], r["session_start"], r["n_events"],
         r["total_value"])
        for r in sessionize(df, gap_seconds=30).collect())
    assert got == want and len(got) == 5
    # exact-boundary pair (100 -> 130, gap == 30) stayed ONE session
    u2 = [g for g in got if g[0] == 2]
    assert sorted(x[2] for x in u2) == [1, 2]
