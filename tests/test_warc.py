"""WARC/WET source: pure-Python parser units, fail-closed fuzz, and
the distributed read path."""

from __future__ import annotations

import gzip

import pytest

from nifi_extracttext_processor_spark.sources import warc as W


def _sample_wet() -> bytes:
    return W.build_wet([
        ("http://a.example/1", "hello world"),
        ("http://b.example/2", "κόσμε unicode"),
        ("http://c.example/3", ""),
    ])


class TestParser:
    def test_wet_gzip_members(self):
        recs = list(W.parse_warc(_sample_wet()))
        assert [r["warc_type"] for r in recs] == ["conversion"] * 3
        assert recs[0]["target_uri"] == "http://a.example/1"
        assert recs[0]["text"] == "hello world"
        assert recs[1]["text"] == "κόσμε unicode"
        assert recs[2]["text"] == ""
        assert all(r["http_status"] is None for r in recs)

    def test_plain_concatenation(self):
        data = W.build_wet([("u:1", "x"), ("u:2", "y")],
                           gzip_members=False)
        recs = list(W.parse_warc(data))
        assert [r["text"] for r in recs] == ["x", "y"]

    def test_single_member_gzip_of_many_records(self):
        # some writers gzip the whole file as ONE member
        plain = W.build_wet([("u:1", "x"), ("u:2", "y")],
                            gzip_members=False)
        recs = list(W.parse_warc(gzip.compress(plain, mtime=0)))
        assert [r["text"] for r in recs] == ["x", "y"]

    def test_response_record_http_split(self):
        body = "<html><body>Hi é</body></html>".encode()
        rec = W.build_response_record("http://e.example/", body)
        (r,) = W.parse_warc(rec)
        assert r["warc_type"] == "response"
        assert r["http_status"] == 200
        assert r["payload"] == body
        assert "Hi é" in r["text"]

    def test_response_non_text_payload_has_no_text(self):
        rec = W.build_response_record(
            "http://e.example/img", b"\x89PNG....",
            http_content_type="image/png")
        (r,) = W.parse_warc(rec)
        assert r["text"] is None
        assert r["payload"] == b"\x89PNG...."

    def test_charset_parameter_honored(self):
        body = "café".encode("latin-1")
        rec = W.build_response_record(
            "u:cs", body, http_content_type="text/html; charset=latin-1")
        (r,) = W.parse_warc(rec)
        assert r["text"] == "café"

    def test_unknown_charset_falls_back_utf8(self):
        rec = W.build_response_record(
            "u:cs", b"abc",
            http_content_type="text/html; charset=no-such-enc")
        (r,) = W.parse_warc(rec)
        assert r["text"] == "abc"

    def test_warcinfo_record_payload_passthrough(self):
        rec = W.build_warc_record(
            "warcinfo", b"software: test\r\n",
            content_type="application/warc-fields")
        (r,) = W.parse_warc(rec)
        assert r["warc_type"] == "warcinfo"
        assert r["payload"] == b"software: test\r\n"
        assert r["text"] is None


class TestFailClosed:
    def test_truncated_block(self):
        rec = W.build_warc_record("conversion", b"full payload")
        with pytest.raises(ValueError, match="truncated WARC"):
            list(W.parse_warc(rec[:-10]))

    def test_missing_content_length(self):
        bad = (b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\n"
               b"body\r\n\r\n")
        with pytest.raises(ValueError, match="Content-Length"):
            list(W.parse_warc(bad))

    def test_bad_version_line(self):
        with pytest.raises(ValueError, match="version"):
            list(W.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n"))

    def test_oversize_content_length_rejected_before_alloc(self):
        bad = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
               b"Content-Length: 99999999999999\r\n\r\n")
        with pytest.raises(ValueError, match="Content-Length"):
            list(W.parse_warc(bad))

    def test_corrupt_gzip(self):
        data = bytearray(gzip.compress(b"x" * 100, mtime=0))
        data[15] ^= 0xFF
        with pytest.raises(ValueError):
            list(W.parse_warc(bytes(data)))

    def test_truncated_gzip_member(self):
        data = gzip.compress(
            W.build_warc_record("conversion", b"abc"), mtime=0)
        with pytest.raises(ValueError):
            list(W.parse_warc(data[: len(data) // 2]))

    def test_zip_bomb_bounded(self):
        # a ~100 KiB gzip member inflating past the record budget must
        # raise, not allocate the full expansion
        old = W.MAX_RECORD_BYTES
        W.MAX_RECORD_BYTES = 1 << 20
        try:
            bomb = gzip.compress(b"\0" * (4 << 20), mtime=0)
            with pytest.raises(ValueError, match="budget"):
                list(W.parse_warc(bomb))
        finally:
            W.MAX_RECORD_BYTES = old

    def test_fuzz_never_hangs_or_leaks(self):
        import hashlib
        seed = _sample_wet()
        for i in range(60):
            b = bytearray(seed)
            h = hashlib.md5(str(i).encode()).digest()
            for k in range(4):
                b[h[k] % len(b)] ^= h[4 + k] or 1
            try:
                list(W.parse_warc(bytes(b)))
            except (ValueError, EOFError):
                pass


class TestSparkPath:
    def test_read_warc_distributed(self, spark, tmp_path):
        for i in range(3):
            (tmp_path / f"seg{i}.warc.gz").write_bytes(W.build_wet(
                [(f"http://s{i}.example/{j}", f"doc {i}-{j}")
                 for j in range(4)]))
        df = W.read_warc(spark, str(tmp_path), glob="*.warc.gz")
        rows = df.collect()
        assert len(rows) == 12
        assert {r["warc_type"] for r in rows} == {"conversion"}
        docs = W.warc_to_documents(df).collect()
        assert len(docs) == 12
        assert all(r["n_chars"] == len(r["text"]) for r in docs)
        assert len({r["doc_id"] for r in docs}) == 12

    def test_mixed_response_and_wet(self, spark, tmp_path):
        seg = (gzip.compress(W.build_response_record(
                   "http://h.example/", b"<p>hello</p>"), mtime=0)
               + gzip.compress(W.build_warc_record(
                   "request", b"GET / HTTP/1.1\r\n\r\n",
                   content_type="application/http; msgtype=request"),
                   mtime=0)
               + W.build_wet([("u:w", "wet text")]))
        (tmp_path / "mix.warc.gz").write_bytes(seg)
        df = W.read_warc(spark, str(tmp_path))
        got = {r["warc_type"]: r for r in df.collect()}
        assert set(got) == {"response", "request", "conversion"}
        docs = W.warc_to_documents(df).collect()
        # request record has no text and is dropped
        assert sorted(d["text"] for d in docs) == \
            ["<p>hello</p>", "wet text"]


class TestStreamingIngest:
    def test_stream_web_corpus_cross_batch(self, spark, tmp_path):
        """Two availableNow drains: batch 2 re-delivers one duplicate
        text (different URL) — the fingerprint catalog must drop it —
        plus one genuinely new document that must land."""
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            read_warc_stream, stream_web_corpus,
        )

        good = ("This is a clean and useful document that has the "
                "right length and the words that a quality filter "
                "wants to see in a sentence with enough substance "
                "to pass all of the configured gates.")
        other = ("Another perfectly reasonable article of adequate "
                 "length that the filters should keep, with the "
                 "usual mix of common words that the quality and "
                 "language checks are looking for in real prose.")
        seg_dir = tmp_path / "segments"
        seg_dir.mkdir()
        out_dir = str(tmp_path / "out")
        cat_dir = str(tmp_path / "catalog")

        from nifi_extracttext_processor_spark.sources import warc as W

        def drain():
            stream = read_warc_stream(spark, str(seg_dir))
            q = (stream.writeStream
                 .foreachBatch(stream_web_corpus(out_dir, cat_dir,
                                                 min_quality=0.3))
                 .option("checkpointLocation",
                         str(tmp_path / "chk"))
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        (seg_dir / "b1.warc.gz").write_bytes(
            W.build_wet([("http://a.example/1", good)]))
        drain()
        rows1 = spark.read.parquet(out_dir).collect()
        assert [r["text"] for r in rows1] == [good]

        (seg_dir / "b2.warc.gz").write_bytes(W.build_wet([
            ("http://b.example/dup", good),      # content dup
            ("http://b.example/new", other),     # genuinely new
            ("http://b.example/junk", "zzzz"),   # quality-filtered
        ]))
        drain()
        rows2 = spark.read.parquet(out_dir).collect()
        texts = sorted(r["text"] for r in rows2)
        assert texts == sorted([good, other])
        # catalog carries exactly the two kept fingerprints
        assert spark.read.parquet(cat_dir).count() == 2


class TestStreamWebCorpusAdversarial:
    """Adversarial cross-batch fixture (VERDICT r15 task 7):
    byte-DIFFERENT but normalization-equal content arriving across a
    batch boundary, plus an OUT-OF-ORDER replay of an earlier batch
    after a later batch has landed."""

    # precomposed U+00E9 in one batch, decomposed e+U+0301 in the
    # other: different bytes, identical after NFC — the fingerprint
    # is computed over NORMALIZED text, so the catalog must catch it
    GOOD_NFC = ("This is a clean and useful café document that "
                "has the right length and the words that a quality "
                "filter wants to see in a sentence with enough "
                "substance to pass all of the configured gates.")
    GOOD_NFD = GOOD_NFC.replace("é", "é")
    OTHER = ("Another perfectly reasonable article of adequate "
             "length that the filters should keep, with the usual "
             "mix of common words that the quality and language "
             "checks are looking for in real prose.")

    def _parse(self, spark, seg_path):
        from nifi_extracttext_processor_spark.sources.warc import (
            parse_warc_df,
        )
        files = (spark.read.format("binaryFile")
                 .load(str(seg_path))
                 .select("path", "modificationTime", "length",
                         "content"))
        return parse_warc_df(files)

    def test_normalized_variant_suppressed_and_ooo_replay(
            self, spark, tmp_path):
        assert self.GOOD_NFC.encode() != self.GOOD_NFD.encode()
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_web_corpus,
        )
        out, cat = str(tmp_path / "o"), str(tmp_path / "c")
        fn = stream_web_corpus(out, cat, min_quality=0.3)

        s1 = tmp_path / "b1.warc.gz"
        s1.write_bytes(W.build_wet([("http://a.example/1",
                                     self.GOOD_NFC)]))
        b1 = self._parse(spark, s1)
        fn(b1, 0)

        # batch 1: the NFD byte-variant of the cataloged doc (must be
        # suppressed via the normalized fingerprint) + a new doc
        s2 = tmp_path / "b2.warc.gz"
        s2.write_bytes(W.build_wet([
            ("http://b.example/variant", self.GOOD_NFD),
            ("http://b.example/new", self.OTHER)]))
        fn(self._parse(spark, s2), 1)
        texts = sorted(r["text"] for r in
                       spark.read.parquet(out).collect())
        assert texts == sorted([self.GOOD_NFC, self.OTHER]), \
            "NFD variant escaped the normalized-fingerprint catalog"
        assert spark.read.parquet(cat).count() == 2

        # OUT-OF-ORDER replay: batch 0 re-delivered AFTER batch 1
        # landed — dynamic-partition-overwrite rewrites only batch=0,
        # batch 1's rows stand, and nothing duplicates
        fn(b1, 0)
        texts = sorted(r["text"] for r in
                       spark.read.parquet(out).collect())
        assert texts == sorted([self.GOOD_NFC, self.OTHER])
        assert spark.read.parquet(cat).count() == 2


class TestStreamReplayIdempotent:
    """Round-7 review fix: foreachBatch is at-least-once — replaying
    a batch (same batch_id) must overwrite its own `batch=` partition
    in both output and fingerprint catalog, not append duplicates."""

    GOOD = ("This is a clean and useful document that has the right "
            "length and the words that a quality filter wants to see "
            "in a sentence with enough substance to pass the gates.")

    def _batch_df(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.sources.warc import (
            parse_warc_df,
        )
        seg = tmp_path / "seg.warc.gz"
        seg.write_bytes(W.build_wet([("http://a.example/1",
                                      self.GOOD)]))
        files = (spark.read.format("binaryFile")
                 .load(str(seg)).select("path", "modificationTime",
                                        "length", "content"))
        return parse_warc_df(files)

    def test_full_replay_no_duplicates(self, spark, tmp_path):
        # replay window 2: output AND fingerprints committed, but the
        # checkpoint was not — the rerun's rows all dedup out and the
        # first run's data stands
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_web_corpus,
        )
        out, cat = str(tmp_path / "o"), str(tmp_path / "c")
        fn = stream_web_corpus(out, cat, min_quality=0.3)
        bdf = self._batch_df(spark, tmp_path)
        fn(bdf, 0)
        fn(bdf, 0)  # at-least-once replay
        rows = spark.read.parquet(out).collect()
        assert [r["text"] for r in rows] == [self.GOOD]
        assert spark.read.parquet(cat).count() == 1

    def test_crash_between_writes_replay(self, spark, tmp_path):
        # replay window 1: output committed, fingerprint write lost —
        # the rerun recomputes the same survivors and re-overwrites
        # the batch partition instead of appending
        import shutil

        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_web_corpus,
        )
        out, cat = str(tmp_path / "o"), str(tmp_path / "c")
        fn = stream_web_corpus(out, cat, min_quality=0.3)
        bdf = self._batch_df(spark, tmp_path)
        fn(bdf, 0)
        shutil.rmtree(cat)  # simulate the crash window
        fn(bdf, 0)
        rows = spark.read.parquet(out).collect()
        assert [r["text"] for r in rows] == [self.GOOD]
        assert spark.read.parquet(cat).count() == 1

    def test_distinct_batches_still_accumulate(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_web_corpus,
        )
        other = ("Another perfectly reasonable article of adequate "
                 "length that the filters should keep, with the "
                 "usual mix of common words that the quality and "
                 "language checks look for in real prose.")
        out, cat = str(tmp_path / "o"), str(tmp_path / "c")
        fn = stream_web_corpus(out, cat, min_quality=0.3)
        fn(self._batch_df(spark, tmp_path), 0)
        from nifi_extracttext_processor_spark.sources.warc import (
            parse_warc_df,
        )
        seg2 = tmp_path / "seg2.warc.gz"
        seg2.write_bytes(W.build_wet([("http://b.example/2", other)]))
        files2 = (spark.read.format("binaryFile").load(str(seg2))
                  .select("path", "modificationTime", "length",
                          "content"))
        fn(parse_warc_df(files2), 1)
        texts = sorted(r["text"]
                       for r in spark.read.parquet(out).collect())
        assert texts == sorted([self.GOOD, other])


class TestStreamLmScoring:
    """Round-7: stream_web_corpus with a PRE-TRAINED char-LM — the
    broadcast model makes scores batch-independent: two drains must
    score identically to one batch run over the same documents."""

    DOC_A = ("The committee announced on Tuesday that the new policy "
             "would take effect at the start of the fiscal year and "
             "officials said they expect the measure to reduce costs "
             "across the region for the coming decade.")
    DOC_B = ("Analysts responded that the proposal would require "
             "careful review before the council could act, noting "
             "that the timeline and the budget both remain open "
             "questions for the committee this year.")
    REF = [("r:1", "The committee said the policy and the budget "
                   "would require careful review before officials "
                   "act on the proposal for the region this year."),
           ("r:2", "Officials expect the measure to reduce costs "
                   "and the council noted the timeline remains an "
                   "open question for the coming fiscal year.")]

    def _model(self, spark):
        from nifi_extracttext_processor_spark.operators.lm import (
            train_char_lm,
        )
        ref = spark.createDataFrame(self.REF, "url string, text string")
        return train_char_lm(ref, "text", n=3)

    def _run(self, spark, tmp_path, name, batches):
        from nifi_extracttext_processor_spark.sources.warc import (
            parse_warc_df,
        )
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_web_corpus,
        )
        out = str(tmp_path / f"{name}_o")
        cat = str(tmp_path / f"{name}_c")
        fn = stream_web_corpus(out, cat, min_quality=0.3,
                               lm_model=self._model(spark))
        for bid, docs in enumerate(batches):
            seg = tmp_path / f"{name}_{bid}.warc.gz"
            seg.write_bytes(W.build_wet(docs))
            files = (spark.read.format("binaryFile").load(str(seg))
                     .select("path", "modificationTime", "length",
                             "content"))
            fn(parse_warc_df(files), bid)
        return {r["url"]: (r["n_ngrams"], r["nll"]) for r in
                spark.read.parquet(out).collect()}

    def test_two_drains_score_like_one(self, spark, tmp_path):
        split = self._run(spark, tmp_path, "split",
                          [[("http://a/1", self.DOC_A)],
                           [("http://b/2", self.DOC_B)]])
        onego = self._run(spark, tmp_path, "one",
                          [[("http://a/1", self.DOC_A),
                            ("http://b/2", self.DOC_B)]])
        assert split == onego
        assert all(v[1] is not None for v in split.values())

    def test_lm_model_path_matches_in_memory(self, spark, tmp_path):
        """stream_web_corpus(lm_model=<saved path>) must score
        identically to the in-memory triple (models.py wiring)."""
        from nifi_extracttext_processor_spark.operators.models import (
            save_char_lm,
        )
        from nifi_extracttext_processor_spark.sources.warc import (
            parse_warc_df,
        )
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_web_corpus,
        )
        counts, ctx, vocab = self._model(spark)
        mp = str(tmp_path / "lm_model")
        save_char_lm(mp, counts, ctx, vocab, n=3)
        mem = self._run(spark, tmp_path, "mem",
                        [[("http://a/1", self.DOC_A),
                          ("http://b/2", self.DOC_B)]])
        out = str(tmp_path / "viapath_o")
        fn = stream_web_corpus(out, str(tmp_path / "viapath_c"),
                               min_quality=0.3, lm_model=mp)
        seg = tmp_path / "viapath.warc.gz"
        seg.write_bytes(W.build_wet([("http://a/1", self.DOC_A),
                                     ("http://b/2", self.DOC_B)]))
        files = (spark.read.format("binaryFile").load(str(seg))
                 .select("path", "modificationTime", "length",
                         "content"))
        fn(parse_warc_df(files), 0)
        via_path = {r["url"]: (r["n_ngrams"], r["nll"]) for r in
                    spark.read.parquet(out).collect()}
        assert via_path == mem

    def test_max_nll_filters(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.sources.warc import (
            parse_warc_df,
        )
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_web_corpus,
        )
        # mojibake-ish junk scores far off the reference model
        junk = ("qqxzv wkjq zzqx vkjw qqzx wvkj xqqz " * 6).strip()
        out = str(tmp_path / "o")
        fn = stream_web_corpus(out, str(tmp_path / "c"),
                               min_quality=0.0,
                               lm_model=self._model(spark),
                               max_nll=4.5)
        seg = tmp_path / "s.warc.gz"
        seg.write_bytes(W.build_wet([("u:good", self.DOC_A),
                                     ("u:junk", junk)]))
        files = (spark.read.format("binaryFile").load(str(seg))
                 .select("path", "modificationTime", "length",
                         "content"))
        fn(parse_warc_df(files), 0)
        urls = {r["url"] for r in spark.read.parquet(out).collect()}
        assert urls == {"u:good"}


class TestStreamClassifierGate:
    GOOD = ("The committee announced that the new policy would take "
            "effect next year and officials said they expect the "
            "measure to reduce costs across the region for a decade.")
    SPAM = ("winner winner click the free prize casino bonus click "
            "free casino prize winner bonus click free prize casino "
            "winner click bonus free prize casino winner click now.")

    def _clf(self, spark):
        from nifi_extracttext_processor_spark.operators.classifier import (
            train_text_classifier,
        )
        labeled = spark.createDataFrame(
            [(1, self.GOOD, 1),
             (2, "policy officials committee measure region", 1),
             (3, self.SPAM, 0),
             (4, "click free prize casino winner bonus", 0)],
            "doc_id long, text string, label int")
        w, b, _ = train_text_classifier(labeled, n_buckets=256,
                                        n_iter=30, lr=5.0)
        return w, b

    def _run(self, spark, tmp_path, name, batches, **kw):
        from nifi_extracttext_processor_spark.sources.warc import (
            parse_warc_df,
        )
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_web_corpus,
        )
        out = str(tmp_path / f"{name}_o")
        fn = stream_web_corpus(out, str(tmp_path / f"{name}_c"),
                               min_quality=0.0, **kw)
        for bid, docs in enumerate(batches):
            seg = tmp_path / f"{name}_{bid}.warc.gz"
            seg.write_bytes(W.build_wet(docs))
            files = (spark.read.format("binaryFile").load(str(seg))
                     .select("path", "modificationTime", "length",
                             "content"))
            fn(parse_warc_df(files), bid)
        return {r["url"]: r["clf_prob"] for r in
                spark.read.parquet(out).collect()}

    def test_two_drains_score_like_one_and_gate(self, spark, tmp_path):
        clf = self._clf(spark)
        split = self._run(spark, tmp_path, "split",
                          [[("u:good", self.GOOD)],
                           [("u:spam", self.SPAM)]],
                          classifier=clf)
        onego = self._run(spark, tmp_path, "one",
                          [[("u:good", self.GOOD),
                            ("u:spam", self.SPAM)]],
                          classifier=clf)
        assert split == onego           # batch-independent scores
        assert split["u:good"] > 0.5 > split["u:spam"]
        gated = self._run(spark, tmp_path, "gated",
                          [[("u:good", self.GOOD),
                            ("u:spam", self.SPAM)]],
                          classifier=clf, min_classifier_prob=0.5)
        assert set(gated) == {"u:good"}


class TestReviewFixes:
    def test_xhtml_response_gets_text(self):
        rec = W.build_response_record(
            "u:x", b"<html><body><p>xhtml page</p></body></html>",
            http_content_type="application/xhtml+xml; charset=utf-8")
        (r,) = W.parse_warc(rec)
        assert r["text"] is not None and "xhtml page" in r["text"]

    def test_json_and_plus_xml_textual(self):
        for ct in ("application/json", "image/svg+xml",
                   "application/rss+xml"):
            rec = W.build_response_record(
                "u:t", b'{"k": 1}', http_content_type=ct)
            (r,) = W.parse_warc(rec)
            assert r["text"] is not None, ct

    def test_binary_types_still_opaque(self):
        for ct in ("image/png", "application/pdf",
                   "application/octet-stream"):
            rec = W.build_response_record(
                "u:b", b"\x89binary", http_content_type=ct)
            (r,) = W.parse_warc(rec)
            assert r["text"] is None, ct

    def test_many_members_linear_walk(self):
        # memoryview slicing: 4000 members parse in well under a
        # second; the quadratic version took ~0.8s at 8k and grows 4x
        # per doubling, so a generous bound still catches regression
        import time
        data = W.build_wet([(f"u:{i}", "x" * 50) for i in range(4000)])
        t0 = time.perf_counter()
        n = sum(1 for _ in W.parse_warc(data))
        dt = time.perf_counter() - t0
        assert n == 4000
        assert dt < 2.0, f"gzip member walk too slow: {dt:.2f}s"


class TestTransferCodings:
    """Round-7 review fixes: hostile charset values and HTTP
    transfer/content codings real Common Crawl records carry."""

    def test_charset_with_embedded_nul_does_not_raise(self):
        # codec names with a NUL make io.TextIOWrapper raise
        # ValueError (not LookupError); one hostile page must not
        # fail the task — fall back to utf-8
        rec = W.build_response_record(
            "u:evil", b"hello world",
            http_content_type="text/html; charset=utf-8\x00")
        (r,) = W.parse_warc(rec)
        assert r["text"] == "hello world"

    def test_content_encoding_gzip_inflated(self):
        body = "<p>compressed café</p>".encode()
        rec = W.build_response_record(
            "u:gz", gzip.compress(body, mtime=0),
            extra_http_headers={"Content-Encoding": "gzip"})
        (r,) = W.parse_warc(rec)
        assert "compressed café" in r["text"]

    def test_content_encoding_deflate_both_wrappings(self):
        import zlib
        for enc in (zlib.compress(b"deflate text"),       # zlib-wrapped
                    zlib.compress(b"deflate text")[2:-4]):  # raw
            rec = W.build_response_record(
                "u:df", enc, http_content_type="text/plain",
                extra_http_headers={"Content-Encoding": "deflate"})
            (r,) = W.parse_warc(rec)
            assert r["text"] == "deflate text"

    def test_chunked_transfer_encoding_reassembled(self):
        chunks = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
        rec = W.build_response_record(
            "u:ch", chunks, http_content_type="text/plain",
            extra_http_headers={"Transfer-Encoding": "chunked"})
        (r,) = W.parse_warc(rec)
        assert r["text"] == "hello world"

    def test_chunked_then_gzip(self):
        inner = gzip.compress(b"both codings", mtime=0)
        chunks = (hex(len(inner))[2:].encode() + b"\r\n" + inner
                  + b"\r\n0\r\n\r\n")
        rec = W.build_response_record(
            "u:cg", chunks, http_content_type="text/plain",
            extra_http_headers={"Transfer-Encoding": "chunked",
                                "Content-Encoding": "gzip"})
        (r,) = W.parse_warc(rec)
        assert r["text"] == "both codings"

    def test_malformed_codings_fall_back_to_raw(self):
        # broken chunk framing / unknown coding (br) / corrupt gzip:
        # keep the bytes we have, never raise
        cases = [
            (b"not chunked", {"Transfer-Encoding": "chunked"}),
            (b"brotli bytes", {"Content-Encoding": "br"}),
            (b"\x1f\x8bcorrupt", {"Content-Encoding": "gzip"}),
        ]
        for payload, hdrs in cases:
            rec = W.build_response_record(
                "u:bad", payload, http_content_type="text/plain",
                extra_http_headers=hdrs)
            (r,) = W.parse_warc(rec)
            assert r["payload"] == payload, hdrs

    def test_gzip_bomb_in_content_encoding_fails_closed(self):
        # a tiny gzip member inflating past MAX_RECORD_BYTES must not
        # be materialized — the compressed bytes are kept as-is
        bomb = gzip.compress(b"\x00" * (W.MAX_RECORD_BYTES + 100))
        assert len(bomb) < 1 << 20
        rec = W.build_response_record(
            "u:bomb", bomb, http_content_type="text/plain",
            extra_http_headers={"Content-Encoding": "gzip"})
        (r,) = W.parse_warc(rec)
        assert r["payload"] == bomb


class TestSitemaps:
    URLSET = (b'<?xml version="1.0"?>'
              b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
              b'<url><loc>http://e.x/a</loc>'
              b'<lastmod>2026-01-02</lastmod></url>'
              b'<url><loc> http://e.x/b </loc></url>'
              b'<url><priority>0.5</priority></url>'  # no loc: dropped
              b'</urlset>')

    def test_urlset(self):
        recs = W.parse_sitemap(self.URLSET)
        assert [(r["loc"], r["lastmod"]) for r in recs] == [
            ("http://e.x/a", "2026-01-02"), ("http://e.x/b", None)]
        assert all(r["kind"] == "url" for r in recs)

    def test_sitemapindex_and_gzip(self):
        idx = (b'<sitemapindex><sitemap>'
               b'<loc>http://e.x/s1.xml.gz</loc></sitemap>'
               b'</sitemapindex>')
        recs = W.parse_sitemap(gzip.compress(idx, mtime=0))
        assert recs == [{"loc": "http://e.x/s1.xml.gz",
                         "lastmod": None, "kind": "sitemap"}]

    def test_namespace_prefixed(self):
        ns = (b'<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/'
              b'sitemap/0.9"><sm:url><sm:loc>http://e.x/n</sm:loc>'
              b'</sm:url></sm:urlset>')
        assert W.parse_sitemap(ns)[0]["loc"] == "http://e.x/n"

    def test_fail_closed(self):
        for bad in (b"", b"<html></html>", b"<urlset><url>",
                    b"\x1f\x8bgarbage"):
            try:
                W.parse_sitemap(bad)
                raise AssertionError(f"{bad!r} should have raised")
            except ValueError:
                pass

    def test_spark_read(self, spark, tmp_path):
        (tmp_path / "s1.xml").write_bytes(self.URLSET)
        (tmp_path / "s2.xml.gz").write_bytes(
            gzip.compress(self.URLSET, mtime=0))
        rows = W.read_sitemaps(spark, str(tmp_path)).collect()
        assert len(rows) == 4
        assert {r["loc"] for r in rows} == {"http://e.x/a",
                                            "http://e.x/b"}


class TestSitemapBomb:
    def test_gzip_bomb_bounded(self):
        old = W.MAX_RECORD_BYTES
        W.MAX_RECORD_BYTES = 1 << 20
        try:
            bomb = gzip.compress(
                b"<urlset>" + b"\0" * (8 << 20), mtime=0)
            try:
                W.parse_sitemap(bomb)
                raise AssertionError("bomb should have raised")
            except ValueError as e:
                assert "budget" in str(e)
        finally:
            W.MAX_RECORD_BYTES = old


class TestIncrementalIngest:
    def test_second_run_skips_processed_segments(self, spark, tmp_path):
        seg_dir = tmp_path / "segs"
        seg_dir.mkdir()
        out = str(tmp_path / "docs")
        cat = str(tmp_path / "catalog")
        (seg_dir / "s1.warc.gz").write_bytes(
            W.build_wet([("u:1", "first segment doc")]))
        n1 = W.ingest_warc_incremental(spark, str(seg_dir), out, cat)
        assert n1 == 1
        assert spark.read.parquet(out).count() == 1
        # re-run with nothing new: no-op, no duplicates
        assert W.ingest_warc_incremental(spark, str(seg_dir), out,
                                         cat) == 0
        assert spark.read.parquet(out).count() == 1
        # add a segment: only it is processed
        (seg_dir / "s2.warc.gz").write_bytes(
            W.build_wet([("u:2", "second segment doc"),
                         ("u:3", "third doc")]))
        n3 = W.ingest_warc_incremental(spark, str(seg_dir), out, cat)
        assert n3 == 1
        texts = sorted(r["text"] for r in
                       spark.read.parquet(out).collect())
        assert texts == ["first segment doc", "second segment doc",
                         "third doc"]
        assert spark.read.parquet(cat).count() == 2

    def test_transform_hook(self, spark, tmp_path):
        from pyspark.sql import functions as F
        seg_dir = tmp_path / "s2"
        seg_dir.mkdir()
        (seg_dir / "a.warc.gz").write_bytes(W.build_wet(
            [("u:keep", "kept"), ("u:drop", "dropped")]))
        out = str(tmp_path / "o2")
        W.ingest_warc_incremental(
            spark, str(seg_dir), out, str(tmp_path / "c2"),
            transform=lambda df: df.filter(
                F.col("target_uri") == "u:keep"))
        rows = spark.read.parquet(out).collect()
        assert [r["text"] for r in rows] == ["kept"]


class TestStreamNormalizationParity:
    def test_batch_and_stream_fingerprint_identically(self, spark,
                                                      tmp_path):
        """A CRLF copy of a doc already ingested with LF endings must
        be caught by the fingerprint catalog — only true if streaming
        normalizes exactly like the batch plan."""
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            read_warc_stream, stream_web_corpus,
        )
        doc_lf = ("A clean and useful document that has the right\n"
                  "length and the words that a quality filter wants\n"
                  "to see in sentences with enough substance to pass.")
        doc_crlf = doc_lf.replace("\n", "\r\n")
        seg_dir = tmp_path / "segs"
        seg_dir.mkdir()
        out = str(tmp_path / "o")
        cat = str(tmp_path / "c")

        def drain():
            q = (read_warc_stream(spark, str(seg_dir)).writeStream
                 .foreachBatch(stream_web_corpus(out, cat,
                                                 min_quality=0.3))
                 .option("checkpointLocation", str(tmp_path / "chk"))
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        (seg_dir / "b1.warc.gz").write_bytes(
            W.build_wet([("u:lf", doc_lf)]))
        drain()
        (seg_dir / "b2.warc.gz").write_bytes(
            W.build_wet([("u:crlf", doc_crlf)]))
        drain()
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 1  # CRLF copy deduped against LF original
        # CROSS-PATH assertion: the batch plan must normalize the
        # CRLF copy to the exact text the streaming path landed —
        # this is what keeps batch and streaming fingerprints equal
        from nifi_extracttext_processor_spark.plans.web_corpus import (
            prepare_web_corpus,
        )
        batch_docs = spark.createDataFrame(
            [(1, "u:crlf", doc_crlf)],
            "doc_id long, url string, text string")
        (b,) = (prepare_web_corpus(batch_docs, min_quality=0.3)
                .select("text").collect())
        assert b["text"] == rows[0]["text"]


class TestIngestReviewFixes:
    def test_crash_between_writes_is_idempotent(self, spark, tmp_path):
        """Simulate a failure AFTER the docs write but BEFORE the
        catalog append (delete the catalog): the re-run must
        re-overwrite the segment partition, not append duplicates."""
        import shutil
        seg_dir = tmp_path / "segs"
        seg_dir.mkdir()
        out = str(tmp_path / "o")
        cat = str(tmp_path / "c")
        (seg_dir / "s1.warc.gz").write_bytes(
            W.build_wet([("u:1", "doc one"), ("u:2", "doc two")]))
        assert W.ingest_warc_incremental(spark, str(seg_dir), out,
                                         cat) == 1
        shutil.rmtree(cat)  # catalog write "failed"
        assert W.ingest_warc_incremental(spark, str(seg_dir), out,
                                         cat) == 1
        texts = sorted(r["text"] for r in
                       spark.read.parquet(out).collect())
        assert texts == ["doc one", "doc two"]  # no duplicates

    def test_corrupt_catalog_raises_not_reingests(self, spark,
                                                  tmp_path):
        seg_dir = tmp_path / "segs2"
        seg_dir.mkdir()
        (seg_dir / "s.warc.gz").write_bytes(
            W.build_wet([("u:x", "a doc")]))
        cat = tmp_path / "cat2"
        cat.mkdir()
        (cat / "part-00000.parquet").write_bytes(b"not parquet")
        import pytest as pt
        with pt.raises(Exception):
            W.ingest_warc_incremental(
                spark, str(seg_dir), str(tmp_path / "o2"), str(cat))
