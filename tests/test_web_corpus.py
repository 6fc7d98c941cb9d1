"""End-to-end web-corpus plan: WARC segments → boilerplate removal →
URL dedup → lang/quality/LM filters → exact dedup → token stats."""

from __future__ import annotations

import gzip

import pytest

from nifi_extracttext_processor_spark.plans import web_corpus as wc
from nifi_extracttext_processor_spark.sources import warc as W

ARTICLE = ("The committee announced on Tuesday that the new policy "
           "would take effect at the start of the next fiscal year "
           "and officials said they expect the measure to reduce "
           "costs across the region for the next decade.")

PAGE = f"""<html><body>
<nav><a href="/">Home</a> <a href="/a">News</a> <a href="/b">More</a></nav>
<article><p>{ARTICLE}</p></article>
<footer><a href="/t">Terms</a> | © 2026</footer>
</body></html>"""


@pytest.fixture(scope="module")
def segments(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    seg1 = (gzip.compress(W.build_response_record(
                "http://site.example/story?utm_source=feed", PAGE.encode()),
                mtime=0)
            + gzip.compress(W.build_response_record(
                "http://site.example/story", PAGE.encode()), mtime=0))
    (d / "seg1.warc.gz").write_bytes(seg1)
    (d / "seg2.warc.gz").write_bytes(W.build_wet([
        ("http://wet.example/good",
         "This is a clean and useful document that has the right "
         "length and the words that a quality filter wants to see "
         "in a sentence with enough substance to pass the gates."),
        ("http://wet.example/junk", "zzzz"),
    ]))
    return str(d)


class TestWarcToDocuments:
    def test_boilerplate_removed_from_responses(self, spark, segments):
        docs = wc.warc_segments_to_documents(spark, segments).collect()
        by_url = {}
        for r in docs:
            by_url.setdefault(r["url"], []).append(r)
        story = by_url["http://site.example/story"][0]
        assert ARTICLE in story["text"]
        assert "Home" not in story["text"]
        assert "Terms" not in story["text"]
        # WET records pass through untouched
        assert by_url["http://wet.example/junk"][0]["text"] == "zzzz"
        assert len(docs) == 4

    def test_no_boilerplate_mode_keeps_chrome(self, spark, segments):
        docs = wc.warc_segments_to_documents(
            spark, segments, remove_boilerplate=False).collect()
        story = [r for r in docs
                 if r["url"] == "http://site.example/story"][0]
        assert "Home" in story["text"]

    def test_non_utf8_charset_survives_boilerplate(self, spark,
                                                   tmp_path):
        """Round-7 review fix: the boilerplate classifier must run on
        the charset-decoded text the WARC parser produced, NOT on a
        utf-8/latin-1 re-decode of the raw payload — a Shift_JIS page
        would otherwise land mojibake main_text."""
        jp = ("日本語の記事本文です。" * 8
              + "この段落は十分に長く、本文として分類されます。")
        page = (f"<html><body><nav><a href='/'>ホーム</a></nav>"
                f"<article><p>{jp}</p></article></body></html>")
        rec = W.build_response_record(
            "http://jp.example/story", page.encode("shift_jis"),
            http_content_type="text/html; charset=shift_jis")
        d = tmp_path / "segs"
        d.mkdir()
        (d / "jp.warc.gz").write_bytes(gzip.compress(rec, mtime=0))
        (r,) = wc.warc_segments_to_documents(spark, str(d)).collect()
        assert jp in r["text"]
        assert "�" not in r["text"]


class TestPrepare:
    def test_full_pipeline(self, spark, segments):
        docs = wc.warc_segments_to_documents(spark, segments)
        out = wc.prepare_web_corpus(docs, min_quality=0.3).collect()
        urls = sorted(r["url"].split("?")[0] for r in out)
        # utm duplicate collapsed by URL dedup; junk doc filtered by
        # quality; both surviving docs carry scores + token stats
        assert "http://wet.example/junk" not in urls
        assert len([u for u in urls if u.endswith("/story")]) == 1
        for r in out:
            assert r["nll"] is not None and r["nll"] > 0
            assert r["n_ws_tokens"] > 0 and r["n_bpe_tokens"] > 0

    def test_reference_lm_and_nll_cut(self, spark, segments):
        docs = wc.warc_segments_to_documents(spark, segments)
        ref = spark.createDataFrame(
            [(1, ARTICLE)], "doc_id long, text string")
        out = wc.prepare_web_corpus(
            docs, lm_reference=ref, min_quality=0.0, max_nll=3.2)
        rows = out.collect()
        # the article page scores well under its own reference model;
        # the unrelated WET doc scores worse (may or may not pass);
        # everything kept respects the cut
        assert all(r["nll"] <= 3.2 for r in rows)
        assert any("story" in r["url"] for r in rows)


class TestPrepareR7Stages:
    def test_classifier_gate(self, spark, segments):
        from nifi_extracttext_processor_spark.operators.classifier import (
            train_text_classifier,
        )
        docs = wc.warc_segments_to_documents(spark, segments)
        # train a tiny discriminator: article-like words = 1,
        # junk tokens = 0
        labeled = spark.createDataFrame(
            [(1, ARTICLE, 1), (2, "zzzz zzzz zzzz zzzz", 0),
             (3, "policy officials committee fiscal", 1),
             (4, "zzzz qqqq zzzz qqqq", 0)],
            "doc_id long, text string, label int")
        w, b, _ = train_text_classifier(labeled, n_buckets=256,
                                        n_iter=30, lr=5.0)
        out = wc.prepare_web_corpus(
            docs, min_quality=0.0, classifier=(w, b),
            min_classifier_prob=0.5).collect()
        urls = {r["url"] for r in out}
        assert any("story" in u for u in urls)
        assert not any("junk" in u for u in urls)
        for r in out:
            assert 0.0 <= r["clf_prob"] <= 1.0

    def test_classifier_path_matches_in_memory(self, spark, segments,
                                               tmp_path):
        """A saved-model path in place of the (weights, bias) tuple
        must produce identical clf_prob rows (models.py wiring)."""
        from nifi_extracttext_processor_spark.operators.classifier import (
            train_text_classifier,
        )
        from nifi_extracttext_processor_spark.operators.models import (
            save_classifier,
        )
        docs = wc.warc_segments_to_documents(spark, segments)
        labeled = spark.createDataFrame(
            [(1, ARTICLE, 1), (2, "zzzz zzzz zzzz zzzz", 0),
             (3, "policy officials committee fiscal", 1),
             (4, "zzzz qqqq zzzz qqqq", 0)],
            "doc_id long, text string, label int")
        w, b, _ = train_text_classifier(labeled, n_buckets=256,
                                        n_iter=30, lr=5.0)
        mp = str(tmp_path / "clf_model")
        save_classifier(spark, mp, w, b)
        mem = sorted((r["url"], r["clf_prob"]) for r in
                     wc.prepare_web_corpus(
                         docs, min_quality=0.0, classifier=(w, b),
                         min_classifier_prob=0.5).collect())
        via_path = sorted((r["url"], r["clf_prob"]) for r in
                          wc.prepare_web_corpus(
                              docs, min_quality=0.0, classifier=mp,
                              min_classifier_prob=0.5).collect())
        assert via_path == mem

    def test_host_rank_prior(self, spark, segments):
        docs = wc.warc_segments_to_documents(spark, segments)
        ranks = spark.createDataFrame(
            [("site.example", 0.8), ("wet.example", 0.01)],
            "node string, rank double")
        out = wc.prepare_web_corpus(
            docs, min_quality=0.0, host_ranks=ranks,
            min_host_rank=0.5).collect()
        assert out and all("site.example" in r["url"] for r in out)
        assert all(r["host_rank"] == 0.8 for r in out)

    def test_host_rank_requires_url(self, spark):
        import pytest as _pytest
        docs = spark.createDataFrame(
            [(1, "some text")], "doc_id long, text string")
        ranks = spark.createDataFrame([("h", 0.5)],
                                      "node string, rank double")
        with _pytest.raises(ValueError):
            wc.prepare_web_corpus(docs, host_ranks=ranks)


class TestKnGate:
    def test_kn_reference_adds_column_and_filters(self, spark):
        from nifi_extracttext_processor_spark.plans.web_corpus import (
            prepare_web_corpus,
        )
        rows = [(i, f"http://a{i}.example.com/p",
                 "the quick brown fox jumps over the lazy dog again "
                 * 3) for i in range(8)]
        rows.append((100, "http://junk.example.com/p",
                     "dog the lazy over jumps fox zz qq ww ee rr tt "
                     "yy uu ii oo pp aa ss dd ff gg hh jj kk ll"))
        docs = spark.createDataFrame(
            rows, "doc_id long, url string, text string")
        ref = docs.filter("doc_id < 8")
        scored = prepare_web_corpus(docs, min_quality=0.0,
                                    langs=("en",),
                                    kn_reference=ref)
        assert "kn_nll" in scored.columns
        vals = {r["doc_id"]: r["kn_nll"] for r in
                scored.select("doc_id", "kn_nll").collect()}
        if 100 in vals and vals:
            ok = [v for k, v in vals.items() if k != 100]
            if ok:
                assert vals[100] > min(ok)

    def test_saved_kn_path(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.kn_lm import (
            train_kn_bigram,
        )
        from nifi_extracttext_processor_spark.operators.models import (
            save_kn_bigram,
        )
        from nifi_extracttext_processor_spark.plans.web_corpus import (
            prepare_web_corpus,
        )
        rows = [(i, f"http://a{i}.example.com/p",
                 "a steady sentence about cats and dogs number "
                 + str(i)) for i in range(6)]
        docs = spark.createDataFrame(
            rows, "doc_id long, url string, text string")
        model = train_kn_bigram(docs)
        p = str(tmp_path / "kn")
        save_kn_bigram(p, model)
        a = sorted((r["doc_id"], r["kn_nll"]) for r in
                   prepare_web_corpus(docs, min_quality=0.0,
                                      kn_reference=docs)
                   .select("doc_id", "kn_nll").collect())
        b = sorted((r["doc_id"], r["kn_nll"]) for r in
                   prepare_web_corpus(docs, min_quality=0.0,
                                      kn_reference=p)
                   .select("doc_id", "kn_nll").collect())
        assert a == b
