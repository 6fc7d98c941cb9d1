"""End-to-end test of plans/llm_pretrain.py — the composed
pretraining-corpus pipeline. One run over synthesized multi-source
fixtures, asserting each stage's visible effect: the near-duplicate
is dropped, the semantic duplicate is dropped, the contaminated doc
is dropped, the achieved token mixture is within tolerance of the
requested shares, and the shard manifest reconciles with the bytes
on disk.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.plans.llm_pretrain import (
    build_pretrain_corpus,
    clean_source,
    llm_pretrain_plan,
    tokenize_pack_shard,
)

# vocabulary pools so docs are realistic-ish and unique
_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
          "golf", "hotel", "india", "juliet", "kilo", "lima"]

# the eval-set n-gram planted into the contaminated doc (>= 8 words)
_EVAL_NGRAM = ("the quick brown fox jumps over the lazy dog "
               "near the river")


def _doc(i: int, length: int) -> str:
    return " ".join(_WORDS[(i * 7 + j) % len(_WORDS)] + str(i)
                    for j in range(length))


def _source_a(spark):
    """Short-doc source with one near-dup pair (900/901), one
    semantic-dup pair (902/903, via the embeddings sidecar) and one
    contaminated doc (904)."""
    rows = [(i, _doc(i, 25)) for i in range(20)]
    base = _doc(50, 30)
    rows.append((900, base))
    rows.append((901, base + " extra"))          # near-dup of 900
    rows.append((902, _doc(60, 25)))
    rows.append((903, _doc(61, 25)))             # semantic dup of 902
    rows.append((904, _doc(62, 10) + " " + _EVAL_NGRAM))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _source_b(spark):
    """Long-doc source: same row count ballpark, ~4x the tokens."""
    rows = [(1000 + i, _doc(100 + i, 100)) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _embeddings(spark):
    """Sidecar for source A ids: 902/903 nearly parallel (cosine
    ~1.0), everything else well separated."""
    rows = []
    ids = list(range(20)) + [900, 901, 902, 903, 904]
    for n, i in enumerate(ids):
        v = [0.0] * 32
        v[n] = 1.0                       # orthogonal one-hots
        rows.append((i, v))
    rows = [(i, v) for i, v in rows if i not in (902, 903)]
    v902 = [0.0] * 32
    v902[30] = 1.0
    v902[31] = 0.2
    v903 = list(v902)
    v903[31] = 0.201                      # cosine ~1.0 with v902
    rows.append((902, v902))
    rows.append((903, v903))
    return spark.createDataFrame(rows,
                                 "doc_id long, embedding array<double>")


def _benchmark(spark):
    return spark.createDataFrame(
        [(1, f"evaluation prompt: {_EVAL_NGRAM} answer below")],
        "doc_id long, text string")


class TestCleanSource:
    def test_near_semantic_and_contamination_drops(self, spark):
        a = _source_a(spark)
        out = clean_source(a, near_threshold=0.5,
                           embeddings=_embeddings(spark),
                           semantic_threshold=0.95,
                           benchmark=_benchmark(spark),
                           decontaminate_n=8)
        kept = {r["doc_id"] for r in out.select("doc_id").collect()}
        # exactly one of the near-dup pair survives (keep-best policy
        # picks by quality, not id)
        assert len(kept & {900, 901}) == 1
        assert 902 in kept and 903 not in kept     # semantic: min id
        assert 904 not in kept                     # contaminated
        assert set(range(20)) <= kept              # clean docs kept

    def test_stages_optional(self, spark):
        a = _source_a(spark)
        out = clean_source(a, near_threshold=None)
        assert out.count() == a.count()
        with pytest.raises(ValueError, match="embeddings"):
            clean_source(a, near_threshold=None,
                         benchmark_embeddings=_embeddings(spark))


class TestBenchmarkHoist:
    def test_benchmark_tokenized_once_for_n_sources(self, spark,
                                                    tmp_path,
                                                    monkeypatch):
        # The benchmark n-gram table must be built ONCE and shared
        # across every source's decontamination, not re-derived per
        # source.
        import nifi_extracttext_processor_spark.plans.llm_pretrain \
            as lp
        calls = {"n": 0}
        real = lp.__dict__.get("benchmark_ngrams")  # imported lazily
        from nifi_extracttext_processor_spark.operators import corpus

        orig = corpus.benchmark_ngrams

        def counting(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(corpus, "benchmark_ngrams", counting)
        a, b = _source_a(spark), _source_b(spark)
        llm_pretrain_plan(
            [(a, 0.4), (b, 0.3), (_source_b(spark), 0.3)],
            str(tmp_path / "c"),
            benchmark=_benchmark(spark),
            near_threshold=0.5, n_merges=5, num_shards=2)
        assert calls["n"] == 1
        assert real is None  # plan must import it lazily, not bind


class TestEndToEnd:
    def test_full_plan(self, spark, tmp_path):
        a, b = _source_a(spark), _source_b(spark)
        path = str(tmp_path / "corpus")
        manifest, merges = llm_pretrain_plan(
            [(a, 0.5), (b, 0.5)], path,
            benchmark=_benchmark(spark),
            embeddings=_embeddings(spark),
            near_threshold=0.5,
            num_shards=4, seq_budget=64, n_merges=50,
            split_weights={"train": 8, "val": 1, "test": 1},
            seed=0)
        assert merges and isinstance(merges[0], tuple)

        written = spark.read.parquet(path)
        ids = {r["doc_id"] for r in written.select("doc_id").collect()}
        # stage effects survive into the landed corpus (mixing may
        # sample docs away, so assert the DROPS, plus that the
        # surviving near-dup twin's counterpart is gone)
        assert len(ids & {900, 901}) <= 1
        assert 903 not in ids and 904 not in ids

        # token mixture: achieved shares within sampling tolerance of
        # the requested 50/50 (small corpus -> generous band)
        tok = {r["mix_source"]: r["t"] for r in
               written.groupBy("mix_source")
               .agg(F.sum("n_bpe_real").alias("t")).collect()}
        share = tok[0] / (tok[0] + tok[1])
        assert 0.3 < share < 0.7
        # and a row-rate mixture would have been ~4x skewed to B
        assert tok[1] < 3 * tok[0]

        # split labels present and leakage-stable
        assert {r["split"] for r in
                written.select("split").distinct().collect()} \
            <= {"train", "val", "test"}

        # manifest reconciles with the bytes on disk
        m = {r["shard"]: r for r in manifest.collect()}
        got = (written.groupBy("shard")
               .agg(F.count("*").alias("n"),
                    F.sum("n_bpe_real").alias("t")).collect())
        assert got, "no shards written"
        for r in got:
            assert m[r["shard"]]["n_docs"] == r["n"]
            assert m[r["shard"]]["n_tokens"] == r["t"]

        # packing: every (bucket, seq) stays within budget + one doc
        # overhang (standard concat-and-chunk semantics: a doc only
        # starts a new sequence once the previous one is full)
        over = (written.groupBy("bucket", "seq_no")
                .agg(F.sum("n_bpe_real").alias("t"),
                     F.max("n_bpe_real").alias("mx"))
                .filter(F.col("t") - F.col("mx") >= 64 + 64)
                .count())
        assert over == 0

    def test_contamination_report_output(self, spark, tmp_path):
        """VERDICT r11 task 5: report_contamination=True makes the
        composed plan also emit the per-benchmark-item leakage report
        (contamination_report over the RAW source union, before the
        decontaminate stage drops the carriers). The planted leak in
        source A (doc 904 carries _EVAL_NGRAM verbatim) must surface
        with nonzero hit_frac and exactly one carrying corpus doc."""
        a, b = _source_a(spark), _source_b(spark)
        out = llm_pretrain_plan(
            [(a, 0.5), (b, 0.5)], str(tmp_path / "corpus"),
            benchmark=_benchmark(spark),
            near_threshold=0.5, n_merges=5, num_shards=2,
            report_contamination=True)
        assert len(out) == 3
        manifest, merges, report = out
        rows = {r["bench_id"]: r for r in report.collect()}
        assert set(rows) == {1}          # one row per benchmark item
        leak = rows[1]
        # "prompt: the quick brown ... dog near the river answer" has
        # some 8-grams fully inside _EVAL_NGRAM (planted in doc 904)
        assert leak["n_ngrams"] > 0
        assert 0 < leak["n_hit_ngrams"] < leak["n_ngrams"]
        assert leak["hit_frac"] == pytest.approx(
            leak["n_hit_ngrams"] / leak["n_ngrams"], abs=1e-4)
        assert leak["n_corpus_docs"] == 1     # only doc 904 carries it
        # and the filter half still dropped the carrier from the output
        written = spark.read.parquet(str(tmp_path / "corpus"))
        ids = {r["doc_id"] for r in written.select("doc_id").collect()}
        assert 904 not in ids
        # flag off -> 2-tuple unchanged; flag without benchmark -> error
        with pytest.raises(ValueError, match="benchmark"):
            llm_pretrain_plan([(a, 1.0)], str(tmp_path / "x"),
                              report_contamination=True)

    def test_deterministic_rerun(self, spark, tmp_path):
        a, b = _source_a(spark), _source_b(spark)
        srcs = [(a.select("doc_id", "text"), 0.6),
                (b.select("doc_id", "text"), 0.4)]
        c1 = build_pretrain_corpus([(clean_source(s), w)
                                    for s, w in srcs], seed=7)
        c2 = build_pretrain_corpus([(clean_source(s), w)
                                    for s, w in srcs], seed=7)
        r1 = sorted((r["doc_id"], r["mix_source"], r["split"])
                    for r in c1.collect())
        r2 = sorted((r["doc_id"], r["mix_source"], r["split"])
                    for r in c2.collect())
        assert r1 == r2

    def test_saved_bpe_model_path(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.models import (
            save_bpe,
        )
        from nifi_extracttext_processor_spark.operators.tokenize import (
            train_bpe,
        )
        b = _source_b(spark)
        corpus = build_pretrain_corpus([(b, 1.0)])
        merges = train_bpe(b, n_merges=30)
        mp = str(tmp_path / "bpe")
        save_bpe(spark, mp, merges)
        path = str(tmp_path / "sharded")
        manifest, used = tokenize_pack_shard(
            corpus, path, num_shards=2, seq_budget=128, merges=mp)
        assert [tuple(m) for m in used] == [tuple(m) for m in merges]
        assert manifest.count() >= 1


class TestTemperatureMixture:
    def test_tau_extremes_and_direction(self, spark):
        from nifi_extracttext_processor_spark.plans.llm_pretrain \
            import temperature_weights
        counts = {"web": 900, "code": 90, "books": 10}
        # tau=1: natural proportions exactly
        w1 = temperature_weights(counts, tau=1.0)
        assert abs(w1["web"] - 0.9) < 1e-12
        assert abs(w1["books"] - 0.01) < 1e-12
        # lower tau flattens: small sources gain, big ones lose,
        # order preserved
        w7 = temperature_weights(counts, tau=0.7)
        assert w7["books"] > w1["books"] and w7["web"] < w1["web"]
        assert w7["web"] > w7["code"] > w7["books"]
        assert abs(sum(w7.values()) - 1.0) < 1e-12

    def test_dataframe_input_and_validation(self, spark):
        import pytest as pt
        from nifi_extracttext_processor_spark.plans.llm_pretrain \
            import temperature_weights
        df = spark.createDataFrame(
            [("a", 300), ("b", 100)], "source string, n_tokens long")
        w = temperature_weights(df, tau=0.5)
        assert set(w) == {"a", "b"} and w["a"] > w["b"]
        with pt.raises(ValueError):
            temperature_weights({"a": 1}, tau=0.0)
        with pt.raises(ValueError):
            temperature_weights({"a": 0}, tau=0.5)
        with pt.raises(ValueError):
            temperature_weights({})

    def test_epochs_guardrail(self):
        import pytest as pt
        from nifi_extracttext_processor_spark.plans.llm_pretrain \
            import suggested_epochs, temperature_weights
        counts = {"web": 1_000_000, "books": 1_000}
        w = temperature_weights(counts, tau=0.5)
        ep = suggested_epochs(w, counts, token_budget=100_000)
        # the tiny source's epoch count explodes under flattening —
        # exactly the overfitting signal this reports
        assert ep["books"] > 1.0 > ep["web"]
        with pt.raises(ValueError):
            suggested_epochs(w, {"web": 1}, token_budget=10)
        with pt.raises(ValueError):
            suggested_epochs(w, counts, token_budget=0)
