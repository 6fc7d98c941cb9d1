"""Multinomial Naive Bayes (operators/nbayes.py): training vs an
independent pure-Python reference, multi-class separation, smoothing
and empty-doc semantics, full train+score DuckDB parity, save/load
round-trip, and plan shape (zero UDF, broadcast model joins).
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.classifier import (
    _bucket_col,
)
from nifi_extracttext_processor_spark.operators.nbayes import (
    naive_bayes_sql,
    reference_naive_bayes,
    score_naive_bayes,
    train_naive_bayes,
)

SPORT = ["match", "goal", "team", "season", "coach"]
TECH = ["kernel", "compiler", "thread", "cache", "socket"]
FOOD = ["recipe", "butter", "oven", "flour", "spice"]
NOISE = ["the", "a", "of", "with"]


def _corpus():
    rows = []
    for i in range(20):
        for lbl, words in (("sport", SPORT), ("tech", TECH),
                           ("food", FOOD)):
            body = [words[(i + j) % 5] for j in range(4)] + \
                [NOISE[(i + j) % 4] for j in range(2)]
            rows.append((f"{lbl}{i}", " ".join(body), lbl))
    return rows


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        _corpus(), "doc_id string, text string, label string").cache()


class TestTraining:
    def test_matches_pure_python_reference(self, spark):
        df = spark.createDataFrame(
            [("a", "x y x", "p"), ("b", "y z", "q"), ("c", "x", "p")],
            "doc_id string, text string, label string")
        n_buckets = 32
        # bucket each term the same way the trainer does
        tok_rows = (df.select("label", F.explode(
            F.split(F.lower(F.trim("text")), r"\s+")).alias("term"))
            .filter(F.length("term") > 0)
            .withColumn("bucket", _bucket_col("xxhash64", n_buckets))
            .collect())
        by_doc: dict[str, list[int]] = {"p": [], "q": []}
        for r in tok_rows:
            by_doc[r["label"]].append(r["bucket"])
        ref_cond, ref_cls = reference_naive_bayes(
            [("p", by_doc["p"]), ("q", by_doc["q"])], n_buckets)
        # reference counted docs per label itself: p=2 docs, q=1
        ref_cls = {"p": (math.log(2 / 3), ref_cls["p"][1]),
                   "q": (math.log(1 / 3), ref_cls["q"][1])}
        cond, cls = train_naive_bayes(df, n_buckets=n_buckets)
        got_cond = {(r["label"], r["bucket"]): r["logp"]
                    for r in cond.collect()}
        got_cls = {r["label"]: (r["logprior"], r["logp_default"])
                   for r in cls.collect()}
        assert set(got_cond) == set(ref_cond)
        for k, v in ref_cond.items():
            assert got_cond[k] == pytest.approx(v, abs=1e-12)
        for k, (lp, ld) in ref_cls.items():
            assert got_cls[k][0] == pytest.approx(lp, abs=1e-12)
            assert got_cls[k][1] == pytest.approx(ld, abs=1e-12)

    def test_null_label_rejected(self, spark):
        df = spark.createDataFrame(
            [("a", "x", "p"), ("b", "y", None)],
            "doc_id string, text string, label string")
        with pytest.raises(ValueError, match="NULL labels"):
            train_naive_bayes(df)

    def test_bad_args(self, corpus_df):
        with pytest.raises(ValueError, match="alpha"):
            train_naive_bayes(corpus_df, alpha=0.0)
        with pytest.raises(ValueError, match="n_buckets"):
            train_naive_bayes(corpus_df, n_buckets=0)

    def test_all_empty_class_gets_prior_and_default(self, spark):
        df = spark.createDataFrame(
            [("a", "x y", "p"), ("b", "", "q")],
            "doc_id string, text string, label string")
        cond, cls = train_naive_bayes(df, n_buckets=16, alpha=1.0)
        rows = {r["label"]: r for r in cls.collect()}
        assert rows["q"]["logprior"] == pytest.approx(math.log(0.5))
        # no tokens in q: default = ln(alpha / (0 + alpha*B)) = -ln B
        assert rows["q"]["logp_default"] == pytest.approx(
            -math.log(16.0))
        assert cond.filter(F.col("label") == "q").count() == 0


class TestScoring:
    def test_separates_three_classes(self, corpus_df):
        cond, cls = train_naive_bayes(corpus_df, n_buckets=1 << 12)
        out = score_naive_bayes(corpus_df, cond, cls,
                                n_buckets=1 << 12,
                                keep_cols=("label",))
        rows = out.collect()
        assert len(rows) == 60
        acc = sum(r["pred_label"] == r["label"] for r in rows) / 60
        assert acc == 1.0

    def test_empty_doc_predicts_prior_argmax(self, spark):
        df = spark.createDataFrame(
            [("a", "x x x", "big"), ("b", "y", "big"),
             ("d", "w w", "big"),
             ("c", "z", "small"), ("e", "", "small")],
            "doc_id string, text string, label string")
        cond, cls = train_naive_bayes(df, n_buckets=64)
        out = {r["doc_id"]: r for r in
               score_naive_bayes(df, cond, cls, n_buckets=64)
               .collect()}
        assert out["e"]["pred_label"] == "big"
        assert out["e"]["logjoint"] == pytest.approx(
            round(math.log(3 / 5), 4))

    def test_unseen_tokens_use_default(self, spark):
        train = spark.createDataFrame(
            [("a", "alpha beta", "p"), ("b", "gamma delta", "q")],
            "doc_id string, text string, label string")
        test = spark.createDataFrame(
            [("t", "zzz yyy xxx www")],
            "doc_id string, text string")
        cond, cls = train_naive_bayes(train, n_buckets=1 << 10)
        out = score_naive_bayes(test, cond, cls,
                                n_buckets=1 << 10).collect()
        assert len(out) == 1 and out[0]["logjoint"] is not None
        # all-unseen doc: logjoint = logprior + n*default; priors and
        # defaults are equal for p/q, tie breaks to larger label
        assert out[0]["pred_label"] == "q"
        assert out[0]["logjoint"] == pytest.approx(round(
            math.log(0.5) + 4 * math.log(1 / (2 + 1024)), 4))

    def test_plan_no_udf_and_broadcast_model(self, corpus_df):
        cond, cls = train_naive_bayes(corpus_df, n_buckets=256)
        out = score_naive_bayes(corpus_df, cond, cls, n_buckets=256)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "BroadcastHashJoin" in plan or \
            "BroadcastNestedLoopJoin" in plan


class TestOracleParity:
    def test_duckdb_train_score_parity(self, spark, sf_dir):
        import duckdb

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        cond, cls = train_naive_bayes(
            docs, label_col="lang", n_buckets=1024, hash_method="md5")
        out = score_naive_bayes(docs, cond, cls, n_buckets=1024,
                                hash_method="md5")
        got = {r["doc_id"]: (r["pred_label"], r["logjoint"])
               for r in out.collect()}
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        odf = con.execute(naive_bayes_sql(n_buckets=1024)).df()
        want = {int(r.doc_id): (r.pred_label, round(float(r.logjoint), 4))
                for r in odf.itertuples()}
        assert got == want


class TestPersistence:
    def test_save_load_round_trip(self, spark, corpus_df, tmp_path):
        from nifi_extracttext_processor_spark.operators.models import (
            load_nbayes,
            save_nbayes,
        )

        cond, cls = train_naive_bayes(corpus_df, n_buckets=512,
                                      alpha=0.5)
        path = str(tmp_path / "nb_model")
        save_nbayes(spark, path, cond, cls, n_buckets=512,
                    hash_method="xxhash64", alpha=0.5)
        cond2, cls2, cfg = load_nbayes(spark, path)
        assert cfg["n_buckets"] == 512
        assert cfg["hash_method"] == "xxhash64"
        assert cfg["alpha"] == 0.5
        a = score_naive_bayes(corpus_df, cond, cls,
                              n_buckets=512).collect()
        b = score_naive_bayes(corpus_df, cond2, cls2,
                              n_buckets=512).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_load_wrong_type_raises(self, spark, corpus_df, tmp_path):
        from nifi_extracttext_processor_spark.operators.models import (
            load_nbayes,
            save_classifier,
        )

        path = str(tmp_path / "not_nb")
        save_classifier(spark, path, [0.0, 1.0], 0.1,
                        hash_method="xxhash64")
        with pytest.raises(ValueError, match="expected"):
            load_nbayes(spark, path)
