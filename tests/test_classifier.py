"""Quality classifier (operators/classifier.py): distributed LR
training vs an independent numpy reference, catalyst/arrow scoring
equivalence, DuckDB parity of the pseudo-weight scoring twin, and
plan shape (zero UDF + broadcast join on the scoring path).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.classifier import (
    hashed_doc_features,
    reference_lr,
    score_pseudo,
    score_pseudo_sql,
    score_text,
    train_text_classifier,
)

# synthetic separable corpus: label 1 = "quality" vocabulary,
# label 0 = "spam" vocabulary, with shared noise words
GOOD_WORDS = ["research", "analysis", "method", "evidence", "theory"]
SPAM_WORDS = ["winner", "click", "free", "prize", "casino"]
NOISE = ["the", "and", "with", "for"]


def _corpus(n_per_class=30):
    rows = []
    for i in range(n_per_class):
        g = [GOOD_WORDS[(i + j) % 5] for j in range(4)] + \
            [NOISE[(i + j) % 4] for j in range(3)]
        s = [SPAM_WORDS[(i + j) % 5] for j in range(4)] + \
            [NOISE[(i + 2 * j) % 4] for j in range(3)]
        rows.append((f"g{i}", " ".join(g), 1))
        rows.append((f"s{i}", " ".join(s), 0))
    return rows


class TestFeatures:
    def test_sparse_features_shape_and_empty_doc(self, spark):
        df = spark.createDataFrame(
            [("a", "x y x"), ("b", ""), ("c", "   ")],
            "doc_id string, text string")
        out = {r["doc_id"]: r for r in
               hashed_doc_features(df, n_buckets=16).collect()}
        assert len(out) == 3
        assert sorted(out["a"]["counts"]) == [1.0, 2.0] or \
            out["a"]["counts"] == [3.0]  # x,y may collide in 16 buckets
        assert out["b"]["buckets"] == [] and out["b"]["counts"] == []
        assert out["c"]["buckets"] == []

    def test_buckets_sorted_ascending(self, spark):
        df = spark.createDataFrame(
            [("a", "alpha beta gamma delta epsilon zeta")],
            "doc_id string, text string")
        r = hashed_doc_features(df, n_buckets=64).collect()[0]
        assert r["buckets"] == sorted(r["buckets"])


class TestTraining:
    def test_matches_numpy_reference(self, spark):
        rows = _corpus(10)
        df = spark.createDataFrame(
            rows, "doc_id string, text string, label int")
        n_buckets, n_iter = 256, 8
        w, b, hist = train_text_classifier(
            df, n_buckets=n_buckets, n_iter=n_iter, lr=0.5)
        # independent reference on the SAME features
        feats = hashed_doc_features(
            df, n_buckets=n_buckets, extra_cols=("label",)).collect()
        ref = [(float(r["label"]), list(r["buckets"]),
                list(r["counts"])) for r in feats]
        w2, b2, hist2 = reference_lr(ref, n_buckets, n_iter, lr=0.5)
        assert abs(b - b2) < 1e-9
        assert max(abs(x - y) for x, y in zip(w, w2)) < 1e-9
        assert all(abs(x - y) < 1e-9 for x, y in zip(hist, hist2))

    def test_loss_decreases_and_separates(self, spark):
        rows = _corpus(30)
        df = spark.createDataFrame(
            rows, "doc_id string, text string, label int")
        w, b, hist = train_text_classifier(
            df, n_buckets=512, n_iter=40, lr=5.0)
        assert hist[-1] < hist[0] * 0.5
        scored = score_text(df, w, b, keep_cols=("label",)).collect()
        acc = sum(1 for r in scored
                  if (r["prob"] > 0.5) == (r["label"] == 1)) / len(scored)
        assert acc >= 0.95

    def test_empty_and_bad_input(self, spark):
        df = spark.createDataFrame(
            [("a", "", 1)], "doc_id string, text string, label int")
        with pytest.raises(ValueError):
            train_text_classifier(df, n_buckets=16, n_iter=1)
        with pytest.raises(ValueError):
            train_text_classifier(df, n_buckets=16, n_iter=0)


class TestScoring:
    def _trained(self, spark):
        rows = _corpus(15)
        df = spark.createDataFrame(
            rows, "doc_id string, text string, label int")
        w, b, _ = train_text_classifier(
            df, n_buckets=512, n_iter=10, lr=1.0)
        return df, w, b

    def test_catalyst_equals_arrow(self, spark):
        df, w, b = self._trained(spark)
        cat = sorted((r["doc_id"], r["logit"], r["prob"]) for r in
                     score_text(df, w, b, method="catalyst").collect())
        arw = sorted((r["doc_id"], r["logit"], r["prob"]) for r in
                     score_text(df, w, b, method="arrow").collect())
        assert cat == arw

    def test_tokenless_doc_scores_bias(self, spark):
        df = spark.createDataFrame(
            [("a", "word"), ("b", "   ")], "doc_id string, text string")
        out = {r["doc_id"]: r["logit"] for r in
               score_text(df, [0.25] * 16, bias=0.5).collect()}
        assert out["b"] == 0.5
        assert out["a"] == 0.75  # single token, normalized weight+bias

    def test_scoring_plan_shape(self, spark):
        df = spark.createDataFrame(
            [("a", "hello world")], "doc_id string, text string")
        plan = score_text(df, [0.1] * 32, 0.0)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "BroadcastExchange" in plan     # weight table broadcasts
        assert "mapInPandas" not in plan


class TestPseudoScoreParity:
    def test_matches_duckdb(self, spark):
        import duckdb
        import pandas as pd
        rows = [(f"d{i}", t) for i, (_, t, _) in enumerate(_corpus(10))]
        rows += [("empty", ""), ("ws", "   ")]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["logit"], r["label_pred"])
            for r in score_pseudo(df).collect())
        con = duckdb.connect()
        con.register("documents",
                     pd.DataFrame(rows, columns=["doc_id", "text"]))
        want = sorted(
            (r["doc_id"], int(r["n_tokens"]), r["logit"],
             bool(r["label_pred"]))
            for _, r in con.execute(score_pseudo_sql()).df().iterrows())
        assert got == want
