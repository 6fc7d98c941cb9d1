"""approx_top_terms (Misra-Gries heavy hitters): agreement with the
exact aggregate at ample capacity, the MG error/membership guarantees
at tight capacity, and the bounded-shuffle plan shape.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.text_analysis import (
    approx_top_terms,
    top_terms,
)


def _zipf_docs(spark, n_docs=200, seed=3):
    rnd = random.Random(seed)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    for d in range(n_docs):
        words = [vocab[min(int(rnd.paretovariate(1.1)), 299)]
                 for _ in range(40)]
        docs.append((d, " ".join(words)))
    return spark.createDataFrame(docs, "doc_id long, text string")


class TestApproxTopTerms:
    def test_ample_capacity_matches_exact(self, spark):
        df = _zipf_docs(spark)
        exact = [(r["term"], r["n"]) for r in
                 top_terms(df, k=15).collect()]
        approx = [(r["term"], r["est_count"]) for r in
                  approx_top_terms(df, k=15, capacity=10000).collect()]
        assert approx == exact  # capacity > vocab: sketch is exact

    def test_tight_capacity_guarantees(self, spark):
        df = _zipf_docs(spark)
        truth = {r["term"]: r["n"] for r in
                 top_terms(df, k=10000).collect()}
        n_tokens = sum(truth.values())
        cap = 64
        rows = approx_top_terms(df, k=50, capacity=cap).collect()
        for r in rows:
            f = truth[r["term"]]
            assert r["est_count"] <= f          # never overestimates
            assert r["max_count"] >= f          # upper bound holds
        # membership: every term with f > n/cap per partition-sum
        # bound must appear among the sketch survivors
        got_terms = {r["term"] for r in
                     approx_top_terms(df, k=10000,
                                      capacity=cap).collect()}
        for t, f in truth.items():
            if f > n_tokens / cap:
                assert t in got_terms, (t, f, n_tokens / cap)

    def test_deterministic_same_input(self, spark):
        df = _zipf_docs(spark)
        a = [(r["term"], r["est_count"]) for r in
             approx_top_terms(df, k=20, capacity=128).collect()]
        b = [(r["term"], r["est_count"]) for r in
             approx_top_terms(df, k=20, capacity=128).collect()]
        assert a == b

    def test_bad_args(self, spark):
        df = _zipf_docs(spark, n_docs=2)
        with pytest.raises(ValueError):
            approx_top_terms(df, k=0)
        with pytest.raises(ValueError):
            approx_top_terms(df, capacity=0)

    def test_plan_bounded_shuffle(self, spark):
        df = _zipf_docs(spark, n_docs=5)
        plan = approx_top_terms(df, k=5, capacity=32)._jdf \
            .queryExecution().executedPlan().toString()
        # sketch runs BEFORE any exchange: the only wide ops are the
        # <=cap-per-partition merge agg and the top-k
        assert "TakeOrderedAndProject" in plan
        assert "rangepartitioning" not in plan.lower()


class TestApproxTopNgrams:
    def test_bigram_mode_matches_exact_at_ample_capacity(self, spark):
        df = _zipf_docs(spark, n_docs=60)
        # exact bigram counts computed independently
        from collections import Counter
        truth = Counter()
        for r in df.collect():
            ws = r["text"].split()
            truth.update(" ".join(ws[i:i + 2])
                         for i in range(len(ws) - 1))
        got = [(r["term"], r["est_count"]) for r in
               approx_top_terms(df, k=10, capacity=100000,
                                ngram=2).collect()]
        want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert got == want

    def test_short_docs_and_bad_ngram(self, spark):
        df = spark.createDataFrame(
            [(1, "one"), (2, ""), (3, "two words")],
            "doc_id long, text string")
        rows = approx_top_terms(df, k=10, capacity=100,
                                ngram=2).collect()
        assert [(r["term"], r["est_count"]) for r in rows] == \
            [("two words", 1)]
        with pytest.raises(ValueError):
            approx_top_terms(df, ngram=0)


class TestExactRecountVariant:
    def test_matches_exact_topk_and_bound_holds(self, spark, sf_dir):
        """The driver row's determinism contract: on the documents
        table the true k-th unigram count must exceed
        n_tokens/capacity (the MG membership bound), and the two-pass
        variant must equal the plain exact top-k."""
        from nifi_extracttext_processor_spark.operators.text_analysis \
            import approx_top_terms_exact
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        toks = d.select(F.explode(
            F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                     lambda t: F.length(t) > 0)).alias("term"))
        exact = (toks.groupBy("term")
                 .agg(F.count("*").cast("long").alias("n"))
                 .orderBy(F.desc("n"), F.asc("term")).limit(20)
                 .collect())
        n_tokens = toks.count()
        assert exact[-1]["n"] > n_tokens / 4096, (
            "MG bound violated on the test table - the two-pass "
            "variant's determinism contract no longer holds")
        got = approx_top_terms_exact(d, k=20, capacity=4096).collect()
        assert [(r["term"], r["n"]) for r in got] == \
            [(r["term"], r["n"]) for r in exact]

    def test_ngram_recount_and_validation(self, spark):
        from nifi_extracttext_processor_spark.operators.text_analysis \
            import approx_top_terms_exact
        df = spark.createDataFrame(
            [(1, "a b a b c"), (2, "a b x"), (3, "")],
            "doc_id long, text string")
        rows = approx_top_terms_exact(df, k=2, capacity=100,
                                      ngram=2).collect()
        assert [(r["term"], r["n"]) for r in rows] == \
            [("a b", 3), ("b a", 1)]
        with pytest.raises(ValueError):
            approx_top_terms_exact(df, k=0)
