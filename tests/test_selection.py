"""DSIR data selection (operators/selection.py): semantic behavior
(target-like documents up-weighted), DuckDB parity of the md5 twin,
Gumbel-top-k determinism, and plan shape (zero UDF, broadcast
models, TakeOrdered selection).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.selection import (
    dsir_logweights,
    dsir_logweights_sql,
    dsir_select,
    fit_hash_ngram_model,
)

TARGETY = [
    "the committee reviewed the annual budget proposal carefully",
    "officials said the policy review would take several months",
    "the council approved the budget after careful review",
    "analysts reviewed the proposal and the policy timeline",
]
JUNKY = [
    "click here winner free prize casino bonus now",
    "zzzz qqqq zzzz qqqq wwww zzzz",
    "buy cheap pills online casino winner click",
]


def _raw(spark):
    rows = ([(f"t{i}", t, 1) for i, t in enumerate(TARGETY)]
            + [(f"j{i}", t, 0) for i, t in enumerate(JUNKY)])
    return spark.createDataFrame(
        rows, "doc_id string, text string, is_target int")


class TestDsirSemantics:
    def test_targetlike_docs_outweigh_junk(self, spark):
        raw = _raw(spark)
        target = raw.filter("is_target = 1").select("doc_id", "text")
        tm = fit_hash_ngram_model(target, n_buckets=4096)
        rm = fit_hash_ngram_model(raw, n_buckets=4096)
        w = {r["doc_id"]: r["logw"] for r in
             dsir_logweights(raw, tm, rm, n_buckets=4096).collect()}
        # per-gram average weight: every target doc above every junk doc
        n = {r["doc_id"]: max(r["n_grams"], 1) for r in
             dsir_logweights(raw, tm, rm, n_buckets=4096).collect()}
        tw = min(w[f"t{i}"] / n[f"t{i}"] for i in range(len(TARGETY)))
        jw = max(w[f"j{i}"] / n[f"j{i}"] for i in range(len(JUNKY)))
        assert tw > jw

    def test_select_prefers_target_at_low_temperature(self, spark):
        raw = _raw(spark)
        target = raw.filter("is_target = 1").select("doc_id", "text")
        got = [r["doc_id"] for r in
               dsir_select(raw, target, k=4, n_buckets=4096,
                           temperature=0.01).collect()]
        assert all(d.startswith("t") for d in got)

    def test_empty_doc_gets_zero_weight(self, spark):
        raw = spark.createDataFrame(
            [("a", "real text here"), ("b", "   ")],
            "doc_id string, text string")
        tm = fit_hash_ngram_model(raw, n_buckets=512)
        w = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in
             dsir_logweights(raw, tm, tm, n_buckets=512).collect()}
        assert w["b"] == (0, 0.0)
        # target == raw model: every ratio is 1 -> logw 0 for all
        assert w["a"][1] == pytest.approx(0.0, abs=1e-6)

    def test_select_determinism_and_bounds(self, spark):
        raw = _raw(spark)
        target = raw.filter("is_target = 1").select("doc_id", "text")
        a = [r["doc_id"] for r in
             dsir_select(raw, target, k=3, n_buckets=2048,
                         seed=7).collect()]
        b = [r["doc_id"] for r in
             dsir_select(raw, target, k=3, n_buckets=2048,
                         seed=7).collect()]
        assert a == b
        everything = dsir_select(raw, target, k=100,
                                 n_buckets=2048).collect()
        assert len(everything) == raw.count()
        with pytest.raises(ValueError):
            dsir_select(raw, target, k=0)
        with pytest.raises(ValueError):
            dsir_select(raw, target, k=1, temperature=0.0)


class TestDsirParity:
    def test_logweights_match_duckdb(self, spark):
        import duckdb
        raw = _raw(spark)
        target = raw.filter("is_target = 1").select("doc_id", "text")
        tm = fit_hash_ngram_model(target, n_buckets=4096, md5=True)
        rm = fit_hash_ngram_model(raw, n_buckets=4096, md5=True)
        got = sorted(tuple(r) for r in
                     dsir_logweights(raw, tm, rm, n_buckets=4096,
                                     md5=True).collect())
        con = duckdb.connect()
        con.register("documents", raw.toPandas())
        want = sorted(tuple(r) for r in con.execute(
            dsir_logweights_sql(target_pred="is_target = 1",
                                n_buckets=4096)).fetchall())
        assert got == want


class TestDsirPlanShape:
    def test_no_udf_broadcast_models_takeordered(self, spark):
        raw = _raw(spark)
        target = raw.filter("is_target = 1").select("doc_id", "text")
        plan = dsir_select(raw, target, k=3, n_buckets=1024)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastExchange" in plan or \
            "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
