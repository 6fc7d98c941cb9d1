"""Collocation extraction (operators/collocations.py): hand-computed
PMI golden, LLR vs the independent 2×2 reference, min_count cut,
deterministic tie-break, DuckDB parity, plan shape (narrow pairing —
no self-join shuffle, no UDF).
"""
from __future__ import annotations

import math

import pytest

from nifi_extracttext_processor_spark.operators.collocations import (
    collocations,
    collocations_sql,
    reference_llr,
)


@pytest.fixture(scope="module")
def tiny(spark):
    # 3 docs, 10 bigram events total; "new york" appears 3 times
    rows = [("d1", "new york is new york"),
            ("d2", "york new york minute"),
            ("d3", "a new day in york")]
    return spark.createDataFrame(rows, "doc_id string, text string")


class TestGolden:
    def test_pmi_hand_computed(self, tiny):
        out = {(r["w1"], r["w2"]): r for r in
               collocations(tiny, min_count=1, top_k=100).collect()}
        # events: d1: (new,york)(york,is)(is,new)(new,york)
        #         d2: (york,new)(new,york)(york,minute)
        #         d3: (a,new)(new,day)(day,in)(in,york)
        # N=11, c(new york)=3, c(new,.)=4, c(.,york)=4
        r = out[("new", "york")]
        assert r["n"] == 3
        assert r["pmi"] == pytest.approx(
            round(math.log(3 * 11 / (4 * 4)), 4))

    def test_llr_matches_reference(self, tiny):
        out = {(r["w1"], r["w2"]): r for r in
               collocations(tiny, min_count=1, top_k=100).collect()}
        # (new york): k11=3, k12=c(new,.)-3=1, k21=c(.,york)-3=1,
        # k22=11-3-1-1=6
        assert out[("new", "york")]["llr"] == pytest.approx(
            round(reference_llr(3, 1, 1, 6), 4))
        # a 1-count pair: (york, is): k11=1, cx=c(york,.)=3,
        # cy=c(.,is)=1 -> k12=2, k21=0, k22=8
        assert out[("york", "is")]["llr"] == pytest.approx(
            round(reference_llr(1, 2, 0, 8), 4))

    def test_min_count_cut(self, tiny):
        out = collocations(tiny, min_count=3, top_k=100).collect()
        assert [(r["w1"], r["w2"]) for r in out] == [("new", "york")]

    def test_short_docs_contribute_nothing(self, spark):
        df = spark.createDataFrame(
            [("a", "solo"), ("b", ""), ("c", None), ("d", "x y")],
            "doc_id string, text string")
        out = collocations(df, min_count=1, top_k=10).collect()
        assert [(r["w1"], r["w2"], r["n"]) for r in out] == \
            [("x", "y", 1)]

    def test_validation(self, tiny):
        with pytest.raises(ValueError, match="min_count"):
            collocations(tiny, min_count=0)
        with pytest.raises(ValueError, match="top_k"):
            collocations(tiny, top_k=0)


class TestDeterminism:
    def test_tie_break_and_topk_cut(self, spark):
        # four pairs with identical counts and margins => equal llr;
        # cut at k=2 must take the (w1, w2)-ascending pair first
        rows = [("d", "a1 b1"), ("e", "a2 b2"),
                ("f", "a3 b3"), ("g", "a4 b4")]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        out = collocations(df, min_count=1, top_k=2).collect()
        assert [(r["w1"], r["w2"]) for r in out] == \
            [("a1", "b1"), ("a2", "b2")]


class TestParityAndPlan:
    def test_duckdb_parity(self, spark, sf_dir):
        import duckdb

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = [tuple(r) for r in
               collocations(docs, min_count=5, top_k=50).collect()]
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = [tuple(r) for r in
                con.execute(collocations_sql(min_count=5, top_k=50))
                .df().itertuples(index=False)]
        assert got == want

    def test_plan_narrow_pairing_topk(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (collocations(docs, min_count=5, top_k=50)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan
        # pairing is an array zip, never a positional self-join:
        # the only SortMergeJoin-able keys are the margin joins
        assert "CartesianProduct" not in plan
