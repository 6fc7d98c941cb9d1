"""sample_k_per_group (operators/corpus.py): exact-k quota sampling —
determinism, nested-quota subset property, DuckDB twin parity, plan
shape (one keyed window, no global sort).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.corpus import (
    sample_k_per_group,
    sample_k_per_group_sql,
)


def _df(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(60)]
    rows += [(100, "tiny"), (101, "tiny")]  # group smaller than k
    return spark.createDataFrame(rows, "doc_id long, lang string")


class TestSampleKPerGroup:
    def test_exact_k_and_small_groups(self, spark):
        out = sample_k_per_group(_df(spark), "lang", k=5).collect()
        by = {}
        for r in out:
            by.setdefault(r["lang"], []).append(r["doc_id"])
        assert sorted(len(v) for v in by.values()) == [2, 5, 5, 5]
        assert sorted(by["tiny"]) == [100, 101]

    def test_deterministic_across_partitionings(self, spark):
        df = _df(spark)
        a = sorted((r["lang"], r["doc_id"]) for r in
                   sample_k_per_group(df, "lang", k=4).collect())
        b = sorted((r["lang"], r["doc_id"]) for r in
                   sample_k_per_group(df.repartition(13), "lang",
                                      k=4).collect())
        assert a == b

    def test_seed_changes_selection(self, spark):
        df = _df(spark)
        a = {r["doc_id"] for r in
             sample_k_per_group(df, "lang", k=5, seed=0).collect()}
        b = {r["doc_id"] for r in
             sample_k_per_group(df, "lang", k=5, seed=1).collect()}
        assert a != b

    def test_nested_quota_subset(self, spark):
        df = _df(spark)
        small = {r["doc_id"] for r in
                 sample_k_per_group(df, "lang", k=3).collect()}
        big = {r["doc_id"] for r in
               sample_k_per_group(df, "lang", k=10).collect()}
        assert small < big

    def test_md5_twin_matches_duckdb(self, spark):
        import duckdb
        df = _df(spark)
        got = sorted(
            (r["lang"], r["doc_id"], r["sample_rank"]) for r in
            sample_k_per_group(df, "lang", k=4, md5=True).collect())
        con = duckdb.connect()
        con.register("t", df.toPandas())
        want = sorted(
            (r["lang"], int(r["doc_id"]), int(r["sample_rank"]))
            for _, r in con.execute(
                sample_k_per_group_sql("t", "lang", k=4))
            .df().iterrows())
        assert got == want

    def test_bad_k(self, spark):
        with pytest.raises(ValueError):
            sample_k_per_group(_df(spark), "lang", k=0)

    def test_plan_keyed_window_no_global_sort(self, spark):
        plan = sample_k_per_group(_df(spark), "lang", k=3)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "rangepartitioning" not in plan.lower()
        assert plan.lower().count("hashpartitioning") == 1
