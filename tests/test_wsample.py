"""Efraimidis-Spirakis weighted sampling: statistical bias toward
heavy weights, determinism/nesting, zero/NULL-weight exclusion,
grouped stratification, DuckDB twin parity, and the
TakeOrderedAndProject plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.wsample import (
    weighted_sample,
    weighted_sample_grouped,
    weighted_sample_grouped_sql,
    weighted_sample_sql,
)


@pytest.fixture(scope="module")
def frame(spark):
    # 500 light rows (w=1) + 50 heavy rows (w=50); a zero-weight and
    # a NULL-weight row that must never be drawn.
    rows = [(i, "light", 1.0) for i in range(500)]
    rows += [(1000 + i, "heavy", 50.0) for i in range(50)]
    rows += [(9998, "never", 0.0), (9999, "never", None)]
    return spark.createDataFrame(rows,
                                 "doc_id long, tag string, w double")


class TestSample:
    def test_heavy_rows_overrepresented(self, spark, frame):
        # heavy rows are 50/550 of the population but carry ~83% of
        # the total weight; in a k=100 draw they must far exceed
        # their 9% population share.
        got = weighted_sample(frame, 100, "w").collect()
        assert len(got) == 100
        heavy = sum(1 for r in got if r["tag"] == "heavy")
        assert heavy >= 25

    def test_zero_and_null_never_drawn(self, spark, frame):
        got = weighted_sample(frame, 552, "w").collect()
        ids = {r["doc_id"] for r in got}
        assert 9998 not in ids and 9999 not in ids
        assert len(got) == 550  # everything eligible

    def test_deterministic_and_seed_sensitive(self, spark, frame):
        a = sorted(r["doc_id"] for r in
                   weighted_sample(frame, 50, "w", seed=1).collect())
        b = sorted(r["doc_id"] for r in
                   weighted_sample(frame, 50, "w", seed=1).collect())
        c = sorted(r["doc_id"] for r in
                   weighted_sample(frame, 50, "w", seed=2).collect())
        assert a == b
        assert a != c

    def test_nested_k(self, spark, frame):
        # E-S keys are fixed per (id, seed): a larger k is a superset
        a = {r["doc_id"] for r in
             weighted_sample(frame, 30, "w").collect()}
        b = {r["doc_id"] for r in
             weighted_sample(frame, 60, "w").collect()}
        assert a <= b

    def test_validates(self, spark, frame):
        with pytest.raises(ValueError):
            weighted_sample(frame, 0, "w")
        with pytest.raises(ValueError):
            weighted_sample_grouped(frame, 5, "w", [])


class TestGrouped:
    def test_k_per_group(self, spark, frame):
        got = weighted_sample_grouped(frame, 10, "w", ["tag"]) \
            .groupBy("tag").count().collect()
        counts = {r["tag"]: r["count"] for r in got}
        assert counts == {"light": 10, "heavy": 10}


class TestTwin:
    @pytest.fixture(scope="class")
    def ddb(self, frame):
        con = duckdb.connect()
        con.register("t", frame.toPandas())
        return con

    def test_sample_parity(self, spark, frame, ddb):
        a = sorted(r["doc_id"] for r in
                   weighted_sample(frame, 100, "w", md5=True,
                                   seed=7).collect())
        b = sorted(r[0] for r in ddb.execute(weighted_sample_sql(
            "t", 100, "w", seed=7, select="doc_id")).fetchall())
        assert a == b

    def test_grouped_parity(self, spark, frame, ddb):
        a = sorted((r["tag"], r["doc_id"]) for r in
                   weighted_sample_grouped(
                       frame, 15, "w", ["tag"], md5=True).collect())
        b = sorted((r[0], r[1]) for r in ddb.execute(
            weighted_sample_grouped_sql(
                "t", 15, "w", ["tag"],
                select="tag, doc_id")).fetchall())
        assert a == b


class TestPlan:
    def test_take_ordered_no_global_sort(self, spark, frame):
        plan = weighted_sample(frame, 10, "w")._jdf \
            .queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
