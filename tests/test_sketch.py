"""HyperLogLog sketches: accuracy vs exact distinct, mergeability
(union-of-partials ≡ sketch-of-union), determinism, DuckDB twin
parity, and the map-side-combinable plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.sketch import (
    hll_distinct,
    hll_distinct_sql,
    hll_estimate,
    hll_merge,
    hll_partials,
    hll_partials_sql,
)


@pytest.fixture(scope="module")
def frame(spark):
    # 3 groups with known exact cardinalities 1000 / 300 / 40, values
    # repeated with different multiplicities + some NULLs.
    rows = []
    for i in range(3000):
        rows.append(("a", f"u{i % 1000}"))
    for i in range(900):
        rows.append(("b", f"v{i % 300}"))
    for i in range(40):
        rows.append(("c", f"w{i}"))
    rows.append(("a", None))
    return spark.createDataFrame(rows, "g string, val string")


class TestAccuracy:
    def test_estimate_within_5pct(self, spark, frame):
        got = {r["g"]: r["est_distinct"] for r in
               hll_distinct(frame, "val", ["g"]).collect()}
        for g, exact in (("a", 1000), ("b", 300), ("c", 40)):
            assert abs(got[g] - exact) / exact < 0.05, (g, got[g])

    def test_null_excluded(self, spark):
        df = spark.createDataFrame(
            [("x",), (None,), ("x",)], "val string")
        [r] = hll_distinct(df, "val").collect()
        assert r["est_distinct"] == 1

    def test_deterministic(self, spark, frame):
        a = sorted(hll_distinct(frame, "val", ["g"]).collect())
        b = sorted(hll_distinct(frame, "val", ["g"]).collect())
        assert a == b

    def test_validates_b(self, spark, frame):
        with pytest.raises(ValueError):
            hll_distinct(frame, "val", b=10)


class TestMerge:
    def test_merge_equals_sketch_of_union(self, spark, frame):
        day1 = frame.filter(F.col("val") < "u5")
        day2 = frame.filter(~(F.col("val") < "u5")
                            | F.col("val").isNull())
        merged = hll_merge(hll_partials(day1, "val", ["g"]),
                           hll_partials(day2, "val", ["g"]))
        whole = hll_partials(frame, "val", ["g"])
        a = sorted(map(tuple, hll_estimate(merged, ["g"]).collect()))
        b = sorted(map(tuple, hll_estimate(whole, ["g"]).collect()))
        assert a == b


class TestTwin:
    @pytest.fixture(scope="class")
    def ddb(self, frame):
        con = duckdb.connect()
        con.register("t", frame.toPandas())
        return con

    def test_partials_parity(self, spark, frame, ddb):
        a = sorted(map(tuple,
                       hll_partials(frame, "val", ["g"]).collect()))
        b = sorted(map(tuple, ddb.execute(
            hll_partials_sql("t", "val", ["g"])).fetchall()))
        assert a == b

    def test_estimate_parity(self, spark, frame, ddb):
        a = sorted(map(tuple,
                       hll_distinct(frame, "val", ["g"]).collect()))
        b = sorted(map(tuple, ddb.execute(
            hll_distinct_sql("t", "val", ["g"])).fetchall()))
        assert a == b

    def test_global_parity(self, spark, frame, ddb):
        [a] = hll_distinct(frame, "val").collect()
        [b] = ddb.execute(hll_distinct_sql("t", "val")).fetchall()
        assert a["est_distinct"] == b[0]


class TestPlan:
    def test_one_agg_no_join(self, spark, frame):
        plan = hll_distinct(frame, "val", ["g"])._jdf \
            .queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "partial_max" in plan or "HashAggregate" in plan
