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


class TestSetAlgebra:
    def test_intersection_and_jaccard(self, spark):
        from nifi_extracttext_processor_spark.operators.sketch import (
            hll_set_stats,
        )
        # A = 0..599, B = 400..999 → |A∩B|=200, |A∪B|=1000, J=0.2
        a = spark.createDataFrame([(f"u{i}",) for i in range(600)],
                                  "val string")
        b = spark.createDataFrame(
            [(f"u{i}",) for i in range(400, 1000)], "val string")
        [r] = hll_set_stats(hll_partials(a, "val"),
                            hll_partials(b, "val")).collect()
        assert abs(r["est_union"] - 1000) / 1000 < 0.05
        assert abs(r["est_intersect"] - 200) / 1000 < 0.05
        assert abs(r["jaccard_est"] - 0.2) < 0.05

    def test_disjoint_clamps_at_zero(self, spark):
        from nifi_extracttext_processor_spark.operators.sketch import (
            hll_set_stats,
        )
        a = spark.createDataFrame([(f"a{i}",) for i in range(300)],
                                  "val string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(300)],
                                  "val string")
        [r] = hll_set_stats(hll_partials(a, "val"),
                            hll_partials(b, "val")).collect()
        assert r["est_intersect"] >= 0
        assert r["est_intersect"] / 600 < 0.05


class TestStreaming:
    def test_incremental_registers_and_replay(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.sketch import (
            hll_estimate,
        )
        from nifi_extracttext_processor_spark.streaming.pipeline \
            import stream_hll
        sd = str(tmp_path / "hll_state")
        fb, read_state = stream_hll(sd, "val", ["g"])
        assert read_state(spark) is None
        b0 = spark.createDataFrame(
            [("a", f"u{i}") for i in range(400)], "g string, val string")
        b1 = spark.createDataFrame(
            [("a", f"u{i}") for i in range(200, 700)]
            + [("b", "x")], "g string, val string")
        fb(b0, 0)
        fb(b1, 1)
        got = sorted(map(tuple, hll_estimate(
            read_state(spark), ["g"]).collect()))
        whole = sorted(map(tuple, hll_distinct(
            b0.unionByName(b1), "val", ["g"]).collect()))
        assert got == whole
        want = sorted(map(tuple, read_state(spark).collect()))
        fb(b1, 1)      # replay: register max is idempotent
        assert sorted(map(tuple,
                          read_state(spark).collect())) == want


class TestPlan:
    def test_one_agg_no_join(self, spark, frame):
        plan = hll_distinct(frame, "val", ["g"])._jdf \
            .queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "partial_max" in plan or "HashAggregate" in plan


# ---------------------------------------------------------------------------
# KMV / theta-style sketch
# ---------------------------------------------------------------------------

from nifi_extracttext_processor_spark.operators.sketch import (  # noqa: E402
    kmv_distinct,
    kmv_distinct_sql,
    kmv_estimate,
    kmv_merge,
    kmv_partials,
    kmv_partials_sql,
    kmv_set_stats,
    kmv_set_stats_sql,
)


class TestKMV:
    def test_exact_below_k(self, spark, frame):
        # group c has 40 distinct < k=64 → sketch IS the set → exact
        got = {r["g"]: r["est_distinct"] for r in
               kmv_distinct(frame, "val", ["g"], k=64).collect()}
        assert got["c"] == 40

    def test_estimator_within_kmv_error(self, spark, frame):
        # k=256 → relative std err ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
        got = {r["g"]: r["est_distinct"] for r in
               kmv_distinct(frame, "val", ["g"], k=256).collect()}
        assert abs(got["a"] - 1000) / 1000 < 0.25, got["a"]
        # b holds 300 distinct > k=256 → estimator path too
        assert abs(got["b"] - 300) / 300 < 0.25, got["b"]

    def test_null_excluded_and_sketch_bounded(self, spark, frame):
        p = kmv_partials(frame, "val", ["g"], k=16)
        sizes = {r["g"]: r["n"] for r in
                 p.groupBy("g").agg(F.count("*").alias("n"))
                 .collect()}
        assert all(v <= 16 for v in sizes.values()), sizes
        [r] = kmv_distinct(
            spark.createDataFrame([("x",), (None,), ("x",)],
                                  "val string"), "val").collect()
        assert r["est_distinct"] == 1

    def test_merge_equals_sketch_of_union(self, spark, frame):
        day1 = frame.filter(F.col("val") < "u5")
        day2 = frame.filter(~(F.col("val") < "u5")
                            | F.col("val").isNull())
        merged = kmv_merge(kmv_partials(day1, "val", ["g"], k=64),
                           kmv_partials(day2, "val", ["g"], k=64),
                           k=64)
        whole = kmv_partials(frame, "val", ["g"], k=64)
        a = sorted(map(tuple, merged.collect()))
        b = sorted(map(tuple, whole.collect()))
        assert a == b

    def test_validates_k_and_group_clash(self, spark, frame):
        with pytest.raises(ValueError):
            kmv_distinct(frame, "val", k=1)
        with pytest.raises(ValueError):
            kmv_partials(frame.withColumnRenamed("g", "hv"),
                         "val", ["hv"])


class TestKMVSetAlgebra:
    def test_partial_overlap(self, spark):
        # A = 0..999, B = 500..1499 → J = 500/1500 = 1/3
        a = spark.createDataFrame([(f"u{i}",) for i in range(1000)],
                                  "val string")
        b = spark.createDataFrame(
            [(f"u{i}",) for i in range(500, 1500)], "val string")
        [r] = kmv_set_stats(kmv_partials(a, "val", k=256),
                            kmv_partials(b, "val", k=256),
                            k=256).collect()
        assert abs(r["est_union"] - 1500) / 1500 < 0.25
        assert abs(r["jaccard_est"] - 1 / 3) < 0.12
        assert abs(r["est_intersect"] - 500) / 500 < 0.4

    def test_disjoint_and_identical(self, spark):
        a = spark.createDataFrame([(f"a{i}",) for i in range(300)],
                                  "val string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(300)],
                                  "val string")
        [r] = kmv_set_stats(kmv_partials(a, "val", k=128),
                            kmv_partials(b, "val", k=128),
                            k=128).collect()
        assert r["est_intersect"] == 0 and r["jaccard_est"] == 0.0
        [r2] = kmv_set_stats(kmv_partials(a, "val", k=128),
                             kmv_partials(a, "val", k=128),
                             k=128).collect()
        assert r2["jaccard_est"] == 1.0
        assert r2["est_intersect"] == r2["est_union"] == r2["est_a"]

    def test_exact_when_small(self, spark):
        # both sets below k → every stat exact
        a = spark.createDataFrame([(f"u{i}",) for i in range(30)],
                                  "val string")
        b = spark.createDataFrame([(f"u{i}",) for i in range(20, 50)],
                                  "val string")
        [r] = kmv_set_stats(kmv_partials(a, "val", k=128),
                            kmv_partials(b, "val", k=128),
                            k=128).collect()
        assert (r["est_a"], r["est_b"], r["est_union"],
                r["est_intersect"]) == (30, 30, 50, 10)
        assert r["jaccard_est"] == 0.2


class TestKMVTwin:
    @pytest.fixture(scope="class")
    def ddb(self, frame):
        con = duckdb.connect()
        con.register("t", frame.toPandas())
        return con

    def test_partials_parity(self, spark, frame, ddb):
        a = sorted(map(tuple,
                       kmv_partials(frame, "val", ["g"],
                                    k=32).collect()))
        b = sorted(map(tuple, ddb.execute(
            kmv_partials_sql("t", "val", ["g"], 32)).fetchall()))
        assert a == b

    def test_estimate_parity(self, spark, frame, ddb):
        a = sorted(map(tuple,
                       kmv_distinct(frame, "val", ["g"],
                                    k=32).collect()))
        b = sorted(map(tuple, ddb.execute(
            kmv_distinct_sql("t", "val", ["g"], 32)).fetchall()))
        assert a == b

    def test_set_stats_parity(self, spark, frame, ddb):
        pa = kmv_partials(frame.filter("g = 'a'"), "val", k=64)
        pb = kmv_partials(frame.filter("g = 'b'"), "val", k=64)
        [got] = kmv_set_stats(pa, pb, k=64).collect()
        [exp] = ddb.execute(kmv_set_stats_sql(
            "t", "val", "g = 'a'", "g = 'b'", None, 64)).fetchall()
        assert tuple(got) == exp
