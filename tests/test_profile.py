"""profile_table (operators/profile.py): single-scan per-column stats
— golden values, null/complex-type handling, DuckDB twin parity, and
the one-aggregation plan shape.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.profile import (
    profile_table,
    profile_table_sql,
)


def _df(spark):
    rows = [
        (1, "a", 1.5, ["x"]),
        (2, "b", None, ["y", "z"]),
        (3, None, 2.5, None),
        (4, "b", 0.25, []),
    ]
    return spark.createDataFrame(
        rows, "id long, s string, v double, arr array<string>")


class TestProfile:
    def test_golden(self, spark):
        out = {r["column"]: r for r in
               profile_table(_df(spark), exact=True).collect()}
        assert set(out) == {"id", "s", "v", "arr"}
        assert out["id"]["n_rows"] == 4 and out["id"]["n_nulls"] == 0
        assert out["id"]["n_distinct"] == 4
        assert out["id"]["min_value"] == "1"
        assert out["id"]["max_value"] == "4"
        assert out["s"]["n_nulls"] == 1
        assert out["s"]["null_frac"] == 0.25
        assert out["s"]["n_distinct"] == 2
        assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"
        assert out["v"]["min_value"] == "0.25"
        # arrays: no ordering — nulls/distinct only
        assert out["arr"]["min_value"] is None
        assert out["arr"]["n_nulls"] == 1
        assert out["arr"]["n_distinct"] == 3
        assert out["arr"]["dtype"] == "array<string>"

    def test_subset_and_errors(self, spark):
        df = _df(spark)
        out = profile_table(df, cols=["id"]).collect()
        assert len(out) == 1 and out[0]["column"] == "id"
        with pytest.raises(ValueError):
            profile_table(df, cols=["nope"])
        with pytest.raises(ValueError):
            profile_table(df, cols=[])

    def test_matches_duckdb(self, spark):
        import duckdb
        df = _df(spark).select("id", "s", "v")
        got = sorted(tuple(r) for r in
                     profile_table(df, exact=True).collect())
        con = duckdb.connect()
        con.register("t", df.toPandas())
        sql = profile_table_sql(
            "t", [("id", "bigint"), ("s", "string"), ("v", "double")])
        want = sorted(
            (r["column"], r["dtype"], int(r["n_rows"]),
             int(r["n_nulls"]), r["null_frac"], int(r["n_distinct"]),
             r["min_value"], r["max_value"])
            for _, r in con.execute(sql).df().iterrows())
        assert got == want

    def test_single_scan_plan(self, spark):
        df = _df(spark).select("id", "s", "v")
        plan = profile_table(df)._jdf \
            .queryExecution().executedPlan().toString()
        # approx mode: ONE aggregate pass, no Expand, no per-column
        # scans, no UDF
        assert plan.count("Scan ") <= 1
        assert "Expand" not in plan
        assert "BatchEvalPython" not in plan

    def test_approx_close_to_exact(self, spark):
        df = spark.range(0, 5000).select(
            F.col("id"), (F.col("id") % 100).alias("m"))
        out = {r["column"]: r for r in profile_table(df).collect()}
        assert out["m"]["n_distinct"] == pytest.approx(100, rel=0.1)
        assert out["id"]["n_distinct"] == pytest.approx(5000, rel=0.1)


class TestDistinctSketches:
    def test_merge_across_batches_estimates_union(self, spark):
        from nifi_extracttext_processor_spark.operators.profile import (
            build_distinct_sketch, merge_distinct_sketches,
        )
        b1 = spark.range(0, 3000).select(
            (F.col("id") % 2000).alias("u"))       # 2000 distinct
        b2 = spark.range(1000, 5000).select(
            (F.col("id") % 4000).alias("u"))       # 4000 distinct
        s1 = build_distinct_sketch(b1, "u")
        s2 = build_distinct_sketch(b2, "u")
        est = merge_distinct_sketches(s1.union(s2)).collect()[0]
        # true union distinct = 4000 (b2's values cover b1's)
        assert est["n_distinct_est"] == pytest.approx(4000, rel=0.08)
        assert est["n_rows"] == 7000

    def test_grouped_sketches(self, spark):
        from nifi_extracttext_processor_spark.operators.profile import (
            build_distinct_sketch, merge_distinct_sketches,
        )
        df = spark.createDataFrame(
            [("a", i % 10) for i in range(100)]
            + [("b", i % 50) for i in range(100)],
            "g string, v long")
        out = {r["g"]: r["n_distinct_est"] for r in
               merge_distinct_sketches(
                   build_distinct_sketch(df, "v", by="g"),
                   by="g").collect()}
        assert out["a"] == pytest.approx(10, abs=1)
        assert out["b"] == pytest.approx(50, rel=0.08)


class TestExpectations:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "x", 5.0), (2, "y", None), (3, None, 7.0),
             (4, "y", 9.0)],
            "id long, s string, v double")

    def test_passing_gate(self, spark):
        from nifi_extracttext_processor_spark.operators.profile import (
            check_expectations,
        )
        ok, fails = check_expectations(self._df(spark), {
            "id": {"min_distinct": 4, "max_null_frac": 0.0},
            "s": {"max_null_frac": 0.5},
        }, exact=True)
        assert ok and fails.count() == 0

    def test_failing_gate_reports_each_violation(self, spark):
        from nifi_extracttext_processor_spark.operators.profile import (
            check_expectations,
        )
        ok, fails = check_expectations(self._df(spark), {
            "s": {"max_null_frac": 0.1, "min_distinct": 3},
            "v": {"min_value": "6"},   # observed min "5.0" < "6"
        }, exact=True)
        assert not ok
        got = {(r["column"], r["check"]) for r in fails.collect()}
        assert got == {("s", "max_null_frac"), ("s", "min_distinct"),
                       ("v", "min_value")}

    def test_unknown_check_raises(self, spark):
        from nifi_extracttext_processor_spark.operators.profile import (
            check_expectations,
        )
        with pytest.raises(ValueError):
            check_expectations(self._df(spark), {"id": {"nope": 1}})


class TestQuantileProfile:
    def _df(self, spark):
        from pyspark.sql import functions as F
        return (spark.range(0, 101)
                .select(F.col("id").cast("double").alias("x"),
                        (F.col("id") * 2).cast("long").alias("y")))

    def test_exact_quantiles_golden(self, spark):
        from nifi_extracttext_processor_spark.operators.profile import (
            profile_quantiles,
        )
        got = {(r["column"], r["prob"]): r["quantile"] for r in
               profile_quantiles(self._df(spark), ["x", "y"],
                                 probs=(0.0, 0.5, 1.0),
                                 exact=True).collect()}
        assert got[("x", 0.0)] == 0.0
        assert got[("x", 0.5)] == 50.0
        assert got[("x", 1.0)] == 100.0
        assert got[("y", 0.5)] == 100.0

    def test_matches_duckdb(self, spark):
        import duckdb

        from nifi_extracttext_processor_spark.operators.profile import (
            profile_quantiles, profile_quantiles_sql,
        )
        df = self._df(spark)
        got = [tuple(r) for r in
               profile_quantiles(df, ["x", "y"], exact=True).collect()]
        con = duckdb.connect()
        con.register("t", df.toPandas())
        want = [tuple(r) for r in con.execute(
            profile_quantiles_sql("t", ["x", "y"])).fetchall()]
        assert got == want

    def test_approx_single_scan_and_close(self, spark):
        from nifi_extracttext_processor_spark.operators.profile import (
            profile_quantiles,
        )
        df = self._df(spark)
        out = profile_quantiles(df, ["x", "y"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        # ONE aggregation pass over the input, no per-column jobs
        assert plan.count("Scan") <= 2
        assert "BatchEvalPython" not in plan
        got = {(r["column"], r["prob"]): r["quantile"]
               for r in out.collect()}
        assert abs(got[("x", 0.5)] - 50.0) <= 1.0

    def test_bad_args(self, spark):
        import pytest as pt

        from nifi_extracttext_processor_spark.operators.profile import (
            profile_quantiles,
        )
        df = self._df(spark).withColumn(
            "s", F.lit("str"))
        with pt.raises(ValueError, match="non-numeric"):
            profile_quantiles(df, ["s"])
        with pt.raises(ValueError):
            profile_quantiles(df, [])
        with pt.raises(ValueError):
            profile_quantiles(df, ["x"], probs=(1.5,))


class TestKeySkewReport:
    def test_planted_hot_key(self, spark):
        from nifi_extracttext_processor_spark.operators.profile import (
            key_skew_report,
        )
        from pyspark.sql import functions as F
        # 1000 rows on the hot key, 10 each on 50 cold keys
        df = spark.range(1000).select(F.lit("hot").alias("k")).union(
            spark.range(500).select(
                F.concat(F.lit("cold"), (F.col("id") % 50))
                .alias("k")))
        rows = key_skew_report(df, ["k"], k=3).collect()
        assert rows[0]["rank"] == 1 and rows[0]["k"] == "hot"
        assert rows[0]["n"] == 1000
        # mean rows/key = 1500/51; skew = 1000 / (1500/51) = 34.0
        assert rows[0]["skew"] == 34.0
        assert rows[0]["frac"] == round(1000 / 1500, 4)
        assert rows[1]["n"] == 10  # cold keys tied, key-asc order
        assert rows[1]["k"] == "cold0" and rows[2]["k"] == "cold1"

    def test_null_keys_are_a_bucket(self, spark):
        from nifi_extracttext_processor_spark.operators.profile import (
            key_skew_report,
        )
        from pyspark.sql import functions as F
        df = spark.range(10).select(
            F.when(F.col("id") < 7, None).otherwise("x").alias("k"))
        rows = key_skew_report(df, ["k"], k=2).collect()
        assert rows[0]["k"] is None and rows[0]["n"] == 7

    def test_twin_parity_and_validation(self, spark, sf_dir):
        import duckdb
        import pytest as pt
        from nifi_extracttext_processor_spark.operators.profile import (
            key_skew_report, key_skew_report_sql,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        got = sorted(map(tuple, key_skew_report(
            ev, ["event_type", "user_id"], k=25).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        want = sorted(map(tuple, con.execute(key_skew_report_sql(
            "events", ["event_type", "user_id"], k=25)).fetchall()))
        assert got == want
        with pt.raises(ValueError):
            key_skew_report(ev, [], k=5)
        with pt.raises(ValueError):
            key_skew_report(ev, ["user_id"], k=0)

    def test_no_global_sort_in_plan(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.profile import (
            key_skew_report,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        plan = key_skew_report(ev, ["user_id"], k=10)._jdf \
            .queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
