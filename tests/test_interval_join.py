"""interval_join (operators/temporal.py): bin-strategy range join vs
the DuckDB theta-join oracle, multiplicity/edge semantics, and the
plan guarantee that the join is a hash equi-join (never a nested-loop
or cartesian).
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.temporal import (
    interval_join,
    interval_join_sql,
)


def _random_frames(spark, seed=11, n_left=300, n_right=60):
    rnd = random.Random(seed)
    left = [(i, rnd.randrange(3), rnd.uniform(0, 1000))
            for i in range(n_left)]
    right = []
    for j in range(n_right):
        s = rnd.uniform(0, 1000)
        right.append((j, rnd.randrange(3), s, s + rnd.uniform(0, 150)))
    # a couple of degenerate intervals (end < start) that must drop
    right.append((n_right, 0, 500.0, 400.0))
    right.append((n_right + 1, 1, 900.0, 900.0))  # point interval
    ldf = spark.createDataFrame(left, "lid long, k long, ts double")
    rdf = spark.createDataFrame(right,
                                "rid long, k long, s double, e double")
    return left, right, ldf, rdf


def _duckdb_want(left, right, by):
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    con.register("l_t", pd.DataFrame(
        left, columns=["lid", "k", "ts"]))
    con.register("r_t", pd.DataFrame(
        right, columns=["rid", "k", "s", "e"]))
    sql = interval_join_sql(
        "l_t", "r_t", ts_col="ts", start_col="s", end_col="e",
        by="k" if by else None,
        left_cols=("lid", "k", "ts"), right_cols=("rid",))
    return sorted((int(r["lid"]), None if pd.isna(r["rid"])
                   else int(r["rid"]))
                  for _, r in con.execute(sql).df().iterrows())


class TestIntervalJoin:
    @pytest.mark.parametrize("bucket", [10.0, 100.0, 5000.0])
    def test_keyed_matches_duckdb(self, spark, bucket):
        left, right, ldf, rdf = _random_frames(spark)
        got = sorted(
            (r["lid"], r["rid"]) for r in interval_join(
                ldf, rdf, ts_col="ts", start_col="s", end_col="e",
                by="k", bucket_seconds=bucket,
                right_cols=("rid",)).collect())
        assert got == _duckdb_want(left, right, by=True)

    def test_unkeyed_matches_duckdb(self, spark):
        left, right, ldf, rdf = _random_frames(spark, n_left=80,
                                               n_right=25)
        got = sorted(
            (r["lid"], r["rid"]) for r in interval_join(
                ldf, rdf, ts_col="ts", start_col="s", end_col="e",
                bucket_seconds=50.0, right_cols=("rid",)).collect())
        want = _duckdb_want(left[:80], right[:25] + right[-2:],
                            by=False)
        assert got == want

    def test_left_join_keeps_unmatched(self, spark):
        ldf = spark.createDataFrame(
            [(1, 5.0), (2, 50.0), (2, 50.0), (3, 999.0)],
            "lid long, ts double")
        rdf = spark.createDataFrame(
            [(10, 0.0, 10.0), (11, 40.0, 60.0)],
            "rid long, s double, e double")
        rows = interval_join(ldf, rdf, ts_col="ts", start_col="s",
                             end_col="e", bucket_seconds=20.0,
                             how="left", right_cols=("rid",)).collect()
        got = sorted((r["lid"], r["rid"]) for r in rows)
        # duplicate left row keeps multiplicity; unmatched keeps NULL
        assert got == [(1, 10), (2, 11), (2, 11), (3, None)]

    def test_inclusive_bounds_and_point_interval(self, spark):
        ldf = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 15.0)], "lid long, ts double")
        rdf = spark.createDataFrame(
            [(7, 10.0, 20.0), (8, 15.0, 15.0)],
            "rid long, s double, e double")
        got = sorted((r["lid"], r["rid"]) for r in interval_join(
            ldf, rdf, ts_col="ts", start_col="s", end_col="e",
            bucket_seconds=4.0, right_cols=("rid",)).collect())
        assert got == [(1, 7), (2, 7), (3, 7), (3, 8)]

    def test_interval_spanning_many_buckets(self, spark):
        ldf = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "lid long, ts double")
        rdf = spark.createDataFrame(
            [(1, 5.0, 95.0)], "rid long, s double, e double")
        n = interval_join(ldf, rdf, ts_col="ts", start_col="s",
                          end_col="e", bucket_seconds=3.0,
                          right_cols=("rid",)).count()
        assert n == 91

    def test_bad_args(self, spark):
        ldf = spark.createDataFrame([(1, 1.0)], "lid long, ts double")
        rdf = spark.createDataFrame([(1, 0.0, 2.0)],
                                    "rid long, s double, e double")
        with pytest.raises(ValueError):
            interval_join(ldf, rdf, start_col="s", end_col="e",
                          how="outer")
        with pytest.raises(ValueError):
            interval_join(ldf, rdf, start_col="s", end_col="e",
                          bucket_seconds=0)

    def test_plan_is_hash_equijoin(self, spark):
        _, _, ldf, rdf = _random_frames(spark, n_left=50, n_right=20)
        plan = interval_join(
            ldf, rdf, ts_col="ts", start_col="s", end_col="e",
            by="k", bucket_seconds=100.0,
            right_cols=("rid",))._jdf \
            .queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan
        assert "Cartesian" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
            or "BroadcastHashJoin" in plan
