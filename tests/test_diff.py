"""Snapshot diffing (operators/diff.py): verdict goldens, null-safe
semantics, hash-compare equivalence, duplicate-key guard, DuckDB
twin, and the one-join plan shape."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.diff import (
    diff_snapshots,
    diff_snapshots_sql,
    diff_summary,
)

OLD = [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40),
       (5, "e", None)]
NEW = [(1, "a", 10),            # unchanged
       (2, "B", 20),            # changed (value)
       (3, None, 30),           # unchanged (NULL == NULL)
       (5, "e", 55),            # changed (NULL -> value)
       (6, "f", 60)]            # added; 4 removed


def _pair(spark):
    old = spark.createDataFrame(OLD, "k long, s string, v int")
    new = spark.createDataFrame(NEW, "k long, s string, v int")
    return old, new


class TestVerdicts:
    def test_golden(self, spark):
        old, new = _pair(spark)
        got = {r["k"]: r["change_type"] for r in
               diff_snapshots(old, new, ["k"]).collect()}
        assert got == {2: "changed", 4: "removed", 5: "changed",
                       6: "added"}

    def test_include_unchanged_and_summary(self, spark):
        old, new = _pair(spark)
        d = diff_snapshots(old, new, ["k"], include_unchanged=True)
        got = {r["k"]: r["change_type"] for r in d.collect()}
        assert got[1] == "unchanged" and got[3] == "unchanged"
        s = {r["change_type"]: r["n"] for r in
             diff_summary(d).collect()}
        assert s == {"added": 1, "removed": 1, "changed": 2,
                     "unchanged": 2}

    def test_old_new_values_carried(self, spark):
        old, new = _pair(spark)
        rows = {r["k"]: r for r in
                diff_snapshots(old, new, ["k"]).collect()}
        assert rows[2]["old_s"] == "b" and rows[2]["new_s"] == "B"
        assert rows[4]["old_v"] == 40 and rows[4]["new_v"] is None
        assert rows[6]["old_s"] is None and rows[6]["new_s"] == "f"

    def test_hash_compare_same_verdicts(self, spark):
        old, new = _pair(spark)
        a = sorted((r["k"], r["change_type"]) for r in
                   diff_snapshots(old, new, ["k"]).collect())
        b = sorted((r["k"], r["change_type"]) for r in
                   diff_snapshots(old, new, ["k"],
                                  hash_compare=True).collect())
        assert a == b

    def test_hash_compare_null_and_separator_adversarial(self, spark):
        # NULL vs a literal NUL byte, and separator bytes that would
        # shift column boundaries under naive concat_ws hashing, must
        # all read as CHANGED / UNCHANGED correctly.
        old = spark.createDataFrame(
            [(1, None, "x"), (2, "a\x1f", "b"), (3, "p", "q")],
            "k int, s string, t string")
        new = spark.createDataFrame(
            [(1, "\x00", "x"), (2, "a", "\x1fb"), (3, "p", "q")],
            "k int, s string, t string")
        got = {r["k"]: r["change_type"] for r in
               diff_snapshots(old, new, ["k"], hash_compare=True,
                              include_unchanged=True).collect()}
        assert got == {1: "changed", 2: "changed", 3: "unchanged"}

    def test_subset_compare_cols(self, spark):
        old, new = _pair(spark)
        # comparing only v: key 2 (s changed, v same) reads unchanged
        got = {r["k"]: r["change_type"] for r in
               diff_snapshots(old, new, ["k"],
                              compare_cols=["v"]).collect()}
        assert 2 not in got
        assert got[5] == "changed"

    def test_duplicate_key_guard_and_validation(self, spark):
        old, new = _pair(spark)
        dup = old.unionAll(old.limit(1))
        with pytest.raises(ValueError, match="duplicate key"):
            diff_snapshots(dup, new, ["k"], assert_unique_keys=True)
        with pytest.raises(ValueError, match="key columns"):
            diff_snapshots(old, new, [])
        with pytest.raises(ValueError, match="missing"):
            diff_snapshots(old, new, ["k"], compare_cols=["zz"])


class TestParityAndPlan:
    def test_duckdb_parity(self, spark):
        import pandas as pd
        old, new = _pair(spark)
        key = lambda t: tuple((x is None, x) for x in t)
        got = sorted((tuple(r) for r in diff_snapshots(
            old, new, ["k"], include_unchanged=True).collect()),
            key=key)
        con = duckdb.connect()
        con.register("o", pd.DataFrame(OLD, columns=["k", "s", "v"]))
        con.register("n", pd.DataFrame(NEW, columns=["k", "s", "v"]))
        want = sorted((tuple(r) for r in con.execute(
            diff_snapshots_sql("o", "n", ["k"], ["s", "v"],
                               include_unchanged=True)).fetchall()),
            key=key)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert [x for x in g] == [
                int(x) if isinstance(x, float) and x == int(x)
                else x for x in w]

    def test_single_join_no_udf(self, spark):
        old, new = _pair(spark)
        plan = diff_snapshots(old, new, ["k"])._jdf \
            .queryExecution().executedPlan().toString()
        assert plan.count("Join") == 1
        assert "BatchEvalPython" not in plan
