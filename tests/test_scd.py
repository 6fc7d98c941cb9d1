"""SCD Type-2 operators (operators/scd.py): interval goldens,
no-op compaction, null-safe change semantics, the
merge-equals-rebuild invariant, and DuckDB twins."""
from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.scd import (
    scd2_from_changelog,
    scd2_from_changelog_sql,
    scd2_merge,
    scd2_merge_sql,
)


def _t(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


LOG = [
    # key 1: gold -> gold (no-op, compacts) -> silver
    (1, "gold", _t(0)),
    (1, "gold", _t(1)),
    (1, "silver", _t(2)),
    # key 2: one record, stays open
    (2, "bronze", _t(0)),
    # key 3: null -> null (no churn) -> value
    (3, None, _t(0)),
    (3, None, _t(1)),
    (3, "gold", _t(5)),
]


def _log(spark, rows=None):
    return spark.createDataFrame(rows or LOG,
                                 "user_id long, tier string, "
                                 "ts timestamp")


class TestChangelog:
    def test_intervals_and_compaction(self, spark):
        hist = scd2_from_changelog(_log(spark), ["user_id"], ["tier"])
        rows = sorted(
            ((r["user_id"], r["tier"], r["valid_from"],
              r["valid_to"], r["is_current"])
             for r in hist.collect()),
            key=lambda x: (x[0], x[2]))
        assert rows == [
            (1, "gold", _t(0), _t(2), False),
            (1, "silver", _t(2), None, True),
            (2, "bronze", _t(0), None, True),
            (3, None, _t(0), _t(5), False),
            (3, "gold", _t(5), None, True),
        ]

    def test_point_in_time_join_semantics(self, spark):
        # the reason SCD2 exists: an as-of lookup at t=1 must see gold
        hist = scd2_from_changelog(_log(spark), ["user_id"], ["tier"])
        at = hist.filter(
            (F.col("user_id") == 1)
            & (F.col("valid_from") <= F.lit(_t(1)))
            & (F.col("valid_to").isNull()
               | (F.col("valid_to") > F.lit(_t(1)))))
        assert [r["tier"] for r in at.collect()] == ["gold"]

    def test_duckdb_parity(self, spark):
        import pandas as pd
        df = _log(spark)
        key = lambda t: tuple((x is None, x) for x in t)
        got = sorted((tuple(r) for r in scd2_from_changelog(
            df, ["user_id"], ["tier"],
            tiebreak_col="tier").collect()), key=key)
        con = duckdb.connect()
        con.register("log", pd.DataFrame(
            LOG, columns=["user_id", "tier", "ts"]))
        want = sorted((tuple(r) for r in con.execute(
            scd2_from_changelog_sql(
                "log", ["user_id"], ["tier"],
                tiebreak_col="tier")).fetchall()), key=key)
        assert got == want

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            scd2_from_changelog(_log(spark), [], ["tier"])


class TestMerge:
    def _hist(self, spark):
        return scd2_from_changelog(_log(spark), ["user_id"], ["tier"])

    def test_close_insert_untouched(self, spark):
        hist = self._hist(spark)
        updates = spark.createDataFrame(
            [(1, "platinum", _t(10)),    # changed
             (2, "bronze", _t(10)),      # unchanged -> untouched
             (9, "new", _t(10))],        # brand-new key
            "user_id long, tier string, ts timestamp")
        merged = scd2_merge(hist, updates, ["user_id"], ["tier"])
        rows = sorted(
            ((r["user_id"], r["tier"], r["valid_from"],
              r["valid_to"], r["is_current"])
             for r in merged.collect()),
            key=lambda x: (x[0], x[2]))
        assert (1, "silver", _t(2), _t(10), False) in rows
        assert (1, "platinum", _t(10), None, True) in rows
        assert (2, "bronze", _t(0), None, True) in rows
        assert (9, "new", _t(10), None, True) in rows
        # exactly one open row per live key
        cur = [r for r in rows if r[4]]
        assert sorted(r[0] for r in cur) == [1, 2, 3, 9]

    def test_null_semantics(self, spark):
        hist = self._hist(spark)
        updates = spark.createDataFrame(
            [(3, "gold", _t(10)),     # same value -> untouched
             (2, None, _t(10)),       # value -> NULL: real change
             (8, None, _t(10))],      # new key with NULL attr
            "user_id long, tier string, ts timestamp")
        merged = scd2_merge(hist, updates, ["user_id"], ["tier"])
        rows = {(r["user_id"], r["tier"], r["is_current"])
                for r in merged.collect()}
        assert (3, "gold", True) in rows          # untouched
        assert (2, "bronze", False) in rows       # closed
        assert (2, None, True) in rows            # new NULL version
        assert (8, None, True) in rows            # new key
        # and NULL -> NULL earlier in key 3's history never churned
        n3 = [r for r in merged.collect() if r["user_id"] == 3]
        assert len(n3) == 2

    def test_merge_equals_rebuild(self, spark):
        """Applying a later snapshot batch to the built history ==
        rebuilding from the concatenated changelog."""
        upd_rows = [(1, "platinum", _t(10)), (2, "bronze", _t(10)),
                    (9, "new", _t(10))]
        hist = self._hist(spark)
        updates = spark.createDataFrame(
            upd_rows, "user_id long, tier string, ts timestamp")
        key = lambda t: tuple((x is None, x) for x in t)
        merged = sorted((tuple(r) for r in scd2_merge(
            hist, updates, ["user_id"], ["tier"]).collect()), key=key)
        rebuilt = sorted((tuple(r) for r in scd2_from_changelog(
            _log(spark, LOG + upd_rows), ["user_id"],
            ["tier"]).collect()), key=key)
        assert merged == rebuilt

    def test_duckdb_parity(self, spark):
        import pandas as pd
        hist = self._hist(spark)
        upd_rows = [(1, "platinum", _t(10)), (2, None, _t(10)),
                    (9, "new", _t(10)),
                    (3, "stale-change", _t(4))]   # stale: both drop
        updates = spark.createDataFrame(
            upd_rows, "user_id long, tier string, ts timestamp")
        key = lambda t: tuple((x is None, x) for x in t)
        got = sorted((tuple(r) for r in scd2_merge(
            hist, updates, ["user_id"], ["tier"]).collect()), key=key)
        con = duckdb.connect()
        con.register("hist", hist.toPandas())
        con.register("upd", pd.DataFrame(
            upd_rows, columns=["user_id", "tier", "ts"]))
        want = sorted((tuple(r) for r in con.execute(scd2_merge_sql(
            "hist", "upd", ["user_id"], ["tier"])).fetchall()),
            key=key)
        assert got == want

    def test_plan_broadcasts_updates(self, spark):
        hist = self._hist(spark)
        updates = spark.createDataFrame(
            [(1, "x", _t(10))],
            "user_id long, tier string, ts timestamp")
        plan = scd2_merge(hist, updates, ["user_id"], ["tier"])._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan

    def test_validation(self, spark):
        hist = self._hist(spark)
        with pytest.raises(ValueError, match="missing column"):
            scd2_merge(hist.drop("is_current"), hist, ["user_id"],
                       ["tier"])
        with pytest.raises(ValueError):
            scd2_merge(hist, hist, [], ["tier"])


class TestStreamScd2:
    def _batches(self, spark):
        b0 = spark.createDataFrame(
            [(1, "gold", _t(0)), (2, "bronze", _t(1)),
             (1, "silver", _t(2))],        # two changes for key 1
            "user_id long, tier string, ts timestamp")
        b1 = spark.createDataFrame(
            [(1, "platinum", _t(5)), (3, "new", _t(5))],
            "user_id long, tier string, ts timestamp")
        return b0, b1

    def test_batches_build_history(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_scd2,
        )
        hd = str(tmp_path / "hist")
        fb, read_history = stream_scd2(hd, ["user_id"], ["tier"])
        assert read_history(spark) is None      # pre-bootstrap
        b0, b1 = self._batches(spark)
        fb(b0, 0)
        h0 = {(r["user_id"], r["tier"], r["is_current"])
              for r in read_history(spark).collect()}
        # within-batch intermediate state (gold) collapses: latest only
        assert h0 == {(1, "silver", True), (2, "bronze", True)}
        fb(b1, 1)
        h1 = sorted(
            ((r["user_id"], r["tier"], r["valid_from"],
              r["valid_to"], r["is_current"])
             for r in read_history(spark).collect()),
            key=lambda x: (x[0], x[2]))
        assert (1, "silver", _t(2), _t(5), False) in h1
        assert (1, "platinum", _t(5), None, True) in h1
        assert (2, "bronze", _t(1), None, True) in h1
        assert (3, "new", _t(5), None, True) in h1

    def test_replay_idempotent(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_scd2,
        )
        hd = str(tmp_path / "hist2")
        fb, read_history = stream_scd2(hd, ["user_id"], ["tier"])
        b0, b1 = self._batches(spark)
        fb(b0, 0)
        fb(b1, 1)
        want = sorted(
            (tuple(r) for r in read_history(spark).collect()),
            key=str)
        fb(b1, 1)      # at-least-once replay after commit
        got = sorted(
            (tuple(r) for r in read_history(spark).collect()),
            key=str)
        assert got == want


class TestStaleAndAsOf:
    def _hist(self, spark):
        return scd2_from_changelog(_log(spark), ["user_id"], ["tier"])

    def test_stale_dropped_by_default(self, spark):
        hist = self._hist(spark)
        # key 1's open row starts at t2; an update at t1 is stale
        upd = spark.createDataFrame(
            [(1, "ancient", _t(1)), (9, "new", _t(10))],
            "user_id long, tier string, ts timestamp")
        merged = scd2_merge(hist, upd, ["user_id"], ["tier"])
        rows = {(r["user_id"], r["tier"], r["is_current"])
                for r in merged.collect()}
        assert (1, "silver", True) in rows       # untouched
        assert (1, "ancient", True) not in rows  # stale dropped
        assert (9, "new", True) in rows          # fresh insert kept

    def test_stale_error_mode(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import SparkRuntimeException
        hist = self._hist(spark)
        upd = spark.createDataFrame(
            [(1, "ancient", _t(1))],
            "user_id long, tier string, ts timestamp")
        with pytest.raises((Py4JJavaError, SparkRuntimeException),
                           match="stale"):
            scd2_merge(hist, upd, ["user_id"], ["tier"],
                       on_stale="error").collect()
        with pytest.raises(ValueError, match="on_stale"):
            scd2_merge(hist, upd, ["user_id"], ["tier"],
                       on_stale="banana")

    def test_as_of_lookup(self, spark):
        from nifi_extracttext_processor_spark.operators.scd import (
            scd2_as_of,
        )
        hist = self._hist(spark)
        at1 = {(r["user_id"], r["tier"])
               for r in scd2_as_of(hist, _t(1)).collect()}
        assert at1 == {(1, "gold"), (2, "bronze"), (3, None)}
        at6 = {(r["user_id"], r["tier"])
               for r in scd2_as_of(hist, _t(6)).collect()}
        assert at6 == {(1, "silver"), (2, "bronze"), (3, "gold")}
