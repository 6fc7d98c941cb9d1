"""Rollup maintenance: the rollup-of-rollup == direct-agg invariant
(per grain, per dims subset), merge associativity, avg-at-query-time
correctness, HLL-register grain re-merge ≡ direct build, DuckDB twin
parity on real events."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.rollup import (
    rollup_build,
    rollup_distinct_build,
    rollup_distinct_query,
    rollup_merge,
    rollup_query,
    rollup_query_sql,
    rollup_to_grain,
)
from nifi_extracttext_processor_spark.operators.sketch import (
    hll_distinct,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from nifi_extracttext_processor_spark.sources.tables import (
        load_table,
    )
    return load_table(spark, sf_dir, "events")


def _rows(df):
    return sorted(map(tuple, df.collect()))


class TestInvariant:
    def test_month_from_day_equals_direct_month(self, spark, events):
        day = rollup_build(events, "ts", "day", ["event_type"],
                           "value")
        via_state = rollup_query(day, "month", ["event_type"])
        direct = rollup_query(
            rollup_build(events, "ts", "month", ["event_type"],
                         "value"),
            "month", ["event_type"])
        assert _rows(via_state) == _rows(direct)

    def test_drop_dims_on_requery(self, spark, events):
        day = rollup_build(events, "ts", "day", ["event_type"],
                           "value")
        no_dims = rollup_query(day, "year")
        direct = rollup_query(rollup_build(events, "ts", "year",
                                           value_col="value"), "year")
        assert _rows(no_dims) == _rows(direct)

    def test_merge_of_splits_equals_whole(self, spark, events):
        h1 = events.filter(F.col("event_id") % 2 == 0)
        h2 = events.filter(F.col("event_id") % 2 == 1)
        merged = rollup_merge(
            rollup_build(h1, "ts", "day", ["event_type"], "value"),
            rollup_build(h2, "ts", "day", ["event_type"], "value"))
        whole = rollup_build(events, "ts", "day", ["event_type"],
                             "value")
        a = _rows(rollup_query(merged, "month", ["event_type"]))
        b = _rows(rollup_query(whole, "month", ["event_type"]))
        assert a == b

    def test_counts_only_state(self, spark, events):
        day = rollup_build(events, "ts", "day", ["event_type"])
        out = rollup_query(day, "month", ["event_type"])
        assert set(out.columns) == {"bucket", "event_type", "n_rows"}
        total = out.agg(F.sum("n_rows")).collect()[0][0]
        assert total == events.count()

    def test_validates_grain(self, spark, events):
        with pytest.raises(ValueError, match="grain"):
            rollup_build(events, "ts", "week")
        with pytest.raises(ValueError):
            rollup_merge()


class TestAvg:
    def test_avg_is_sum_over_nvals(self, spark):
        df = spark.createDataFrame(
            [("2024-01-01 05:00:00", "a", 1.0),
             ("2024-01-02 06:00:00", "a", 2.0),
             ("2024-02-03 07:00:00", "a", 10.0),
             ("2024-01-04 08:00:00", "a", None)],
            "ts string, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        day = rollup_build(df, "ts", "day", ["event_type"], "value")
        got = {r["bucket"].month: r for r in
               rollup_query(day, "month", ["event_type"]).collect()}
        assert got[1]["n_rows"] == 3 and got[1]["n_vals"] == 2
        assert got[1]["avg_v"] == 1.5       # (1+2)/2, NULL excluded
        assert got[2]["avg_v"] == 10.0


class TestDistinct:
    def test_day_registers_to_month_equal_direct(self, spark, events):
        state = rollup_distinct_build(events, "user_id", "ts", "day",
                                      ["event_type"])
        via = rollup_distinct_query(state, "month", ["event_type"])
        direct = hll_distinct(
            events.select(F.date_trunc("month", "ts").alias("__tb"),
                          "event_type", "user_id"),
            "user_id", ["__tb", "event_type"]) \
            .withColumnRenamed("__tb", "bucket")
        assert _rows(via) == _rows(direct)


class TestStreaming:
    def _batches(self, spark):
        b0 = spark.createDataFrame(
            [("2024-01-01 05:00:00", "click", 1.0),
             ("2024-01-02 06:00:00", "click", 2.0),
             ("2024-01-02 07:00:00", "view", 5.0)],
            "ts string, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        b1 = spark.createDataFrame(
            [("2024-01-02 08:00:00", "click", 4.0),
             ("2024-02-01 09:00:00", "view", 7.0)],
            "ts string, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        return b0, b1

    def test_incremental_state_equals_batch_build(self, spark,
                                                  tmp_path):
        from nifi_extracttext_processor_spark.streaming.pipeline \
            import stream_rollup
        sd = str(tmp_path / "state")
        fb, read_state = stream_rollup(sd, "ts", "day",
                                       ["event_type"], "value")
        assert read_state(spark) is None
        b0, b1 = self._batches(spark)
        fb(b0, 0)
        fb(b1, 1)
        got = _rows(rollup_query(read_state(spark), "month",
                                 ["event_type"]))
        want = _rows(rollup_query(
            rollup_build(b0.unionByName(b1), "ts", "day",
                         ["event_type"], "value"),
            "month", ["event_type"]))
        assert got == want

    def test_replay_does_not_double_count(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.streaming.pipeline \
            import stream_rollup
        sd = str(tmp_path / "state2")
        fb, read_state = stream_rollup(sd, "ts", "day",
                                       ["event_type"], "value")
        b0, b1 = self._batches(spark)
        fb(b0, 0)
        fb(b1, 1)
        want = _rows(read_state(spark))
        fb(b1, 1)      # at-least-once replay after commit
        assert _rows(read_state(spark)) == want


class TestTwin:
    def test_query_parity(self, spark, events, sf_dir):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        day = rollup_build(events, "ts", "day", ["event_type"],
                           "value")
        a = _rows(rollup_query(day, "month", ["event_type"])
                  .select("bucket", "event_type", "n_rows", "n_vals",
                          "sum_v", "min_v", "max_v", "avg_v"))
        b = sorted(map(tuple, con.execute(rollup_query_sql(
            "events", "ts", "month", ["event_type"],
            "value")).fetchall()))
        assert a == b
