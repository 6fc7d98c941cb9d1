"""Histogram state + grid quantiles: golden on a known distribution,
grid-precision bound vs exact percentile, merge ≡ whole, twin parity
on events, validation."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.histogram import (
    histogram_build,
    histogram_merge,
    histogram_quantiles,
    histogram_quantiles_sql,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [("a", float(i)) for i in range(1, 101)]   # 1..100
    rows += [("b", 5.0)] * 10
    rows.append(("a", None))
    rows.append(("a", 1e9))                            # clamps hi
    return spark.createDataFrame(rows, "g string, v double")


class TestQuantiles:
    def test_uniform_golden(self, spark, frame):
        st = histogram_build(frame, "v", 0.0, 100.0, 100, ["g"])
        got = {(r["g"], r["q"]): r["value"] for r in
               histogram_quantiles(st, [0.5, 0.95], 0.0, 100.0, 100,
                                   ["g"]).collect()}
        # group a: 101 values (1..100 + clamped outlier); width=1 so
        # midpoints are x.5; median ~ 50.5 +- 1 bin
        assert abs(got[("a", 0.5)] - 50.5) <= 1.0
        assert abs(got[("a", 0.95)] - 95.5) <= 1.5
        assert got[("b", 0.5)] == 5.5     # all mass in bin 5

    def test_grid_precision_vs_exact(self, spark, frame):
        a = frame.filter((F.col("g") == "a") & F.col("v").isNotNull()
                         & (F.col("v") < 1000))
        st = histogram_build(a, "v", 0.0, 100.0, 200)
        [r] = histogram_quantiles(st, [0.9], 0.0, 100.0,
                                  200).collect()
        exact = a.selectExpr("percentile(v, 0.9) p").collect()[0]["p"]
        assert abs(r["value"] - exact) <= 100.0 / 200  # width bound

    def test_merge_equals_whole(self, spark, frame):
        h1 = frame.filter(F.col("v") < 50)
        h2 = frame.filter(~(F.col("v") < 50) | F.col("v").isNull())
        merged = histogram_merge(
            histogram_build(h1, "v", 0.0, 100.0, 50, ["g"]),
            histogram_build(h2, "v", 0.0, 100.0, 50, ["g"]))
        whole = histogram_build(frame, "v", 0.0, 100.0, 50, ["g"])
        a = sorted(map(tuple, histogram_quantiles(
            merged, [0.25, 0.75], 0.0, 100.0, 50, ["g"]).collect()))
        b = sorted(map(tuple, histogram_quantiles(
            whole, [0.25, 0.75], 0.0, 100.0, 50, ["g"]).collect()))
        assert a == b

    def test_validates(self, spark, frame):
        with pytest.raises(ValueError):
            histogram_build(frame, "v", 5.0, 5.0, 10)
        with pytest.raises(ValueError):
            histogram_quantiles(frame, [1.5], 0.0, 1.0, 10)
        with pytest.raises(ValueError):
            histogram_merge()


class TestTwin:
    def test_events_parity(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        st = histogram_build(ev, "value", 0.0, 500.0, 64,
                             ["event_type"])
        a = sorted(map(tuple, histogram_quantiles(
            st, [0.5, 0.9, 0.99], 0.0, 500.0, 64,
            ["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        b = sorted(map(tuple, con.execute(histogram_quantiles_sql(
            "events", "value", [0.5, 0.9, 0.99], 0.0, 500.0, 64,
            ["event_type"])).fetchall()))
        assert a == b


class TestStreaming:
    def test_incremental_state_and_replay(self, spark, tmp_path,
                                          frame):
        from nifi_extracttext_processor_spark.streaming.pipeline \
            import stream_histogram
        sd = str(tmp_path / "hist_state")
        fb, read_state = stream_histogram(sd, "v", 0.0, 100.0, 50,
                                          ["g"])
        assert read_state(spark) is None
        h1 = frame.filter(F.col("v") < 50)
        h2 = frame.filter(~(F.col("v") < 50) | F.col("v").isNull())
        fb(h1, 0)
        fb(h2, 1)
        got = sorted(map(tuple, histogram_quantiles(
            read_state(spark), [0.5], 0.0, 100.0, 50,
            ["g"]).collect()))
        want = sorted(map(tuple, histogram_quantiles(
            histogram_build(frame, "v", 0.0, 100.0, 50, ["g"]),
            [0.5], 0.0, 100.0, 50, ["g"]).collect()))
        assert got == want
        snap = sorted(map(tuple, read_state(spark).collect()))
        fb(h2, 1)
        assert sorted(map(tuple,
                          read_state(spark).collect())) == snap


class TestWeighted:
    def test_token_weighted_median(self, spark):
        # doc lengths 10 and 100; short doc has 10 tokens, long 990:
        # the unweighted median doc length is ~55 but half of all
        # TOKENS live in docs of length 100
        df = spark.createDataFrame(
            [(10.0, 10), (100.0, 990)], "v double, w int")
        st = histogram_build(df, "v", 0.0, 128.0, 128,
                             weight_col="w")
        [r] = histogram_quantiles(st, [0.5], 0.0, 128.0,
                                  128).collect()
        assert r["value"] == 100.5
        with pytest.raises(ValueError, match="integer"):
            histogram_build(df.withColumn(
                "w", F.col("w").cast("double")), "v", 0.0, 1.0, 10,
                weight_col="w")
