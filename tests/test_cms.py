"""Count-min sketch: one-sided error guarantee (never undercounts),
accuracy on skew, merge ≡ whole, DuckDB twin parity, determinism."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.sketch import (
    cms_build,
    cms_build_sql,
    cms_estimate,
    cms_estimate_sql,
    cms_merge,
)


@pytest.fixture(scope="module")
def frame(spark):
    # Zipf-ish: item_0 x 1000, item_1 x 500, ... long tail of 1s.
    rows = []
    rows += [("g1", "item_0")] * 1000
    rows += [("g1", "item_1")] * 500
    rows += [("g1", f"tail_{i}") for i in range(300)]
    rows += [("g2", "item_0")] * 50
    rows.append(("g1", None))
    return spark.createDataFrame(rows, "g string, val string")


@pytest.fixture(scope="module")
def items(spark):
    return spark.createDataFrame(
        [("g1", "item_0"), ("g1", "item_1"), ("g1", "tail_7"),
         ("g1", "absent"), ("g2", "item_0")], "g string, val string")


class TestGuarantees:
    def test_never_undercounts_and_tight_on_skew(self, spark, frame,
                                                 items):
        sk = cms_build(frame, "val", ["g"], d=4, w=2048)
        got = {(r["g"], r["val"]): r["est_count"] for r in
               cms_estimate(sk, items, "val", ["g"], d=4,
                            w=2048).collect()}
        true = {("g1", "item_0"): 1000, ("g1", "item_1"): 500,
                ("g1", "tail_7"): 1, ("g1", "absent"): 0,
                ("g2", "item_0"): 50}
        n = 1800
        for k, t in true.items():
            assert got[k] >= t, (k, got[k], t)
            # eps = e/w; bound is eps*N with prob 1-e^-d — at w=2048
            # and N=1800 the slack is ~2.4; assert a loose 0.01*N
            assert got[k] <= t + 0.01 * n, (k, got[k], t)

    def test_deterministic(self, spark, frame, items):
        a = sorted(map(tuple, cms_estimate(
            cms_build(frame, "val", ["g"]), items, "val",
            ["g"]).collect()))
        b = sorted(map(tuple, cms_estimate(
            cms_build(frame, "val", ["g"]), items, "val",
            ["g"]).collect()))
        assert a == b

    def test_validates(self, spark, frame):
        with pytest.raises(ValueError):
            cms_build(frame, "val", d=0)
        with pytest.raises(ValueError):
            cms_merge()


class TestMerge:
    def test_merge_equals_whole(self, spark, frame, items):
        h1 = frame.filter(F.col("val").startswith("item")
                          | F.col("val").isNull())
        h2 = frame.filter(~F.col("val").startswith("item"))
        merged = cms_merge(cms_build(h1, "val", ["g"]),
                           cms_build(h2, "val", ["g"]))
        whole = cms_build(frame, "val", ["g"])
        a = sorted(map(tuple, cms_estimate(
            merged, items, "val", ["g"]).collect()))
        b = sorted(map(tuple, cms_estimate(
            whole, items, "val", ["g"]).collect()))
        assert a == b


class TestStreaming:
    def test_incremental_counts_and_replay(self, spark, tmp_path,
                                           frame, items):
        from nifi_extracttext_processor_spark.streaming.pipeline \
            import stream_cms
        sd = str(tmp_path / "cms_state")
        fb, read_state = stream_cms(sd, "val", ["g"])
        assert read_state(spark) is None
        h1 = frame.filter(F.col("val").startswith("item")
                          | F.col("val").isNull())
        h2 = frame.filter(~F.col("val").startswith("item"))
        fb(h1, 0)
        fb(h2, 1)
        got = sorted(map(tuple, cms_estimate(
            read_state(spark), items, "val", ["g"]).collect()))
        want = sorted(map(tuple, cms_estimate(
            cms_build(frame, "val", ["g"]), items, "val",
            ["g"]).collect()))
        assert got == want
        snap = sorted(map(tuple, read_state(spark).collect()))
        fb(h2, 1)      # at-least-once replay: no double count
        assert sorted(map(tuple,
                          read_state(spark).collect())) == snap


class TestTwin:
    @pytest.fixture(scope="class")
    def ddb(self, frame, items):
        con = duckdb.connect()
        con.register("t", frame.toPandas())
        con.register("probes", items.toPandas())
        return con

    def test_build_parity(self, spark, frame, ddb):
        a = sorted(map(tuple, cms_build(
            frame, "val", ["g"], md5=True).collect()))
        b = sorted(map(tuple, ddb.execute(
            cms_build_sql("t", "val", ["g"])).fetchall()))
        assert a == b

    def test_estimate_parity(self, spark, frame, items, ddb):
        sk = cms_build(frame, "val", ["g"], md5=True)
        a = sorted(map(tuple, cms_estimate(
            sk, items, "val", ["g"], md5=True)
            .select("g", F.col("val").alias("item"), "est_count")
            .collect()))
        b = sorted(map(tuple, ddb.execute(cms_estimate_sql(
            "t", "val", "probes", "val", ["g"])).fetchall()))
        assert a == b
