"""Poisson-bootstrap CIs (operators/abtest.py ab_bootstrap_ci):
coverage sanity on a known-mean synthetic, determinism, weight
distribution, NULL/degenerate handling, DuckDB twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.abtest import (
    _POIS_CDF,
    ab_bootstrap_ci,
    ab_bootstrap_ci_sql,
)


@pytest.fixture(scope="module")
def metric(spark):
    # two variants, distinct means (c ~ i%7, t ~ i%7 + 3)
    rows = [(i, "c", float(i % 7)) for i in range(300)] \
        + [(i + 1000, "t", float(i % 7) + 3.0) for i in range(300)]
    return spark.createDataFrame(
        rows, "row_id long, variant string, value double")


class TestBootstrap:
    def test_ci_brackets_mean_and_separates_variants(self, metric):
        got = {r["variant"]: r for r in
               ab_bootstrap_ci(metric, "variant", "value",
                               "row_id", n_boot=100).collect()}
        for v in ("c", "t"):
            r = got[v]
            assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
            # a 300-row mean's CI is tight: half-width < 1
            assert r["ci_hi"] - r["ci_lo"] < 1.0
        # disjoint CIs for means 3 apart
        assert got["c"]["ci_hi"] < got["t"]["ci_lo"]
        assert got["c"]["n"] == 300

    def test_deterministic_and_seed_sensitive(self, metric):
        a = sorted(map(tuple, ab_bootstrap_ci(
            metric, "variant", "value", "row_id", n_boot=50,
            seed=7).collect()))
        b = sorted(map(tuple, ab_bootstrap_ci(
            metric.repartition(13), "variant", "value", "row_id",
            n_boot=50, seed=7).collect()))
        assert a == b
        c = sorted(map(tuple, ab_bootstrap_ci(
            metric, "variant", "value", "row_id", n_boot=50,
            seed=8).collect()))
        assert a != c  # different resamples, (almost surely) diff CI

    def test_poisson_weights_mean_one(self, spark):
        """The inverse-CDF weights must average ~1 (Poisson(1)), else
        every resample is biased."""
        df = spark.range(4000).select(
            F.col("id").alias("row_id"), F.lit("x").alias("variant"),
            F.lit(1.0).alias("value"))
        # weight mean shows up as resample-mean stability on a
        # constant metric: every resample mean is exactly 1.0
        [r] = ab_bootstrap_ci(df, "variant", "value", "row_id",
                              n_boot=20).collect()
        assert r["mean"] == 1.0
        assert r["ci_lo"] == 1.0 and r["ci_hi"] == 1.0
        # and the CDF table itself is a valid monotone CDF
        assert all(a < b for a, b in zip(_POIS_CDF, _POIS_CDF[1:]))
        assert 0.99999999 < _POIS_CDF[-1] < 1.0

    def test_nulls_excluded_and_validation(self, spark):
        df = spark.createDataFrame(
            [(1, "c", 1.0), (2, "c", None), (None, "c", 3.0)],
            "row_id long, variant string, value double")
        [r] = ab_bootstrap_ci(df, "variant", "value", "row_id",
                              n_boot=10).collect()
        assert r["n"] == 1
        with pytest.raises(ValueError):
            ab_bootstrap_ci(df, "variant", "value", "row_id", n_boot=1)
        with pytest.raises(ValueError):
            ab_bootstrap_ci(df, "variant", "value", "row_id",
                            alpha=1.5)

    def test_twin_parity_on_events(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        exp = ev.withColumn(
            "variant",
            F.when(F.pmod(F.col("event_id"), 3) == 0, "c")
            .otherwise("t"))
        got = sorted(map(tuple, ab_bootstrap_ci(
            exp, "variant", "value", "event_id", n_boot=60,
            group_by=["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW exp AS SELECT *, CASE WHEN event_id % 3 = 0 "
            "THEN 'c' ELSE 't' END AS variant FROM "
            f"'{sf_dir}/events.parquet'")
        want = sorted(map(tuple, con.execute(ab_bootstrap_ci_sql(
            "exp", "variant", "value", "event_id", n_boot=60,
            group_by=["event_type"])).fetchall()))
        assert got == want


class TestBootstrapRatio:
    def test_ratio_point_and_ci(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_bootstrap_ratio_ci,
        )
        # per-user (clicks, views): c ~ CTR 0.2, t ~ CTR 0.4
        rows = [(i, "c", float(i % 3), 10.0) for i in range(200)] \
            + [(i + 1000, "t", float(i % 3) + 2.0, 10.0)
               for i in range(200)]
        df = spark.createDataFrame(
            rows, "row_id long, variant string, clicks double, "
                  "views double")
        got = {r["variant"]: r for r in ab_bootstrap_ratio_ci(
            df, "variant", "clicks", "views", "row_id",
            n_boot=100).collect()}
        # sum(i%3, i<200) = 199; views sum = 2000 -> 0.0995
        assert got["c"]["ratio"] == 0.0995
        assert got["t"]["ratio"] == 0.2995   # (199 + 400) / 2000
        for v in ("c", "t"):
            r = got[v]
            assert r["ci_lo"] <= r["ratio"] <= r["ci_hi"]
        assert got["c"]["ci_hi"] < got["t"]["ci_lo"]

    def test_moves_num_and_den_together(self, spark):
        """Every unit has clicks == views, so EVERY resample ratio is
        exactly 1.0 — only a shared per-row weight achieves that
        degenerate CI; independent resampling of the two sides would
        scatter it."""
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_bootstrap_ratio_ci,
        )
        df = spark.range(500).select(
            F.col("id").alias("row_id"), F.lit("x").alias("variant"),
            (F.col("id") % 7 + 1).cast("double").alias("clicks"),
            (F.col("id") % 7 + 1).cast("double").alias("views"))
        [r] = ab_bootstrap_ratio_ci(
            df, "variant", "clicks", "views", "row_id",
            n_boot=40).collect()
        assert r["ratio"] == 1.0
        assert r["ci_lo"] == 1.0 and r["ci_hi"] == 1.0

    def test_twin_parity_on_events(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_bootstrap_ratio_ci, ab_bootstrap_ratio_ci_sql,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        exp = (ev.withColumn(
            "variant",
            F.when(F.pmod(F.col("event_id"), 3) == 0, "c")
            .otherwise("t"))
            .withColumn("views",
                        (F.pmod(F.col("user_id"), 5) + 1)
                        .cast("double")))
        got = sorted(map(tuple, ab_bootstrap_ratio_ci(
            exp, "variant", "value", "views", "event_id",
            n_boot=60, group_by=["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW exp AS SELECT *, CASE WHEN event_id % 3 = 0 "
            "THEN 'c' ELSE 't' END AS variant, "
            "CAST(user_id % 5 + 1 AS DOUBLE) AS views FROM "
            f"'{sf_dir}/events.parquet'")
        want = sorted(map(tuple, con.execute(ab_bootstrap_ratio_ci_sql(
            "exp", "variant", "value", "views", "event_id",
            n_boot=60, group_by=["event_type"])).fetchall()))
        assert got == want


class TestXxhashDual:
    def test_xxhash_path_deterministic_and_sane(self, spark, metric):
        """md5=False is the production hash (cheaper, not
        twin-replayable): same contract — deterministic under
        repartition, CI brackets the mean."""
        a = sorted(map(tuple, ab_bootstrap_ci(
            metric, "variant", "value", "row_id", n_boot=50,
            md5=False).collect()))
        b = sorted(map(tuple, ab_bootstrap_ci(
            metric.repartition(11), "variant", "value", "row_id",
            n_boot=50, md5=False).collect()))
        assert a == b
        got = {r[0]: r for r in a}
        for v in ("c", "t"):
            assert got[v][3] <= got[v][2] <= got[v][4]  # lo<=mean<=hi
