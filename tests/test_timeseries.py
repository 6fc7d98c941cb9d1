"""gap_fill (operators/timeseries.py): golden fill semantics per
mode, per-key spine bounds (no extrapolation), the fail-closed spine
guard, DuckDB twin parity, and validation."""
from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.timeseries import (
    gap_fill,
    gap_fill_sql,
)


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


@pytest.fixture(scope="module")
def series(spark):
    # key "a": hours 0,1,4,5 observed (gap at 2,3); key "b": 2,3 only
    rows = [
        ("a", _ts(0), 10, 1.0),
        ("a", _ts(1), 20, 2.0),
        ("a", _ts(4), 5, 8.0),
        ("a", _ts(5), 7, 10.0),
        ("b", _ts(2), 1, 100.0),
        ("b", _ts(3), 2, 200.0),
    ]
    return spark.createDataFrame(
        rows, "k string, bucket timestamp, n long, v double")


def test_golden_fills(spark, series):
    out = {(r["k"], r["bucket"].hour): (r["n"], r["v"])
           for r in gap_fill(series, "bucket", ["k"], 3600,
                             {"n": "zero", "v": "linear"}).collect()}
    # observed rows untouched
    assert out[("a", 0)] == (10, 1.0)
    assert out[("a", 5)] == (7, 10.0)
    # gap hours 2,3: n zero-filled, v linearly ramps 2.0 -> 8.0
    assert out[("a", 2)] == (0, 4.0)
    assert out[("a", 3)] == (0, 6.0)
    # key b spine is its own [2, 3] — no extrapolation into 0..1 or 4+
    assert ("b", 1) not in out and ("b", 4) not in out
    assert out[("b", 2)] == (1, 100.0)
    assert len(out) == 8  # a: 0..5 (6 rows), b: 2..3 (2 rows)


def test_locf_mode(spark, series):
    out = {(r["k"], r["bucket"].hour): r["v"]
           for r in gap_fill(series, "bucket", ["k"], 3600,
                             {"v": "locf"}).collect()}
    assert out[("a", 2)] == 2.0 and out[("a", 3)] == 2.0
    assert out[("a", 4)] == 8.0


def test_multi_gap_linear_ramp(spark):
    rows = [("x", _ts(0), 0.0), ("x", _ts(4), 8.0)]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    out = {r["bucket"].hour: r["v"]
           for r in gap_fill(df, "bucket", ["k"], 3600,
                             {"v": "linear"}).collect()}
    assert out == {0: 0.0, 1: 2.0, 2: 4.0, 3: 6.0, 4: 8.0}


def test_duckdb_twin_parity(spark, series):
    pdf = series.toPandas()
    con = duckdb.connect()
    con.register("series", pdf)
    fill = {"n": "zero", "v": "linear"}
    got = sorted(tuple(r) for r in
                 gap_fill(series, "bucket", ["k"], 3600, fill).collect())
    want = sorted(tuple(r) for r in con.sql(
        gap_fill_sql("series", "bucket", ["k"], 3600, fill)).fetchall())
    assert got == want


def test_spine_guard_raises(spark):
    rows = [("x", _ts(0), 1.0),
            ("x", dt.datetime(2024, 3, 1, 0, 0, 0), 2.0)]  # 60 days
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    with pytest.raises(Exception, match="gap_fill: key would emit"):
        gap_fill(df, "bucket", ["k"], 60, {"v": "locf"},
                 max_buckets_per_key=1000).collect()


def test_validation(spark, series):
    with pytest.raises(ValueError, match="key column"):
        gap_fill(series, "bucket", [], 3600, {"v": "locf"})
    with pytest.raises(ValueError, match="step"):
        gap_fill(series, "bucket", ["k"], 0, {"v": "locf"})
    with pytest.raises(ValueError, match="unknown fill mode"):
        gap_fill(series, "bucket", ["k"], 3600, {"v": "cubic"})


class TestDecayedAgg:
    def _df(self, spark):
        from pyspark.sql import functions as F
        return spark.createDataFrame(
            [("2024-01-08 00:00:00", "a", 10.0),   # exactly 1 HL old
             ("2024-01-15 00:00:00", "a", 4.0),    # age 0
             ("2024-01-01 00:00:00", "a", 8.0),    # 2 HLs old
             ("2024-01-16 00:00:00", "a", 99.0),   # future: excluded
             (None, "a", 5.0),                     # NULL ts: excluded
             ("2024-01-15 00:00:00", "b", 1.0)],
            "ts string, g string, v double"
        ).withColumn("ts", F.to_timestamp("ts"))

    def test_half_life_golden(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import decayed_agg
        got = {r["g"]: r for r in decayed_agg(
            self._df(spark), "2024-01-15 00:00:00",
            half_life="7 days", value_col="v",
            group_by=["g"]).collect()}
        # a: weights ~0.5, 1.0, ~0.25 (hourly-bucketed bit-product
        # decay is within float noise of the ideal halving)
        assert abs(got["a"]["decayed_count"] - 1.75) < 1e-3
        assert abs(got["a"]["decayed_sum"] - 11.0) < 1e-2
        assert got["b"]["decayed_count"] == 1.0

    def test_twin_parity_on_events(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.timeseries \
            import decayed_agg, decayed_agg_sql
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        a = sorted(map(tuple, decayed_agg(
            ev, "2024-06-01 00:00:00", half_life="30 days",
            value_col="value", group_by=["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        b = sorted(map(tuple, con.execute(decayed_agg_sql(
            "events", "2024-06-01 00:00:00", half_life="30 days",
            value_col="value",
            group_by=["event_type"])).fetchall()))
        assert a == b


class TestSeasonalAnomaly:
    def _df(self, spark):
        from pyspark.sql import functions as F
        import datetime as dt
        rows = []
        # 8 Mondays 09:00 with value ~10, one with 100 (the anomaly);
        # 8 Mondays 03:00 with value ~100 (so 100 is NORMAL at 3am)
        start = dt.date(2024, 1, 1)  # a Monday
        for wk in range(8):
            d = (start + dt.timedelta(weeks=wk)).isoformat()
            rows.append((f"{d} 09:00:00", "m", 10.0 + (wk % 3)))
            rows.append((f"{d} 03:00:00", "m", 100.0 + wk))
        rows.append(("2024-02-26 09:00:00", "m", 100.0))  # Monday 9am
        return spark.createDataFrame(
            rows, "ts string, k string, v double"
        ).withColumn("ts", F.to_timestamp("ts"))

    def test_seasonal_context(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import detect_anomalies_seasonal
        out = detect_anomalies_seasonal(
            self._df(spark), "ts", ["k"], "v", threshold=3.0,
            min_periods=4).collect()
        flagged = {(str(r["ts"]), r["v"]) for r in out
                   if r["is_anomaly"]}
        # the 9am 100.0 is anomalous; the 3am 100s are not
        assert ("2024-02-26 09:00:00", 100.0) in flagged
        assert not any(t.endswith("03:00:00") for t, _ in flagged)

    def test_leave_one_out_and_min_periods(self, spark):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.timeseries \
            import detect_anomalies_seasonal
        # only 3 observations in a cell -> n-1=2 < min_periods -> NULL
        df = spark.createDataFrame(
            [("2024-01-01 09:00:00", "k", 1.0),
             ("2024-01-08 09:00:00", "k", 2.0),
             ("2024-01-15 09:00:00", "k", 50.0)],
            "ts string, k string, v double"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = detect_anomalies_seasonal(df, "ts", ["k"], "v",
                                        min_periods=4).collect()
        assert all(r["z"] is None and r["is_anomaly"] is False
                   for r in out)

    def test_twin_parity_on_events(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.timeseries \
            import (detect_anomalies_seasonal,
                    detect_anomalies_seasonal_sql)
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        a = sorted(map(tuple, detect_anomalies_seasonal(
            ev, "ts", ["event_type"], "value").collect()), key=str)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        b = sorted(map(tuple, con.execute(
            detect_anomalies_seasonal_sql(
                "events", "ts", ["event_type"],
                "value")).fetchall()), key=str)
        assert len(a) == len(b)
        assert a == b


class TestSesForecast:
    def test_hand_computed_fold(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import ses_forecast
        # one group, 4 days, y = 10, 20, 30, 40; alpha = 0.5
        rows = [(f"2024-01-0{i + 1} 12:00:00", float((i + 1) * 10))
                for i in range(4)]
        df = spark.createDataFrame(rows, "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = ses_forecast(df, "ts", "v", alpha=0.5).collect()
        # level: 10 -> .5*20+.5*10=15 -> .5*30+.5*15=22.5 -> 31.25
        assert r["forecast"] == 31.25
        assert r["n_periods"] == 4
        assert r["last_day"] == "2024-01-04"
        assert r["last_y"] == 40.0

    def test_intraday_rows_collapse_first(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import ses_forecast
        # two rows on the same day sum before the fold
        rows = [("2024-01-01 01:00:00", 5.0),
                ("2024-01-01 23:00:00", 5.0),
                ("2024-01-02 12:00:00", 20.0)]
        df = spark.createDataFrame(rows, "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = ses_forecast(df, "ts", "v", alpha=0.5).collect()
        assert r["n_periods"] == 2
        assert r["forecast"] == 15.0  # .5*20 + .5*10

    def test_validates_alpha(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import ses_forecast
        df = spark.createDataFrame([("2024-01-01", 1.0)],
                                   "ts string, v double")
        import pytest as _pt
        with _pt.raises(ValueError):
            ses_forecast(df, "ts", "v", alpha=1.0)

    def test_twin_parity_grouped(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import ses_forecast, ses_forecast_sql
        import duckdb
        import random
        rng = random.Random(3)
        rows = [(g, f"2024-02-{d + 1:02d} 08:30:00",
                 round(rng.uniform(1, 100), 2))
                for g in ("a", "b") for d in range(15)]
        df = spark.createDataFrame(rows, "g string, ts string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, ses_forecast(
            df, "ts", "v", ["g"], alpha=0.25).collect()))
        b = sorted(map(tuple, con.execute(ses_forecast_sql(
            "t", "ts", "v", ["g"], alpha=0.25)).fetchall()))
        assert a == b


class TestLeadLagCorr:
    def test_planted_lead(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import lead_lag_corr
        import random
        rng = random.Random(11)
        # B at day d+2 follows A at day d exactly -> corr 1.0 at lag 2
        ys = [rng.uniform(10, 100) for _ in range(30)]
        rows = []
        for d, y in enumerate(ys):
            rows.append(("A", f"2024-03-{d + 1:02d} 10:00:00", y))
        for d, y in enumerate(ys[:-2]):
            rows.append(("B", f"2024-03-{d + 3:02d} 10:00:00", y))
        df = spark.createDataFrame(rows, "k string, ts string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        got = {r["lag"]: r["corr"] for r in lead_lag_corr(
            df, "ts", "v", "k", "A", "B", max_lag=3).collect()}
        assert got[2] == 1.0
        assert abs(got[0]) < 0.7

    def test_validates_and_twin(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import lead_lag_corr, lead_lag_corr_sql
        import duckdb
        import pytest as _pt
        import random
        rng = random.Random(5)
        rows = [(k, f"2024-04-{d + 1:02d} 09:00:00",
                 round(rng.uniform(1, 50), 3))
                for k in ("x", "y") for d in range(20)]
        df = spark.createDataFrame(rows, "k string, ts string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        with _pt.raises(ValueError):
            lead_lag_corr(df, "ts", "v", "k", "x", "y", max_lag=0)
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = [tuple(r) for r in lead_lag_corr(
            df, "ts", "v", "k", "x", "y", max_lag=4).collect()]
        b = con.execute(lead_lag_corr_sql(
            "t", "ts", "v", "k", "x", "y", 4)).fetchall()
        assert a == b


class TestHoltForecast:
    def test_linear_series_exact(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import holt_forecast
        # perfectly linear series: any (alpha, beta) tracks exactly
        rows = [(f"2024-01-{d + 1:02d}", float((d + 1) * 10))
                for d in range(6)]
        df = spark.createDataFrame(rows, "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = holt_forecast(df, "ts", "v", alpha=0.4, beta=0.2,
                            horizon=3).collect()
        assert (r["level"], r["trend"]) == (60.0, 10.0)
        assert r["forecast"] == 90.0

    def test_manual_fold_golden(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import holt_forecast
        ys = [10.0, 23.0, 31.0, 47.0]
        rows = [(f"2024-02-0{i + 1}", y) for i, y in enumerate(ys)]
        df = spark.createDataFrame(rows, "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = holt_forecast(df, "ts", "v", alpha=0.5,
                            beta=0.3).collect()
        l, b = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            lp = 0.5 * y + 0.5 * (l + b)
            b = 0.3 * (lp - l) + 0.7 * b
            l = lp
        assert r["level"] == round(l, 4)
        assert r["trend"] == round(b, 4)

    def test_single_day_and_validation(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import holt_forecast
        df = spark.createDataFrame([("2024-01-01", 3.5)],
                                   "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = holt_forecast(df, "ts", "v").collect()
        assert (r["level"], r["trend"], r["forecast"]) \
            == (3.5, 0.0, 3.5)
        import pytest as _pt
        with _pt.raises(ValueError):
            holt_forecast(df, "ts", "v", beta=0.0)
        with _pt.raises(ValueError):
            holt_forecast(df, "ts", "v", horizon=0)

    def test_twin_parity_grouped(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import holt_forecast, holt_forecast_sql
        import duckdb
        import random
        rng = random.Random(21)
        rows = [(g, f"2024-03-{d + 1:02d} 12:00:00",
                 round(rng.uniform(5, 80), 2))
                for g in ("a", "b", "c") for d in range(12)]
        df = spark.createDataFrame(rows, "g string, ts string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, holt_forecast(
            df, "ts", "v", ["g"], alpha=0.25, beta=0.15,
            horizon=2).collect()))
        b = sorted(map(tuple, con.execute(holt_forecast_sql(
            "t", "ts", "v", ["g"], alpha=0.25, beta=0.15,
            horizon=2)).fetchall()))
        assert a == b


class TestForecastBacktest:
    def test_perfect_weekly_pattern(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import forecast_backtest
        # y depends only on day-of-week -> seasonal-naive-7 is exact
        # (MAE 0) while naive-1 errs on every boundary -> MASE 0
        rows = [(f"2024-01-{d + 1:02d}", float(10 + (d % 7) * 5))
                for d in range(28)]
        df = spark.createDataFrame(rows, "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = forecast_backtest(df, "ts", "v", season=7).collect()
        assert r["mae_seasonal"] == 0.0
        assert r["mase"] == 0.0
        assert r["mae_naive"] > 0
        assert (r["n_naive"], r["n_seasonal"]) == (27, 21)

    def test_constant_series_null_mase(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import forecast_backtest
        rows = [(f"2024-02-{d + 1:02d}", 5.0) for d in range(14)]
        df = spark.createDataFrame(rows, "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = forecast_backtest(df, "ts", "v", season=7).collect()
        assert r["mae_naive"] == 0.0
        assert r["mase"] is None   # 0/0 guarded, not NaN
        import pytest as _pt
        with _pt.raises(ValueError):
            forecast_backtest(df, "ts", "v", season=1)

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import forecast_backtest, forecast_backtest_sql
        import duckdb
        import random
        rng = random.Random(29)
        rows = [(g, f"2024-03-{d + 1:02d} 10:00:00",
                 round(rng.uniform(1, 60), 2))
                for g in ("a", "b") for d in range(21)]
        df = spark.createDataFrame(rows, "g string, ts string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, forecast_backtest(
            df, "ts", "v", ["g"], season=5).collect()))
        b = sorted(map(tuple, con.execute(forecast_backtest_sql(
            "t", "ts", "v", ["g"], season=5)).fetchall()))
        assert a == b


class TestRobustTrend:
    def test_perfect_monotone(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import robust_trend
        rows = [(f"2024-01-{d + 1:02d}", 10.0 + 2.5 * d)
                for d in range(20)]
        df = spark.createDataFrame(rows, "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = robust_trend(df, "ts", "v").collect()
        assert r["mk_s"] == 190        # all C(20,2) pairs concordant
        assert r["trend"] == "up"
        assert r["sen_slope"] == 2.5   # exact: perfectly linear

    def test_outlier_robustness_vs_flat(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import robust_trend
        # flat series with one massive outlier: sen slope stays ~0
        rows = [(f"2024-02-{d + 1:02d}",
                 5.0 if d != 10 else 5000.0) for d in range(20)]
        df = spark.createDataFrame(rows, "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = robust_trend(df, "ts", "v").collect()
        assert r["sen_slope"] == 0.0
        assert r["trend"] == "none"

    def test_all_tied_null_z(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import robust_trend
        rows = [(f"2024-03-{d + 1:02d}", 7.0) for d in range(10)]
        df = spark.createDataFrame(rows, "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = robust_trend(df, "ts", "v").collect()
        assert r["mk_s"] == 0
        assert r["mk_z"] is None      # zero variance: all tied
        assert r["sen_slope"] == 0.0

    def test_twin_parity_grouped(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import robust_trend, robust_trend_sql
        import duckdb
        import random
        rng = random.Random(43)
        rows = [(g, f"2024-04-{d + 1:02d} 09:00:00",
                 round(rng.uniform(1, 50) + (d * 0.8 if g == "a"
                                             else 0), 2))
                for g in ("a", "b") for d in range(25)]
        df = spark.createDataFrame(rows, "g string, ts string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, robust_trend(
            df, "ts", "v", ["g"]).collect()))
        b = sorted(map(tuple, con.execute(robust_trend_sql(
            "t", "ts", "v", ["g"])).fetchall()))
        assert a == b


class TestPettitt:
    def test_planted_shift_detected(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import pettitt_test
        import datetime
        rows = []
        for i in range(40):
            d = datetime.datetime(2024, 1, 1) \
                + datetime.timedelta(days=i)
            rows.append((d, 10.0 if i < 20 else 50.0))
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        [r] = pettitt_test(df).collect()
        # clean two-level shift: K = 20*20, changepoint = last
        # pre-change day
        assert r["n_days"] == 40
        assert r["k_stat"] == 400
        assert r["changepoint_day"] == datetime.date(2024, 1, 20)
        assert r["significant"]

    def test_flat_series_not_significant(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import pettitt_test
        import datetime
        import random
        rng = random.Random(9)
        rows = [(datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(days=i),
                 10.0 + rng.uniform(-1, 1)) for i in range(50)]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        [r] = pettitt_test(df).collect()
        assert not r["significant"]

    def test_alpha_validation_and_grouped_twin(self, spark):
        import duckdb
        import pytest as _pt

        from nifi_extracttext_processor_spark.operators.timeseries \
            import pettitt_test, pettitt_test_sql
        import datetime
        import random
        rng = random.Random(5)
        rows = []
        for g in ("a", "b"):
            shift = 30 if g == "a" else 0
            for i in range(60):
                d = datetime.datetime(2024, 1, 1) \
                    + datetime.timedelta(days=i, hours=3)
                rows.append((g, d,
                             10.0 + (shift if i >= 35 else 0)
                             + rng.uniform(-1, 1)))
        df = spark.createDataFrame(
            rows, "g string, ts timestamp, value double")
        with _pt.raises(ValueError):
            pettitt_test(df, alpha=0.2)
        with _pt.raises(ValueError):
            pettitt_test_sql("t", alpha=0.2)
        a = sorted(map(tuple, pettitt_test(
            df, group_by=["g"]).collect()))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        b = sorted(con.execute(pettitt_test_sql(
            "t", group_by=["g"])).fetchall())
        assert a == b
        byg = {t[0]: t for t in a}
        assert byg["a"][4] is True or byg["a"][4]   # planted shift
        assert not byg["b"][4]                      # flat
