"""r14 operator package: Greenwood confidence bands + Aalen-Johansen
competing risks (survival family completion), CUSUM mean-shift
changepoint (parametric sibling of Pettitt), Brier decomposition
(calibration eval), and the Zipf power-law corpus fit. Hand/identity
goldens + DuckDB twin parity on every operator."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.evalmetrics import (
    brier_decomposition,
    brier_decomposition_sql,
)
from nifi_extracttext_processor_spark.operators.survival import (
    aalen_johansen,
    aalen_johansen_sql,
    km_greenwood,
    km_greenwood_sql,
    km_survival,
)
from nifi_extracttext_processor_spark.operators.text_analysis import (
    zipf_fit,
    zipf_fit_sql,
)
from nifi_extracttext_processor_spark.operators.timeseries import (
    cusum_changepoint,
    cusum_changepoint_sql,
)


def _twin(spark_df, sql, table="tt", con=None, by=None):
    con = con or duckdb.connect()
    con.register(table, spark_df.toPandas())
    return con


def _rows_match(got_df, odf):
    cols = sorted(got_df.columns)
    g = (got_df.toPandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd
    if len(g) != len(o):
        return False
    for c in cols:
        a, b = g[c], o[c]
        eq = (a == b) | (pd.isna(a) & pd.isna(b))
        if not eq.all():
            return False
    return True


class TestKmGreenwood:
    DATA = [(1.0, 1), (2.0, 1), (2.0, 0), (3.0, 1), (4.0, 0),
            (5.0, 1), (6.0, 0), (6.0, 1), (7.0, 1), (3.0, 1)]

    def _ref(self):
        """Pure-python Greenwood reference."""
        from collections import Counter
        d = Counter()
        c = Counter()
        for t, e in self.DATA:
            (d if e else c)[int(t)] += 1
        times = sorted(set(d) | set(c))
        at_risk = len(self.DATA)
        s, v, out = 1.0, 0.0, {}
        bad = False
        for t in times:
            di, ci = d.get(t, 0), c.get(t, 0)
            n = at_risk
            s = s * (1.0 - di / n)
            if n == di:
                bad = True
            elif di:
                v += di / (n * (n - di))
            se = None if bad else math.sqrt(s * s * v)
            out[t] = (n, di, ci, s, se)
            at_risk -= di + ci
        return out

    def test_hand_reference(self, spark):
        df = spark.createDataFrame(self.DATA, "duration double, event int")
        got = {r["t"]: r for r in km_greenwood(df).collect()}
        ref = self._ref()
        assert set(got) == set(ref)
        for t, (n, di, ci, s, se) in ref.items():
            r = got[t]
            assert (r["n_risk"], r["n_events"], r["n_censored"]) \
                == (n, di, ci)
            assert r["survival"] == pytest.approx(round(s, 4))
            if se is None:
                assert r["se"] is None and r["ci_lo"] is None
            else:
                assert r["se"] == pytest.approx(round(se, 4))
                assert r["ci_lo"] == pytest.approx(
                    round(max(s - 1.959963984540054 * se, 0.0), 4))

    def test_matches_km_survival_curve(self, spark):
        df = spark.createDataFrame(self.DATA, "duration double, event int")
        g = {r["t"]: r["survival"]
             for r in km_greenwood(df).collect()}
        k = {r["t"]: r["survival"]
             for r in km_survival(df).collect()}
        assert g == k

    def test_twin_parity_grouped(self, spark):
        df = (spark.createDataFrame(self.DATA,
                                    "duration double, event int")
              .withColumn("g", (F.col("duration") > 3).cast("int")))
        con = _twin(df, None)
        odf = con.execute(
            km_greenwood_sql("tt", group_by=["g"])).df()
        assert _rows_match(km_greenwood(df, group_by=["g"]), odf)


class TestAalenJohansen:
    DATA = [(1, 1), (2, 1), (2, 0), (3, 2), (3, 1), (4, 0), (5, 2),
            (6, 1), (6, 0), (7, 2)]

    def test_mass_conservation(self, spark):
        """Σ_k CIF_k(t_max) + S(t_max) == 1 at the last event time."""
        df = spark.createDataFrame(
            [(float(t), c) for t, c in self.DATA],
            "duration double, cause int")
        cif = aalen_johansen(df, round_dp=10).collect()
        last = {}
        for r in cif:
            last[r["cause"]] = r["cif"]  # rows t-ordered per cause
        km = km_survival(
            df.withColumn("event", (F.col("cause") > 0).cast("int")),
            round_dp=10).collect()
        s_last = km[-1]["survival"]
        assert sum(last.values()) + s_last == pytest.approx(1.0, abs=1e-9)

    def test_single_cause_equals_one_minus_km(self, spark):
        df = spark.createDataFrame(
            [(float(t), 1 if c else 0) for t, c in self.DATA],
            "duration double, cause int")
        cif = {r["t"]: r["cif"]
               for r in aalen_johansen(df, round_dp=10).collect()}
        km = {r["t"]: r["survival"]
              for r in km_survival(
                  df.withColumn("event", F.col("cause")),
                  round_dp=10).collect()}
        for t, v in cif.items():
            assert v == pytest.approx(round(1.0 - km[t], 10), abs=1e-9)

    def test_twin_parity(self, spark):
        df = spark.createDataFrame(
            [(float(t), c) for t, c in self.DATA],
            "duration double, cause int")
        con = _twin(df, None)
        odf = con.execute(aalen_johansen_sql("tt")).df()
        assert _rows_match(aalen_johansen(df), odf)


class TestCusum:
    def _series(self, spark, shift_at=10, n=20, lo=10.0, hi=15.0):
        rows = [(f"2024-01-{d + 1:02d} 12:00:00",
                 lo if d < shift_at else hi) for d in range(n)]
        return spark.createDataFrame(rows, "ts string, value double") \
            .withColumn("ts", F.to_timestamp("ts"))

    def test_detects_level_shift(self, spark):
        df = self._series(spark)
        [r] = cusum_changepoint(df).collect()
        assert str(r["changepoint_day"]) == "2024-01-10"
        assert r["significant"] is True
        assert r["n_days"] == 20
        # max |S_t| at the boundary: 10 days at -2.5 from the mean
        assert r["cusum_max"] == pytest.approx(25.0)

    def test_constant_series_null_stat(self, spark):
        df = self._series(spark, shift_at=99, lo=7.0, hi=7.0)
        [r] = cusum_changepoint(df).collect()
        assert r["stat"] is None and r["significant"] is False

    def test_shift_invariance(self, spark):
        a = cusum_changepoint(self._series(spark)).collect()[0]
        b = cusum_changepoint(
            self._series(spark, lo=110.0, hi=115.0)).collect()[0]
        assert a["stat"] == b["stat"]
        assert a["changepoint_day"] == b["changepoint_day"]

    def test_twin_parity_grouped(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        odf = con.execute(cusum_changepoint_sql(
            "events", group_by=["event_type"])).df()
        assert _rows_match(
            cusum_changepoint(ev, group_by=["event_type"]), odf)


class TestBrierDecomposition:
    def test_perfect_forecast(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0), (0, 0.0), (1, 1.0), (0, 0.0)],
            "label int, prob double")
        [r] = brier_decomposition(df).collect()
        assert r["brier"] == 0.0
        assert r["reliability"] == 0.0
        assert r["resolution"] == pytest.approx(0.25)
        assert r["uncertainty"] == pytest.approx(0.25)

    def test_identity_on_bin_means(self, spark):
        """brier == rel − res + unc exactly when every forecast sits
        on its bin's mean forecast."""
        rows = [(1, 0.85), (0, 0.85), (1, 0.85),
                (0, 0.25), (0, 0.25), (1, 0.25)]
        df = spark.createDataFrame(rows, "label int, prob double")
        [r] = brier_decomposition(df, round_dp=10).collect()
        assert r["brier"] == pytest.approx(
            r["reliability"] - r["resolution"] + r["uncertainty"],
            abs=1e-9)

    def test_within_bin_variance_breaks_identity(self, spark):
        rows = [(1, 0.81), (0, 0.89), (1, 0.85),
                (0, 0.21), (0, 0.29), (1, 0.25)]
        df = spark.createDataFrame(rows, "label int, prob double")
        [r] = brier_decomposition(df, round_dp=10).collect()
        decomp = r["reliability"] - r["resolution"] + r["uncertainty"]
        assert r["brier"] > decomp  # residual = within-bin variance

    def test_twin_parity_grouped(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        d = ev.select(
            (F.col("value") > 200).cast("int").alias("label"),
            (F.pmod(F.col("event_id"), 1000) / 1000.0).alias("prob"),
            "event_type")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        odf = con.execute(brier_decomposition_sql(
            "(SELECT CAST(value > 200 AS INT) AS label, "
            "(event_id % 1000) / 1000.0 AS prob, event_type "
            "FROM events)", group_by=["event_type"])).df()
        assert _rows_match(
            brier_decomposition(d, group_by=["event_type"]), odf)


class TestZipfFit:
    def test_exact_power_law_fits_slope_minus_one(self, spark):
        """counts C/r for r=1..8 → ln f = ln C − 1·ln r exactly."""
        words = []
        for r in range(1, 9):
            words += [f"w{r:02d}"] * (840 // r)
        df = spark.createDataFrame([(" ".join(words),)], "text string")
        [row] = zipf_fit(df, top_k=8).collect()
        assert row["n_terms"] == 8
        assert row["slope"] == pytest.approx(-1.0, abs=2e-3)
        assert row["r2"] == pytest.approx(1.0, abs=1e-3)

    def test_constant_counts_slope_zero(self, spark):
        df = spark.createDataFrame(
            [("a b c d a b c d a b c d",)], "text string")
        [row] = zipf_fit(df, top_k=4).collect()
        assert row["slope"] == pytest.approx(0.0)
        assert row["r2"] is None  # vy == 0

    def test_twin_parity_grouped(self, spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        odf = con.execute(zipf_fit_sql(
            "documents", group_by=["lang"], top_k=100)).df()
        assert _rows_match(
            zipf_fit(d, group_by=["lang"], top_k=100), odf)


class TestKruskalWallis:
    def test_hand_reference(self, spark):
        """[1,2,3] vs [2,3,4] vs [5,6,7]: tie-corrected H computed by
        an independent pure-python reference = 6.056497."""
        from nifi_extracttext_processor_spark.operators.ranktest \
            import kruskal_wallis
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("b", 2.0), ("b", 3.0), ("b", 4.0),
                ("c", 5.0), ("c", 6.0), ("c", 7.0)]
        df = spark.createDataFrame(rows, "variant string, value double")
        [r] = kruskal_wallis(df, "variant", "value",
                             round_dp=6).collect()
        assert (r["k_groups"], r["n_total"], r["df"]) == (3, 9, 2)
        assert r["h"] == pytest.approx(6.056497)
        assert r["epsilon_sq"] == pytest.approx(0.676083)

    def test_two_arm_reduces_to_mann_whitney_z2(self, spark):
        """With k=2 and no ties, H == z² of the Mann-Whitney test on
        the same data (the classic identity)."""
        from nifi_extracttext_processor_spark.operators.ranktest \
            import ab_mann_whitney, kruskal_wallis
        rows = [("c", float(x)) for x in (1, 4, 6, 9, 12)] \
            + [("t", float(x)) for x in (2, 5, 8, 11, 14)]
        df = spark.createDataFrame(rows, "variant string, value double")
        [kwr] = kruskal_wallis(df, "variant", "value",
                               round_dp=8).collect()
        [mwr] = ab_mann_whitney(df, "variant", "value", "c", "t",
                                round_dp=8).collect()
        assert kwr["h"] == pytest.approx(mwr["z"] ** 2, rel=1e-5)

    def test_all_tied_null(self, spark):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import kruskal_wallis
        df = spark.createDataFrame(
            [("a", 5.0), ("b", 5.0), ("c", 5.0)] * 3,
            "variant string, value double")
        [r] = kruskal_wallis(df, "variant", "value").collect()
        assert r["h"] is None and r["epsilon_sq"] is None

    def test_guard_fires_on_high_cardinality(self, spark):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import kruskal_wallis
        df = (spark.range(500)
              .select(F.concat(F.lit("v"), F.col("id") % 3)
                      .alias("variant"),
                      (F.col("id") / 3.0).alias("value")))
        with pytest.raises(Exception) as ei:
            kruskal_wallis(df, "variant", "value",
                           max_distinct=100).collect()
        assert "kruskal_wallis" in str(ei.value)

    def test_twin_parity_grouped(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import kruskal_wallis, kruskal_wallis_sql
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        exp = ev.withColumn(
            "variant",
            F.concat(F.lit("v"), F.pmod(F.col("event_id"), 4)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        odf = con.execute(kruskal_wallis_sql(
            "(SELECT *, 'v' || CAST(event_id % 4 AS VARCHAR) "
            "AS variant FROM events)",
            "variant", "value", group_by=["event_type"])).df()
        assert _rows_match(
            kruskal_wallis(exp, "variant", "value",
                           group_by=["event_type"]), odf)


class TestSeasonalDecompose:
    def _planted(self, spark, n=28):
        pat = [0.0, 10.0, -10.0, 5.0, -5.0, 3.0, -3.0]
        rows = [(f"2024-01-{d + 1:02d} 06:00:00", 100.0 + pat[d % 7])
                for d in range(n)]
        return (spark.createDataFrame(rows, "ts string, value double")
                .withColumn("ts", F.to_timestamp("ts")))

    def test_recovers_planted_pattern_exactly(self, spark):
        """flat level + pure 7-day pattern: trend == level, seasonal
        == the (centered) pattern, resid == 0 on every full-window
        day."""
        from nifi_extracttext_processor_spark.operators.timeseries \
            import seasonal_decompose
        dec = seasonal_decompose(self._planted(spark)).collect()
        pat = {0: 0.0, 1: 10.0, 2: -10.0, 3: 5.0, 4: -5.0,
               5: 3.0, 6: -3.0}
        full = [r for r in dec if r["trend"] is not None]
        assert len(full) == 28 - 6  # 3 edge days each side
        for r in full:
            assert r["trend"] == pytest.approx(100.0)
            assert r["resid"] == pytest.approx(0.0)
            dow = (r["d"].day - 1) % 7
            assert r["seasonal"] == pytest.approx(pat[dow])

    def test_edges_null_values_kept(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import seasonal_decompose
        dec = seasonal_decompose(self._planted(spark)).collect()
        edges = [r for r in dec if r["trend"] is None]
        assert len(edges) == 6
        for r in edges:
            assert r["seasonal"] is None and r["resid"] is None
            assert r["value"] is not None

    def test_seasonal_indices_sum_to_zero(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import seasonal_decompose
        dec = seasonal_decompose(self._planted(spark),
                                 round_dp=10).collect()
        idx = {}
        for r in dec:
            if r["seasonal"] is not None:
                idx[(r["d"].day - 1) % 7] = r["seasonal"]
        assert sum(idx.values()) == pytest.approx(0.0, abs=1e-8)

    def test_even_period_rejected(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import seasonal_decompose
        with pytest.raises(ValueError):
            seasonal_decompose(self._planted(spark), period=6)

    def test_twin_parity_grouped(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import seasonal_decompose, seasonal_decompose_sql
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        odf = con.execute(seasonal_decompose_sql(
            "events", group_by=["event_type"])).df()
        assert _rows_match(
            seasonal_decompose(ev, group_by=["event_type"]), odf)


class TestMoodMedian:
    def test_hand_reference(self, spark):
        """3 arms straddling the pooled lower median 5.0: A=6, chi2=8
        (independent pure-python reference)."""
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_mood_median
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
                ("b", 3.0), ("b", 5.0), ("b", 6.0), ("b", 7.0),
                ("c", 6.0), ("c", 8.0), ("c", 9.0), ("c", 10.0)]
        df = spark.createDataFrame(rows, "variant string, value double")
        [r] = ab_mood_median(df, "variant", "value",
                             round_dp=6).collect()
        assert (r["k_groups"], r["n_total"], r["n_above"],
                r["median"], r["chi2"], r["df"]) \
            == (3, 12, 6, 5.0, 8.0, 2)

    def test_identical_arms_chi2_zero(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_mood_median
        rows = [(g, float(v)) for g in ("a", "b")
                for v in (1, 2, 3, 4, 5, 6)]
        df = spark.createDataFrame(rows, "variant string, value double")
        [r] = ab_mood_median(df, "variant", "value").collect()
        assert r["chi2"] == 0.0

    def test_all_at_median_null(self, spark):
        """Every value equal → nothing above the median → NULL chi2
        (degenerate margin), the documented convention."""
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_mood_median
        df = spark.createDataFrame(
            [("a", 5.0), ("b", 5.0)] * 4, "variant string, value double")
        [r] = ab_mood_median(df, "variant", "value").collect()
        assert r["chi2"] is None and r["n_above"] == 0

    def test_twin_parity_grouped(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_mood_median, ab_mood_median_sql
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        exp = ev.withColumn(
            "variant",
            F.concat(F.lit("v"), F.pmod(F.col("event_id"), 4)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        odf = con.execute(ab_mood_median_sql(
            "(SELECT *, 'v' || CAST(event_id % 4 AS VARCHAR) "
            "AS variant FROM events)",
            "variant", "value", group_by=["event_type"])).df()
        assert _rows_match(
            ab_mood_median(exp, "variant", "value",
                           group_by=["event_type"]), odf)


class TestResidualDiagnostics:
    def _df(self, spark, rows):
        return (spark.createDataFrame(rows, "ts string, value double")
                .withColumn("ts", F.to_timestamp("ts")))

    def test_dw_extremes(self, spark):
        """alternating series → DW near 4; monotone trend → near 0;
        the hand value for the alternator is exact: diffs all ±10,
        num = 19·100, den = Σ(e²) = 20·25 → DW = 1900/500 = 3.8."""
        from nifi_extracttext_processor_spark.operators.timeseries \
            import durbin_watson
        alt = [(f"2024-01-{d + 1:02d}", 10.0 if d % 2 == 0 else 20.0)
               for d in range(20)]
        [r] = durbin_watson(self._df(spark, alt)).collect()
        assert r["dw"] == pytest.approx(3.8)
        tr = [(f"2024-01-{d + 1:02d}", float(d)) for d in range(20)]
        [r2] = durbin_watson(self._df(spark, tr)).collect()
        assert r2["dw"] < 0.1

    def test_dw_constant_null(self, spark):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import durbin_watson
        c = [(f"2024-01-{d + 1:02d}", 5.0) for d in range(10)]
        [r] = durbin_watson(self._df(spark, c)).collect()
        assert r["dw"] is None

    def test_runs_trend_too_few_runs(self, spark):
        """monotone trend: one below-block then one above-block = 2
        runs — strongly non-random (z << 0). The median-valued day
        itself is excluded (classic convention)."""
        from nifi_extracttext_processor_spark.operators.timeseries \
            import runs_test
        tr = [(f"2024-01-{d + 1:02d}", float(d)) for d in range(20)]
        [r] = runs_test(self._df(spark, tr)).collect()
        assert r["n_days"] == 19 and r["n_runs"] == 2
        assert r["z"] < -3 and r["significant"] is True

    def test_runs_alternator_too_many_runs(self, spark):
        """low/high alternation with distinct values: every retained
        day flips sign — z >> 0."""
        from nifi_extracttext_processor_spark.operators.timeseries \
            import runs_test
        rows = []
        for d in range(20):
            v = float(d // 2) if d % 2 == 0 else 100.0 + d
            rows.append((f"2024-01-{d + 1:02d}", v))
        [r] = runs_test(self._df(spark, rows)).collect()
        assert r["z"] > 3 and r["significant"] is True

    def test_twin_parity_grouped(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.timeseries \
            import (durbin_watson, durbin_watson_sql, runs_test,
                    runs_test_sql)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        for op, sqlf in [(durbin_watson, durbin_watson_sql),
                         (runs_test, runs_test_sql)]:
            odf = con.execute(
                sqlf("events", group_by=["event_type"])).df()
            assert _rows_match(
                op(ev, group_by=["event_type"]), odf), op.__name__
