"""A/B readouts: hand-computed z/t goldens, degenerate-cell NULLs,
twin parity on events with hash-derived variants."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.abtest import (
    ab_proportion_test,
    ab_proportion_test_sql,
    ab_welch_test,
    ab_welch_test_sql,
)


class TestProportion:
    def test_hand_computed(self, spark):
        rows = ([("c", 1)] * 30 + [("c", 0)] * 70
                + [("t", 1)] * 45 + [("t", 0)] * 55
                + [("x", 1)] * 5 + [("t", None)])
        df = spark.createDataFrame(rows, "variant string, conv int")
        [r] = ab_proportion_test(df, "variant", "conv",
                                 "c", "t").collect()
        assert (r["n_control"], r["n_treatment"]) == (100, 100)
        assert r["p_control"] == 0.3 and r["p_treatment"] == 0.45
        pp = 75 / 200
        se = math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
        assert r["z"] == round(0.15 / se, 4)
        assert r["significant"] is True      # z ~ 2.19

    def test_degenerate_cells(self, spark):
        df = spark.createDataFrame(
            [("c", 1), ("c", 1), ("t", 1)], "variant string, conv int")
        [r] = ab_proportion_test(df, "variant", "conv",
                                 "c", "t").collect()
        assert r["z"] is None                # pooled variance 0
        assert r["significant"] is False


class TestWelch:
    def test_hand_computed(self, spark):
        c = [1.0, 2.0, 3.0, 4.0]
        t = [3.0, 5.0, 7.0]
        rows = [("c", v) for v in c] + [("t", v) for v in t]
        df = spark.createDataFrame(rows, "variant string, v double")
        [r] = ab_welch_test(df, "variant", "v", "c", "t").collect()
        import statistics
        a = statistics.variance(c) / len(c)
        b = statistics.variance(t) / len(t)
        texp = (statistics.mean(t) - statistics.mean(c)) \
            / math.sqrt(a + b)
        dfw = (a + b) ** 2 / (a * a / 3 + b * b / 2)
        assert r["t"] == round(texp, 4)
        assert r["df_welch"] == round(dfw, 2)
        assert r["diff"] == 2.5


class TestTwin:
    def test_events_parity(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        exp = ev.withColumn(
            "variant",
            F.when(F.pmod(F.col("event_id"), 2) == 0, "control")
            .otherwise("treatment")).withColumn(
            "converted", (F.col("value") > 100).cast("int"))
        a1 = sorted(map(tuple, ab_proportion_test(
            exp, "variant", "converted", "control", "treatment",
            ["event_type"]).collect()))
        a2 = sorted(map(tuple, ab_welch_test(
            exp, "variant", "value", "control", "treatment",
            ["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW exp AS SELECT *, CASE WHEN event_id % 2 = 0 "
            "THEN 'control' ELSE 'treatment' END AS variant, "
            "CAST(value > 100 AS INT) AS converted FROM "
            f"'{sf_dir}/events.parquet'")
        b1 = sorted(map(tuple, con.execute(ab_proportion_test_sql(
            "exp", "variant", "converted", "control", "treatment",
            ["event_type"])).fetchall()))
        b2 = sorted(map(tuple, con.execute(ab_welch_test_sql(
            "exp", "variant", "value", "control", "treatment",
            ["event_type"])).fetchall()))
        assert a1 == b1
        assert a2 == b2


class TestCuped:
    def _df(self, spark):
        # y = x + noise + small treatment effect; x strongly
        # predictive, so CUPED should shrink variance a lot
        rows = []
        x = 7
        for i in range(400):
            x = (x * 1103515245 + 12345) % (1 << 31)
            pre = (x % 100) / 10.0
            x = (x * 1103515245 + 12345) % (1 << 31)
            noise = ((x % 100) - 50) / 100.0
            variant = "t" if i % 2 == 0 else "c"
            eff = 0.3 if variant == "t" else 0.0
            rows.append((variant, pre + noise + eff, pre))
        from pyspark.sql import Row
        return spark.createDataFrame(
            rows, "variant string, y double, x double")

    def test_variance_reduction_and_power(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_cuped_test, ab_welch_test
        df = self._df(spark)
        [cu] = ab_cuped_test(df, "variant", "y", "x",
                             "c", "t").collect()
        [we] = ab_welch_test(df, "variant", "y", "c", "t").collect()
        # x explains most of y's variance
        assert cu["var_reduction"] > 0.9
        # adjusted diff still estimates the true effect
        assert abs(cu["adj_diff"] - 0.3) < 0.1
        # CUPED's |t| must beat plain Welch's on the same data
        assert abs(cu["t"]) > abs(we["t"])

    def test_zero_covariate_variance_falls_back(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_cuped_test, ab_welch_test
        df = spark.createDataFrame(
            [("c", 1.0, 5.0), ("c", 2.0, 5.0), ("c", 3.0, 5.0),
             ("t", 2.0, 5.0), ("t", 4.0, 5.0), ("t", 6.0, 5.0)],
            "variant string, y double, x double")
        [cu] = ab_cuped_test(df, "variant", "y", "x",
                             "c", "t").collect()
        [we] = ab_welch_test(df, "variant", "y", "c", "t").collect()
        assert cu["theta"] == 0.0
        assert cu["t"] == we["t"]

    def test_twin_parity(self, spark):
        import duckdb
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_cuped_test, ab_cuped_test_sql
        df = self._df(spark)
        con = duckdb.connect()
        con.register("exp", df.toPandas())
        a = sorted(map(tuple, ab_cuped_test(
            df, "variant", "y", "x", "c", "t").collect()))
        b = sorted(map(tuple, con.execute(ab_cuped_test_sql(
            "exp", "variant", "y", "x", "c", "t")).fetchall()))
        assert a == b


class TestSrm:
    def test_balanced_vs_broken(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_srm_check
        ok = spark.createDataFrame(
            [("c",)] * 500 + [("t",)] * 510, "variant string")
        [r] = ab_srm_check(ok, "variant",
                           {"c": 0.5, "t": 0.5}).collect()
        assert r["srm_suspected"] is False
        broken = spark.createDataFrame(
            [("c",)] * 500 + [("t",)] * 650, "variant string")
        [r2] = ab_srm_check(broken, "variant",
                            {"c": 0.5, "t": 0.5}).collect()
        assert r2["srm_suspected"] is True
        assert r2["chi2"] > r["chi2"]

    def test_unequal_weights_and_validation(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_srm_check
        # 90/10 declared, 90/10 observed -> fine
        df = spark.createDataFrame(
            [("c",)] * 900 + [("t",)] * 100, "variant string")
        [r] = ab_srm_check(df, "variant",
                           {"c": 0.9, "t": 0.1}).collect()
        assert r["srm_suspected"] is False
        with pytest.raises(ValueError):
            ab_srm_check(df, "variant", {})

    def test_twin_parity(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_srm_check, ab_srm_check_sql
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        exp = ev.withColumn(
            "variant",
            F.when(F.pmod(F.col("event_id"), 3) == 0, "c")
            .otherwise("t"))
        a = sorted(map(tuple, ab_srm_check(
            exp, "variant", {"c": 1.0, "t": 2.0},
            ["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW exp AS SELECT *, CASE WHEN event_id % 3 = 0 "
            "THEN 'c' ELSE 't' END AS variant FROM "
            f"'{sf_dir}/events.parquet'")
        b = sorted(map(tuple, con.execute(ab_srm_check_sql(
            "exp", "variant", {"c": 1.0, "t": 2.0},
            ["event_type"])).fetchall()))
        assert a == b


class TestSrmAdversarialNames:
    def test_sql_twin_survives_quotes_and_hyphens(self, spark):
        """ADVICE r10: variant names reach the twin SQL as string
        literals AND as n_<variant> output-column identifiers; names
        with quotes/spaces/hyphens must produce valid SQL matching the
        Spark side (which aliases any name natively)."""
        import duckdb
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_srm_check, ab_srm_check_sql
        names = ["o'brien-arm", 'quo"te arm']
        df = spark.createDataFrame(
            [(names[0],)] * 480 + [(names[1],)] * 520,
            "variant string")
        expected = {names[0]: 0.5, names[1]: 0.5}
        got = ab_srm_check(df, "variant", expected)
        con = duckdb.connect()
        con.register("exp", df.toPandas())
        odf = con.execute(
            ab_srm_check_sql("exp", "variant", expected)).df()
        assert sorted(got.columns) == sorted(odf.columns)
        assert (sorted(map(tuple, got.collect()))
                == sorted(map(tuple, odf.itertuples(index=False))))


class TestWinsorizedWelch:
    def _df(self, spark, whale=False):
        rows = [("c", float(i % 5)) for i in range(200)] \
            + [("t", float(i % 5) + 0.5) for i in range(200)]
        if whale:
            rows.append(("c", 100000.0))  # one whale order in control
        return spark.createDataFrame(rows, "variant string, value double")

    def test_whale_resistant(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_welch_test, ab_welch_test_winsorized,
        )
        clean = self._df(spark, whale=False)
        dirty = self._df(spark, whale=True)
        [plain] = ab_welch_test(dirty, "variant", "value",
                                "c", "t").collect()
        [wins] = ab_welch_test_winsorized(dirty, "variant", "value",
                                          "c", "t", trim=0.01).collect()
        [ref] = ab_welch_test(clean, "variant", "value",
                              "c", "t").collect()
        # the whale flips the plain diff sign / kills significance;
        # winsorized stays near the clean readout
        assert plain["mean_control"] > ref["mean_control"] + 100
        assert abs(wins["diff"] - ref["diff"]) < 0.1
        assert wins["significant"] is True
        assert wins["n_control"] == 201  # rows kept, not trimmed away

    def test_zero_trim_equals_plain(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_welch_test, ab_welch_test_winsorized,
        )
        df = self._df(spark)
        a = sorted(map(tuple, ab_welch_test(
            df, "variant", "value", "c", "t").collect()))
        b = sorted(map(tuple, ab_welch_test_winsorized(
            df, "variant", "value", "c", "t", trim=0.0).collect()))
        assert a == b

    def test_twin_parity_and_validation(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_welch_test_winsorized, ab_welch_test_winsorized_sql,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        exp = ev.withColumn(
            "variant",
            F.when(F.pmod(F.col("event_id"), 3) == 0, "c")
            .otherwise("t"))
        got = sorted(map(tuple, ab_welch_test_winsorized(
            exp, "variant", "value", "c", "t", trim=0.05,
            group_by=["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW exp AS SELECT *, CASE WHEN event_id % 3 = 0 "
            "THEN 'c' ELSE 't' END AS variant FROM "
            f"'{sf_dir}/events.parquet'")
        want = sorted(map(tuple, con.execute(
            ab_welch_test_winsorized_sql(
                "exp", "variant", "value", "c", "t", trim=0.05,
                group_by=["event_type"])).fetchall()))
        assert got == want
        with pytest.raises(ValueError):
            ab_welch_test_winsorized(exp, "variant", "value", "c",
                                     "t", trim=0.5)


class TestQuantileLift:
    def test_tail_moves_mean_flat(self, spark):
        """The motivating case: treatment leaves the median alone but
        blows up p99 — quantile lift sees it, mean lift barely does."""
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_quantile_lift,
        )
        rows = [("c", float(i % 100)) for i in range(1000)] \
            + [("t", float(i % 100)) for i in range(980)] \
            + [("t", 5000.0)] * 20          # 2% tail regression
        df = spark.createDataFrame(rows, "variant string, value double")
        got = {r["prob"]: r for r in ab_quantile_lift(
            df, "variant", "value", "c", "t").collect()}
        assert abs(got[0.5]["lift"]) < 2.0       # median ~unmoved
        assert got[0.99]["lift"] > 1000.0        # p99 explodes

    def test_twin_parity_grouped(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_quantile_lift, ab_quantile_lift_sql,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        exp = ev.withColumn(
            "variant",
            F.when(F.pmod(F.col("event_id"), 3) == 0, "c")
            .otherwise("t"))
        got = sorted(map(tuple, ab_quantile_lift(
            exp, "variant", "value", "c", "t",
            group_by=["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW exp AS SELECT *, CASE WHEN event_id % 3 = 0 "
            "THEN 'c' ELSE 't' END AS variant FROM "
            f"'{sf_dir}/events.parquet'")
        want = sorted(map(tuple, con.execute(ab_quantile_lift_sql(
            "exp", "variant", "value", "c", "t",
            group_by=["event_type"])).fetchall()))
        assert got == want
        with pytest.raises(ValueError):
            ab_quantile_lift(exp, "variant", "value", "c", "t",
                             probs=(1.5,))


class TestRatioDelta:
    def _df(self, spark):
        rows = []
        for i in range(400):
            v = "c" if i % 2 == 0 else "t"
            x = float((i * 37) % 23) + (1.75 if v == "t" else 0.0)
            y = float((i * 11) % 7) + 1.0
            rows.append((v, x, y))
        return spark.createDataFrame(
            rows, "variant string, clicks double, views double")

    def test_matches_numpy_delta_method(self, spark):
        import numpy as np
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_ratio_delta_test,
        )
        df = self._df(spark)
        [r] = ab_ratio_delta_test(df, "variant", "clicks", "views",
                                  "c", "t").collect()
        rows = df.collect()

        def ref(tag):
            xs = np.array([w["clicks"] for w in rows
                           if w["variant"] == tag])
            ys = np.array([w["views"] for w in rows
                           if w["variant"] == tag])
            n = len(xs)
            rr = xs.sum() / ys.sum()
            yb = ys.mean()
            se2 = (np.var(xs, ddof=1)
                   - 2 * rr * np.cov(xs, ys, ddof=1)[0][1]
                   + rr * rr * np.var(ys, ddof=1)) / (n * yb * yb)
            return rr, se2

        r0, s0 = ref("c")
        r1, s1 = ref("t")
        assert r["ratio_control"] == pytest.approx(r0, abs=1e-4)
        assert r["ratio_treatment"] == pytest.approx(r1, abs=1e-4)
        assert r["z"] == pytest.approx(
            (r1 - r0) / (s0 + s1) ** 0.5, abs=1e-4)

    def test_twin_parity(self, spark):
        import duckdb
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_ratio_delta_test, ab_ratio_delta_test_sql,
        )
        df = self._df(spark)
        got = ab_ratio_delta_test(df, "variant", "clicks", "views",
                                  "c", "t")
        con = duckdb.connect()
        con.register("t", df.toPandas())
        odf = con.execute(ab_ratio_delta_test_sql(
            "t", "variant", "clicks", "views", "c", "t")).df()
        assert [tuple(r) for r in got.collect()] \
            == [tuple(r) for r in odf.itertuples(index=False)]

    def test_degenerate_cells(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_ratio_delta_test,
        )
        # n=1 per side -> NULL z; zero denominator sum -> NULL ratio
        df = spark.createDataFrame(
            [("c", 1.0, 0.0), ("t", 2.0, 0.0)],
            "variant string, x double, y double")
        [r] = ab_ratio_delta_test(df, "variant", "x", "y",
                                  "c", "t").collect()
        assert r["ratio_control"] is None and r["z"] is None
        assert r["significant"] is False

    def test_joint_resampling_free_consistency(self, spark):
        """x == y -> every ratio exactly 1.0, diff 0, NULL z (zero
        variance of the linearized statistic)."""
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_ratio_delta_test,
        )
        rows = [("c", float(i % 5 + 1), float(i % 5 + 1))
                for i in range(40)] \
            + [("t", float(i % 7 + 1), float(i % 7 + 1))
               for i in range(40)]
        df = spark.createDataFrame(rows,
                                   "variant string, x double, y double")
        [r] = ab_ratio_delta_test(df, "variant", "x", "y",
                                  "c", "t").collect()
        assert r["ratio_control"] == 1.0
        assert r["ratio_treatment"] == 1.0
        assert r["diff"] == 0.0 and r["z"] is None


class TestPostStratified:
    def _mix_imbalanced(self, spark):
        """Stratum A metric ~10, stratum B ~2; treatment over-exposed
        in A (60% vs control's 40%) -> plain Welch reads the mix as a
        1.6 fake lift; within each stratum the true lift is ~0."""
        rows = []
        for i in range(300):
            s = "A" if (i % 10 < (7 if i % 2 else 3)) else "B"
            v = "t" if i % 2 else "c"
            rows.append((v, s, (10.0 if s == "A" else 2.0)
                         + (i % 5) * 0.1))
        return spark.createDataFrame(
            rows, "variant string, stratum string, value double")

    def test_removes_mix_imbalance(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_post_stratified, ab_welch_test,
        )
        df = self._mix_imbalanced(spark)
        [w] = ab_welch_test(df, "variant", "value", "c", "t").collect()
        [p] = ab_post_stratified(df, "variant", "value", ["stratum"],
                                 "c", "t").collect()
        assert abs(w["diff"]) > 1.0          # the fake mix lift
        assert abs(p["diff"]) < 0.1          # stratification removes it
        assert p["n_strata_used"] == 2
        assert p["n_control"] + p["n_treatment"] == 300

    def test_thin_strata_excluded(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_post_stratified,
        )
        rows = [("c", "A", float(i)) for i in range(10)] \
            + [("t", "A", float(i) + 1) for i in range(10)] \
            + [("c", "thin", 99.0)]          # n1=0 there -> dropped
        df = spark.createDataFrame(
            rows, "variant string, stratum string, value double")
        [r] = ab_post_stratified(df, "variant", "value", ["stratum"],
                                 "c", "t").collect()
        assert r["n_strata_used"] == 1
        assert r["n_control"] == 10          # the thin row is excluded

    def test_no_usable_strata(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_post_stratified,
        )
        df = spark.createDataFrame(
            [("c", "A", 1.0), ("t", "B", 2.0)],
            "variant string, stratum string, value double")
        out = ab_post_stratified(df, "variant", "value", ["stratum"],
                                 "c", "t").collect()
        assert out == []                     # nothing estimable
        with pytest.raises(ValueError, match="strata_cols"):
            ab_post_stratified(df, "variant", "value", [], "c", "t")

    def test_grouped_multistrata_twin_parity(self, spark):
        import duckdb
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_post_stratified, ab_post_stratified_sql,
        )
        rows = []
        for i in range(600):
            rows.append((f"g{i % 2}", f"s{i % 3}", f"p{i % 2}",
                         "t" if i % 5 < 2 else "c",
                         float((i * 13) % 37) / 3.0))
        df = spark.createDataFrame(
            rows, "seg string, country string, platform string, "
                  "variant string, value double")
        got = ab_post_stratified(df, "variant", "value",
                                 ["country", "platform"], "c", "t",
                                 group_by=["seg"])
        con = duckdb.connect()
        con.register("t", df.toPandas())
        odf = con.execute(ab_post_stratified_sql(
            "t", "variant", "value", ["country", "platform"],
            "c", "t", group_by=["seg"])).df()
        a = sorted(map(str, (tuple(r) for r in got.collect())))
        b = sorted(map(str, (tuple(r) for r in
                             odf.itertuples(index=False))))
        assert a == b


class TestJackknife:
    def _df(self, spark):
        rows = [("c" if i % 2 else "t", i // 3,
                 float((i * 37) % 101) / 7.0) for i in range(3000)]
        return spark.createDataFrame(
            rows, "variant string, user_id long, value double")

    def test_se_tracks_classic_sem_and_twin(self, spark):
        import duckdb
        import statistics
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_jackknife_ci, ab_jackknife_ci_sql,
        )
        df = self._df(spark)
        got = {r["variant"]: r for r in ab_jackknife_ci(
            df, "variant", "value", "user_id",
            n_buckets=20).collect()}
        vals = [r["value"] for r in df.collect()
                if r["variant"] == "c"]
        sem = statistics.stdev(vals) / len(vals) ** 0.5
        # jackknife over user buckets: close to classic SEM, slightly
        # ABOVE it (user_id clusters 3 correlated rows — exactly what
        # the unit-respecting bucketing should account for)
        assert sem * 0.9 < got["c"]["se_jack"] < sem * 1.5
        assert got["c"]["ci_lo"] < got["c"]["mean"] < got["c"]["ci_hi"]
        con = duckdb.connect()
        con.register("t", df.toPandas())
        odf = con.execute(ab_jackknife_ci_sql(
            "t", "variant", "value", "user_id",
            n_buckets=20)).df()
        def canon(v):
            if isinstance(v, float) and v == v and v.is_integer():
                return str(int(v))
            return str(v)

        a = sorted(",".join(map(canon, tuple(r)))
                   for r in ab_jackknife_ci(
                       df, "variant", "value", "user_id",
                       n_buckets=20).collect())
        b = sorted(",".join(map(canon, tuple(r)))
                   for r in odf.itertuples(index=False))
        assert a == b

    def test_constant_metric_zero_se(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_jackknife_ci,
        )
        df = spark.createDataFrame(
            [("c", i, 5.0) for i in range(100)],
            "variant string, user_id long, value double")
        [r] = ab_jackknife_ci(df, "variant", "value", "user_id",
                              n_buckets=10).collect()
        assert r["se_jack"] == 0.0
        assert r["ci_lo"] == r["ci_hi"] == r["mean"] == 5.0

    def test_single_bucket_null_se_and_validation(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_jackknife_ci,
        )
        # one user -> one bucket used -> se undefined
        df = spark.createDataFrame(
            [("c", 1, float(i)) for i in range(10)],
            "variant string, user_id long, value double")
        [r] = ab_jackknife_ci(df, "variant", "value", "user_id",
                              n_buckets=10).collect()
        assert r["n_buckets_used"] == 1 and r["se_jack"] is None
        with pytest.raises(ValueError, match="n_buckets"):
            ab_jackknife_ci(df, "variant", "value", "user_id",
                            n_buckets=1)

    def test_unit_respecting_buckets_catch_clustering(self, spark):
        """All of a user's rows share a bucket: duplicate every
        user's value 10x — classic row-level SEM shrinks by ~1/sqrt(10)
        (wrongly), the user-bucketed jackknife SE must NOT."""
        import statistics
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_jackknife_ci,
        )
        base = [(i, float((i * 37) % 101) / 7.0) for i in range(300)]
        dup = [("c", u, v) for u, v in base for _ in range(10)]
        df = spark.createDataFrame(
            dup, "variant string, user_id long, value double")
        [r] = ab_jackknife_ci(df, "variant", "value", "user_id",
                              n_buckets=20).collect()
        vals = [v for _, v in base]
        true_sem = statistics.stdev(vals) / len(vals) ** 0.5
        naive_sem = true_sem / 10 ** 0.5
        assert r["se_jack"] > naive_sem * 2     # not fooled
        assert r["se_jack"] == pytest.approx(true_sem, rel=0.5)


class TestCovariateBalance:
    def test_planted_imbalance_flagged(self, spark):
        import duckdb
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_covariate_balance, ab_covariate_balance_sql,
        )
        rows = []
        for i in range(400):
            v = "t" if i % 2 else "c"
            age = float(30 + (i * 7) % 20) + (3.0 if v == "t" else 0.0)
            spend = float((i * 13) % 50)
            rows.append((v, age, spend,
                         None if i % 50 == 0 else float(i % 9)))
        df = spark.createDataFrame(
            rows, "variant string, age double, spend double, "
                  "visits double")
        out = {r["covariate"]: r for r in ab_covariate_balance(
            df, "variant", ["age", "spend", "visits"],
            "c", "t").collect()}
        assert out["age"]["imbalanced"] is True
        assert out["age"]["smd"] > 0.5
        assert out["spend"]["imbalanced"] is False
        # covariate-wise NULL exclusion: visits drops its NULL rows
        assert out["visits"]["n_control"] == 192
        assert out["visits"]["n_treatment"] == 200
        # order preserved + twin parity
        got = [tuple(r) for r in ab_covariate_balance(
            df, "variant", ["age", "spend", "visits"],
            "c", "t").collect()]
        con = duckdb.connect()
        con.register("t", df.toPandas())
        twin = [tuple(t) for t in con.execute(ab_covariate_balance_sql(
            "t", "variant", ["age", "spend", "visits"],
            "c", "t")).fetchall()]
        assert got == twin
        assert [g[0] for g in got] == ["age", "spend", "visits"]

    def test_one_scan_and_degenerate(self, spark):
        import pytest as _pt
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_covariate_balance,
        )
        df = spark.createDataFrame(
            [("c", 5.0), ("c", 5.0), ("t", 5.0), ("t", 5.0)],
            "variant string, x double")
        out = ab_covariate_balance(df, "variant", ["x"], "c", "t")
        [r] = out.collect()
        assert r["smd"] is None and r["imbalanced"] is False
        plan = out._jdf.queryExecution().executedPlan().toString()
        # AQE prints the final AND initial plans; count the final only
        plan = plan.split("== Initial Plan ==")[0]
        assert plan.count("Scan ") <= 1
        with _pt.raises(ValueError, match="covariates"):
            ab_covariate_balance(df, "variant", [], "c", "t")


class TestMsprt:
    def _frame(self, spark, shift):
        import random
        rng = random.Random(7)
        rows = ([("c", rng.gauss(10, 2)) for _ in range(400)]
                + [("t", rng.gauss(10 + shift, 2))
                   for _ in range(400)])
        return spark.createDataFrame(rows, "variant string, v double")

    def test_hand_computed(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_msprt,
        )
        import statistics
        c = [1.0, 2.0, 3.0, 4.0]
        t = [3.0, 5.0, 7.0, 9.0]
        rows = [("c", v) for v in c] + [("t", v) for v in t]
        df = spark.createDataFrame(rows, "variant string, v double")
        [r] = ab_msprt(df, "variant", "v", "c", "t",
                       tau2=4.0).collect()
        vn = (statistics.variance(c) / 4
              + statistics.variance(t) / 4)
        d = statistics.mean(t) - statistics.mean(c)
        ll = (0.5 * math.log(vn / (vn + 4.0))
              + d * d * 4.0 / (2.0 * vn * (vn + 4.0)))
        assert r["log_lambda"] == round(ll, 4)
        assert r["always_valid_p"] == round(min(1.0,
                                                math.exp(-ll)), 4)

    def test_null_effect_not_significant(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_msprt,
        )
        [r] = ab_msprt(self._frame(spark, 0.0), "variant", "v",
                       "c", "t", tau2=1.0).collect()
        assert r["significant"] is False
        assert r["always_valid_p"] > 0.5

    def test_real_effect_detected(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_msprt,
        )
        [r] = ab_msprt(self._frame(spark, 1.0), "variant", "v",
                       "c", "t", tau2=1.0).collect()
        assert r["significant"] is True
        assert r["always_valid_p"] < 0.05

    def test_degenerate_and_validation(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_msprt,
        )
        df = spark.createDataFrame(
            [("c", 1.0), ("t", 2.0)], "variant string, v double")
        [r] = ab_msprt(df, "variant", "v", "c", "t").collect()
        assert r["log_lambda"] is None
        assert r["significant"] is False
        with pytest.raises(ValueError):
            ab_msprt(df, "variant", "v", "c", "t", tau2=0.0)
        with pytest.raises(ValueError):
            ab_msprt(df, "variant", "v", "c", "t", alpha=1.5)

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_msprt,
            ab_msprt_sql,
        )
        df = self._frame(spark, 0.5)
        con = duckdb.connect()
        con.register("t", df.toPandas())
        [a] = ab_msprt(df, "variant", "v", "c", "t",
                       tau2=2.0).collect()
        [b] = con.execute(ab_msprt_sql(
            "t", "variant", "v", "c", "t", tau2=2.0)).fetchall()
        assert tuple(a) == b


class TestPowerMde:
    def test_hand_computed(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_power_mde,
        )
        import statistics
        vals = [float(x) for x in range(1, 101)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        [r] = ab_power_mde(df, "v", mde_rel=0.10).collect()
        m = statistics.mean(vals)
        var = statistics.variance(vals)
        k = 1.959963984540054 + 0.8416212335729143
        assert r["n"] == 100
        assert r["mean"] == round(m, 4)
        assert r["sd"] == round(math.sqrt(var), 4)
        assert r["n_per_arm_required"] == math.ceil(
            2.0 * k * k * var / ((0.10 * m) * (0.10 * m)))
        mde_abs = k * math.sqrt(2.0 * var / 50)
        assert r["mde_abs_at_n"] == round(mde_abs, 4)
        assert r["mde_rel_at_n"] == round(mde_abs / m, 4)

    def test_bigger_mde_needs_fewer(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_power_mde,
        )
        df = spark.createDataFrame(
            [(float(x % 17),) for x in range(200)], "v double")
        [small] = ab_power_mde(df, "v", mde_rel=0.02).collect()
        [big] = ab_power_mde(df, "v", mde_rel=0.20).collect()
        assert small["n_per_arm_required"] \
            > big["n_per_arm_required"]
        with pytest.raises(ValueError):
            ab_power_mde(df, "v", mde_rel=0.0)

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_power_mde,
            ab_power_mde_sql,
        )
        df = spark.createDataFrame(
            [("a", float(x % 23 + 1)) for x in range(150)]
            + [("b", float(x % 7 + 2)) for x in range(90)],
            "g string, v double")
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, ab_power_mde(
            df, "v", ["g"], mde_rel=0.05).collect()))
        b = sorted(map(tuple, con.execute(ab_power_mde_sql(
            "t", "v", ["g"], mde_rel=0.05)).fetchall()))
        assert a == b


class TestAnova:
    def test_two_group_equals_t_squared(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_anova,
        )
        import statistics
        # classic identity: one-way ANOVA with k=2 gives F = t²
        # (pooled-variance t, equal to Welch here with equal n/var
        # structure not required for the F identity — use pooled t)
        c = [1.0, 2.0, 3.0, 4.0, 5.0]
        t = [3.0, 4.0, 5.0, 6.0, 7.0]
        rows = [("c", v) for v in c] + [("t", v) for v in t]
        df = spark.createDataFrame(rows, "variant string, v double")
        [r] = ab_anova(df, "variant", "v").collect()
        n = len(c) + len(t)
        sp2 = ((len(c) - 1) * statistics.variance(c)
               + (len(t) - 1) * statistics.variance(t)) / (n - 2)
        tstat = (statistics.mean(t) - statistics.mean(c)) \
            / math.sqrt(sp2 * (1 / len(c) + 1 / len(t)))
        assert r["f_stat"] == round(tstat * tstat, 4)
        assert (r["df_between"], r["df_within"]) == (1, 8)

    def test_identical_groups_f_zero(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_anova,
        )
        rows = [(v, float(x)) for v in ("a", "b", "c")
                for x in range(10)]
        df = spark.createDataFrame(rows, "variant string, v double")
        [r] = ab_anova(df, "variant", "v").collect()
        assert r["f_stat"] == 0.0
        assert r["eta_sq"] == 0.0
        assert r["k_groups"] == 3

    def test_degenerate_cells(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_anova,
        )
        # single variant -> k<2 -> NULL F
        one = spark.createDataFrame([("a", 1.0), ("a", 2.0)],
                                    "variant string, v double")
        [r] = ab_anova(one, "variant", "v").collect()
        assert r["f_stat"] is None
        # constant metric -> SSW = 0 -> NULL F (not inf)
        const = spark.createDataFrame(
            [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)],
            "variant string, v double")
        [r2] = ab_anova(const, "variant", "v").collect()
        assert r2["f_stat"] is None

    def test_grouped_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_anova,
            ab_anova_sql,
        )
        import random
        rng = random.Random(17)
        rows = [(rng.choice("gh"), f"arm{rng.randint(0, 3)}",
                 float(round(rng.uniform(0, 100), 2)))
                for _ in range(600)]
        df = spark.createDataFrame(rows, "g string, variant string, "
                                   "v double")
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, ab_anova(df, "variant", "v",
                                       ["g"]).collect()))
        b = sorted(map(tuple, con.execute(ab_anova_sql(
            "t", "variant", "v", ["g"])).fetchall()))
        assert a == b


class TestDiffInDiff:
    def _frame(self, spark, effect, shock):
        import random
        rng = random.Random(4)
        rows = []
        for i in range(2000):
            v = "c" if i % 2 else "t"
            pre = i % 4 < 2
            y = (rng.gauss(10, 1) + (0 if pre else shock)
                 + (effect if (v == "t" and not pre) else 0))
            rows.append((v, "2024-01-0%d" % (1 if pre else 9), y))
        from pyspark.sql import functions as F
        return spark.createDataFrame(
            rows, "variant string, ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))

    def test_nets_out_shared_shock(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_diff_in_diff,
        )
        [r] = ab_diff_in_diff(self._frame(spark, 5.0, 3.0),
                              "variant", "v", "ts", "c", "t",
                              "2024-01-05").collect()
        # naive post-change on treatment reads effect + shock (~8);
        # DID recovers the effect alone (~5)
        assert abs(r["did"] - 5.0) < 0.3
        assert r["diff_treatment"] > 7.0
        assert r["significant"] is True

    def test_no_effect_with_shock_not_significant(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_diff_in_diff,
        )
        [r] = ab_diff_in_diff(self._frame(spark, 0.0, 3.0),
                              "variant", "v", "ts", "c", "t",
                              "2024-01-05").collect()
        assert abs(r["did"]) < 0.3
        assert r["significant"] is False
        # both arms saw the shock
        assert r["diff_control"] > 2.5
        assert r["diff_treatment"] > 2.5

    def test_degenerate_and_twin(self, spark):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_diff_in_diff,
            ab_diff_in_diff_sql,
        )
        tiny = spark.createDataFrame(
            [("c", "2024-01-01", 1.0), ("t", "2024-01-09", 2.0)],
            "variant string, ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = ab_diff_in_diff(tiny, "variant", "v", "ts", "c", "t",
                              "2024-01-05").collect()
        assert r["z"] is None and r["significant"] is False
        df = self._frame(spark, 2.0, 1.0)
        con = duckdb.connect()
        con.register("t", df.toPandas())
        [a] = ab_diff_in_diff(df, "variant", "v", "ts", "c", "t",
                              "2024-01-05").collect()
        [b] = con.execute(ab_diff_in_diff_sql(
            "t", "variant", "v", "ts", "c", "t",
            "2024-01-05")).fetchall()
        assert tuple(a) == b


class TestGroupSequential:
    def _frame(self, spark, effect):
        import random
        from pyspark.sql import functions as F
        rng = random.Random(6)
        rows = []
        for i in range(1500):
            v = "c" if i % 2 else "t"
            day = 1 + (i % 28)
            y = rng.gauss(10, 2) + (effect if v == "t" else 0)
            rows.append((v, f"2024-01-{day:02d}", y))
        return spark.createDataFrame(
            rows, "variant string, ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))

    def test_boundaries_shrink_to_final(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_group_sequential,
        )
        import math
        looks = ["2024-01-08", "2024-01-15", "2024-01-22",
                 "2024-01-29"]
        rows = ab_group_sequential(self._frame(spark, 0.0),
                                   "variant", "v", "ts", "c", "t",
                                   looks).collect()
        got = {r["look"]: r["z_boundary"] for r in rows}
        zf = 1.959963984540054
        for k in range(1, 5):
            assert got[k] == round(zf * math.sqrt(4 / k), 4)
        # monotone decreasing; final ≈ z_final
        assert got[1] > got[2] > got[3] > got[4]
        assert abs(got[4] - 1.96) < 0.01
        # cumulative n grows across looks
        ns = {r["look"]: r["n_control"] + r["n_treatment"]
              for r in rows}
        assert ns[1] < ns[2] < ns[3] < ns[4]

    def test_early_stop_on_big_effect_only(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_group_sequential,
        )
        looks = ["2024-01-08", "2024-01-15", "2024-01-29"]
        null_rows = ab_group_sequential(
            self._frame(spark, 0.0), "variant", "v", "ts", "c", "t",
            looks).collect()
        assert all(not r["significant"] for r in null_rows)
        eff_rows = ab_group_sequential(
            self._frame(spark, 2.0), "variant", "v", "ts", "c", "t",
            looks).collect()
        assert all(r["significant"] for r in eff_rows)

    def test_pocock_and_validation(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_group_sequential,
        )
        looks = ["2024-01-08", "2024-01-15", "2024-01-29"]
        rows = ab_group_sequential(
            self._frame(spark, 0.0), "variant", "v", "ts", "c", "t",
            looks, boundary="pocock").collect()
        # flat tabled constant c(3) = 2.289 at every look
        assert {r["z_boundary"] for r in rows} == {2.289}
        import pytest as _pt
        with _pt.raises(ValueError):
            ab_group_sequential(self._frame(spark, 0.0), "variant",
                                "v", "ts", "c", "t", [])
        with _pt.raises(ValueError):
            ab_group_sequential(self._frame(spark, 0.0), "variant",
                                "v", "ts", "c", "t", looks,
                                boundary="bogus")

    def test_pocock_rejects_non_default_z_final(self, spark):
        # ADVICE r12: the Pocock table is pinned to alpha=0.05, so a
        # caller-supplied z_final would be silently ignored — both
        # generators must refuse the combination instead.
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_group_sequential,
            ab_group_sequential_sql,
        )
        looks = ["2024-01-08", "2024-01-29"]
        with pytest.raises(ValueError, match="pocock"):
            ab_group_sequential(self._frame(spark, 0.0), "variant",
                                "v", "ts", "c", "t", looks,
                                z_final=2.576, boundary="pocock")
        with pytest.raises(ValueError, match="pocock"):
            ab_group_sequential_sql("t", "variant", "v", "ts", "c",
                                    "t", looks, z_final=2.576,
                                    boundary="pocock")
        # obf still honours z_final; pocock with the default passes
        ab_group_sequential_sql("t", "variant", "v", "ts", "c", "t",
                                looks, z_final=2.576, boundary="obf")
        ab_group_sequential_sql("t", "variant", "v", "ts", "c", "t",
                                looks, boundary="pocock")

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_group_sequential,
            ab_group_sequential_sql,
        )
        df = self._frame(spark, 0.5)
        con = duckdb.connect()
        con.register("t", df.toPandas())
        looks = ["2024-01-10", "2024-01-20", "2024-01-29"]
        a = sorted(map(tuple, ab_group_sequential(
            df, "variant", "v", "ts", "c", "t", looks).collect()))
        b = sorted(map(tuple, con.execute(ab_group_sequential_sql(
            "t", "variant", "v", "ts", "c", "t", looks)).fetchall()))
        assert a == b


class TestOddsRatio:
    def test_hand_computed(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_odds_ratio,
        )
        rows = ([("t", 1)] * 40 + [("t", 0)] * 60
                + [("c", 1)] * 20 + [("c", 0)] * 80)
        df = spark.createDataFrame(rows, "variant string, conv int")
        [r] = ab_odds_ratio(df, "variant", "conv",
                            "c", "t").collect()
        orr = 40 * 80 / (60 * 20)
        se = math.sqrt(1 / 40 + 1 / 60 + 1 / 20 + 1 / 80)
        za = 1.959963984540054
        assert r["odds_ratio"] == round(orr, 4)
        assert r["ci_low"] == round(math.exp(math.log(orr)
                                             - za * se), 4)
        assert r["ci_high"] == round(math.exp(math.log(orr)
                                              + za * se), 4)
        assert r["relative_risk"] == round((40 / 100) / (20 / 100), 4)
        assert r["significant"] is True   # CI (1.42, 5.0) excludes 1

    def test_zero_cell_correction(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_odds_ratio,
        )
        # control never converts -> without correction OR = inf
        rows = ([("t", 1)] * 5 + [("t", 0)] * 5 + [("c", 0)] * 10)
        df = spark.createDataFrame(rows, "variant string, conv int")
        [r] = ab_odds_ratio(df, "variant", "conv",
                            "c", "t").collect()
        assert r["s_control"] == 0.5        # corrected cell surfaced
        assert math.isfinite(r["odds_ratio"])
        assert math.isfinite(r["ci_high"])

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_odds_ratio,
            ab_odds_ratio_sql,
        )
        import random
        rng = random.Random(51)
        rows = [(rng.choice("gh"), rng.choice("ct"),
                 rng.randint(0, 1)) for _ in range(800)]
        df = spark.createDataFrame(rows, "g string, variant string, "
                                   "conv int")
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, ab_odds_ratio(
            df, "variant", "conv", "c", "t", ["g"]).collect()))
        b = sorted(map(tuple, con.execute(ab_odds_ratio_sql(
            "t", "variant", "conv", "c", "t", ["g"])).fetchall()))
        assert a == b


class TestEbShrunkRates:
    def test_thin_segments_shrink_hard(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            eb_shrunk_rates,
        )
        import random
        rng = random.Random(53)
        rows = []
        # 30 thick segments with rates ~ 0.2
        for g in range(30):
            for i in range(300):
                rows.append((f"thick{g}", int(rng.random() < 0.2)))
        # one 2/2 segment (raw rate 1.0)
        rows += [("tiny", 1), ("tiny", 1)]
        df = spark.createDataFrame(rows, "seg string, conv int")
        got = {r["segment"]: r for r in
               eb_shrunk_rates(df, "seg", "conv").collect()}
        tiny = got["tiny"]
        assert tiny["raw_rate"] == 1.0
        # shrinks most of the way back toward ~0.2
        assert tiny["shrunk_rate"] < 0.6
        # a thick segment barely moves
        thick = got["thick0"]
        assert abs(thick["shrunk_rate"] - thick["raw_rate"]) < 0.02
        # leaderboard fixed: best thick raw ~0.25 now outranks tiny?
        # (not necessarily strictly — assert tiny no longer at 1.0
        # while ordering among thick segments is preserved)
        assert tiny["shrunk_rate"] < 1.0

    def test_degenerate_no_shrinkage(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            eb_shrunk_rates,
        )
        # all segments identical rate -> v = 0 -> honest no-op
        rows = [(f"s{g}", i % 2) for g in range(5) for i in range(10)]
        df = spark.createDataFrame(rows, "seg string, conv int")
        got = eb_shrunk_rates(df, "seg", "conv").collect()
        assert all(r["alpha0"] is None for r in got)
        assert all(r["shrunk_rate"] == r["raw_rate"] for r in got)

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            eb_shrunk_rates,
            eb_shrunk_rates_sql,
        )
        import random
        rng = random.Random(59)
        rows = [(f"s{rng.randint(0, 20)}", rng.randint(0, 1))
                for _ in range(1000)]
        df = spark.createDataFrame(rows, "seg string, conv int")
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, eb_shrunk_rates(
            df, "seg", "conv").collect()))
        b = sorted(map(tuple, con.execute(eb_shrunk_rates_sql(
            "t", "seg", "conv")).fetchall()))
        assert a == b


class TestPairedT:
    def test_within_unit_variance_removed(self, spark):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_paired_t,
            ab_welch_test,
        )
        import random
        rng = random.Random(61)
        rows = []
        # units with WILDLY different baselines but a uniform +1
        # post shift: paired t sees it instantly, unpaired Welch
        # (pre vs post as two groups) drowns in between-unit spread
        for u in range(60):
            base = rng.uniform(0, 1000)
            for _ in range(5):
                rows.append((u, "2024-01-05", base + rng.gauss(0, .2)))
                rows.append((u, "2024-01-25",
                             base + 1.0 + rng.gauss(0, .2)))
        df = spark.createDataFrame(rows, "u int, ts string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = ab_paired_t(df, "u", "v", "ts",
                          "2024-01-15").collect()
        assert r["significant"] is True
        assert abs(r["mean_diff"] - 1.0) < 0.1
        welch = df.withColumn(
            "period", F.when(F.col("ts")
                             >= F.to_timestamp(F.lit("2024-01-15")),
                             "post").otherwise("pre"))
        [w] = ab_welch_test(welch, "period", "v",
                            "pre", "post").collect()
        assert w["significant"] is False   # lost in baseline spread

    def test_unpaired_units_excluded_and_degenerate(self, spark):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_paired_t,
        )
        rows = [(1, "2024-01-05", 10.0), (1, "2024-01-25", 12.0),
                (2, "2024-01-05", 5.0),   # pre only -> excluded
                (3, "2024-01-25", 7.0)]   # post only -> excluded
        df = spark.createDataFrame(rows, "u int, ts string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = ab_paired_t(df, "u", "v", "ts",
                          "2024-01-15").collect()
        assert r["n_units"] == 1
        assert r["t"] is None            # n < 2: no variance

    def test_twin_parity(self, spark):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_paired_t,
            ab_paired_t_sql,
        )
        import random
        rng = random.Random(67)
        rows = [(rng.randint(0, 30), rng.choice("gh"),
                 f"2024-01-{rng.randint(1, 28):02d}",
                 round(rng.uniform(0, 50), 2)) for _ in range(900)]
        df = spark.createDataFrame(rows, "u int, g string, "
                                   "ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, ab_paired_t(
            df, "u", "v", "ts", "2024-01-15", ["g"]).collect()))
        b = sorted(map(tuple, con.execute(ab_paired_t_sql(
            "t", "u", "v", "ts", "2024-01-15", ["g"])).fetchall()))
        assert a == b


class TestMantelHaenszel:
    def test_simpsons_paradox_resolved(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_mh_odds_ratio,
        )
        # classic construction: within each stratum treatment is
        # HARMFUL (OR < 1), but strata sizes/allocation make the
        # crude collapsed OR look protective (> 1)
        rows = []
        # stratum A (easy cases, mostly treatment): t 81/87, c 234/270
        rows += [("A", "t", 1)] * 81 + [("A", "t", 0)] * 6
        rows += [("A", "c", 1)] * 234 + [("A", "c", 0)] * 36
        # stratum B (hard cases, mostly control): t 192/263, c 55/80
        rows += [("B", "t", 1)] * 192 + [("B", "t", 0)] * 71
        rows += [("B", "c", 1)] * 55 + [("B", "c", 0)] * 25
        df = spark.createDataFrame(rows, "s string, variant string, "
                                   "conv int")
        [r] = ab_mh_odds_ratio(df, "variant", "conv", ["s"],
                               "c", "t").collect()
        # kidney-stone-style: crude favors t, MH pooled does not
        assert r["or_crude"] != r["or_mh"]
        assert r["n_strata"] == 2
        # hand-compute MH
        mh_num = (81 * 36 / 357) + (192 * 25 / 343)
        mh_den = (6 * 234 / 357) + (71 * 55 / 343)
        assert r["or_mh"] == round(mh_num / mh_den, 4)

    def test_single_stratum_equals_crude_and_validation(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_mh_odds_ratio,
        )
        rows = ([("x", "t", 1)] * 30 + [("x", "t", 0)] * 70
                + [("x", "c", 1)] * 20 + [("x", "c", 0)] * 80)
        df = spark.createDataFrame(rows, "s string, variant string, "
                                   "conv int")
        [r] = ab_mh_odds_ratio(df, "variant", "conv", ["s"],
                               "c", "t").collect()
        assert r["or_mh"] == r["or_crude"]
        import pytest as _pt
        with _pt.raises(ValueError):
            ab_mh_odds_ratio(df, "variant", "conv", [], "c", "t")

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_mh_odds_ratio,
            ab_mh_odds_ratio_sql,
        )
        import random
        rng = random.Random(71)
        rows = [(rng.choice("pqr"), rng.choice("ct"),
                 rng.randint(0, 1)) for _ in range(900)]
        df = spark.createDataFrame(rows, "s string, variant string, "
                                   "conv int")
        con = duckdb.connect()
        con.register("t", df.toPandas())
        [a] = ab_mh_odds_ratio(df, "variant", "conv", ["s"],
                               "c", "t").collect()
        [b] = con.execute(ab_mh_odds_ratio_sql(
            "t", "variant", "conv", ["s"], "c", "t")).fetchall()
        assert tuple(a) == b


class TestCochranArmitage:
    def test_planted_trend_vs_flat(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ca_trend_test,
        )
        import random
        rng = random.Random(11)
        # rates rise with dose: 10% / 30% / 50% / 70%
        rows = [(d, 1 if rng.random() < 0.1 + 0.2 * d else 0)
                for d in range(4) for _ in range(300)]
        df = spark.createDataFrame(rows, "dose long, conv int")
        [r] = ca_trend_test(df, "dose", "conv").collect()
        assert r["n"] == 1200 and r["n_doses"] == 4
        assert r["z"] > 10 and r["significant"]
        # flat rates: no trend
        flat = [(d, 1 if rng.random() < 0.3 else 0)
                for d in range(4) for _ in range(300)]
        [f] = ca_trend_test(
            spark.createDataFrame(flat, "dose long, conv int"),
            "dose", "conv").collect()
        assert not f["significant"]
        # falling rates: negative z
        fall = [(d, 1 if rng.random() < 0.7 - 0.2 * d else 0)
                for d in range(4) for _ in range(300)]
        [g] = ca_trend_test(
            spark.createDataFrame(fall, "dose long, conv int"),
            "dose", "conv").collect()
        assert g["z"] < -10 and g["significant"]

    def test_hand_computed_z(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ca_trend_test,
        )
        # doses 0,1,2 with (n, r) = (4,1), (4,2), (4,3)
        rows = ([(0, 1)] + [(0, 0)] * 3 + [(1, 1)] * 2 + [(1, 0)] * 2
                + [(2, 1)] * 3 + [(2, 0)])
        df = spark.createDataFrame(rows, "dose long, conv int")
        [r] = ca_trend_test(df, "dose", "conv").collect()
        import math
        N, R = 12, 6
        wr = 0 * 1 + 1 * 2 + 2 * 3          # 8
        wn = 4 * 0 + 4 * 1 + 4 * 2          # 12
        ww = 4 * 0 + 4 * 1 + 4 * 4          # 20
        num = N * wr - R * wn
        var = R * (N - R) * (N * ww - wn * wn) / N
        assert r["z"] == round(num / math.sqrt(var), 4)

    def test_degenerate_and_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ca_trend_test, ca_trend_test_sql,
        )
        # single dose level -> zero variance -> NULL z
        one = spark.createDataFrame([(1, 1), (1, 0)],
                                    "dose long, conv int")
        [r] = ca_trend_test(one, "dose", "conv").collect()
        assert r["z"] is None and not r["significant"]
        # all successes -> R = N -> NULL z
        allhit = spark.createDataFrame([(0, 1), (1, 1), (2, 1)],
                                       "dose long, conv int")
        [a] = ca_trend_test(allhit, "dose", "conv").collect()
        assert a["z"] is None
        # grouped twin parity
        import random
        rng = random.Random(3)
        rows = [(rng.randrange(2), rng.randrange(4),
                 rng.randrange(2)) for _ in range(400)]
        df = spark.createDataFrame(rows, "g int, dose long, conv int")
        con = duckdb.connect()
        con.register("t", df.toPandas())
        x = sorted(map(tuple, ca_trend_test(
            df, "dose", "conv", group_by=["g"]).collect()))
        y = sorted(map(tuple, con.execute(ca_trend_test_sql(
            "t", "dose", "conv", group_by=["g"])).fetchall()))
        assert x == y


class TestBrownForsythe:
    def test_detects_spread_change_mean_equal(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_brown_forsythe, ab_welch_test,
        )
        import random
        rng = random.Random(13)
        # equal means, treatment 3x wider: BF must fire, Welch not
        rows = [("c" if i % 2 else "t",
                 round(10 + rng.uniform(-1, 1)
                       * (3.0 if i % 2 == 0 else 1.0), 2))
                for i in range(1200)]
        df = spark.createDataFrame(rows, "variant string, v double")
        [bf] = ab_brown_forsythe(df, "variant", "v",
                                 "c", "t").collect()
        assert bf["t"] > 5 and bf["significant"]
        [we] = ab_welch_test(df, "variant", "v", "c", "t").collect()
        assert not we["significant"]

    def test_equal_spread_not_significant(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_brown_forsythe,
        )
        import random
        rng = random.Random(29)
        rows = [("c" if i % 2 else "t",
                 round(10 + rng.uniform(-1, 1), 2))
                for i in range(1200)]
        df = spark.createDataFrame(rows, "variant string, v double")
        [r] = ab_brown_forsythe(df, "variant", "v",
                                "c", "t").collect()
        assert not r["significant"]

    def test_median_rule_and_degenerate(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_brown_forsythe,
        )
        # even count: lower median (2nd of 4 sorted) by the rule
        df = spark.createDataFrame(
            [("c", 1.0), ("c", 2.0), ("c", 3.0), ("c", 4.0),
             ("t", 5.0), ("t", 5.0)], "variant string, v double")
        [r] = ab_brown_forsythe(df, "variant", "v",
                                "c", "t").collect()
        assert r["med_control"] == 2.0
        assert r["med_treatment"] == 5.0
        # treatment z's all zero -> t defined only if se > 0; with
        # constant treatment the variance is 0 on that side but
        # control side positive -> still defined
        assert r["t"] is not None

    def test_grouped_twin_parity(self, spark):
        import random

        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_brown_forsythe, ab_brown_forsythe_sql,
        )
        rng = random.Random(13)
        rows = []
        for g in ("e1", "e2"):
            widen = 3.0 if g == "e1" else 1.0
            for i in range(600):
                var = "c" if i % 2 else "t"
                w = widen if var == "t" else 1.0
                rows.append((g, var,
                             round(10 + rng.uniform(-1, 1) * w, 2)))
        df = spark.createDataFrame(rows,
                                   "g string, variant string, v double")
        a = sorted(map(tuple, ab_brown_forsythe(
            df, "variant", "v", "c", "t", group_by=["g"]).collect()))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        b = sorted(con.execute(ab_brown_forsythe_sql(
            "t", "variant", "v", "c", "t",
            group_by=["g"])).fetchall())
        assert a == b


class TestAffineInvariance:
    """Semantic pins: Cochran-Armitage z is invariant under positive
    AFFINE relabeling of the dose scores (the statistic depends only
    on their spacing ratios), and Brown-Forsythe's t is invariant
    under positive affine maps of the metric (|x − med| scales; the
    ratio doesn't)."""

    def test_ca_trend_dose_relabeling(self, spark):
        import random

        from nifi_extracttext_processor_spark.operators.abtest import (
            ca_trend_test,
        )
        rng = random.Random(11)
        rows = [(d, 1 if rng.random() < 0.1 + 0.2 * d else 0)
                for d in range(4) for _ in range(300)]
        df = spark.createDataFrame(rows, "dose long, conv int")
        [base] = ca_trend_test(df, "dose", "conv").collect()
        relabeled = df.withColumn(
            "dose", F.col("dose") * 10 + 7)  # 7,17,27,37
        [got] = ca_trend_test(relabeled, "dose", "conv").collect()
        assert got["z"] == base["z"]
        assert got["significant"] == base["significant"]

    def test_brown_forsythe_metric_affine(self, spark):
        import random

        from nifi_extracttext_processor_spark.operators.abtest import (
            ab_brown_forsythe,
        )
        rng = random.Random(13)
        rows = [("c" if i % 2 else "t",
                 round(10 + rng.uniform(-1, 1)
                       * (3.0 if i % 2 == 0 else 1.0), 2))
                for i in range(800)]
        df = spark.createDataFrame(rows, "variant string, v double")
        [base] = ab_brown_forsythe(df, "variant", "v",
                                   "c", "t").collect()
        aff = df.withColumn("v", F.col("v") * 4.0 + 250.0)
        [got] = ab_brown_forsythe(aff, "variant", "v",
                                  "c", "t").collect()
        assert got["t"] == base["t"]
        assert got["med_control"] == round(
            base["med_control"] * 4.0 + 250.0, 6)


class TestCaTrendOverflowRegression:
    """r15 widening: large raw dose scores push sum(w^2) past int64
    (4e6 rows at w=1e7 -> 4e20). Pre-fix Spark wrapped silently
    while the DuckDB BIGINT twin raised; agreement here proves the
    decimal(38,0)/HUGEINT accumulation end-to-end."""

    def test_huge_dose_scores_past_int64_wrap(self, spark):
        import duckdb
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.abtest \
            import ca_trend_test, ca_trend_test_sql
        n = 4_000_000
        df = (spark.range(n)
              .select(((F.col("id") % 4) * 10_000_000)
                      .alias("dose"),
                      (F.col("id") % 3 == 0).cast("int")
                      .alias("conv")))
        [r] = ca_trend_test(df, "dose", "conv").collect()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW t AS SELECT (range % 4) * 10000000 AS dose,"
            " CAST(range % 3 = 0 AS INT) AS conv FROM range("
            + str(n) + ")")
        want = con.execute(
            ca_trend_test_sql("t", "dose", "conv")).fetchone()
        assert tuple(str(v) for v in r) == tuple(str(v) for v in want)
        assert r["n"] == n
        assert r["z"] is not None
