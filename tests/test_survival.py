"""Kaplan-Meier survival (operators/survival.py): hand-computed
golden, censoring-vs-naive bias, user_durations derivation, DuckDB
twin parity, grouped + plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.survival import (
    km_survival,
    km_survival_sql,
    user_durations,
)


@pytest.fixture(scope="module")
def subjects(spark):
    # (duration, event): events at 1,2,3; censored at 2,4
    rows = [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0)]
    return spark.createDataFrame(rows, "duration int, event int")


class TestGolden:
    def test_hand_computed_curve(self, spark, subjects):
        got = {r["t"]: r for r in km_survival(subjects).collect()}
        # t=1: n=5 d=1 -> 0.8 ; t=2: n=4 d=1 c=1 -> 0.8*(3/4)=0.6
        # t=3: n=2 d=1 -> 0.3 ; t=4: n=1 d=0 c=1 -> 0.3
        assert got[1]["n_risk"] == 5 and got[1]["survival"] == 0.8
        assert got[2]["n_risk"] == 4 and got[2]["survival"] == 0.6
        assert got[2]["n_censored"] == 1
        assert got[3]["n_risk"] == 2 and got[3]["survival"] == 0.3
        assert got[4]["n_risk"] == 1 and got[4]["survival"] == 0.3
        assert got[4]["n_events"] == 0

    def test_censoring_is_not_an_event(self, spark):
        """Treating censored users as churned (the naive mistake KM
        exists to avoid) must yield strictly lower survival."""
        rows = [(5, 1)] * 2 + [(5, 0)] * 8
        df = spark.createDataFrame(rows, "duration int, event int")
        [r] = km_survival(df).collect()
        assert r["survival"] == 0.8          # 2 events / 10 at risk
        naive = spark.createDataFrame(
            [(5, 1)] * 10, "duration int, event int")
        [rn] = km_survival(naive).collect()
        assert rn["survival"] < r["survival"]

    def test_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 1), (None, 1), (2, None)],
            "duration int, event int")
        rows = km_survival(df).collect()
        assert len(rows) == 1 and rows[0]["n_risk"] == 1


class TestGroupedAndParity:
    def test_twin_parity_on_events(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        dur = user_durations(ev, inactive_days=30,
                             group_by=["event_type"])
        got = sorted(map(tuple, km_survival(
            dur, group_by=["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        dur_sql = """
          SELECT event_type, user_id AS user,
                 date_diff('day', CAST(min(ts) AS DATE),
                           CAST(max(ts) AS DATE))::BIGINT AS duration,
                 CAST(date_diff('day', CAST(max(ts) AS DATE),
                      (SELECT CAST(max(ts) AS DATE) FROM events))
                      > 30 AS INT) AS event
          FROM events WHERE ts IS NOT NULL
          GROUP BY event_type, user_id"""
        want = sorted(map(tuple, con.execute(km_survival_sql(
            f"({dur_sql})", group_by=["event_type"])).fetchall()))
        assert got == want

    def test_determinism_under_repartition(self, spark, subjects):
        a = sorted(map(tuple, km_survival(subjects).collect()))
        b = sorted(map(tuple,
                       km_survival(subjects.repartition(7)).collect()))
        assert a == b

    def test_window_runs_over_aggregated_rows(self, spark, subjects):
        """Scale contract: the window input is the per-(group, t)
        aggregate, so an Exchange feeding the window carries distinct
        durations, never subjects — assert the plan aggregates BEFORE
        the window."""
        plan = km_survival(subjects)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.index("Window") < plan.index("HashAggregate")


class TestUserDurations:
    def test_derivation(self, spark):
        rows = [("u1", "2024-01-01"), ("u1", "2024-01-11"),
                ("u2", "2024-02-28"), ("u2", "2024-03-01")]
        ev = spark.createDataFrame(rows, "user_id string, ts string") \
            .withColumn("ts", F.to_timestamp("ts"))
        got = {r["user"]: r for r in
               user_durations(ev, inactive_days=30).collect()}
        # corpus max = 2024-03-01; u1 last 01-11 -> 50 days gone ->
        # churned; u2 active at horizon -> censored
        assert got["u1"]["duration"] == 10 and got["u1"]["event"] == 1
        assert got["u2"]["duration"] == 2 and got["u2"]["event"] == 0


class TestLogRank:
    def test_identical_arms_not_significant(self, spark):
        from nifi_extracttext_processor_spark.operators.survival \
            import km_logrank
        rows = [(d, e, v) for v in ("c", "t")
                for d, e in [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0)]]
        df = spark.createDataFrame(
            rows, "duration int, event int, variant string")
        [r] = km_logrank(df, "duration", "event", "variant",
                         "c", "t").collect()
        # perfectly matched arms: O == E at every time -> chi2 == 0
        assert r["chi2"] == 0.0
        assert r["significant"] is False
        assert r["n_control"] == 5 and r["n_treatment"] == 5

    def test_separated_arms_significant(self, spark):
        from nifi_extracttext_processor_spark.operators.survival \
            import km_logrank
        rows = [(1 + i % 3, 1, "c") for i in range(60)] \
            + [(20 + i % 3, 1, "t") for i in range(60)]
        df = spark.createDataFrame(
            rows, "duration int, event int, variant string")
        [r] = km_logrank(df, "duration", "event", "variant",
                         "c", "t").collect()
        assert r["chi2"] > 3.841 and r["significant"] is True

    def test_hand_computed_two_times(self, spark):
        """Two subjects, one per arm, events at t=1 (control) and
        t=2 (treatment) — small enough to verify every term by
        hand (worked in the inline comments below)."""
        from nifi_extracttext_processor_spark.operators.survival \
            import km_logrank
        # subjects: (1, event, c), (2, event, t)
        df = spark.createDataFrame(
            [(1, 1, "c"), (2, 1, "t")],
            "duration int, event int, variant string")
        [r] = km_logrank(df, "duration", "event", "variant",
                         "c", "t").collect()
        # t=1: nt=2, n1t=1, d=1, d1=0 -> OE=-0.5, V=1*.5*.5*1/1=0.25
        # t=2: nt=1 -> V term 0 by the nt>1 guard; OE = 1 - 1*1/1 = 0
        # chi2 = (-0.5)^2 / 0.25 = 1.0
        assert r["chi2"] == 1.0
        assert r["significant"] is False

    def test_no_events_null_chi2(self, spark):
        from nifi_extracttext_processor_spark.operators.survival \
            import km_logrank
        df = spark.createDataFrame(
            [(3, 0, "c"), (4, 0, "t")],
            "duration int, event int, variant string")
        [r] = km_logrank(df, "duration", "event", "variant",
                         "c", "t").collect()
        assert r["chi2"] is None and r["significant"] is False

    def test_twin_parity_grouped(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.survival \
            import km_logrank, km_logrank_sql, user_durations
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events")
        dur = user_durations(ev, inactive_days=30,
                             group_by=["event_type"]) \
            .withColumn("variant",
                        F.when(F.pmod(F.col("user"), 2) == 0, "c")
                        .otherwise("t"))
        got = sorted(map(tuple, km_logrank(
            dur, "duration", "event", "variant", "c", "t",
            group_by=["event_type"]).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        dur_sql = """
          SELECT event_type, user_id AS user,
                 CASE WHEN user_id % 2 = 0 THEN 'c' ELSE 't' END
                   AS variant,
                 date_diff('day', CAST(min(ts) AS DATE),
                           CAST(max(ts) AS DATE))::BIGINT AS duration,
                 CAST(date_diff('day', CAST(max(ts) AS DATE),
                      (SELECT CAST(max(ts) AS DATE) FROM events))
                      > 30 AS INT) AS event
          FROM events WHERE ts IS NOT NULL
          GROUP BY event_type, user_id"""
        want = sorted(map(tuple, con.execute(km_logrank_sql(
            f"({dur_sql})", "duration", "event", "variant", "c", "t",
            group_by=["event_type"])).fetchall()))
        assert got == want


class TestStreamingKm:
    def test_incremental_state_equals_batch_and_replay(
            self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.survival \
            import km_from_counts, km_survival
        from nifi_extracttext_processor_spark.streaming.pipeline \
            import stream_km
        rows = [(g, d, e) for g in ("a", "b")
                for d, e in [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0),
                             (5, 1), (5, 0)]]
        whole = spark.createDataFrame(
            rows, "g string, duration int, event int")
        sd = str(tmp_path / "km_state")
        fb, read_state = stream_km(sd, group_by=["g"])
        assert read_state(spark) is None
        b1 = whole.filter(F.col("duration") <= 2)
        b2 = whole.filter(F.col("duration") > 2)
        fb(b1, 0)
        fb(b2, 1)
        got = sorted(map(tuple, km_from_counts(
            read_state(spark), ["g"]).collect()))
        want = sorted(map(tuple, km_survival(
            whole, group_by=["g"]).collect()))
        assert got == want
        # at-least-once replay of a committed batch does not
        # double-count (earlier-only reads)
        snap = sorted(map(tuple, read_state(spark).collect()))
        fb(b2, 1)
        assert sorted(map(tuple,
                          read_state(spark).collect())) == snap


class TestNelsonAalen:
    ROWS = [(1, 1), (2, 0), (3, 1), (3, 1), (5, 0)]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS,
                                     "duration long, event int")

    def test_golden_curve(self, spark):
        from nifi_extracttext_processor_spark.operators.survival \
            import nelson_aalen
        got = {r["t"]: (r["n_risk"], r["cum_hazard"]) for r in
               nelson_aalen(self._df(spark)).collect()}
        # H(1)=1/5, H(2)=+0/4, H(3)=+2/3, H(5)=+0/1
        assert got[1] == (5, 0.2)
        assert got[2] == (4, 0.2)
        assert got[3] == (3, round(0.2 + 2 / 3, 4))
        assert got[5] == (1, round(0.2 + 2 / 3, 4))

    def test_twin_parity(self, spark):
        import duckdb

        from nifi_extracttext_processor_spark.operators.survival \
            import nelson_aalen, nelson_aalen_sql
        df = self._df(spark).withColumn(
            "g", (F.col("duration") % 2).cast("string"))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, nelson_aalen(
            df, group_by=["g"]).collect()))
        b = sorted(map(tuple, con.execute(nelson_aalen_sql(
            "t", group_by=["g"])).fetchall()))
        assert a == b


class TestRmst:
    ROWS = [(1, 1), (2, 0), (3, 1), (3, 1), (5, 0)]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS,
                                     "duration long, event int")

    def test_golden_area(self, spark):
        from nifi_extracttext_processor_spark.operators.survival \
            import km_rmst
        # S=1 on [0,1), 0.8 on [1,3), 0.8/3 on [3,...)
        [r4] = km_rmst(self._df(spark), tau=4.0).collect()
        assert r4["rmst"] == round(1 + 0.8 * 2 + 0.8 / 3, 4)
        [r10] = km_rmst(self._df(spark), tau=10.0).collect()
        assert r10["rmst"] == round(1 + 0.8 * 2 + 0.8 / 3 * 7, 4)
        # horizon before the first event: area is exactly tau
        [r05] = km_rmst(self._df(spark), tau=0.5).collect()
        assert r05["rmst"] == 0.5

    def test_validation_and_twin_parity(self, spark):
        import duckdb
        import pytest as _pt

        from nifi_extracttext_processor_spark.operators.survival \
            import km_rmst, km_rmst_sql
        with _pt.raises(ValueError):
            km_rmst(self._df(spark), tau=0.0)
        with _pt.raises(ValueError):
            km_rmst_sql("t", tau=-1.0)
        df = self._df(spark).withColumn(
            "g", (F.col("duration") % 2).cast("string"))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, km_rmst(
            df, tau=4.0, group_by=["g"]).collect()))
        b = sorted(map(tuple, con.execute(km_rmst_sql(
            "t", tau=4.0, group_by=["g"])).fetchall()))
        assert a == b

    def test_rmst_never_exceeds_tau_and_is_monotone(self, spark):
        from nifi_extracttext_processor_spark.operators.survival \
            import km_rmst
        import random
        rng = random.Random(21)
        rows = [(rng.randint(0, 20), rng.randint(0, 1))
                for _ in range(200)]
        df = spark.createDataFrame(rows, "duration long, event int")
        vals = []
        for tau in (2.0, 8.0, 15.0):
            [r] = km_rmst(df, tau=tau).collect()
            assert 0 < r["rmst"] <= tau
            vals.append(r["rmst"])
        assert vals == sorted(vals)


class TestNaFromCounts:
    def test_merged_counts_equal_whole_history(self, spark):
        """The KM family's mergeable-state contract extends to the
        hazard curve: km_counts over two halves, km_merge, then
        nelson_aalen_from_counts == nelson_aalen over the union."""
        from nifi_extracttext_processor_spark.operators.survival \
            import (km_counts, km_merge, nelson_aalen,
                    nelson_aalen_from_counts)
        import random
        rng = random.Random(4)
        rows = [(rng.randint(1, 15), rng.randint(0, 1))
                for _ in range(300)]
        df = spark.createDataFrame(rows, "duration long, event int")
        half_a = df.limit(150)
        a = km_counts(half_a)
        b = km_counts(df.exceptAll(half_a))
        merged = km_merge(a, b)
        got = sorted(map(tuple,
                         nelson_aalen_from_counts(merged).collect()))
        want = sorted(map(tuple, nelson_aalen(df).collect()))
        assert got == want


class TestSurvivalReportPlan:
    def test_sections_match_standalone_operators(self, spark):
        from nifi_extracttext_processor_spark.operators.survival \
            import km_logrank, km_rmst, km_survival, nelson_aalen
        from nifi_extracttext_processor_spark.plans.survival \
            import survival_report
        import random
        rng = random.Random(6)
        rows = [(rng.randint(1, 12), rng.randint(0, 1),
                 "c" if rng.random() < 0.5 else "t")
                for _ in range(400)]
        df = spark.createDataFrame(
            rows, "duration long, event int, variant string")
        rep = survival_report(df, tau=8.0, variant_col="variant",
                              control="c", treatment="t")
        assert set(rep) == {"km", "band", "hazard", "rmst", "logrank"}
        assert sorted(map(tuple, rep["km"].collect())) \
            == sorted(map(tuple, km_survival(df).collect()))
        from nifi_extracttext_processor_spark.operators.survival \
            import km_greenwood
        assert sorted(map(tuple, rep["band"].collect())) \
            == sorted(map(tuple, km_greenwood(df).collect()))
        assert sorted(map(tuple, rep["hazard"].collect())) \
            == sorted(map(tuple, nelson_aalen(df).collect()))
        assert sorted(map(tuple, rep["rmst"].collect())) \
            == sorted(map(tuple, km_rmst(df, tau=8.0).collect()))
        assert sorted(map(tuple, rep["logrank"].collect())) \
            == sorted(map(tuple, km_logrank(
                df, "duration", "event", "variant",
                "c", "t").collect()))
        # without the arm columns the comparison section is absent
        rep2 = survival_report(df, tau=8.0)
        assert set(rep2) == {"km", "band", "hazard", "rmst"}


class TestShareStateLifecycle:
    """VERDICT r14 #6: share_state=True persists are load-bearing for
    composed plans — prove release_all() reclaims BOTH frames even
    when the consumer crashes mid-report, and that a released report
    still recomputes correctly afterwards."""

    def _frame(self, spark, n=200, seed=11):
        import random
        rng = random.Random(seed)
        rows = [(rng.randint(1, 12), rng.randint(0, 1))
                for _ in range(n)]
        return spark.createDataFrame(rows, "duration long, event int")

    def test_release_reclaims_both_persists_after_crash(self, spark):
        from nifi_extracttext_processor_spark.operators import (
            lifecycle,
        )
        from nifi_extracttext_processor_spark.plans.survival import (
            survival_report,
        )
        lifecycle.release_all(blocking=True)
        assert lifecycle.live_count() == 0
        df = self._frame(spark)
        rep = survival_report(df, tau=8.0)
        # the two shared frames (durations + km_counts) registered
        assert lifecycle.live_count() == 2
        # consumer crashes mid-report: one section read, then an
        # exception escapes before the rest are consumed
        with pytest.raises(RuntimeError):
            rep["km"].collect()
            raise RuntimeError("consumer died mid-report")
        freed = lifecycle.release_all(blocking=True)
        assert freed == 2
        assert lifecycle.live_count() == 0
        # release is idempotent
        assert lifecycle.release_all(blocking=True) == 0
        # the sections are still consumable (recompute, un-cached)
        assert rep["rmst"].collect()[0]["rmst"] is not None

    def test_share_state_false_registers_nothing(self, spark):
        from nifi_extracttext_processor_spark.operators import (
            lifecycle,
        )
        from nifi_extracttext_processor_spark.plans.survival import (
            survival_report,
        )
        lifecycle.release_all(blocking=True)
        rep = survival_report(self._frame(spark), tau=8.0,
                              share_state=False)
        assert lifecycle.live_count() == 0
        assert rep["km"].count() > 0

    def test_experiment_report_release_after_crash(self, spark):
        from nifi_extracttext_processor_spark.operators import (
            lifecycle,
        )
        from nifi_extracttext_processor_spark.plans.experiment import (
            experiment_report,
        )
        import random
        rng = random.Random(7)
        rows = [("c" if rng.random() < 0.5 else "t",
                 float(rng.randint(0, 40)) / 2.0,
                 rng.randint(0, 1))
                for _ in range(300)]
        df = spark.createDataFrame(
            rows, "variant string, value double, converted int")
        lifecycle.release_all(blocking=True)
        rep = experiment_report(df, "variant", "value", "c", "t")
        n_live = lifecycle.live_count()
        assert n_live >= 1
        with pytest.raises(RuntimeError):
            next(iter(rep.values())).collect()
            raise RuntimeError("consumer died mid-report")
        assert lifecycle.release_all(blocking=True) == n_live
        assert lifecycle.live_count() == 0
        # still consumable after release
        for sec in rep.values():
            assert sec.count() >= 0
