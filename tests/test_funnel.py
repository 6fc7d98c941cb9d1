"""Funnel + cohort retention (operators/sessions.py): hand-built
goldens, ordering semantics, DuckDB twin parity, plan shape.
"""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.sessions import (
    cohort_retention,
    cohort_retention_sql,
    funnel,
    funnel_counts,
    funnel_sql,
)

BASE = dt.datetime(2026, 1, 5)  # a Monday


def _t(m):
    return BASE + dt.timedelta(minutes=m)


EVENTS = [
    # u1 completes signup -> click -> purchase in order
    (1, "signup", _t(0)), (1, "click", _t(10)), (1, "purchase", _t(20)),
    # u2 clicks BEFORE signup: click must not count until after signup
    (2, "click", _t(0)), (2, "signup", _t(5)), (2, "click", _t(30)),
    # u3 signs up only
    (3, "signup", _t(1)),
    # u4 purchases without ever signing up: reaches no step
    (4, "purchase", _t(2)),
    # u5 simultaneous signup+click at the same ts: >= lets it count
    (5, "signup", _t(7)), (5, "click", _t(7)),
]


def _df(spark):
    return spark.createDataFrame(
        EVENTS, "user_id long, event_type string, ts timestamp")


class TestFunnel:
    STEPS = ["signup", "click", "purchase"]

    def test_golden(self, spark):
        out = {r["user_id"]: r for r in
               funnel(_df(spark), self.STEPS).collect()}
        assert set(out) == {1, 2, 3, 5}          # u4 never starts
        assert out[1]["n_steps"] == 3
        assert out[1]["step_3_ts"] == _t(20)
        # u2's pre-signup click is ignored; the later one counts
        assert out[2]["n_steps"] == 2
        assert out[2]["step_2_ts"] == _t(30)
        assert out[3]["n_steps"] == 1 and out[3]["step_2_ts"] is None
        assert out[5]["n_steps"] == 2            # simultaneous allowed
        assert out[5]["step_2_ts"] == _t(7)

    def test_counts(self, spark):
        got = [(r["step"], r["n_users"]) for r in
               funnel_counts(funnel(_df(spark), self.STEPS),
                             3).collect()]
        assert got == [(1, 4), (2, 3), (3, 1)]

    def test_matches_duckdb(self, spark):
        import duckdb
        got = sorted(tuple(r) for r in
                     funnel(_df(spark), self.STEPS).collect())
        con = duckdb.connect()
        con.register("events", _df(spark).toPandas())
        want = sorted(
            tuple(None if v != v else v for v in r)  # NaT -> None
            for r in con.execute(funnel_sql(self.STEPS))
            .fetchall())
        assert got == want

    def test_bad_args_and_plan(self, spark):
        with pytest.raises(ValueError):
            funnel(_df(spark), [])
        plan = funnel(_df(spark), self.STEPS)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestCohortRetention:
    def test_golden_weekly(self, spark):
        wk = dt.timedelta(days=7)
        rows = []
        # cohort A: 3 users first seen week 0; 2 return week 1; 1 week 2
        for u in (1, 2, 3):
            rows.append((u, "click", BASE))
        rows += [(1, "click", BASE + wk), (2, "click", BASE + wk),
                 (1, "click", BASE + 2 * wk)]
        # cohort B: 1 user first seen week 1
        rows.append((9, "click", BASE + wk))
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp")
        got = {(r["cohort"], r["period_offset"]):
               (r["n_active"], r["retention"])
               for r in cohort_retention(df).collect()}
        c0 = BASE  # Monday == week start
        assert got[(c0, 0)] == (3, 1.0)
        assert got[(c0, 1)] == (2, round(2 / 3, 4))
        assert got[(c0, 2)] == (1, round(1 / 3, 4))
        assert got[(BASE + wk, 0)] == (1, 1.0)

    def test_matches_duckdb(self, spark):
        import duckdb
        df = _df(spark)
        got = sorted(tuple(r) for r in cohort_retention(df).collect())
        con = duckdb.connect()
        con.register("events", df.toPandas())
        want = sorted(tuple(r) for r in
                      con.execute(cohort_retention_sql()).fetchall())
        assert got == want

    def test_dst_timezone_day_offsets(self, spark):
        """r7 ADVICE: under a DST session timezone, adjacent date_trunc
        days differ by 23/25 h; truncating the offset collapsed spring-
        forward neighbors into offset 0 (retention > 1). Rounding must
        recover exact day offsets across the 2025-03-09 US transition."""
        tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone",
                       "America/New_York")
        try:
            rows = [(1, "x", dt.datetime(2025, 3, 8, 12)),
                    (1, "x", dt.datetime(2025, 3, 9, 12)),   # 23 h day
                    (1, "x", dt.datetime(2025, 3, 10, 12)),
                    (2, "x", dt.datetime(2025, 3, 8, 9))]
            df = spark.createDataFrame(
                rows, "user_id long, event_type string, ts timestamp")
            out = cohort_retention(df, period="day").collect()
            got = {r["period_offset"]: (r["n_active"], r["retention"])
                   for r in out}
            assert got == {0: (2, 1.0), 1: (1, 0.5), 2: (1, 0.5)}
            assert all(r["retention"] <= 1.0 for r in out)
        finally:
            spark.conf.set("spark.sql.session.timeZone", tz)

    def test_monthly_offsets(self, spark):
        rows = [(1, "x", dt.datetime(2026, 1, 10)),
                (1, "x", dt.datetime(2026, 3, 2)),
                (2, "x", dt.datetime(2026, 1, 20))]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp")
        got = {(r["cohort"].month, r["period_offset"]): r["n_active"]
               for r in cohort_retention(df, period="month").collect()}
        assert got[(1, 0)] == 2 and got[(1, 2)] == 1


class TestConversionWindow:
    def test_window_cuts_late_steps(self, spark):
        import datetime as dt

        import duckdb
        from nifi_extracttext_processor_spark.operators.sessions \
            import funnel, funnel_sql
        T = dt.datetime(2026, 1, 1)
        rows = [
            (1, T, 1, "view", None),
            (2, T + dt.timedelta(days=2), 1, "click", None),
            (3, T + dt.timedelta(days=3), 1, "purchase", None),
            # u2's click is 40 days out: counted unbounded, cut at 7d
            (4, T, 2, "view", None),
            (5, T + dt.timedelta(days=40), 2, "click", None),
            # u3: early out-of-window click, later IN-window click —
            # the in-window one must still qualify
            (6, T, 3, "view", None),
            (7, T + dt.timedelta(days=40), 3, "view", None),
            (8, T + dt.timedelta(days=42), 3, "click", None),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
        unb = {r["user_id"]: r["n_steps"] for r in funnel(
            df, ["view", "click", "purchase"]).collect()}
        win = {r["user_id"]: r["n_steps"] for r in funnel(
            df, ["view", "click", "purchase"],
            max_gap_days=7).collect()}
        assert unb == {1: 3, 2: 2, 3: 2}
        assert win == {1: 3, 2: 1, 3: 1}
        # NOTE u3 is 1, not 2: first-touch chaining anchors step 1 at
        # the EARLIEST view (day 0); the day-42 click is outside ITS
        # window (the standard first-touch funnel convention)
        con = duckdb.connect()
        con.register("events", df.toPandas())
        for g in (None, 7):
            a = sorted(map(str, (tuple(r) for r in funnel(
                df, ["view", "click", "purchase"],
                max_gap_days=g).collect())))
            b = sorted(map(str, (tuple(t) for t in con.execute(
                funnel_sql(["view", "click", "purchase"],
                           max_gap_days=g)).fetchall())))
            assert a == b

    def test_step_names_escaped(self):
        import duckdb
        from nifi_extracttext_processor_spark.operators.sessions \
            import funnel_sql
        sql = funnel_sql(["o'step", 'two"step'], table="t")
        import pandas as pd
        con = duckdb.connect()
        con.register("t", pd.DataFrame(
            {"user_id": [1], "ts": [pd.Timestamp("2026-01-01")],
             "event_type": ["o'step"]}))
        rows = con.execute(sql).fetchall()   # parses and runs
        assert rows and rows[0][3] == 1      # n_steps = 1
