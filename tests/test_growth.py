"""Growth accounting + session-stats rollup (operators/sessions.py):
hand-built classification fixtures (new/retained/resurrected/churned,
blackout periods, quick ratio), bounce/duration goldens, twin parity."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.sessions import (
    growth_accounting,
    growth_accounting_sql,
    session_stats,
    session_stats_sql,
)

M0 = dt.datetime(2026, 1, 15)


def _mon(k, u, i):
    # one event for user u in month (jan + k)
    mo = (1 + k - 1) % 12 + 1
    yr = 2026 + (k) // 12
    return (i, dt.datetime(yr, mo, 10), u, "click", None)


@pytest.fixture(scope="module")
def activity(spark):
    """Months 0..3:
      u1 active 0,1,2,3              (new@0 then retained)
      u2 active 0, gap, 2            (new@0, churn@1, resurrect@2,
                                      churn@3)
      u3 active 1 only               (new@1, churn@2)
    """
    rows, i = [], 0
    for u, months in ((1, [0, 1, 2, 3]), (2, [0, 2]), (3, [1])):
        for k in months:
            rows.append(_mon(k, u, i))
            i += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_classification_golden(spark, activity):
    out = {r["p"]: r for r in
           growth_accounting(activity, period="month").collect()}
    base = 2026 * 12 + 1 - 1
    m = {k: out[base + k] for k in range(4)}
    assert (m[0]["n_new"], m[0]["n_retained"], m[0]["n_resurrected"],
            m[0]["n_churned"]) == (2, 0, 0, 0)
    # month1: u3 new, u1 retained; u2 churned (active 0, not 1)
    assert (m[1]["n_new"], m[1]["n_retained"], m[1]["n_resurrected"],
            m[1]["n_churned"]) == (1, 1, 0, 1)
    # month2: u2 resurrected, u1 retained; u3 churned
    assert (m[2]["n_new"], m[2]["n_retained"], m[2]["n_resurrected"],
            m[2]["n_churned"]) == (0, 1, 1, 1)
    assert m[2]["quick_ratio"] == 1.0    # (0 new + 1 res) / 1 churned
    # month3: u1 retained; u2 churned again
    assert (m[3]["n_new"], m[3]["n_retained"], m[3]["n_resurrected"],
            m[3]["n_churned"]) == (0, 1, 0, 1)
    # the period AFTER the last active one is not reported (churn
    # there is structurally unknowable)
    assert base + 4 not in out


def test_blackout_period_keeps_churn(spark):
    """Everyone active in month 0, NOBODY in month 1, some return in
    month 2: the churn into the empty period must not vanish."""
    rows = [(_i, dt.datetime(2026, 1, 5), u, "x", None)
            for _i, u in enumerate((1, 2, 3))]
    rows += [(10, dt.datetime(2026, 3, 5), 1, "x", None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    out = {r["p"]: r for r in
           growth_accounting(df, period="month").collect()}
    base = 2026 * 12 + 1 - 1
    assert out[base + 1]["n_churned"] == 3          # the blackout
    assert out[base + 1]["n_new"] == 0
    assert out[base + 2]["n_resurrected"] == 1


def test_growth_twin_parity_all_periods(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    for per in ("month", "week", "day"):
        got = [tuple(r) for r in
               growth_accounting(ev, period=per).collect()]
        want = [tuple(t) for t in con.execute(
            growth_accounting_sql("events", period=per)).fetchall()]
        assert got == want and got, per
    with pytest.raises(ValueError, match="period"):
        growth_accounting(ev, period="quarter")
    with pytest.raises(ValueError, match="period"):
        growth_accounting_sql("events", period="quarter")


def test_session_stats_golden(spark):
    """u1: two events 10s apart (one session, duration 10, 2 events);
    u2: one event (bounce). Same day -> one row."""
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [(1, t0, 1, "a", None),
            (2, t0 + dt.timedelta(seconds=10), 1, "b", None),
            (3, t0, 2, "a", None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    [r] = session_stats(df).collect()
    assert r["day"] == "2026-01-01"
    assert r["n_sessions"] == 2 and r["n_users"] == 2
    assert r["bounce_rate"] == 0.5
    assert r["avg_events"] == 1.5
    assert r["avg_duration_s"] == 5.0       # (10 + 0) / 2
    assert r["max_duration_s"] == 10


def test_session_stats_twin_parity(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    got = [tuple(r) for r in session_stats(ev).collect()]
    want = [tuple(t) for t in con.execute(
        session_stats_sql("events")).fetchall()]
    assert got == want and got


class TestUserRfm:
    def test_hand_computed(self, spark):
        from nifi_extracttext_processor_spark.operators.sessions \
            import user_rfm
        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (1, t0, 1, "click", None),
            (2, t0 + dt.timedelta(days=5), 1, "purchase", 10.5),
            (3, t0 + dt.timedelta(days=9), 2, "purchase", None),
            (4, t0 + dt.timedelta(days=10), 2, "view", None),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
        out = {r["user"]: r for r in user_rfm(df).collect()}
        # horizon = day 10; u1 last at day 5 -> recency 5
        assert out[1]["recency_days"] == 5
        assert out[1]["frequency"] == 2
        assert out[1]["monetary"] == 10.5
        assert out[1]["n_purchases"] == 1
        # u2: purchase with NULL value counts 0 monetary, 0 purchases
        assert out[2]["recency_days"] == 0
        assert out[2]["monetary"] == 0.0
        assert out[2]["n_purchases"] == 0

    def test_twin_parity(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.sessions \
            import user_rfm, user_rfm_sql
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        a = sorted(tuple(r) for r in user_rfm(ev).collect())
        b = sorted(tuple(t) for t in
                   con.execute(user_rfm_sql("events")).fetchall())
        assert a == b and a


class TestTargetEncodeLoo:
    def test_loo_and_prior_goldens(self, spark):
        from nifi_extracttext_processor_spark.operators.classifier \
            import target_encode_loo
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 10.0), ("c", None)],
            "cat string, y double")
        rows = {(r["cat"], r["y"]): r["te"] for r in
                target_encode_loo(df, "cat", "y",
                                  prior_weight=2.0).collect()}
        gm = 14.0 / 3
        assert rows[("a", 1.0)] == round((4.0 - 1.0 + 2 * gm) / 3, 6)
        assert rows[("a", 3.0)] == round((4.0 - 3.0 + 2 * gm) / 3, 6)
        # singleton category: LOO collapses to exactly the prior
        assert rows[("b", 10.0)] == round(gm, 6)
        # NULL-label row: smoothed category mean, no LOO subtraction
        assert rows[("c", None)] == round(gm, 6)

    def test_no_self_leakage(self, spark):
        """A category whose rows all share one label must NOT encode
        that label back into its own rows at prior_weight=0 (the
        leak plain mean-encoding has)."""
        from nifi_extracttext_processor_spark.operators.classifier \
            import target_encode_loo
        df = spark.createDataFrame(
            [("x", 1.0), ("x", 1.0), ("y", 0.0), ("y", 0.0)],
            "cat string, y double")
        rows = [(r["cat"], r["te"]) for r in
                target_encode_loo(df, "cat", "y",
                                  prior_weight=0.0).collect()]
        # LOO of ("x", 1.0) over the OTHER x row = 1.0 — equal labels
        # still agree; the leak shows on a singleton, where LOO with
        # m=0 is 0/0 -> NULL instead of the row's own label
        df2 = spark.createDataFrame(
            [("solo", 42.0), ("y", 0.0)], "cat string, y double")
        out = {r["cat"]: r["te"] for r in target_encode_loo(
            df2, "cat", "y", prior_weight=0.0).collect()}
        assert out["solo"] is None     # never its own 42.0
        import pytest as _pt
        with _pt.raises(ValueError, match="prior_weight"):
            target_encode_loo(df, "cat", "y", prior_weight=-1)

    def test_twin_parity_and_broadcast_plan(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.classifier \
            import target_encode_loo, target_encode_loo_sql
        ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
              .select("event_id", "event_type", "value"))
        out = target_encode_loo(ev, "event_type", "value")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        got = sorted(map(str, ((r["event_id"], r["te"])
                               for r in out.collect())))
        want = sorted(map(str, ((t[0], t[2]) for t in con.execute(
            target_encode_loo_sql(
                "(SELECT event_id, event_type, value FROM events)",
                "event_type", "value",
                select="t.event_id, t.event_type")).fetchall())))
        assert got == want
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" \
            in plan


class TestCohortLtv:
    def test_hand_golden(self, spark):
        from nifi_extracttext_processor_spark.operators.sessions \
            import cohort_ltv
        jan, feb, mar = (dt.datetime(2026, m, 10) for m in (1, 2, 3))
        rows = [
            # cohort jan: u1 (10 @ offset 0, 20 @ offset 2),
            #             u2 (NULL-value activity @ 0 only)
            (1, jan, 1, "purchase", 10.0),
            (2, mar, 1, "purchase", 20.0),
            (3, jan, 2, "click", None),
            # cohort feb: u3 (5 @ offset 0)
            (4, feb, 3, "purchase", 5.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
        out = {(r["cohort_p"], r["period_offset"]): r
               for r in cohort_ltv(df, period="month").collect()}
        jan_p = 2026 * 12 + 0
        feb_p = 2026 * 12 + 1
        assert out[(jan_p, 0)]["cohort_size"] == 2
        assert out[(jan_p, 0)]["revenue"] == 10.0
        assert out[(jan_p, 0)]["cum_ltv_per_user"] == 5.0   # 10/2
        assert out[(jan_p, 2)]["revenue"] == 20.0
        assert out[(jan_p, 2)]["cum_ltv_per_user"] == 15.0  # 30/2
        assert out[(feb_p, 0)]["cum_ltv_per_user"] == 5.0
        with pytest.raises(ValueError, match="period"):
            cohort_ltv(df, period="quarter")

    def test_twin_parity_all_periods(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.sessions \
            import cohort_ltv, cohort_ltv_sql
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        for per in ("month", "week", "day"):
            a = [tuple(r) for r in cohort_ltv(ev, period=per).collect()]
            b = [tuple(t) for t in con.execute(
                cohort_ltv_sql("events", period=per)).fetchall()]
            assert a == b and a, per
