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
