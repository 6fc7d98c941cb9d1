"""detect_anomalies_rolling / detect_anomalies_mad
(operators/timeseries.py): values vs independent pure-Python
references, spike/warm-up/zero-sigma semantics, MAD robustness where
the classic z-score breaks down, NULL handling, DuckDB twin parity,
and plan shape (one sort for rolling; broadcast stat joins for MAD)."""
from __future__ import annotations

import math
import statistics

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators.timeseries import (
    detect_anomalies_mad,
    detect_anomalies_mad_sql,
    detect_anomalies_rolling,
    detect_anomalies_rolling_sql,
)


def _ref_rolling(vals, n, mp, threshold):
    """Plain-loop trailing-window modified reference: stats over the
    n values strictly before i (non-null), round-6 like the op."""
    out = []
    for i, v in enumerate(vals):
        win = [x for x in vals[max(0, i - n):i] if x is not None]
        if len(win) < mp:
            out.append((None, None, None, False))
            continue
        m = statistics.fmean(win)
        sd = math.sqrt(statistics.fmean([(x - m) ** 2 for x in win]))
        m, sd = round(m, 6), round(sd, 6)
        if sd > 0 and v is not None:
            z = round((v - statistics.fmean(win))
                      / math.sqrt(statistics.fmean(
                          [(x - statistics.fmean(win)) ** 2
                           for x in win])), 6)
            out.append((m, sd, z, abs(z) > threshold))
        else:
            out.append((m, sd, None, False))
    return out


def _mk(spark, vals, key="a"):
    return spark.createDataFrame(
        [(key, i, None if v is None else float(v))
         for i, v in enumerate(vals)], "k string, t long, v double")


def test_rolling_matches_reference(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 30.0, 10.0, 11.0, 9.0, 10.0]
    df = _mk(spark, vals)
    got = [(r["roll_mean"], r["roll_std"], r["zscore"], r["is_anomaly"])
           for r in detect_anomalies_rolling(
               df, "t", ["k"], "v", n=4, threshold=3.0)
           .orderBy("t").collect()]
    want = _ref_rolling(vals, 4, 4, 3.0)
    for g, w in zip(got, want):
        assert g[0] == pytest.approx(w[0], abs=1e-9) if w[0] is not None \
            else g[0] is None
        assert g[2] == pytest.approx(w[2], abs=1e-9) if w[2] is not None \
            else g[2] is None
        assert g[3] == w[3]


def test_spike_flagged_warmup_not(spark):
    vals = [10.0, 10.2, 9.8, 10.1, 9.9, 50.0, 10.0]
    df = _mk(spark, vals)
    rows = detect_anomalies_rolling(df, "t", ["k"], "v",
                                    n=5, threshold=3.0) \
        .orderBy("t").collect()
    # warm-up: fewer than n=5 predecessors -> null z, never flagged
    for r in rows[:5]:
        assert r["zscore"] is None and not r["is_anomaly"]
    assert rows[5]["is_anomaly"]          # the 50.0 spike
    # the spike sits in row 6's reference window, inflating sigma,
    # but 10.0 is still close to the trailing mean -> unflagged
    assert not rows[6]["is_anomaly"]


def test_constant_reference_never_standardizes(spark):
    df = _mk(spark, [5.0, 5.0, 5.0, 99.0])
    rows = detect_anomalies_rolling(df, "t", ["k"], "v",
                                    n=3, threshold=2.0) \
        .orderBy("t").collect()
    r = rows[3]
    assert r["roll_std"] == 0.0
    assert r["zscore"] is None and not r["is_anomaly"]


def test_null_values_and_min_periods(spark):
    df = _mk(spark, [1.0, None, 3.0, 2.0, None, 2.5])
    rows = detect_anomalies_rolling(
        df, "t", ["k"], "v", n=4, min_periods=2, threshold=3.0) \
        .orderBy("t").collect()
    assert rows[1]["zscore"] is None and not rows[1]["is_anomaly"]
    # row 3 has predecessors [1.0, None, 3.0] -> 2 non-null >= mp
    assert rows[3]["roll_mean"] == pytest.approx(2.0)
    # NULL current value scores nothing even with a full window
    assert rows[4]["zscore"] is None and not rows[4]["is_anomaly"]


def test_rolling_single_sort_plan(spark):
    df = _mk(spark, [float(i) for i in range(20)])
    plan = detect_anomalies_rolling(df, "t", ["k"], "v", n=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_rolling_duckdb_twin_parity(spark, tmp_path):
    rows = [("a", i, i % 7, float((i * 37) % 19) + (40.0 if i == 33 else 0))
            for i in range(60)] + \
           [("b", i, 0, float(i % 5)) for i in range(25)] + \
           [("b", 99, 1, None)]
    df = spark.createDataFrame(rows, "k string, t long, tb long, v double")
    p = str(tmp_path / "x.parquet")
    df.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW x AS SELECT * FROM read_parquet('{p}/*.parquet')")
    sql = detect_anomalies_rolling_sql(
        "x", "t", ["k"], "v", n=6, threshold=2.5,
        min_periods=3, tiebreak_col="tb")
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    got = {tuple(r) for r in detect_anomalies_rolling(
        df, "t", ["k"], "v", n=6, threshold=2.5,
        min_periods=3, tiebreak_col="tb").collect()}
    assert got == want


# ---- MAD ----


def _ref_mad(vals, threshold):
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    out = []
    for v in vals:
        if mad > 0:
            z = round(0.6745 * (v - med) / mad, 6)
            out.append((z, abs(z) > threshold))
        else:
            out.append((None, False))
    return out


def test_mad_matches_reference_and_beats_zscore(spark):
    # one enormous outlier: classic z breaks (it inflates sigma so
    # much its own |z| stays under 3.5); MAD flags it
    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 10.3, 1000.0]
    m = statistics.fmean(vals)
    sd = statistics.pstdev(vals)
    assert abs((1000.0 - m) / sd) < 3.5        # the breakdown, proven
    df = _mk(spark, vals)
    got = {r["v"]: (r["mad_z"], r["is_anomaly"])
           for r in detect_anomalies_mad(df, ["k"], "v",
                                         threshold=3.5).collect()}
    want = dict(zip(vals, _ref_mad(vals, 3.5)))
    for v, (wz, wf) in want.items():
        gz, gf = got[v]
        assert gf == wf, v
        if wz is None:
            assert gz is None
        else:
            assert gz == pytest.approx(wz, abs=1e-9)
    assert got[1000.0][1] and not any(
        f for v, (_, f) in got.items() if v != 1000.0)


def test_mad_zero_flags_nothing(spark):
    # >= half the mass on one value -> MAD 0 -> cannot standardize
    df = _mk(spark, [5.0] * 6 + [1.0, 9.0, 7.0, 3.0])
    rows = detect_anomalies_mad(df, ["k"], "v").collect()
    assert all(r["mad_z"] is None and not r["is_anomaly"] for r in rows)


def test_mad_null_and_approx_path(spark):
    df = _mk(spark, [1.0, 2.0, 3.0, 4.0, None, 100.0])
    rows = {r["t"]: r for r in
            detect_anomalies_mad(df, ["k"], "v").collect()}
    assert rows[4]["mad_z"] is None and not rows[4]["is_anomaly"]
    assert rows[5]["is_anomaly"]
    # sketch path: same flags on this easy fixture, no oracle claimed
    approx = {r["t"]: r["is_anomaly"] for r in detect_anomalies_mad(
        df, ["k"], "v", exact=False).collect()}
    assert approx == {t: r["is_anomaly"] for t, r in rows.items()}


def test_mad_broadcast_plan(spark):
    df = _mk(spark, [float(i) for i in range(30)])
    plan = detect_anomalies_mad(df, ["k"], "v") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # med joins twice (under the MAD-agg branch and in the output
    # branch) + the mad join itself — all broadcast, data never shuffles
    assert plan.count("BroadcastHashJoin") == 3


def test_mad_duckdb_twin_parity(spark, tmp_path):
    rows = [("a", i, float((i * 31) % 23)) for i in range(41)] + \
           [("a", 100, 500.0), ("b", 0, 1.0), ("b", 1, 1.0),
            ("b", 2, 2.0), ("b", 3, None)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    p = str(tmp_path / "m.parquet")
    df.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW m AS SELECT * FROM read_parquet('{p}/*.parquet')")
    sql = detect_anomalies_mad_sql("m", ["k"], "v", threshold=2.0)
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    got = {tuple(r) for r in detect_anomalies_mad(
        df, ["k"], "v", threshold=2.0).collect()}
    assert got == want


def test_validation(spark):
    df = _mk(spark, [1.0, 2.0])
    with pytest.raises(ValueError):
        detect_anomalies_rolling(df, "t", [], "v", n=4)
    with pytest.raises(ValueError):
        detect_anomalies_rolling(df, "t", ["k"], "v", n=1)
    with pytest.raises(ValueError):
        detect_anomalies_rolling(df, "t", ["k"], "v", n=4, min_periods=9)
    with pytest.raises(ValueError):
        detect_anomalies_mad(df, [], "v")
