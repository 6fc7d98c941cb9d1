"""grouped_ols / grouped_corr (operators/regression.py): closed-form
fit vs an independent numpy.polyfit reference, degenerate-group NULL
semantics, x_shift frame invariance, DuckDB twin parity, and the
single-aggregation plan shape."""
from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.regression import (
    grouped_corr,
    grouped_corr_sql,
    grouped_ols,
    grouped_ols_sql,
)


@pytest.fixture(scope="module")
def pts(spark):
    rows = []
    # key "lin": exact line y = 3x + 1 -> slope 3, r2 = 1
    for x in range(10):
        rows.append(("lin", float(x), 3.0 * x + 1.0))
    # key "noisy": deterministic pseudo-noise around y = -2x + 5
    for x in range(20):
        rows.append(("noisy", float(x),
                     -2.0 * x + 5.0 + math.sin(x * 1.7) * 3.0))
    # key "flat": zero y-variance -> slope 0, r2 NULL
    for x in range(5):
        rows.append(("flat", float(x), 7.0))
    # key "vert": zero x-variance -> all NULL
    for y in range(4):
        rows.append(("vert", 2.0, float(y)))
    # key "one": single point -> all NULL
    rows.append(("one", 1.0, 1.0))
    return spark.createDataFrame(rows, "k string, x double, y double")


def _np_fit(rows):
    xs = np.array([r[0] for r in rows])
    ys = np.array([r[1] for r in rows])
    slope, intercept = np.polyfit(xs, ys, 1)
    pred = slope * xs + intercept
    ss_res = float(((ys - pred) ** 2).sum())
    ss_tot = float(((ys - ys.mean()) ** 2).sum())
    return float(slope), float(intercept), 1.0 - ss_res / ss_tot


def test_ols_matches_numpy(spark, pts):
    got = {r["k"]: r for r in grouped_ols(pts, ["k"], "x", "y").collect()}
    raw = [(r["x"], r["y"]) for r in pts.filter("k = 'noisy'").collect()]
    slope, intercept, r2 = _np_fit(raw)
    assert got["noisy"]["slope"] == pytest.approx(slope, rel=1e-9)
    assert got["noisy"]["intercept"] == pytest.approx(intercept, rel=1e-9)
    assert got["noisy"]["r2"] == pytest.approx(r2, rel=1e-9)
    assert got["lin"]["slope"] == pytest.approx(3.0)
    assert got["lin"]["intercept"] == pytest.approx(1.0)
    assert got["lin"]["r2"] == pytest.approx(1.0)


def test_degenerate_groups(spark, pts):
    got = {r["k"]: r for r in grouped_ols(pts, ["k"], "x", "y").collect()}
    # flat y: well-defined zero slope, but r2 is 0/0 -> NULL
    assert got["flat"]["slope"] == pytest.approx(0.0)
    assert got["flat"]["r2"] is None
    # vertical / single point: no fit at all
    for k in ("vert", "one"):
        assert got[k]["slope"] is None
        assert got[k]["intercept"] is None
        assert got[k]["r2"] is None
    assert got["one"]["n_points"] == 1


def test_x_shift_frame_invariance(spark, pts):
    base = {r["k"]: r for r in grouped_ols(pts, ["k"], "x", "y").collect()}
    shifted = {r["k"]: r
               for r in grouped_ols(pts, ["k"], "x", "y",
                                    x_shift=100.0).collect()}
    for k in ("lin", "noisy"):
        assert shifted[k]["slope"] == pytest.approx(
            base[k]["slope"], rel=1e-6)
        assert shifted[k]["r2"] == pytest.approx(base[k]["r2"], rel=1e-6)
        # intercept moves by slope * shift (the frame change)
        assert shifted[k]["intercept"] == pytest.approx(
            base[k]["intercept"] + base[k]["slope"] * 100.0, rel=1e-6)


def test_corr_matches_numpy(spark, pts):
    got = {r["k"]: r
           for r in grouped_corr(pts, ["k"], "x", "y").collect()}
    raw = [(r["x"], r["y"]) for r in pts.filter("k = 'noisy'").collect()]
    ref = float(np.corrcoef([p[0] for p in raw],
                            [p[1] for p in raw])[0, 1])
    assert got["noisy"]["pearson_r"] == pytest.approx(ref, rel=1e-9)
    assert got["lin"]["pearson_r"] == pytest.approx(1.0)
    assert got["flat"]["pearson_r"] is None
    assert got["vert"]["pearson_r"] is None


def test_duckdb_twin_parity(spark, pts, tmp_path):
    p = str(tmp_path / "pts.parquet")
    pts.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW pts AS SELECT * FROM read_parquet('{p}/*.parquet')")
    for sql, fn, kw in (
            (grouped_ols_sql("pts", ["k"], "x", "y", round_to=6),
             grouped_ols, {"round_to": 6}),
            (grouped_corr_sql("pts", ["k"], "x", "y", round_to=6),
             grouped_corr, {"round_to": 6})):
        want = {tuple(r) for r in con.execute(sql).fetchall()}
        got = {tuple(r) for r in fn(pts, ["k"], "x", "y", **kw).collect()}
        assert got == want


def test_single_aggregation_plan(spark, pts):
    plan = grouped_ols(pts, ["k"], "x", "y")._jdf.queryExecution() \
        .executedPlan().toString()
    # one partial + one final hash aggregate pair, exactly one exchange
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_null_inputs_dropped(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", None, 9.0),
         ("a", 3.0, None), ("a", 3.0, 6.0)],
        "k string, x double, y double")
    row = grouped_ols(df, ["k"], "x", "y").collect()[0]
    assert row["n_points"] == 3
    assert row["slope"] == pytest.approx(2.0)
    assert row["intercept"] == pytest.approx(0.0, abs=1e-12)
