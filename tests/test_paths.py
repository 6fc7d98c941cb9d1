"""paths (operators/paths.py) + CUSUM changepoints (operators/
timeseries.py): golden semantics on hand-built sequences, DuckDB
twin parity, and edge cases (short paths, constant series)."""
from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators.paths import (
    event_transitions,
    event_transitions_sql,
    top_paths,
    top_paths_sql,
)
from nifi_extracttext_processor_spark.operators.timeseries import (
    detect_changepoints,
    detect_changepoints_sql,
)


def _t(i):
    return dt.datetime(2024, 1, 1, 0, 0, i)


@pytest.fixture(scope="module")
def journeys(spark):
    rows = [
        # u1: a > b > c      u2: a > b        u3: a > b > c > a
        (1, 1, _t(0), "a"), (2, 1, _t(1), "b"), (3, 1, _t(2), "c"),
        (4, 2, _t(0), "a"), (5, 2, _t(1), "b"),
        (6, 3, _t(0), "a"), (7, 3, _t(1), "b"), (8, 3, _t(2), "c"),
        (9, 3, _t(3), "a"),
        (10, 4, _t(0), "z"),                        # single event
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string")


def test_transitions_golden(spark, journeys):
    got = {(r["from_event"], r["to_event"]): (r["n"], r["p"])
           for r in event_transitions(journeys).collect()}
    # a->b three times (u1,u2,u3); c->a once; b->c twice
    assert got[("a", "b")] == (3, 1.0)
    assert got[("b", "c")] == (2, 1.0)
    assert got[("c", "a")] == (1, 1.0)
    assert len(got) == 3  # u4's single event contributes nothing


def test_transitions_probability_normalization(spark):
    rows = [(1, 1, _t(0), "a"), (2, 1, _t(1), "b"),
            (3, 1, _t(2), "a"), (4, 1, _t(3), "c"),
            (5, 1, _t(4), "a"), (6, 1, _t(5), "b")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string")
    got = {(r["from_event"], r["to_event"]): r["p"]
           for r in event_transitions(df).collect()}
    assert got[("a", "b")] == 0.666667 and got[("a", "c")] == 0.333333


def test_top_paths_golden_and_short_paths(spark, journeys):
    got = [(r["path"], r["n_users"]) for r in
           top_paths(journeys, depth=3, k=10).collect()]
    assert got[0] == ("a > b > c", 2)      # u1, u3 (u3 truncated at 3)
    assert ("a > b", 1) in got             # u2's SHORT path kept
    assert ("z", 1) in got                 # u4 single event kept
    # deterministic tie order: count desc then path asc
    assert got == sorted(got, key=lambda x: (-x[1], x[0]))


def test_paths_duckdb_parity(spark, journeys):
    con = duckdb.connect()
    con.register("events", journeys.toPandas())
    got = sorted(tuple(r) for r in event_transitions(journeys).collect())
    want = sorted(tuple(r) for r in
                  con.sql(event_transitions_sql()).fetchall())
    assert got == want
    got = sorted(tuple(r) for r in
                 top_paths(journeys, depth=2, k=10).collect())
    want = sorted(tuple(r) for r in
                  con.sql(top_paths_sql(depth=2, k=10)).fetchall())
    assert got == want


def test_paths_validation(spark, journeys):
    with pytest.raises(ValueError):
        top_paths(journeys, depth=0)
    with pytest.raises(ValueError):
        top_paths(journeys, k=0)


class TestChangepoints:
    def _series(self, spark):
        # key "s": mean shifts from ~0 to ~10 at i=30;
        # key "flat": constant
        rows = []
        for i in range(60):
            v = 0.0 if i < 30 else 10.0
            v += (0.3 if i % 2 else -0.3)
            rows.append(("s", _t(i), v))
            rows.append(("flat", _t(i), 5.0))
        return spark.createDataFrame(rows,
                                     "k string, ts timestamp, v double")

    def test_shift_flagged_after_changepoint(self, spark):
        df = self._series(spark)
        out = {(r["k"], r["ts"].second): r["is_change"]
               for r in detect_changepoints(
                   df, "ts", ["k"], "v", threshold=5.0,
                   baseline_n=30).collect()}
        # baseline reference: quiet before the shift, fire after
        assert not any(out[("s", i)] for i in range(30))
        assert all(out[("s", i)] for i in range(35, 60))
        assert not any(out[("flat", i)] for i in range(60))

    def test_global_reference_reads_step_both_sides(self, spark):
        # with the full-series reference a step series deviates from
        # the global mean on BOTH sides — documented semantics
        df = self._series(spark)
        rows = detect_changepoints(df, "ts", ["k"], "v",
                                   threshold=5.0).collect()
        s = [r for r in rows if r["k"] == "s"]
        assert any(r["cusum_neg"] > 5 for r in s)   # early half
        assert any(r["cusum_pos"] > 5 for r in s)   # late half
        assert not any(r["is_change"] for r in rows
                       if r["k"] == "flat")

    def test_duckdb_twin_parity(self, spark):
        df = self._series(spark)
        con = duckdb.connect()
        con.register("t", df.toPandas())
        got = sorted(tuple(r) for r in detect_changepoints(
            df, "ts", ["k"], "v", threshold=4.0,
            tiebreak_col="v").collect())
        want = sorted(tuple(r) for r in con.sql(detect_changepoints_sql(
            "t", "ts", ["k"], "v", threshold=4.0,
            tiebreak_col="v")).fetchall())
        assert got == want

    def test_long_series_twin_parity_exact(self, spark):
        """r16 regression (caught by the sf1 battery): over a LONG
        per-key series a raw-double running sum diverges between
        engines (Spark streams the cumulative frame, DuckDB may
        tree-combine) by an amount that GROWS with length — at sf1 it
        reached 1e-5 and flipped a round-6 digit. The z-grid integer
        accumulation must make the chart bit-identical at any length;
        2k points with ~9-digit doubles is enough to flip the old
        construction's last rounded digit."""
        import duckdb as ddb
        import datetime as dt
        base = dt.datetime(2024, 1, 1)
        rows = [("k", base + dt.timedelta(seconds=i),
                 ((i * 2654435761) % 100000) / 7.0 + (i % 17) * 0.013)
                for i in range(2000)]
        df = spark.createDataFrame(rows,
                                   "k string, ts timestamp, v double")
        con = ddb.connect()
        con.register("t", df.toPandas())
        got = sorted(tuple(r) for r in detect_changepoints(
            df, "ts", ["k"], "v", threshold=3.0,
            baseline_n=50).collect())
        want = sorted(tuple(r) for r in con.sql(detect_changepoints_sql(
            "t", "ts", ["k"], "v", threshold=3.0,
            baseline_n=50)).fetchall())
        assert got == want

    def test_textbook_recursion_oracle(self, spark):
        # pure-Python Page (1954) recursion replayed point-for-point,
        # on a series whose FIRST point already deviates from the
        # reference — the case the window identity only matches when
        # the empty prefix C0 = 0 enters the running extremum
        vals = [10.0, 0.5, -0.2, 9.5, 11.0, 0.1, 10.2, -0.4, 9.9, 0.3]
        df = spark.createDataFrame(
            [("k", _t(i), v) for i, v in enumerate(vals)],
            "k string, ts timestamp, v double")
        mu = sum(vals) / len(vals)
        sd = (sum((v - mu) ** 2 for v in vals) / len(vals)) ** 0.5
        drift = 0.5
        sp = sn = 0.0
        want = []
        for v in vals:
            z = (v - mu) / sd
            sp = max(0.0, sp + z - drift)
            sn = max(0.0, sn - z - drift)
            want.append((round(sp, 6), round(sn, 6)))
        rows = sorted(detect_changepoints(
            df, "ts", ["k"], "v", drift=drift).collect(),
            key=lambda r: r["ts"])
        got = [(r["cusum_pos"], r["cusum_neg"]) for r in rows]
        assert [p for p, _ in got] == pytest.approx(
            [p for p, _ in want], abs=1e-6)
        assert [n for _, n in got] == pytest.approx(
            [n for _, n in want], abs=1e-6)

    def test_first_point_deviation_counted(self, spark):
        # advisor scenario: every z ≈ 3σ above a baseline reference
        # from the first post-baseline row; textbook S+ after m such
        # points is m*(z - drift) — no under-report by the first
        # sample's deviation
        base = [(i % 2) * 2.0 for i in range(10)]       # mu=1, sd=1
        after = [4.0 if i % 2 else 2.0 for i in range(10)]  # z in {1,3}
        vals = base + after
        df = spark.createDataFrame(
            [("k", _t(i), v) for i, v in enumerate(vals)],
            "k string, ts timestamp, v double")
        rows = sorted(detect_changepoints(
            df, "ts", ["k"], "v", drift=0.5,
            baseline_n=10).collect(), key=lambda r: r["ts"])
        sp = 0.0
        want = []
        for v in vals:
            z = v - 1.0
            sp = max(0.0, sp + z - 0.5)
            want.append(round(sp, 6))
        got = [r["cusum_pos"] for r in rows]
        assert got == pytest.approx(want, abs=1e-6)
        # the first post-shift point carries its own deviation on top
        # of the baseline tail (S+=0.5 at i=9): z=1 at i=10 → S+=1.0
        assert got[10] == pytest.approx(1.0, abs=1e-6)

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            detect_changepoints(self._series(spark), "ts", [], "v")
