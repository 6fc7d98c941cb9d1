"""Multi-touch conversion attribution (operators/attribution.py):
hand-computed goldens for all four models, lookback exclusion,
reconciliation to total conversion value, deterministic tie order,
and DuckDB twin parity."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.attribution import (
    MODELS,
    attribute_conversions,
    attribution_report,
    attribution_report_sql,
)

T0 = dt.datetime(2026, 1, 10)


def _ts(days):
    return T0 + dt.timedelta(days=days)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: click d0, view d2, click d3 -> purchase d4 (100)
        (1, _ts(0), 1, "click", None), (2, _ts(2), 1, "view", None),
        (3, _ts(3), 1, "click", None), (4, _ts(4), 1, "purchase", 100.0),
        # user 2: one view d0 -> purchase d1 (50)
        (5, _ts(0), 2, "view", None), (6, _ts(1), 2, "purchase", 50.0),
        # user 3: only touch is 40 days out -> unattributed (30)
        (7, _ts(-40), 3, "click", None), (8, _ts(0), 3, "purchase", 30.0),
        # user 4: two touches at the SAME instant (id order breaks the
        # tie: view id=9 first, click id=10 last) -> purchase (20)
        (9, _ts(0), 4, "view", None), (10, _ts(0), 4, "click", None),
        (11, _ts(1), 4, "purchase", 20.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


EXPECT = {
    # touch_type -> attributed_value per model (hand-computed)
    "last": {"click": 120.0, "view": 50.0},
    "first": {"click": 100.0, "view": 70.0},
    "linear": {"click": 76.6667, "view": 93.3333},
    "position": {"click": 90.0, "view": 80.0},
}


@pytest.mark.parametrize("model", list(EXPECT))
def test_models_hand_computed(spark, events, model):
    rep = {r["touch_type"]: r for r in attribution_report(
        events, ["click", "view"], model=model).collect()}
    for ch, v in EXPECT[model].items():
        assert rep[ch]["attributed_value"] == pytest.approx(v), ch
    # user 3's conversion is beyond the lookback -> unattributed
    assert rep["unattributed"]["n_conversions"] == 1
    assert rep["unattributed"]["attributed_value"] == 30.0
    # the report reconciles to total conversion value (200)
    assert sum(r["attributed_value"] for r in rep.values()) \
        == pytest.approx(200.0, abs=1e-3)


@pytest.mark.parametrize("model", list(EXPECT))
def test_twin_parity(spark, events, model):
    got = attribution_report(events, ["click", "view"], model=model)
    con = duckdb.connect()
    con.register("t", events.toPandas())
    odf = con.execute(attribution_report_sql(
        "t", ["click", "view"], model=model)).df()
    assert got.columns == list(odf.columns)
    assert [tuple(r) for r in got.collect()] \
        == [tuple(r) for r in odf.itertuples(index=False)]


def test_linear_weights_sum_to_one_per_conversion(spark, events):
    credits = attribute_conversions(events, ["click", "view"],
                                    model="linear")
    per_conv = (credits.groupBy("conv_id")
                .agg(F.round(F.sum("weight"), 9).alias("w"))
                .collect())
    assert per_conv and all(r["w"] == 1.0 for r in per_conv)


def test_position_middle_split(spark):
    """k=4 touches: 0.4 / 0.1 / 0.1 / 0.4 (0.2 split over 2 mids)."""
    rows = [(i, _ts(i), 1, "click", None) for i in range(4)]
    rows.append((9, _ts(5), 1, "purchase", 10.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    credits = attribute_conversions(df, ["click"], model="position")
    ws = [r["weight"] for r in
          credits.orderBy("touch_id").collect()]
    assert ws == pytest.approx([0.4, 0.1, 0.1, 0.4])


def test_same_instant_touch_counts(spark):
    """A touch at exactly the conversion timestamp is credited
    (<= convention)."""
    rows = [(1, _ts(0), 1, "click", None),
            (2, _ts(0), 1, "purchase", 10.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    rep = {r["touch_type"]: r for r in attribution_report(
        df, ["click"], model="last").collect()}
    assert rep["click"]["attributed_value"] == 10.0
    # fully attributed -> no unattributed row at all (one-pass shape)
    assert "unattributed" not in rep


def test_validation(spark, events):
    with pytest.raises(ValueError, match="model"):
        attribute_conversions(events, ["click"], model="decay")
    with pytest.raises(ValueError, match="lookback"):
        attribute_conversions(events, ["click"], lookback_days=0)
    with pytest.raises(ValueError, match="model"):
        attribution_report_sql("t", ["click"], model="decay")


class TestTimeToConvert:
    def test_hand_computed(self, spark, events):
        from nifi_extracttext_processor_spark.operators.attribution \
            import time_to_convert
        # first-touch anchors: u1 d0->d4 = 4, u2 d0->d1 = 1,
        # u4 d0->d1 = 1, u3 unattributed (NULL)
        out = {r["days_to_convert"]: r for r in time_to_convert(
            events, ["click", "view"]).collect()}
        assert out[4]["n_conversions"] == 1
        assert out[4]["total_value"] == 100.0
        assert out[1]["n_conversions"] == 2
        assert out[1]["total_value"] == 70.0
        assert out[None]["n_conversions"] == 1
        assert out[None]["total_value"] == 30.0
        # last-touch anchors shift u1 to d3->d4 = 1
        last = {r["days_to_convert"]: r for r in time_to_convert(
            events, ["click", "view"], from_touch="last").collect()}
        assert last[1]["n_conversions"] == 3
        assert None in last

    def test_histogram_reconciles_to_conversion_count(self, spark,
                                                      events):
        from nifi_extracttext_processor_spark.operators.attribution \
            import time_to_convert
        out = time_to_convert(events, ["click", "view"]).collect()
        assert sum(r["n_conversions"] for r in out) == 4
        assert sum(r["total_value"] for r in out) \
            == pytest.approx(200.0)

    def test_twin_parity_and_validation(self, spark, events):
        import duckdb
        from nifi_extracttext_processor_spark.operators.attribution \
            import time_to_convert, time_to_convert_sql
        for ft in ("first", "last"):
            got = time_to_convert(events, ["click", "view"],
                                  from_touch=ft, lookback_days=7)
            con = duckdb.connect()
            con.register("t", events.toPandas())
            odf = con.execute(time_to_convert_sql(
                "t", ["click", "view"], from_touch=ft,
                lookback_days=7)).df()
            a = [tuple(r) for r in got.collect()]
            b = [tuple(r) for r in odf.itertuples(index=False)]
            assert [x[1:] for x in a] == [x[1:] for x in b]
            assert [x[0] for x in a] == \
                [None if x[0] != x[0] else x[0] for x in b]
        with pytest.raises(ValueError, match="from_touch"):
            time_to_convert(events, ["click"], from_touch="mid")


class TestTouchCap:
    def test_cap_keeps_first_n_per_user_day(self, spark):
        from nifi_extracttext_processor_spark.operators.attribution \
            import attribution_report, cap_touches_per_day
        rows = []
        # bot user 1: 50 clicks on one day; user 2: 2 clicks
        for i in range(50):
            rows.append((i, _ts(0) + dt.timedelta(minutes=i),
                         1, "click", None))
        rows.append((100, _ts(1), 1, "purchase", 10.0))
        rows.append((200, _ts(0), 2, "click", None))
        rows.append((201, _ts(0, ), 2, "purchase", 5.0))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
        capped = cap_touches_per_day(df, ["click"], max_per_day=5)
        # bot reduced to 5 touches; non-touch rows untouched
        assert capped.filter(
            (F.col("user_id") == 1)
            & (F.col("event_type") == "click")).count() == 5
        assert capped.filter(
            F.col("event_type") == "purchase").count() == 2
        # the kept 5 are the FIRST by (ts, id)
        kept_ids = sorted(r["event_id"] for r in capped.filter(
            (F.col("user_id") == 1)
            & (F.col("event_type") == "click")).collect())
        assert kept_ids == [0, 1, 2, 3, 4]
        # attribution still reconciles on capped data
        rep = {r["touch_type"]: r for r in attribution_report(
            capped, ["click"], model="linear").collect()}
        assert rep["click"]["attributed_value"] == 15.0
        import pytest as _pt
        with _pt.raises(ValueError, match="max_per_day"):
            cap_touches_per_day(df, ["click"], max_per_day=0)
