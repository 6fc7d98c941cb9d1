"""Fellegi-Sunter linkage (operators/linkage.py): m/u weight
calibration (rare-field agreement outweighs common-field agreement),
smoothing finiteness, conservative NULL handling, score composition,
threshold helper, and DuckDB twin parity."""

import math

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators.linkage import (
    fs_match_threshold,
    fs_score_pairs,
    fs_weights,
    fs_weights_sql,
)


@pytest.fixture(scope="module")
def labeled(spark):
    # 40 matches / 160 non-matches.
    #   email: agrees on 90% of matches, 1% of non-matches (RARE)
    #   country: agrees on 95% of matches, 80% of non-matches (COMMON)
    rows = []
    for i in range(40):
        rows.append((1, int(i % 10 != 0), int(i % 20 != 1)))
    for i in range(160):
        rows.append((0, int(i == 7), int(i % 5 != 0)))
    return spark.createDataFrame(
        rows, "lab int, email_eq int, country_eq int")


class TestWeights:
    def test_rare_field_outweighs_common(self, spark, labeled):
        w = {r["field"]: r for r in fs_weights(
            labeled, ["email_eq", "country_eq"], "lab").collect()}
        # email agreement is much stronger evidence
        assert w["email_eq"]["w_agree"] \
            > w["country_eq"]["w_agree"] + 3
        # disagreement on email strongly negative; country mildly
        assert w["email_eq"]["w_disagree"] < -1
        assert abs(w["country_eq"]["w_disagree"]) \
            < abs(w["email_eq"]["w_disagree"])
        assert w["email_eq"]["n_match"] == 40
        assert w["email_eq"]["n_nonmatch"] == 160

    def test_smoothing_keeps_weights_finite(self, spark):
        # a field that NEVER agrees on non-matches would be log(inf)
        rows = [(1, 1)] * 5 + [(0, 0)] * 5
        df = spark.createDataFrame(rows, "lab int, f int")
        [w] = fs_weights(df, ["f"], "lab").collect()
        assert math.isfinite(w["w_agree"])
        assert math.isfinite(w["w_disagree"])
        with pytest.raises(ValueError):
            fs_weights(df, [], "lab")

    def test_twin_parity(self, spark, labeled):
        con = duckdb.connect()
        con.register("t", labeled.toPandas())
        a = [tuple(r) for r in fs_weights(
            labeled, ["email_eq", "country_eq"], "lab").collect()]
        b = con.execute(fs_weights_sql(
            "t", ["email_eq", "country_eq"], "lab")).fetchall()
        assert a == b


class TestScoring:
    def test_score_composition_and_nulls(self, spark):
        weights = {"email_eq": (5.0, -3.0), "country_eq": (0.5, -0.2)}
        pairs = spark.createDataFrame(
            [(1, 1, 1), (2, 1, 0), (3, 0, 1), (4, None, None)],
            "pid int, email_eq int, country_eq int")
        got = {r["pid"]: r["fs_score"] for r in
               fs_score_pairs(pairs, weights).collect()}
        assert got[1] == 5.5
        assert got[2] == 4.8
        assert got[3] == -2.5
        assert got[4] == -3.2   # NULLs take the disagreement weight
        with pytest.raises(ValueError):
            fs_score_pairs(pairs, {})

    def test_threshold_helper(self):
        th = fs_match_threshold(target_odds=1000.0, prior_odds=1e-6)
        assert th == pytest.approx(math.log2(1e9))
        with pytest.raises(ValueError):
            fs_match_threshold(target_odds=0.0)

    def test_end_to_end_separates_pairs(self, spark, labeled):
        w = {r["field"]: (r["w_agree"], r["w_disagree"])
             for r in fs_weights(labeled, ["email_eq", "country_eq"],
                                 "lab").collect()}
        scored = fs_score_pairs(labeled, w).collect()
        m_scores = [r["fs_score"] for r in scored if r["lab"] == 1]
        u_scores = [r["fs_score"] for r in scored if r["lab"] == 0]
        # matches score far above non-matches on average
        assert (sum(m_scores) / len(m_scores)
                > sum(u_scores) / len(u_scores) + 4)
