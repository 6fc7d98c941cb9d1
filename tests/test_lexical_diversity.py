"""Lexical-diversity profile (text_analysis.lexical_diversity):
hand-computed goldens over a tiny corpus, degenerate inputs, grouped
twin parity. All four ratios are exact-integer rationals, so the
goldens are exact up to the final round."""

from __future__ import annotations

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators.text_analysis import (
    lexical_diversity,
    lexical_diversity_sql,
)


def test_hand_computed_golden(spark):
    """Corpus 'the cat sat on the mat' + 'a cat and a dog':
    N=11 tokens, V=8 types, V1=5 hapaxes, Σf(f-1)=6, Σf²=17 ->
    ttr=8/11, hapax=5/8, simpson=6/110, yule=10⁴·6/121."""
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("a cat and a dog",), ("",)],
        "text string")
    [r] = lexical_diversity(df, "text").collect()
    assert (r["n_tokens"], r["n_types"]) == (11, 8)
    assert r["ttr"] == round(8 / 11, 4)
    assert r["hapax_frac"] == 0.625
    assert r["simpson_d"] == round(6 / 110, 4)
    assert r["yule_k"] == round(1e4 * 6 / 121, 4)


def test_single_token_group(spark):
    """N=1: simpson undefined -> NULL; everything else defined."""
    df = spark.createDataFrame([("hello",)], "text string")
    [r] = lexical_diversity(df, "text").collect()
    assert r["n_tokens"] == 1 and r["ttr"] == 1.0
    assert r["simpson_d"] is None
    assert r["yule_k"] == 0.0  # Σf² = N


def test_all_repeats_vs_all_unique(spark):
    rep = spark.createDataFrame([("x x x x x x",)], "text string")
    [r] = lexical_diversity(rep, "text").collect()
    assert r["simpson_d"] == 1.0 and r["hapax_frac"] == 0.0
    uniq = spark.createDataFrame([("a b c d e f",)], "text string")
    [u] = lexical_diversity(uniq, "text").collect()
    assert u["simpson_d"] == 0.0 and u["ttr"] == 1.0
    # richer vocabulary -> lower Yule K
    assert u["yule_k"] < r["yule_k"]


def test_grouped_twin_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = lexical_diversity(docs, "text", group_by=["lang"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    odf = con.execute(lexical_diversity_sql(
        "documents", "text", group_by=["lang"])).df()
    assert [tuple(r) for r in got.collect()] \
        == [tuple(r) for r in odf.itertuples(index=False)]


def test_plan_is_two_aggs_no_python(spark):
    df = spark.createDataFrame([("a b c",)] * 4, "text string")
    out = lexical_diversity(df, "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    assert plan.count("Exchange") <= 2  # term agg + closing agg
